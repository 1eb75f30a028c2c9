"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` cells with sidecar
metadata columns (mime, width/height or sample rate, byte size).
Decode / feature-extraction stages are actor pools with small batch
sizes (large payloads × concurrency must fit worker heaps —
ray_guide.md memory note).

The decode kernels themselves are STUBBED in this container (no
image/audio libraries): ``DecodeImageStage`` raises
``NotImplementedError`` in ``real`` mode and produces deterministic
fake features in ``fake`` mode — the Ray-side plumbing (schema,
actor signature, batch sizing, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.hashing import hash_strings

FEATURE_DIM = 64


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake image corpus: (image_id, payload, mime, width,
    height, n_bytes)."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(256, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    w = rng.integers(16, 512, size=n).astype(np.int32)
    h = rng.integers(16, 512, size=n).astype(np.int32)
    return pa.table(
        {
            "image_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "width": pa.array(w),
            "height": pa.array(h),
            "n_bytes": pa.array(sizes.astype(np.int64)),
        }
    )


class DecodeImageStage:
    """Actor-pool stage: (image_id, payload, ...) → (image_id, features).

    ``mode='real'`` would decode with PIL/libjpeg — unavailable in this
    container, so it raises ``NotImplementedError`` with the exact
    integration point documented. ``mode='fake'`` derives a
    deterministic FEATURE_DIM-float vector from the payload bytes
    (murmur3-seeded), so schema, determinism, and batch plumbing are
    fully exercisable.
    """

    def __init__(self, mode: str = "fake", feature_dim: int = FEATURE_DIM):
        if mode not in ("fake", "real"):
            raise ValueError(f"unknown mode {mode}")
        self.mode = mode
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real image decode needs PIL/opencv: decode batch['payload'] "
                "bytes per row, resize, and emit float32 features here"
            )
        h1, h2 = hash_strings(batch["payload"])
        # deterministic fake features: seeded per-payload PRNG expansion
        feats = np.empty((len(batch), self.dim), dtype=np.float32)
        for j in range(self.dim // 2):
            # cheap vectorized expansion: alternate mixes of the two hash words
            feats[:, 2 * j] = ((h1 >> np.uint64(j % 32)) & np.uint64(0xFFFF)).astype(np.float32) / 65535.0
            feats[:, 2 * j + 1] = ((h2 >> np.uint64(j % 32)) & np.uint64(0xFFFF)).astype(np.float32) / 65535.0
        return pa.table(
            {
                "image_id": batch["image_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.dim
                ),
            }
        )


def explode_features(batch: pa.Table, id_column: str = "image_id") -> pa.Table:
    """(id, features fixed_size_list<f32, D>) → long-format
    (id, feat_idx, value) rows — the scalar shape SQL oracles and
    columnar sinks can consume without nested types."""
    n = len(batch)
    feats = batch["features"]
    if isinstance(feats, pa.ChunkedArray):
        feats = feats.combine_chunks()
    dim = feats.type.list_size
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_column: pa.array(np.repeat(ids.to_numpy(zero_copy_only=False), dim)),
            "feat_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
            "value": feats.flatten(),
        }
    )


def decode_images(ds, mode: str = "fake", batch_size: int = 64, concurrency=(1, 4)):
    """Large binary payloads → SMALL batches so payload×concurrency fits
    worker heaps; actor pool amortizes any model/codec setup."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_video_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake video corpus: (video_id, payload, mime,
    n_frames, fps, n_bytes) — payload is n_frames fixed-size chunks."""
    rng = np.random.default_rng(seed)
    frame_bytes = 256
    n_frames = rng.integers(8, 64, size=n)
    payloads = [
        rng.integers(0, 256, size=int(f) * frame_bytes, dtype=np.uint8).tobytes() for f in n_frames
    ]
    return pa.table(
        {
            "video_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/fake"] * n, pa.string()),
            "n_frames": pa.array(n_frames.astype(np.int32)),
            "fps": pa.array(np.full(n, 24, np.int32)),
            "n_bytes": pa.array((n_frames * frame_bytes).astype(np.int64)),
        }
    )


class SampleFramesStage:
    """Actor-pool stage: video payload → ``k`` evenly-spaced frame
    payloads, one output row per sampled frame (flat_map shape).

    ``mode='real'`` would demux with pyav/ffmpeg — unavailable here, so
    it raises with the integration point; ``mode='fake'`` treats the
    payload as fixed 256-byte frames and slices deterministically, so
    the fan-out schema (video_id, frame_idx, frame_payload) and batch
    sizing are fully exercisable.
    """

    FRAME_BYTES = 256

    def __init__(self, k: int = 4, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(f"unknown mode {mode}")
        self.k = k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real frame sampling needs pyav/ffmpeg: demux batch['payload'], "
                "seek to evenly spaced PTS, emit decoded frames here"
            )
        vids, idxs, frames = [], [], []
        ids = batch["video_id"].to_numpy(zero_copy_only=False)
        nf = batch["n_frames"].to_numpy(zero_copy_only=False)
        pays = batch["payload"].to_numpy(zero_copy_only=False)
        for vid, f, pay in zip(ids, nf, pays):
            take = np.linspace(0, int(f) - 1, num=min(self.k, int(f)), dtype=np.int64)
            for t in take:
                vids.append(int(vid))
                idxs.append(int(t))
                frames.append(pay[t * self.FRAME_BYTES : (t + 1) * self.FRAME_BYTES])
        return pa.table(
            {
                "video_id": pa.array(vids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds, k: int = 4, mode: str = "fake", batch_size: int = 32, concurrency=(1, 4)):
    return ds.map_batches(
        SampleFramesStage,
        fn_constructor_kwargs={"k": k, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_fingerprints(batch: pa.Table) -> pa.Table:
    """(video_id, frame_idx, frame_payload) → scalar rows with a
    murmur3 fingerprint of each frame's bytes instead of the payload —
    the dedup/oracle shape (wide binary never leaves the stage)."""
    from raydedup.sketches.hashing import hash_strings

    h1, _ = hash_strings(batch["frame_payload"])
    return pa.table(
        {
            "video_id": batch["video_id"],
            "frame_idx": batch["frame_idx"],
            "frame_fp": pa.array(h1, pa.uint64()),
        }
    )

def synth_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake audio corpus: (audio_id, payload, mime,
    sample_rate, n_samples, n_bytes) — payload is 16-bit PCM-shaped
    bytes (2 bytes per sample)."""
    rng = np.random.default_rng(seed)
    n_samples = rng.integers(1600, 48000, size=n)
    rates = rng.choice([8000, 16000, 44100], size=n).astype(np.int32)
    payloads = [rng.integers(0, 256, size=2 * s, dtype=np.uint8).tobytes() for s in n_samples]
    return pa.table(
        {
            "audio_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/fake-pcm16"] * n, pa.string()),
            "sample_rate": pa.array(rates),
            "n_samples": pa.array(n_samples.astype(np.int64)),
            "n_bytes": pa.array((2 * n_samples).astype(np.int64)),
        }
    )


class AudioFeatureStage:
    """Actor-pool stage: (audio_id, payload, sample_rate, ...) →
    per-frame energy features (audio_id, frame_idx, rms, zero_cross).

    ``mode='real'`` would resample/filter with torchaudio/librosa —
    unavailable here, so it raises with the integration point
    documented. ``mode='fake'`` treats the payload as PCM16 and
    computes REAL framed features (RMS + zero-crossing count per
    ``frame_len``-sample frame) with vectorized numpy — the framing
    math, schema and batch plumbing are production-shaped even though
    the input bytes are synthetic.
    """

    def __init__(self, mode: str = "fake", frame_len: int = 400):
        if mode not in ("fake", "real"):
            raise ValueError(f"unknown mode {mode}")
        self.mode = mode
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real audio decode needs torchaudio/librosa: parse "
                "batch['payload'] containers, resample to a common rate, "
                "and emit mel/MFCC frames here"
            )
        ids = batch["audio_id"].to_numpy(zero_copy_only=False)
        pays = batch["payload"].to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_rms, out_zc = [], [], [], []
        fl = self.frame_len
        for aid, pay in zip(ids, pays):
            pcm = np.frombuffer(pay, dtype="<i2").astype(np.float32) / 32768.0
            n_frames = len(pcm) // fl
            if n_frames == 0:
                continue
            frames = pcm[: n_frames * fl].reshape(n_frames, fl)
            rms = np.sqrt((frames * frames).mean(axis=1))
            zc = (np.diff(np.signbit(frames), axis=1) != 0).sum(axis=1)
            out_ids.append(np.full(n_frames, aid, np.int64))
            out_idx.append(np.arange(n_frames, dtype=np.int32))
            out_rms.append(rms)
            out_zc.append(zc.astype(np.int32))
        if not out_ids:
            return pa.table(
                {
                    "audio_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int32()),
                    "rms": pa.array([], pa.float32()),
                    "zero_cross": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "audio_id": pa.array(np.concatenate(out_ids)),
                "frame_idx": pa.array(np.concatenate(out_idx)),
                "rms": pa.array(np.concatenate(out_rms), pa.float32()),
                "zero_cross": pa.array(np.concatenate(out_zc)),
            }
        )


def audio_features(ds, mode: str = "fake", frame_len: int = 400, batch_size: int = 32, concurrency=(1, 4)):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"mode": mode, "frame_len": frame_len},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
