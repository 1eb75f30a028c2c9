"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` cells with sidecar
metadata columns (mime, width/height or sample rate, byte size).
Decode / feature-extraction stages are actor pools with small batch
sizes (large payloads × concurrency must fit worker heaps —
ray_guide.md memory note).

Decode modes:

- ``fake`` — deterministic features derived from the payload bytes;
  exercises schema, determinism, and batch plumbing with zero codecs.
- ``real`` — optional-dependency decode, attempted ONCE per actor in
  ``__init__``: images prefer PIL and fall back to a built-in minimal
  PNG decoder (stdlib zlib + numpy unfiltering — real pixels, this
  container included); audio prefers soundfile and falls back to
  stdlib ``wave`` for RIFF/WAV PCM16; video frame demux prefers
  ``av`` and includes a built-in decoder for uncompressed YUV4MPEG2
  (y4m: a text header + raw planar frames — real pixels with zero
  optional deps, mirroring the PNG/WAV design); compressed containers
  without ``av`` raise ``NotImplementedError``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.hashing import hash_strings

FEATURE_DIM = 64

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit non-interlaced gray / gray+alpha /
    RGB / RGBA → (h, w, channels) uint8. Pure stdlib-zlib + numpy —
    filters 0/2 vectorize per scanline; 1/3/4 walk the row (their
    recurrence is inherently sequential). Intended for modest images;
    ``DecodeImageStage`` prefers PIL when installed."""
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bitd, color, _comp, _filt, inter = hdr
    if bitd != 8 or inter != 0 or color not in (0, 2, 4, 6):
        raise NotImplementedError(
            "minimal PNG decoder handles 8-bit non-interlaced gray/RGB(A) only"
        )
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):
            rec = cur.copy()
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + int(prev[x])) // 2
                else:  # Paeth
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 scanlines) for (h, w, c) uint8 —
    the planted-fixture counterpart of ``decode_png``."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
        )

    raw = b"".join(b"\x00" + np.ascontiguousarray(img[y]).tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _grid_features(luma: np.ndarray, grid: int = 8) -> np.ndarray:
    """(h, w) float luma → grid×grid block means, flattened float32 in
    [0, 1] — the deterministic 64-dim 'thumbnail' feature."""
    if luma.shape[0] < grid:  # tiny images: nearest-neighbor upsample
        luma = np.repeat(luma, -(-grid // luma.shape[0]), axis=0)
    if luma.shape[1] < grid:
        luma = np.repeat(luma, -(-grid // luma.shape[1]), axis=1)
    h, w = luma.shape
    ys = np.array_split(np.arange(h), grid)
    xs = np.array_split(np.arange(w), grid)
    out = np.empty((grid, grid), np.float32)
    row_means = np.add.reduceat(luma, [y[0] for y in ys], axis=0) / np.array(
        [len(y) for y in ys], np.float32
    )[:, None]
    out = (
        np.add.reduceat(row_means, [x[0] for x in xs], axis=1)
        / np.array([len(x) for x in xs], np.float32)[None, :]
    )
    return (out / 255.0).astype(np.float32).reshape(-1)


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


def synth_png_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL-PNG corpus: (image_id, payload, mime, width,
    height, n_bytes) with decodable 8-bit RGB payloads (seeded noise +
    gradient, encoded by ``encode_png``) — the planted fixture for
    ``mode='real'`` decode paths."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        h = int(rng.integers(9, 48))
        w = int(rng.integers(9, 48))
        base = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        grad = (np.arange(w, dtype=np.int64)[None, :, None] * 255 // max(w - 1, 1)).astype(
            np.uint8
        )
        img = ((base.astype(np.int32) + grad) % 256).astype(np.uint8)
        ids.append(i)
        payloads.append(encode_png(img))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array(np.array(ws, np.int32)),
            "height": pa.array(np.array(hs, np.int32)),
            "n_bytes": pa.array(np.array([len(p) for p in payloads], np.int64)),
        }
    )


class DecodeImageStage:
    """Actor-pool stage: (image_id, payload, ...) → (image_id, features).

    ``mode='real'`` decodes pixels and emits an 8×8 block-mean luma
    thumbnail as the FEATURE_DIM-float vector: PIL when installed
    (attempted once per actor in ``__init__``), else the built-in
    ``decode_png`` for PNG payloads — genuinely functional in
    codec-free containers; non-PNG payloads without PIL raise
    ``NotImplementedError`` naming the missing dependency.
    ``mode='fake'`` derives a deterministic FEATURE_DIM-float vector
    from the payload bytes (murmur3-seeded), so schema, determinism,
    and batch plumbing are exercisable with zero codecs.
    """

    def __init__(self, mode: str = "fake", feature_dim: int = FEATURE_DIM):
        if mode not in ("fake", "real"):
            raise ValueError(f"unknown mode {mode}")
        self.mode = mode
        self.dim = feature_dim
        self._pil = None
        if mode == "real":
            try:  # optional dependency, resolved once per actor
                import PIL.Image as _pil

                self._pil = _pil
            except ImportError:
                self._pil = None

    def _decode_real(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io

            img = np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))
        elif payload[:8] == _PNG_MAGIC:
            img = decode_png(payload)
        else:
            raise NotImplementedError(
                "real image decode for non-PNG payloads needs PIL "
                "(pip install pillow); the built-in decoder handles PNG only"
            )
        return img.astype(np.float32).mean(axis=2) if img.ndim == 3 else img.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            grid = int(np.sqrt(self.dim))
            if grid * grid != self.dim:
                raise ValueError("real mode needs a square feature_dim")
            pays = batch["payload"].to_numpy(zero_copy_only=False)
            feats = np.stack(
                [_grid_features(self._decode_real(p), grid) for p in pays]
            ) if len(pays) else np.empty((0, self.dim), np.float32)
            return pa.table(
                {
                    "image_id": batch["image_id"],
                    "features": pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.reshape(-1), pa.float32()), self.dim
                    ),
                }
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


_Y4M_MAGIC = b"YUV4MPEG2"


def decode_y4m(data: bytes):
    """Stdlib decoder for uncompressed YUV4MPEG2 streams.

    y4m is the trivial video container: one ASCII header line
    (``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<cs>``) then per frame a
    ``FRAME...\n`` marker followed by raw planar YCbCr bytes. Supports
    C420*, C422, C444 and Cmono. Returns ``(frames, meta)``: frames is
    a list of (h, w, 3) uint8 RGB arrays (BT.601 full-range,
    ``floor(x + 0.5)`` rounding — deterministic and reproducible in
    plain SQL for the oracle twin), meta carries width/height/fps/
    colorspace."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = None
    fps = (25, 1)
    cs = "420"
    for tok in data[len(_Y4M_MAGIC) : nl].decode("ascii").split(" "):
        if not tok:
            continue
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            a, b = val.split(":")
            fps = (int(a), int(b))
        elif key == "C":
            cs = val
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if cs.startswith("mono"):
        cw, ch = 0, 0
    elif cs.startswith("420"):
        cw, ch = w // 2, h // 2
    elif cs.startswith("422"):
        cw, ch = w // 2, h
    elif cs.startswith("444"):
        cw, ch = w, h
    else:
        raise ValueError(f"unsupported y4m colorspace C{cs}")
    usz = cw * ch
    fsz = w * h + 2 * usz
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("y4m frame marker missing")
        pos = fnl + 1
        if pos + fsz > len(data):
            raise ValueError("y4m truncated frame")
        raw = np.frombuffer(data, np.uint8, count=fsz, offset=pos)
        pos += fsz
        yp = raw[: w * h].reshape(h, w).astype(np.float64)
        if usz:
            up = raw[w * h : w * h + usz].reshape(ch, cw)
            vp = raw[w * h + usz :].reshape(ch, cw)
            u = np.repeat(np.repeat(up, h // ch, 0), w // cw, 1).astype(np.float64)
            v = np.repeat(np.repeat(vp, h // ch, 0), w // cw, 1).astype(np.float64)
        else:
            u = np.full((h, w), 128.0)
            v = np.full((h, w), 128.0)
        r = yp + 1.402 * (v - 128.0)
        g = yp - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
        b = yp + 1.772 * (u - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        frames.append(np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8))
    return frames, {"width": w, "height": h, "fps": fps, "colorspace": cs}


def encode_y4m(planes, width: int, height: int, fps=(24, 1), colorspace: str = "420") -> bytes:
    """Assemble a YUV4MPEG2 stream from per-frame (y, u, v) plane
    arrays (u/v omitted for mono) — the synth/test-planting twin of
    ``decode_y4m``."""
    out = [
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n".encode()
    ]
    for fr in planes:
        out.append(b"FRAME\n")
        for plane in fr:
            out.append(np.ascontiguousarray(plane, dtype=np.uint8).tobytes())
    return b"".join(out)


def synth_y4m_table(n: int, width: int = 32, height: int = 24) -> pa.Table:
    """Deterministic planted y4m corpus: (video_id, payload, mime,
    n_frames, fps, n_bytes). Every frame has CONSTANT planes —
    ``y = (3*vid + 5*idx) % 256``, ``u = (7*vid + idx) % 256``,
    ``v = (11*vid + 2*idx) % 256`` — so the decoded RGB of each frame
    is a single closed-form value per channel that a SQL oracle can
    recompute exactly (same double expressions, same floor(x+0.5)
    rounding)."""
    payloads, nframes = [], []
    for vid in range(n):
        f = 8 + vid % 5
        frames = []
        for idx in range(f):
            y = np.full((height, width), (3 * vid + 5 * idx) % 256, np.uint8)
            u = np.full((height // 2, width // 2), (7 * vid + idx) % 256, np.uint8)
            v = np.full((height // 2, width // 2), (11 * vid + 2 * idx) % 256, np.uint8)
            frames.append((y, u, v))
        payloads.append(encode_y4m(frames, width, height))
        nframes.append(f)
    return pa.table(
        {
            "video_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-yuv4mpeg"] * n, pa.string()),
            "n_frames": pa.array(np.array(nframes, np.int32)),
            "fps": pa.array(np.full(n, 24, np.int32)),
            "n_bytes": pa.array(np.array([len(p) for p in payloads], np.int64)),
        }
    )


class SampleFramesStage:
    """Actor-pool stage: video payload → ``k`` evenly-spaced frame
    payloads, one output row per sampled frame (flat_map shape).

    ``mode='real'`` decodes uncompressed YUV4MPEG2 payloads with the
    built-in stdlib ``decode_y4m`` (real pixels, zero optional deps)
    and demuxes every other container with pyav (attempted once per
    actor; compressed formats raise ``NotImplementedError`` when it is
    absent). ``mode='fake'`` treats the payload as fixed 256-byte
    frames and slices deterministically, so the fan-out schema
    (video_id, frame_idx, frame_payload) and batch sizing are fully
    exercisable.
    """

    FRAME_BYTES = 256

    def __init__(self, k: int = 4, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(f"unknown mode {mode}")
        self.k = k
        self.mode = mode
        self._av = None
        if mode == "real":
            try:  # optional dependency, resolved once per actor
                import av as _av

                self._av = _av
            except ImportError:
                self._av = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            vids, idxs, frames = [], [], []
            import io

            for vid, pay in zip(
                batch["video_id"].to_numpy(zero_copy_only=False),
                batch["payload"].to_numpy(zero_copy_only=False),
            ):
                if pay.startswith(_Y4M_MAGIC):
                    decoded, _ = decode_y4m(pay)
                    total = len(decoded)
                    take = np.unique(
                        np.linspace(0, max(total - 1, 0), num=min(self.k, total), dtype=np.int64)
                    )
                    for i in take:
                        vids.append(int(vid))
                        idxs.append(int(i))
                        frames.append(decoded[int(i)].tobytes())
                    continue
                if self._av is None:
                    raise NotImplementedError(
                        "real frame sampling for compressed containers needs "
                        "pyav (pip install av): demux batch['payload'], seek "
                        "to evenly spaced PTS, emit frames — the built-in "
                        "stdlib path covers uncompressed YUV4MPEG2 only"
                    )
                with self._av.open(io.BytesIO(pay)) as container:
                    stream = container.streams.video[0]
                    total = stream.frames or 0
                    want = set(
                        np.linspace(0, max(total - 1, 0), num=self.k, dtype=np.int64).tolist()
                    )
                    for i, frame in enumerate(container.decode(stream)):
                        if total and i not in want:
                            continue
                        arr = frame.to_ndarray(format="rgb24")
                        vids.append(int(vid))
                        idxs.append(i)
                        frames.append(arr.tobytes())
                        if len(want) and i >= max(want):
                            break
            return pa.table(
                {
                    "video_id": pa.array(vids, pa.int64()),
                    "frame_idx": pa.array(idxs, pa.int32()),
                    "frame_payload": pa.array(frames, pa.binary()),
                }
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

    ``mode='real'`` decodes the payload container — soundfile when
    installed (attempted once per actor), else stdlib ``wave`` for
    RIFF/WAV PCM16 (functional in codec-free containers) — then runs
    the same framed features. ``mode='fake'`` treats the payload as
    headerless PCM16. Both compute REAL framed features (RMS +
    zero-crossing count per ``frame_len``-sample frame) with
    vectorized numpy.
    """

    def __init__(self, mode: str = "fake", frame_len: int = 400):
        if mode not in ("fake", "real"):
            raise ValueError(f"unknown mode {mode}")
        self.mode = mode
        self.frame_len = frame_len
        self._sf = None
        if mode == "real":
            try:  # optional dependency, resolved once per actor
                import soundfile as _sf

                self._sf = _sf
            except ImportError:
                self._sf = None

    def _pcm_real(self, payload: bytes) -> np.ndarray:
        """payload → mono float32 PCM in [-1, 1]: soundfile when
        installed (any libsndfile format), else stdlib ``wave`` for
        RIFF/WAV PCM16 — genuinely functional in codec-free containers."""
        import io

        if self._sf is not None:
            pcm, _rate = self._sf.read(io.BytesIO(payload), dtype="float32")
            return pcm.mean(axis=1) if pcm.ndim == 2 else pcm
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import wave

            with wave.open(io.BytesIO(payload), "rb") as wf:
                if wf.getsampwidth() != 2:
                    raise NotImplementedError(
                        "stdlib WAV fallback handles PCM16 only; install "
                        "soundfile for other widths"
                    )
                nch = wf.getnchannels()
                pcm = np.frombuffer(
                    wf.readframes(wf.getnframes()), dtype="<i2"
                ).astype(np.float32) / 32768.0
                return pcm.reshape(-1, nch).mean(axis=1) if nch > 1 else pcm
        raise NotImplementedError(
            "real audio decode for non-WAV payloads needs soundfile "
            "(pip install soundfile); the stdlib fallback handles RIFF/WAV PCM16"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_numpy(zero_copy_only=False)
        pays = batch["payload"].to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_rms, out_zc = [], [], [], []
        fl = self.frame_len
        for aid, pay in zip(ids, pays):
            if self.mode == "real":
                pcm = self._pcm_real(pay)
            else:
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
