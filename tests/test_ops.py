"""Training-data operators: simhash, ANN, multimodal plumbing, lang id."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.ops.ann import IVFIndex, topk_cosine
from raydedup.ops.multimodal import DecodeImageStage, decode_images, synth_image_table
from raydedup.ops.simhash import (
    SimHashStage,
    hamming_distance,
    simhash_column,
    simhash_pairs,
)
from raydedup.synth import generate_pages

SF = "/root/testdata/sf0.001"


def test_hamming_distance():
    a = np.array([0b1010, 0xFFFFFFFFFFFFFFFF, 0], dtype=np.uint64)
    b = np.array([0b0110, 0, 0], dtype=np.uint64)
    assert hamming_distance(a, b).tolist() == [2, 64, 0]


def test_simhash_identical_and_near():
    pages, golden = generate_pages(300, seed=21)
    sh = simhash_column(pages["text"].combine_chunks())
    cid = np.array(golden["cluster_id"].to_pylist())
    kinds = golden["kind"].to_pylist()
    # exact dups → identical fingerprints
    for c in np.unique(cid[cid >= 0]):
        mem = np.nonzero(cid == c)[0]
        if len(mem) >= 2 and kinds[mem[0]] == "exact":
            assert sh[mem[0]] == sh[mem[1]]
    # near-0.95 dups → small hamming; singletons → large
    near, far = [], []
    singles = np.nonzero(cid < 0)[0][:50]
    for c in np.unique(cid[cid >= 0]):
        mem = np.nonzero(cid == c)[0]
        if len(mem) >= 2 and kinds[mem[0]] == "near-0.95":
            near.append(hamming_distance(sh[mem[0] : mem[0] + 1], sh[mem[1] : mem[1] + 1])[0])
    for i, j in zip(singles[:-1], singles[1:]):
        far.append(hamming_distance(sh[i : i + 1], sh[j : j + 1])[0])
    assert np.mean(near) < np.mean(far) - 10


def test_simhash_pairs_finds_exact_dups(ray_session):
    pages, golden = generate_pages(400, seed=22)
    ds = rd.from_arrow(pages.select(["url", "text"]))
    fp = ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=2)
    pairs = simhash_pairs(fp, "url", max_hamming=3, n_buckets=16).to_pandas()
    cid = dict(zip(golden["url"].to_pylist(), golden["cluster_id"].to_pylist()))
    kinds = dict(zip(golden["url"].to_pylist(), golden["kind"].to_pylist()))
    # every exact-dup pair must be found
    import collections

    clusters = collections.defaultdict(list)
    for u, c in cid.items():
        if c >= 0 and kinds[u] == "exact":
            clusters[c].append(u)
    found = {(a, b) for a, b in pairs[["id_a", "id_b"]].itertuples(index=False)}
    missing = 0
    total = 0
    for mem in clusters.values():
        mem.sort()
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                total += 1
                if (mem[x], mem[y]) not in found:
                    missing += 1
    assert total > 0 and missing == 0


def test_topk_cosine_matches_bruteforce(ray_session):
    rng = np.random.default_rng(33)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 16),
        }
    )
    ds = rd.from_arrow(tbl)
    q = emb[:3]
    out = topk_cosine(ds, q, k=5).to_pandas()
    # NumPy oracle
    nemb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    nq = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = nemb.astype(np.float64) @ nq.astype(np.float64).T
    for qi in range(3):
        expect = np.argsort(-scores[:, qi], kind="stable")[:5]
        got = out[out.query_id == qi].vec_id.to_numpy()
        assert set(got) == set(expect)
        assert got[0] == qi  # self is nearest
        assert out[out.query_id == qi].score.iloc[0] == pytest.approx(1.0)


def test_ivf_index_recall(ray_session):
    rng = np.random.default_rng(44)
    centers = rng.normal(size=(8, 16)) * 5
    emb = np.concatenate([c + rng.normal(size=(50, 16)) for c in centers]).astype(np.float32)
    ids = np.arange(len(emb), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 16),
        }
    )
    ds = rd.from_arrow(tbl)
    idx = IVFIndex(n_clusters=8)
    assigned = idx.build(ds).materialize()
    assert "ivf_cluster" in assigned.schema().names
    q = emb[:2]
    exact = topk_cosine(ds, q, k=5).to_pandas()
    approx = idx.search(assigned, q, k=5, nprobe=3).to_pandas()
    for qi in range(2):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        assert len(e & a) / 5 >= 0.6  # clustered data, probing 3/8 cells


def test_multimodal_decode_plumbing(ray_session):
    tbl = synth_image_table(100, seed=5)
    ds = rd.from_arrow(tbl)
    feats = decode_images(ds, mode="fake", batch_size=16).to_pandas()
    assert len(feats) == 100
    assert len(feats.features.iloc[0]) == 64
    # deterministic: same payload → same features
    feats2 = decode_images(rd.from_arrow(tbl), mode="fake", batch_size=32).to_pandas()
    f1 = np.stack(feats.sort_values("image_id").features.to_numpy())
    f2 = np.stack(feats2.sort_values("image_id").features.to_numpy())
    np.testing.assert_array_equal(f1, f2)


def test_multimodal_real_mode_nonpng_needs_pil():
    """Without PIL, real mode still decodes PNG via the built-in
    decoder but must raise for other formats, naming the dependency."""
    stage = DecodeImageStage(mode="real")
    if stage._pil is not None:
        pytest.skip("PIL installed: all formats decode")
    with pytest.raises(NotImplementedError):
        stage(synth_image_table(2))  # payloads are not PNGs


def _gradient_img(h, w, c=3):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    ch = np.arange(c, dtype=np.uint8)[None, None, :]
    return ((y * 3 + x * 7 + ch * 31) % 256).astype(np.uint8)


def test_png_roundtrip_all_filters():
    """encode_png (filter 0) → decode_png recovers exact pixels for
    gray / gray+alpha / RGB / RGBA, and the decoder unfilters
    Sub/Up/Average/Paeth scanlines (hand-built fixture)."""
    import struct
    import zlib

    from raydedup.ops.multimodal import decode_png, encode_png

    for c in (1, 2, 3, 4):
        img = _gradient_img(13, 17, c)
        out = decode_png(encode_png(img))
        np.testing.assert_array_equal(out, img)

    # hand-filter a 5x4 RGB image with every filter type
    img = _gradient_img(5, 4, 3).astype(np.int32)
    stride = 4 * 3
    lines = []
    prev = np.zeros(stride, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].reshape(-1)
        filt = np.empty(stride, np.int32)
        for x in range(stride):
            a = int(cur[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            cc = int(prev[x - 3]) if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), img.astype(np.uint8))


def test_multimodal_real_png_decode_through_stage(ray_session):
    """real mode decodes planted PNGs in-container (built-in decoder)
    and emits the 8x8 block-mean luma thumbnail."""
    from raydedup.ops.multimodal import encode_png

    imgs = [_gradient_img(16, 16), _gradient_img(32, 24), _gradient_img(5, 7)]
    tbl = pa.table(
        {
            "image_id": pa.array(np.arange(3, dtype=np.int64)),
            "payload": pa.array([encode_png(i) for i in imgs], pa.binary()),
        }
    )
    feats = (
        decode_images(rd.from_arrow(tbl), mode="real", batch_size=2)
        .to_pandas()
        .sort_values("image_id")
    )
    assert len(feats) == 3
    # first image: flat 16x16 blocks of 2x2 — verify one block mean
    luma = imgs[0].astype(np.float32).mean(axis=2)
    want00 = luma[:2, :2].mean() / 255.0
    got = np.asarray(feats.features.iloc[0], np.float32)
    assert got[0] == pytest.approx(want00, abs=1e-6)
    assert len(got) == 64 and np.isfinite(got).all()


def test_multimodal_real_wav_decode():
    """real audio mode decodes a stdlib-planted RIFF/WAV PCM16 sine and
    produces the same framed features as fake mode on the raw PCM."""
    import io
    import wave

    from raydedup.ops.multimodal import AudioFeatureStage

    t = np.arange(8000, dtype=np.float32) / 8000.0
    pcm16 = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm16.tobytes())
    wav_bytes = buf.getvalue()

    def run(mode, payload):
        tbl = pa.table(
            {
                "audio_id": pa.array([0], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
        return AudioFeatureStage(mode=mode, frame_len=400)(tbl).to_pandas()

    real = run("real", wav_bytes)
    fake = run("fake", pcm16.tobytes())
    assert len(real) == len(fake) == 20
    np.testing.assert_allclose(real.rms.to_numpy(), fake.rms.to_numpy(), rtol=1e-6)
    assert (real.zero_cross.to_numpy() == fake.zero_cross.to_numpy()).all()
    # a 440 Hz sine at 8 kHz: ~44 zero crossings per 400-sample frame
    assert 40 <= real.zero_cross.iloc[0] <= 48
    assert real.rms.iloc[0] == pytest.approx(20000 / 32768 / np.sqrt(2), rel=0.05)


def test_multimodal_real_video_gated():
    """real frame sampling is gated on pyav: with it installed the
    stage demuxes; without it the stage raises naming the dependency."""
    from raydedup.ops.multimodal import SampleFramesStage, synth_video_table

    stage = SampleFramesStage(k=2, mode="real")
    if stage._av is None:
        with pytest.raises(NotImplementedError):
            stage(synth_video_table(1))
    else:
        pytest.importorskip("av")


def test_multimodal_real_image_pil_parity():
    """When PIL is installed, the PIL path and the built-in PNG decoder
    agree on planted PNGs."""
    pytest.importorskip("PIL")
    from raydedup.ops.multimodal import decode_png, encode_png

    stage = DecodeImageStage(mode="real")
    img = _gradient_img(16, 16)
    payload = encode_png(img)
    via_pil = stage._decode_real(payload)
    stage._pil = None
    via_builtin = stage._decode_real(payload)
    np.testing.assert_allclose(via_pil, via_builtin)


def test_langid_markers():
    import ray.data as rd

    from raydedup.ops.text_stats import LangIdStage

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat and it is a fine day for all of us",
                    "der Hund ist nicht auf der Strasse und das ist ein Problem",
                    "le chat est dans la maison et il est content pour une fois",
                    "el perro es un animal y la casa es grande por la noche",
                ]
            ),
        }
    )
    stage = LangIdStage()
    out = stage(tbl)
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es"]

def test_video_frame_sampling_plumbing(ray_session):
    from raydedup.ops.multimodal import SampleFramesStage, sample_frames, synth_video_table

    tbl = synth_video_table(50, seed=3)
    out = sample_frames(rd.from_arrow(tbl), k=4).to_pandas()
    # each video contributes min(k, n_frames) rows
    import collections

    per_video = collections.Counter(out.video_id)
    nf = dict(zip(tbl["video_id"].to_pylist(), tbl["n_frames"].to_pylist()))
    for vid, cnt in per_video.items():
        assert cnt == min(4, nf[vid])
    assert (out.frame_payload.str.len() == 256).all()
    with pytest.raises(NotImplementedError):
        SampleFramesStage(mode="real")(tbl)


def test_srp_cosine_pairs_vs_bruteforce(ray_session):
    """SRP-LSH candidate gen + cogroup cosine verify: precision 1
    (exact verify) and high recall vs the brute-force oracle."""
    from raydedup.ops.ann import cosine_dup_pairs, cosine_dup_pairs_bruteforce

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 16))
    rows, k = [base], 0
    # plant near-duplicates (small perturbations → cosine near 1)
    dup_of = {}
    for i in range(0, 60, 4):
        v = base[i] + rng.normal(size=16) * 0.02
        dup_of[60 + k] = i
        rows.append(v[None, :])
        k += 1
    emb = np.concatenate(rows).astype(np.float32)
    ids = np.arange(len(emb), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 16),
        }
    )
    ds = rd.from_arrow(tbl)
    tau = 0.98
    exact = cosine_dup_pairs_bruteforce(ds, tau=tau).to_pandas()
    srp = cosine_dup_pairs(ds, tau=tau, bands=16, n_planes=64, n_buckets=8).to_pandas()
    exact_set = {(a, b) for a, b in exact[["id_a", "id_b"]].itertuples(index=False)}
    srp_set = {(a, b) for a, b in srp[["id_a", "id_b"]].itertuples(index=False)}
    assert srp_set <= exact_set  # exact verification → precision 1
    assert len(exact_set) >= 10
    recall = len(srp_set & exact_set) / len(exact_set)
    assert recall >= 0.95, recall
    # cosine values are exact float64 on the pairs found
    m = srp.merge(exact, on=["id_a", "id_b"], suffixes=("_s", "_e"))
    assert np.allclose(m.cosine_s, m.cosine_e)


def test_langid_matches_per_row_reference(ray_session):
    """Vectorized marker matching == the per-row set-intersection
    definition, including marker words shared across languages
    ('la', 'un', 'que' are listed for both fr and es)."""
    import pyarrow as pa

    from raydedup.ops.text_stats import _LANG_MARKERS, LangIdStage

    texts = [
        "the cat and the dog is in that house for a while",
        "der hund ist nicht mit der katze auf dem sofa und",
        "le chat est dans la maison pour que les amis",
        "el gato es un animal en la casa por que los",
        "la un que",          # only shared fr/es markers: tie -> fr (dict order)
        "xyzzy plugh 42",     # no markers -> unknown
        "",
    ]

    def reference(text):
        ws = set(text.lower().split())
        best, best_n = "unknown", 0
        for lang, markers in _LANG_MARKERS.items():
            hits = len(ws & markers)
            if hits > best_n:
                best, best_n = lang, hits
        return best

    batch = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    out = LangIdStage()(batch)
    got = out["lang_pred"].to_pylist()
    expect = [reference(t) for t in texts]
    assert got == expect, (got, expect)
    assert got[4] == "fr"  # shared markers credit BOTH langs; tie -> first


def test_audio_feature_stage(ray_session):
    """Audio plumbing: framed RMS/zero-crossing features over PCM16
    payloads; deterministic, covers every input with >= 1 full frame."""
    import pyarrow as pa

    from raydedup.ops.multimodal import AudioFeatureStage, audio_features, synth_audio_table

    tbl = synth_audio_table(40, seed=7)
    ds = rd.from_arrow(tbl)
    out = audio_features(ds, frame_len=400).to_pandas()
    n_samples = dict(zip(tbl["audio_id"].to_pylist(), tbl["n_samples"].to_pylist()))
    for aid, g in out.groupby("audio_id"):
        assert len(g) == n_samples[aid] // 400
        assert (g.rms >= 0).all() and (g.rms <= 1.0).all()
        assert (g.zero_cross >= 0).all() and (g.zero_cross < 400).all()
    # deterministic across runs
    out2 = audio_features(rd.from_arrow(tbl), frame_len=400).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        out.sort_values(["audio_id", "frame_idx"]).reset_index(drop=True),
        out2.sort_values(["audio_id", "frame_idx"]).reset_index(drop=True),
    )
    # real mode documents its integration point
    import pytest

    with pytest.raises(NotImplementedError):
        AudioFeatureStage(mode="real")(tbl)


def test_blockwise_cosine_pairs_exact(ray_session):
    """Distributed blockwise all-pairs equals the brute-force oracle
    EXACTLY (ids and float64 cosines) — the low-tau scale path."""
    from raydedup.ops.ann import cosine_all_pairs_blockwise, cosine_dup_pairs_bruteforce

    rng = np.random.default_rng(11)
    emb = rng.normal(size=(150, 24)).astype(np.float32)
    ids = np.arange(150, dtype=np.int64) * 7 + 3  # non-contiguous ids
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 24),
        }
    )
    ds = rd.from_arrow(tbl)
    tau = 0.3
    exact = (
        cosine_dup_pairs_bruteforce(ds, tau=tau)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    blk = (
        cosine_all_pairs_blockwise(ds, tau=tau, n_chunks=5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(exact) > 20
    assert blk[["id_a", "id_b"]].values.tolist() == exact[["id_a", "id_b"]].values.tolist()
    assert np.allclose(blk.cosine.to_numpy(), exact.cosine.to_numpy(), atol=1e-12)


def test_bruteforce_cosine_bounded(ray_session):
    from raydedup.ops.ann import cosine_dup_pairs_bruteforce

    emb = np.ones((12, 4), dtype=np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(12, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 4),
        }
    )
    ds = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="bound"):
        cosine_dup_pairs_bruteforce(ds, tau=0.5, max_rows=10)


def test_simhash_from_signatures_matches_text_path(ray_session):
    """Fingerprints computed from the signature stage's stored shingle
    sets equal the standalone text-path fingerprints whenever a doc's
    shingles are distinct and under the KMV cap (the common case the
    shared-shingle bench path relies on)."""
    from raydedup.ops.simhash import simhash_batch_fn, simhash_from_signatures
    from raydedup.pipeline.run import build_signatures
    from raydedup.config import DedupConfig

    # distinct words per doc -> shingle multiset == set, under the cap
    texts = [
        " ".join(f"w{d}x{i}" for i in range(30 + d)) for d in range(40)
    ]
    tbl = pa.table({"url": pa.array([f"u{d}" for d in range(40)]), "text": pa.array(texts)})
    ds = rd.from_arrow(tbl)
    sigs = build_signatures(ds, DedupConfig())
    via_sigs = (
        simhash_from_signatures(sigs, id_column="url").to_pandas().sort_values("url")
    )
    direct = (
        ds.map_batches(simhash_batch_fn, batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
    )
    assert (via_sigs["simhash"].to_numpy() == direct["simhash"].to_numpy()).all()


def test_video_frame_fingerprints_match_inprocess(ray_session):
    """Distributed sample+fingerprint == single-process kernel run —
    the video_frames sidecar-oracle contract."""
    import ray.data as rd

    from raydedup.ops.multimodal import (
        SampleFramesStage,
        frame_fingerprints,
        sample_frames,
        synth_video_table,
    )

    tbl = synth_video_table(60, seed=9)
    dist = (
        sample_frames(rd.from_arrow(tbl), k=4, mode="fake", batch_size=16)
        .map_batches(frame_fingerprints, batch_format="pyarrow")
        .sort(["video_id", "frame_idx"])
        .to_pandas()
    )
    ref = frame_fingerprints(SampleFramesStage(k=4, mode="fake")(tbl)).to_pandas()
    ref = ref.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(dist, ref)


def test_repetition_stats_brute_force():
    """Kernel vs a per-doc Python brute force over k-grams."""
    import pyarrow as pa

    from raydedup.ops.text_stats import repetition_stats

    docs = [
        "a b a b c",          # 2-grams: ab ba ab bc -> 1 dup
        "x",                  # too short for any gram
        "",                   # empty
        "q r  q r q",         # double space; words q r q r q
        "t t t t",            # maximal repetition
    ]
    out = repetition_stats(
        pa.table({"doc_id": pa.array(range(len(docs))), "text": pa.array(docs)}),
        "doc_id",
    ).to_pandas()
    for i, text in enumerate(docs):
        words = text.split()
        for k in (2, 3):
            grams = [tuple(words[j : j + k]) for j in range(max(len(words) - k + 1, 0))]
            total, uniq = len(grams), len(set(grams))
            row = out.iloc[i]
            assert row[f"n_grams_{k}"] == total
            assert row[f"n_dup_grams_{k}"] == total - uniq
            expect = (total - uniq) / total if total else 0.0
            assert abs(row[f"dup_frac_{k}"] - expect) < 1e-12


def test_bigram_counts_partial_merge(ray_session):
    """Per-block partials groupby-summed == whole-corpus counts, and the
    top-k ordering is deterministic under ties (count desc, gram asc)."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.text_stats import bigram_counts

    docs = ["the cat sat", "the cat ran", "a b", "a b", "z z z", ""] * 7
    expect = Counter()
    for d in docs:
        w = d.split()
        expect.update(" ".join(w[j : j + 2]) for j in range(len(w) - 1))

    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(5)
    agg = (
        ds.map_batches(lambda b: bigram_counts(b), batch_format="pyarrow")
        .groupby("gram")
        .sum("count")
        .to_pandas()
    )
    col = [c for c in agg.columns if c != "gram"][0]
    got = dict(zip(agg["gram"], agg[col]))
    assert got == dict(expect)


def test_flag_new_docs_incremental(ray_session):
    """Cross-snapshot exact dedup: delta docs flagged against a base
    snapshot, Bloom prefilter + bucketed 128-bit confirm. Planted
    overlaps must be flagged dup; everything else new."""
    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.exact import flag_new_docs

    base_texts = [f"base document number {i} words here" for i in range(300)]
    # delta: 40 copies of base docs (every 7th), 160 genuinely new
    dup_ids = list(range(0, 280, 7))
    new_rows = [(1000 + j, base_texts[i]) for j, i in enumerate(dup_ids)]
    new_rows += [(2000 + j, f"fresh delta doc {j} never seen") for j in range(160)]

    base = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(300)), "text": pa.array(base_texts)})
    ).repartition(4)
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in new_rows]),
                "text": pa.array([r[1] for r in new_rows]),
            }
        )
    ).repartition(3)

    # tiny Bloom (high fpp) to force false positives through the
    # exact-confirm cogroup path
    out = flag_new_docs(new, base, "doc_id", bloom_fpp=0.3).to_pandas()
    assert len(out) == len(new_rows)
    got = dict(zip(out["doc_id"], out["is_new"]))
    for j in range(len(dup_ids)):
        assert got[1000 + j] == False  # noqa: E712
    for j in range(160):
        assert got[2000 + j] == True  # noqa: E712


def test_latest_per_url(ray_session):
    from raydedup.ops.snapshots import latest_per_url

    n = 300
    rows = []
    for i in range(n):
        rows.append((f"https://s/{i}", 1000 + i, f"body {i} v1"))
        if i % 3 == 0:  # recrawl, newer
            rows.append((f"https://s/{i}", 2000 + i, f"body {i} v2"))
        if i % 7 == 0:  # stale duplicate capture, older
            rows.append((f"https://s/{i}", 500 + i, f"body {i} v0"))
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    # shuffle row order + split across blocks: the result must not care
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(t))
    t = t.take(pa.array(perm))
    ds = rd.from_arrow([t.slice(0, len(t) // 2), t.slice(len(t) // 2)])
    out = latest_per_url(ds, n_buckets=8).to_pandas().sort_values("url")
    assert len(out) == n
    for _, r in out.iterrows():
        i = int(r["url"].rsplit("/", 1)[1])
        want = f"body {i} v2" if i % 3 == 0 else f"body {i} v1"
        assert r["text"] == want, (i, r["text"])
        assert r["warc_ts"].value // 1000 == ((2000 + i) if i % 3 == 0 else (1000 + i))


def test_latest_per_url_tiebreak(ray_session):
    from raydedup.ops.snapshots import latest_per_url

    t = pa.table(
        {
            "url": pa.array(["u", "u", "u"]),
            "warc_ts": pa.array([5, 5, 3], pa.timestamp("us")),
            "text": pa.array(["bbb", "zzz", "aaa"]),
        }
    )
    out = latest_per_url(
        rd.from_arrow(t), n_buckets=4, tiebreak_column="text"
    ).to_pandas()
    assert len(out) == 1 and out.iloc[0]["text"] == "zzz"  # max(ts), then max(text)


def test_decontaminate(ray_session):
    from raydedup.ops.decontam import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # shares the 8-gram "alpha..theta" (first 8 bench words)
                    "x y alpha beta gamma delta epsilon zeta eta theta z",
                    # shares words but never 8 consecutive
                    "alpha beta gamma q delta epsilon zeta w eta theta",
                    "totally unrelated text about something else entirely here now",
                    "short doc",  # < 8 words: zero grams, never contaminated
                ]
            ),
        }
    )
    bench = rd.from_arrow(pa.table({"doc_id": pa.array([99], pa.int64()), "text": pa.array([bench_text])}))
    out = (
        decontaminate(rd.from_arrow(corpus), bench, "doc_id", k=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out["n_contaminated_grams"].tolist()[0] >= 1


def test_decontaminate_empty_benchmark(ray_session):
    from raydedup.ops.decontam import decontaminate

    corpus = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b c d e f g h i"])})
    )
    bench = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = decontaminate(corpus, bench, "doc_id", k=8).to_pandas()
    assert out["contaminated"].tolist() == [False]


def test_curation_stage_rules():
    from raydedup.ops.text_stats import CurationStage

    st = CurationStage()
    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown foxes jumped over those lazy sleeping dogs today and gone",  # keep
                    "der hund ist nicht auf und mit von das der die heute",  # lang fail
                    "the quick brown foxes jumped over lazy dogs!!!!!!!!!!!!!!!!!!!!",  # punct fail
                    "the winter garden flower the winter garden flower the winter garden flower and more",  # repetition
                    "xx qq zz ww",  # no markers -> 'unknown' -> lang fail
                ]
            ),
        }
    )
    out = st(b)
    assert out["keep"].to_pylist() == [True, False, False, False, False]
    assert out["reason"].to_pylist() == ["", "lang", "punct", "repetition", "lang"]


def test_curation_reason_priority():
    from raydedup.ops.text_stats import CurationStage

    st = CurationStage()
    # fails BOTH lang and punct -> reason must be the first rule (lang)
    b = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["der die das!!!!!!!!!!!!!!!!!!!!!!!!!"]),
        }
    )
    out = st(b)
    assert out["reason"].to_pylist() == ["lang"]


def test_chunk_docs_edges():
    from raydedup.ops.text_stats import chunk_docs

    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a b c d e", "", "x " + " ".join(f"w{i}" for i in range(130)), "  two  words  "]
            ),
        }
    )
    out = chunk_docs(b, "doc_id", chunk_words=64)
    assert out["doc_id"].to_pylist() == [1, 3, 3, 3, 4]  # empty doc drops
    assert out["chunk_idx"].to_pylist() == [0, 0, 1, 2, 0]
    assert out["n_words"].to_pylist() == [5, 64, 64, 3, 2]
    # chunks tile the doc exactly: rejoining reproduces the word stream
    joined = " ".join(
        t for d, t in zip(out["doc_id"].to_pylist(), out["chunk_text"].to_pylist()) if d == 3
    )
    assert joined == "x " + " ".join(f"w{i}" for i in range(130))
    # slice-safety (non-zero batch offset)
    out2 = chunk_docs(b.slice(2), "doc_id", chunk_words=64)
    assert out2["n_words"].to_pylist() == [64, 64, 3, 2]


def test_paragraph_dedup_planted(ray_session):
    """Brute-force check: chunk-level dup marking matches a
    dict-based single-process replay on a corpus with full copies,
    partial (prefix) copies, and within-doc repetition."""
    from raydedup.ops.exact import paragraph_dedup

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for d in range(12):
        docs[d] = [vocab[i] for i in rng.integers(0, len(vocab), size=int(rng.integers(30, 120)))]
    docs[20] = list(docs[0])  # full copy
    docs[21] = docs[1][:64] + ["zz", "qq"] * 10  # prefix copy + distinct tail
    docs[22] = docs[2][:8] + docs[2][:8]  # within-doc repetition (chunk 8)
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([" ".join(docs[d]) for d in sorted(docs)]),
        }
    )

    # single-process replay with text keys
    CH = 8
    seen: set = set()
    expect: dict[int, tuple[int, int]] = {}
    for d in sorted(docs):
        ws = docs[d]
        chunks = [" ".join(ws[i : i + CH]) for i in range(0, len(ws), CH)]
        ndup = 0
        for c in chunks:
            if c in seen:
                ndup += 1
            else:
                seen.add(c)
        expect[d] = (len(chunks), ndup)

    ds = rd.from_arrow(tbl).repartition(4)
    out = paragraph_dedup(ds, "doc_id", chunk_words=CH, n_buckets=8).to_pandas()
    got = {int(r.doc_id): (int(r.n_chunks), int(r.n_dup_chunks)) for r in out.itertuples()}
    assert got == expect
    full = out[out.doc_id == 20]
    assert float(full.dup_frac.iloc[0]) == 1.0


def test_pii_redact_counts_and_text():
    from raydedup.ops.text_stats import pii_redact

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "write a@b.co and c.d+x@e.org now",
                    "server 192.168.0.1 dial +44 20 7946 0958 end",
                    "plain words only",
                ]
            ),
        }
    )
    out = pii_redact(t, "doc_id").to_pylist()
    assert out[0]["n_email"] == 2 and "<EMAIL>" in out[0]["clean_text"]
    assert "@" not in out[0]["clean_text"]
    assert out[1]["n_ip"] == 1 and out[1]["n_phone"] == 1
    assert "<IP>" in out[1]["clean_text"] and "<PHONE>" in out[1]["clean_text"]
    assert out[2] == {
        "doc_id": 2,
        "n_email": 0,
        "n_ip": 0,
        "n_phone": 0,
        "clean_text": "plain words only",
    }


def test_stratified_sample_deterministic(ray_session):
    """k smallest priorities per stratum, invariant to blocking."""
    from raydedup.ops.sample import stratified_sample
    from raydedup.sketches.aggregates import _column_hashes

    rng = np.random.default_rng(3)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, size=n)]
    tbl = pa.table({"doc_id": pa.array(ids), "lang": pa.array(langs)})
    h, _ = _column_hashes(tbl["doc_id"])

    expect = {}
    for lang in np.unique(langs):
        m = langs == lang
        order = np.lexsort((ids[m], h[m]))
        expect[lang] = list(ids[m][order][:7])

    for parts in (1, 5):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = stratified_sample(ds, "doc_id", "lang", k=7).to_pandas()
        for lang, exp_ids in expect.items():
            sub = out[out.lang == lang].sort_values("sample_rank")
            assert list(sub.doc_id) == exp_ids
            assert list(sub.sample_rank) == list(range(1, len(exp_ids) + 1))


def test_url_normalize_kernel():
    """Canonicalization rules: case, default ports, fragments,
    tracking params, delimiter repair, naive registered domain,
    unparseable pass-through."""
    import pyarrow as pa

    from raydedup.ops.urltools import normalize_url_column

    urls = pa.array(
        [
            "HTTPS://WWW.Example.COM:443/Path/Q?utm_source=x&id=7&utm_medium=y#frag",
            "http://Site.org:80/a?gclid=99",
            "https://host.net:80/a",  # 80 is NOT the https default: kept
            "http://sub.dom.net:8080/k?a=1&fbclid=z&b=2",
            "https://example.com/plain",
            "HTTP://HOST.COM/x?utm_a=1&utm_b=2",
            "not a url",
        ]
    )
    norm, domain = normalize_url_column(urls)
    assert norm.to_pylist() == [
        "https://www.example.com/Path/Q?id=7",
        "http://site.org/a",
        "https://host.net:80/a",
        "http://sub.dom.net:8080/k?a=1&b=2",
        "https://example.com/plain",
        "http://host.com/x",
        "not a url",
    ]
    assert domain.to_pylist() == [
        "example.com",
        "site.org",
        "host.net",
        "dom.net",
        "example.com",
        "host.com",
        None,
    ]


def test_domain_stats_rollup(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.urltools import domain_stats

    ds = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "https://a.one.com/x",
                    "http://WWW.One.COM:80/y",
                    "https://two.org/z?utm_q=1",
                ]
            }
        )
    )
    out = domain_stats(ds).to_pandas().sort_values("domain").reset_index(drop=True)
    assert list(out.domain) == ["one.com", "two.org"]
    assert list(out.n_docs) == [2, 1]
    assert out.total_url_len[0] == len("https://a.one.com/x") + len("http://www.one.com/y")
    assert out.total_url_len[1] == len("https://two.org/z")


def test_mix_sources_rates_nested_and_block_invariant(ray_session):
    """Dataset mixing: rate 0/1 edges are exact, a lower rate samples
    a strict subset of a higher rate (nested recipes), observed rates
    track requested ones, and the output is invariant to block
    structure (map-only determinism)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.sample import mix_sources

    n = 4000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
        }
    )
    rates = {"s0": 0.0, "s1": 0.25, "s2": 0.75, "s3": 1.0}

    def run(ds):
        return (
            mix_sources(ds, "doc_id", "source", rates)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out1 = run(rd.from_arrow(tbl))
    out3 = run(rd.from_arrow(tbl).repartition(13))
    assert out1.equals(out3)

    per = out1.groupby("source").size()
    assert "s0" not in per.index and per["s3"] == n // 4
    for s, r in (("s1", 0.25), ("s2", 0.75)):
        assert abs(per[s] / (n // 4) - r) < 0.07  # 3+ sigma at n=1000

    sub = mix_sources(
        rd.from_arrow(tbl), "doc_id", "source", {"s2": 0.2}, default_rate=0.0
    ).to_pandas()
    hi = out1[out1.source == "s2"]
    assert set(sub.doc_id) <= set(hi.doc_id)


def test_tfidf_matches_pandas_twin(ray_session):
    import pandas as pd

    from raydedup.ops.tfidf import doc_term_tfidf

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(12)]
    n = 200
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 40)))
        for _ in range(n)
    ]
    texts[0] = ""  # empty doc contributes no terms
    texts[1] = "  SHOUTY   Mixed  case "  # lowercasing + multi-space
    df_in = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})

    out = (
        doc_term_tfidf(rd.from_pandas(list(np.array_split(df_in, 5))))
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )

    rows = []
    for i, t in enumerate(texts):
        for w in t.lower().split():
            rows.append((i, w))
    tw = pd.DataFrame(rows, columns=["doc_id", "term"])
    tf = tw.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    dfc = tf.groupby("term").size().rename("df").reset_index()
    exp = tf.merge(dfc, on="term")
    exp["tfidf"] = np.round(exp["tf"] * np.log(n / exp["df"]), 6)
    exp = exp.sort_values(["doc_id", "term"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        out[["doc_id", "term", "tf", "df", "tfidf"]].astype({"tf": "int64", "df": "int64"}),
        exp.astype({"tf": "int64", "df": "int64"}),
    )
    # a term present in every remaining doc would weight 0; empty doc absent
    assert 0 not in set(out["doc_id"]) or texts[0] != ""


@pytest.mark.parametrize("n_blocks", [1, 6])
def test_shuffle_ranks_dense_and_split_invariant(ray_session, n_blocks):
    import pandas as pd

    from raydedup.ops.sample import shuffle_ranks
    from raydedup.sketches.aggregates import _column_hashes

    n = 700
    ids = pa.array(np.arange(n, dtype=np.int64))
    tbl = pa.table({"doc_id": ids})
    df = tbl.to_pandas()
    ds = rd.from_pandas(list(np.array_split(df, n_blocks)))
    out = (
        shuffle_ranks(ds, "doc_id", n_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # twin: argsort by (murmur priority, id)
    h, _ = _column_hashes(ids)
    order = np.lexsort((np.arange(n), h))
    exp = np.empty(n, np.int64)
    exp[order] = np.arange(n)
    assert (out["shuffle_rank"].to_numpy() == exp).all()
    # dense permutation 0..n-1
    assert sorted(out["shuffle_rank"]) == list(range(n))


def test_shuffle_ranks_rejects_non_pow2(ray_session):
    from raydedup.ops.sample import shuffle_ranks

    ds = rd.from_items([{"doc_id": 1}])
    with pytest.raises(ValueError):
        shuffle_ranks(ds, "doc_id", n_buckets=12)


def test_rerank_candidates_matches_local_kernel(ray_session):
    import pandas as pd

    from raydedup.ops.rerank import cross_scorer_weights, rerank_candidates, score_pairs

    rng = np.random.RandomState(3)
    n, dim, nq = 120, 16, 3
    E = rng.standard_normal((n, dim)).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(E.ravel()), dim
                ),
            }
        )
    )
    qm = E[:nq]
    cands = pd.DataFrame(
        {
            "query_id": np.repeat(np.arange(nq, dtype=np.int64), 8),
            "vec_id": rng.choice(n, nq * 8, replace=False).astype(np.int64),
        }
    )
    out = (
        rerank_candidates(rd.from_pandas(cands), emb, qm)
        .to_pandas()
        .sort_values(["query_id", "rerank"])
        .reset_index(drop=True)
    )
    W = cross_scorer_weights(dim)
    exp_rows = []
    for qi, g in cands.groupby("query_id"):
        d = E[g["vec_id"].to_numpy()]
        s = np.round(score_pairs(np.repeat(qm[qi][None, :], len(g), 0), d, W), 6)
        order = np.lexsort((g["vec_id"].to_numpy(), -s))
        for r, j in enumerate(order):
            exp_rows.append((qi, int(g["vec_id"].to_numpy()[j]), float(s[j]), r + 1))
    exp = pd.DataFrame(exp_rows, columns=["query_id", "vec_id", "rerank_score", "rerank"])
    pd.testing.assert_frame_equal(
        out[["query_id", "vec_id", "rerank_score", "rerank"]].astype(
            {"query_id": "int64", "vec_id": "int64", "rerank": "int64"}
        ),
        exp.astype({"query_id": "int64", "vec_id": "int64", "rerank": "int64"}),
    )


def test_top_words_per_group_exact_regime(ray_session):
    """Grouped MG top-k equals brute-force counts (exact regime) for
    any block split; tie-break is (count desc, word asc)."""
    from collections import Counter

    from raydedup.ops.text_stats import top_words_per_group

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = []
    for i in range(60):
        g = f"s{i % 3}"
        rows.append((g, " ".join(rng.choice(vocab, size=rng.integers(1, 25)))))
    tbl = pa.table(
        {
            "source": pa.array([g for g, _ in rows], pa.string()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }
    )
    exp = {}
    for g, t in rows:
        for w in t.lower().split():
            exp[(g, w)] = exp.get((g, w), 0) + 1
    want = {}
    for g in ("s0", "s1", "s2"):
        items = sorted(
            ((w, n) for (gg, w), n in exp.items() if gg == g), key=lambda x: (-x[1], x[0])
        )[:4]
        want[g] = items
    for n_blocks in (1, 5):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = top_words_per_group(ds, "source", k=4).to_pandas()
        got = {}
        for r in out.sort_values(["source", "rank"]).itertuples():
            got.setdefault(r.source, []).append((r.word, int(r.n)))
        assert got == want, n_blocks


def test_collocations_matches_duckdb(ray_session):
    import duckdb

    from raydedup.ops.collocations import collocations

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    out = collocations(ds, min_count=3, top_k=15).to_pandas()
    oracle = duckdb.sql(
        f"""WITH w AS (
              SELECT doc_id, word, pos FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                FROM '{sf}/documents.parquet') raw WHERE word <> ''
            ), uni AS (SELECT word, count(*) AS c FROM w GROUP BY word),
            tu AS (SELECT count(*) AS t FROM w),
            g AS (SELECT word AS w1,
                         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM w),
            bi AS (SELECT w1, w2, count(*) AS c FROM g WHERE w2 IS NOT NULL GROUP BY w1, w2),
            tb AS (SELECT sum(c) AS t FROM bi)
            SELECT bi.w1 || ' ' || bi.w2 AS gram, bi.c AS n,
                   round(ln(CAST(bi.c AS DOUBLE) / tb.t * tu.t / u1.c * tu.t / u2.c), 6) AS pmi
            FROM bi JOIN uni u1 ON bi.w1 = u1.word JOIN uni u2 ON bi.w2 = u2.word
            CROSS JOIN tb CROSS JOIN tu
            WHERE bi.c >= 3 ORDER BY pmi DESC, gram LIMIT 15"""
    ).df()
    assert len(out) == len(oracle)
    assert list(out.gram) == list(oracle.gram)
    assert (out.n.to_numpy() == oracle.n.to_numpy()).all()
    assert (out.pmi.to_numpy() == oracle.pmi.to_numpy()).all()


def test_collocations_tiny_corpus_exact(ray_session):
    """Hand-computable corpus: bigrams (a b)x3 (b c)x2 (c a)x1 so
    T_b=6; unigrams a=3 b=3 c=2, T_u=8; pmi(a b) = ln((3/6)/((3/8)*(3/8)))."""
    import math

    import pyarrow as pa

    from raydedup.ops.collocations import collocations

    docs = pa.table({"text": ["a b c", "a b c a b", ""]})
    for n_blocks in (1, 3):
        ds = rd.from_arrow(docs).repartition(n_blocks)
        out = collocations(ds, min_count=1, top_k=10).to_pandas()
        got = dict(zip(out.gram, out.pmi))
        assert got["a b"] == round(math.log(3 / 6 * 8 / 3 * 8 / 3), 6)
        assert got["b c"] == round(math.log(2 / 6 * 8 / 3 * 8 / 2), 6)
        assert got["c a"] == round(math.log(1 / 6 * 8 / 2 * 8 / 3), 6)
        assert len(out) == 3


def test_bm25_matches_brute_force_twin(ray_session):
    """BM25 top-k equals a single-process numpy twin on sf0.001 docs,
    independent of blocking."""
    import numpy as np
    import pyarrow.parquet as pq

    from raydedup.ops.bm25 import bm25_topk

    sf = "/root/testdata/sf0.001"
    terms = ["hash", "join", "vector", "spark"]
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_numpy()
    texts = [t.lower().split() for t in tbl["text"].to_pylist()]
    dl = np.array([len(t) for t in texts], dtype=np.float64)
    n = float(len(texts))
    avgdl = dl.sum() / n
    k1, b = 1.2, 0.75
    tf = np.array([[t.count(term) for term in terms] for t in texts], dtype=np.float64)
    df = (tf > 0).sum(axis=0).astype(np.float64)
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
    norm = k1 * (1.0 - b + b * dl / avgdl)
    s = np.zeros(len(texts))
    for i in range(len(terms)):
        s += idf[i] * tf[:, i] * (k1 + 1.0) / (tf[:, i] + norm)
    s = np.round(s, 6)
    order = np.lexsort((ids, -s))[:10]
    expect = list(zip(ids[order], s[order]))

    for n_blocks in (1, 5):
        ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]).repartition(
            n_blocks
        )
        out = bm25_topk(ds, terms, k=10).to_pandas()
        got = list(zip(out.doc_id, out.bm25))
        assert [int(i) for i, _ in got] == [int(i) for i, _ in expect], n_blocks
        assert all(abs(a - e) == 0 for (_, a), (_, e) in zip(got, expect)), n_blocks


def test_bm25_absent_term_and_empty_doc(ray_session):
    """A query term absent from the corpus contributes idf*0 = 0; empty
    docs score 0 and never enter the top-k."""
    import pyarrow as pa

    from raydedup.ops.bm25 import bm25_topk

    docs = pa.table(
        {"doc_id": [1, 2, 3], "text": ["alpha beta alpha", "beta gamma", ""]}
    )
    out = bm25_topk(rd.from_arrow(docs), ["alpha", "zzz_missing"], k=2).to_pandas()
    assert list(out.doc_id) == [1, 2]
    assert out.bm25.iloc[0] > 0
    assert out.bm25.iloc[1] == 0.0


def test_weighted_sample_twin_and_split_invariant(ray_session):
    """Selection equals the single-process A-ES twin under any
    blocking; zero/negative weights are excluded."""
    import numpy as np
    import pyarrow as pa

    from raydedup.ops.sample import weighted_sample
    from raydedup.sketches.aggregates import _column_hashes

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    w = (ids % 7).astype(np.int64)  # includes zeros -> excluded
    tbl = pa.table({"doc_id": ids, "wt": w})
    h, _ = _column_hashes(tbl["doc_id"])
    key = np.log((h.astype(np.float64) + 0.5) / 2.0**64) / w.astype(np.float64)
    pos = w > 0
    order = np.lexsort((ids[pos], -key[pos]))[:50]
    expect = sorted(ids[pos][order])

    for n_blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = weighted_sample(ds, "doc_id", "wt", k=50).to_pandas()
        assert list(out.doc_id) == [int(x) for x in expect], n_blocks
        assert (out.wt > 0).all()


def test_weighted_sample_favors_heavy_weights(ray_session):
    """With two weight classes 50x apart, the heavy class dominates the
    sample (probability-proportional-to-size behavior)."""
    import numpy as np
    import pyarrow as pa

    from raydedup.ops.sample import weighted_sample

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 2 == 0, 100, 2).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "wt": w}))
    out = weighted_sample(ds, "doc_id", "wt", k=100).to_pandas()
    heavy = (out.wt == 100).sum()
    assert heavy >= 85  # E[heavy] ~ 98; far above any light-dominated draw


def test_profile_columns_with_nulls_matches_duckdb(ray_session):
    """Profile with genuine NULLs: nulls excluded from distinct and
    min/max, null counts exact, split-invariant."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from raydedup.ops.profile import profile_columns

    rng = np.random.default_rng(3)
    n = 1000
    vals = rng.integers(0, 50, n).astype("float64")
    vals[rng.random(n) < 0.1] = np.nan
    strs = np.array([f"s{i % 17}" for i in range(n)], dtype=object)
    strs[rng.random(n) < 0.05] = None
    tbl = pa.table(
        {
            "num": pa.array([None if np.isnan(v) else v for v in vals], pa.float64()),
            "cat": pa.array(list(strs), pa.string()),
        }
    )
    oracle = duckdb.sql(
        """SELECT 'cat' AS col_name, count(*) n_rows, count(*)-count(cat) n_nulls,
                  count(DISTINCT cat) n_distinct, CAST(NULL AS DOUBLE) min_num,
                  CAST(NULL AS DOUBLE) max_num FROM tbl
           UNION ALL
           SELECT 'num', count(*), count(*)-count(num), count(DISTINCT num),
                  CAST(min(num) AS DOUBLE), CAST(max(num) AS DOUBLE) FROM tbl
           ORDER BY col_name"""
    ).df()
    for n_blocks in (1, 6):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = profile_columns(ds, ["num", "cat"]).to_pandas()
        assert list(out.col_name) == list(oracle.col_name), n_blocks
        for c in ("n_rows", "n_nulls", "n_distinct"):
            assert (out[c].to_numpy() == oracle[c].to_numpy()).all(), (n_blocks, c)
        assert out.min_num.iloc[1] == oracle.min_num.iloc[1]
        assert out.max_num.iloc[1] == oracle.max_num.iloc[1]
        assert np.isnan(out.min_num.iloc[0]) and np.isnan(oracle.min_num.iloc[0])


def test_pivot_sum_matches_duckdb_and_split_invariant(ray_session):
    import duckdb
    import numpy as np

    from raydedup.ops.pivot import pivot_sum

    sf = "/root/testdata/sf0.001"
    cats = ["click", "error", "purchase", "signup", "view"]
    oracle = duckdb.sql(
        "SELECT user_id, "
        + ", ".join(
            f"sum(CASE WHEN event_type = '{c}' THEN CAST(round(value*100,0) AS BIGINT)"
            f" ELSE 0 END)/100.0 AS {c}"
            for c in cats
        )
        + f" FROM '{sf}/events.parquet' GROUP BY user_id ORDER BY user_id"
    ).df()
    for n_blocks in (1, 6):
        ds = rd.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "event_type", "value"]
        ).repartition(n_blocks)
        out = pivot_sum(ds, "user_id", "event_type", "value", cats).sort("user_id").to_pandas()
        assert len(out) == len(oracle), n_blocks
        assert (out.user_id.to_numpy() == oracle.user_id.to_numpy()).all()
        for c in cats:
            assert (out[c].to_numpy() == oracle[c].to_numpy()).all(), (n_blocks, c)


def test_pivot_sum_absent_category_is_zero(ray_session):
    import pyarrow as pa

    from raydedup.ops.pivot import pivot_sum

    tbl = pa.table(
        {"k": [1, 1, 2], "t": ["a", "b", "a"], "v": [1.5, 2.25, 3.0]}
    )
    out = (
        pivot_sum(rd.from_arrow(tbl), "k", "t", "v", ["a", "b", "zzz"])
        .sort("k")
        .to_pandas()
    )
    assert list(out.a) == [1.5, 3.0]
    assert list(out.b) == [2.25, 0.0]
    assert list(out.zzz) == [0.0, 0.0]


def test_key_match_flags_forced_bloom_fp(ray_session):
    """With a 0.5-fpp Bloom, many misses become candidates — the
    cogroup confirm must clear every false positive; result equals
    the exact set regardless of blocking."""
    import numpy as np
    import pyarrow as pa

    from raydedup.ops.antijoin import anti_join_keys, key_match_flags, semi_join_keys

    left = pa.table({"id": np.arange(1000, dtype=np.int64),
                     "k": np.arange(1000, dtype=np.int64)})
    right = pa.table({"rk": np.arange(0, 1000, 3, dtype=np.int64)})  # every 3rd
    for n_blocks in (1, 5):
        l = rd.from_arrow(left).repartition(n_blocks)
        r = rd.from_arrow(right).repartition(n_blocks)
        flags = key_match_flags(l, r, "id", "k", "rk", bloom_fpp=0.5).to_pandas()
        flags = flags.sort_values("id").reset_index(drop=True)
        assert len(flags) == 1000
        expect = (np.arange(1000) % 3) == 0
        assert (flags.matched.to_numpy() == expect).all(), n_blocks

        anti = anti_join_keys(l, r, "id", "k", "rk").to_pandas()
        semi = semi_join_keys(l, r, "id", "k", "rk").to_pandas()
        assert sorted(anti.id) == [int(i) for i in np.arange(1000)[~expect]]
        assert sorted(semi.id) == [int(i) for i in np.arange(1000)[expect]]


def test_key_match_flags_string_keys_and_empty_right(ray_session):
    import pyarrow as pa

    from raydedup.ops.antijoin import key_match_flags

    left = pa.table({"id": [1, 2, 3], "k": ["a", "b", "c"]})
    right = pa.table({"rk": pa.array([], pa.string())})
    flags = key_match_flags(
        rd.from_arrow(left), rd.from_arrow(right), "id", "k", "rk"
    ).to_pandas()
    assert len(flags) == 3 and not flags.matched.any()

    right2 = pa.table({"rk": ["b", "zz"]})
    flags2 = (
        key_match_flags(rd.from_arrow(left), rd.from_arrow(right2), "id", "k", "rk")
        .to_pandas()
        .sort_values("id")
    )
    assert list(flags2.matched) == [False, True, False]


def test_histogram_fixed_matches_duckdb(ray_session):
    import duckdb

    from raydedup.ops.profile import histogram_fixed

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_extendedprice"])
    out = histogram_fixed(ds, "l_extendedprice", lo=0.0, width=2500.0).to_pandas()
    oracle = duckdb.sql(
        f"""SELECT CAST(floor((l_extendedprice - 0.0) / 2500.0) AS BIGINT) AS bin,
                   count(*) AS n
            FROM '{sf}/lineitem.parquet' GROUP BY bin ORDER BY bin"""
    ).df()
    assert (out.bin.to_numpy() == oracle.bin.to_numpy()).all()
    assert (out.n.to_numpy() == oracle.n.to_numpy()).all()
    assert out.n.sum() == duckdb.sql(
        f"SELECT count(*) FROM '{sf}/lineitem.parquet'"
    ).fetchone()[0]


def test_rollup_sum_matches_duckdb(ray_session):
    import duckdb

    from raydedup.ops.rollup import rollup_sum

    sf = "/root/testdata/sf0.001"
    for n_blocks in (1, 5):
        ds = rd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        ).repartition(n_blocks)
        out = rollup_sum(
            ds, ["l_returnflag", "l_linestatus"], {"l_quantity": 0, "l_extendedprice": 2}
        ).to_pandas()
        oracle = duckdb.sql(
            f"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                       COALESCE(l_linestatus, 'ALL') AS ls,
                       sum(CAST(round(l_quantity, 0) AS BIGINT)) * 1.0 AS sq,
                       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sp,
                       count(*) AS n
                FROM '{sf}/lineitem.parquet'
                GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rf, ls"""
        ).df()
        assert len(out) == len(oracle), n_blocks
        assert list(out.l_returnflag) == list(oracle.rf)
        assert list(out.l_linestatus) == list(oracle.ls)
        assert (out.sum_l_quantity.to_numpy() == oracle.sq.to_numpy()).all()
        assert (out.sum_l_extendedprice.to_numpy() == oracle.sp.to_numpy()).all()
        assert (out.n_rows.to_numpy() == oracle.n.to_numpy()).all()
        # grand total is the full row count
        assert out.loc[
            (out.l_returnflag == "ALL") & (out.l_linestatus == "ALL"), "n_rows"
        ].iloc[0] == len(
            duckdb.sql(f"SELECT 1 FROM '{sf}/lineitem.parquet'").df()
        )


def test_cube_sum_matches_duckdb(ray_session):
    import duckdb

    from raydedup.ops.rollup import cube_sum

    sf = "/root/testdata/sf0.001"
    for n_blocks in (1, 5):
        ds = rd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        ).repartition(n_blocks)
        out = (
            cube_sum(
                ds,
                ["l_returnflag", "l_linestatus"],
                {"l_quantity": 0, "l_extendedprice": 2},
            )
            .to_pandas()
        )
        oracle = duckdb.sql(
            f"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                       COALESCE(l_linestatus, 'ALL') AS ls,
                       sum(CAST(round(l_quantity, 0) AS BIGINT)) * 1.0 AS sq,
                       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sp,
                       count(*) AS n
                FROM '{sf}/lineitem.parquet'
                GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls"""
        ).df()
        assert len(out) == len(oracle), n_blocks
        assert list(out.l_returnflag) == list(oracle.rf)
        assert list(out.l_linestatus) == list(oracle.ls)
        assert (out.sum_l_quantity.to_numpy() == oracle.sq.to_numpy()).all()
        assert (out.sum_l_extendedprice.to_numpy() == oracle.sp.to_numpy()).all()
        assert (out.n_rows.to_numpy() == oracle.n.to_numpy()).all()
        # CUBE adds the (ALL, linestatus) slice that ROLLUP lacks
        assert (
            (out.l_returnflag == "ALL") & (out.l_linestatus != "ALL")
        ).sum() == out[out.l_linestatus != "ALL"].l_linestatus.nunique()


def test_funnel_stages_hand_case_and_splits(ray_session):
    """Hand-built sequences exercising every stage and the strict
    after-previous-step rule (a purchase BEFORE the click must not
    count)."""
    import pandas as pd

    from raydedup.ops.funnel import funnel_stages

    rows = [
        # u1: full funnel in order -> 3
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: purchase before click -> stops at 2
        (2, 10, "view"), (2, 15, "purchase"), (2, 20, "click"),
        # u3: click before view -> stage 1 (view exists, no click after)
        (3, 20, "view"), (3, 10, "click"),
        # u4: only irrelevant events -> excluded entirely
        (4, 10, "error"),
        # u5: no view at all -> 0
        (5, 10, "click"), (5, 20, "purchase"),
        # u6: second click after view rescues the funnel -> 3
        (6, 10, "click"), (6, 20, "view"), (6, 30, "click"), (6, 40, "purchase"),
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "event_type": [r[2] for r in rows],
        }
    )
    want = {1: 3, 2: 2, 3: 1, 5: 0, 6: 3}
    for n_blocks in (1, 4):
        import numpy as np

        ds = rd.from_pandas(list(np.array_split(df.sample(frac=1, random_state=0), n_blocks)))
        out = funnel_stages(
            ds, "user_id", "ts", "event_type", ["view", "click", "purchase"], n_buckets=4
        ).to_pandas()
        got = dict(zip(out.user_id, out.stage))
        assert got == want, n_blocks


def test_snapshot_churn_hand_case(ray_session):
    import pandas as pd
    import pytest as _pytest

    from raydedup.ops.snapshots import snapshot_churn

    old = pd.DataFrame(
        {
            "url": ["u/a", "u/b", "u/c"],
            "text": ["alpha", "beta", "gamma"],
        }
    )
    new = pd.DataFrame(
        {
            "url": ["u/b", "u/c", "u/d"],
            "text": ["beta", "gamma EDITED", "delta"],
        }
    )
    out = (
        snapshot_churn(rd.from_pandas(old), rd.from_pandas(new), n_buckets=4)
        .sort("url")
        .to_pandas()
    )
    assert list(zip(out.url, out.status)) == [
        ("u/a", "removed"),
        ("u/c", "changed"),
        ("u/d", "added"),
    ]
    # contract violation: duplicate url within one snapshot must raise
    dup = pd.concat([old, old.iloc[[0]]], ignore_index=True)
    with _pytest.raises(Exception):
        snapshot_churn(rd.from_pandas(dup), rd.from_pandas(new)).materialize()


def test_ivf_partitioned_probe_prunes_directories(ray_session, tmp_path):
    """write_partitioned lays out one directory per cluster; a probe
    reads ONLY its nprobe directories (file-level pruning) and returns
    the same hits as the row-filter search."""
    import os

    rng = np.random.default_rng(45)
    centers = rng.normal(size=(8, 16)) * 5
    emb = np.concatenate([c + rng.normal(size=(40, 16)) for c in centers]).astype(np.float32)
    ids = np.arange(len(emb), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 16),
        }
    )
    ds = rd.from_arrow(tbl)
    idx = IVFIndex(n_clusters=8)
    assigned = idx.build(ds).materialize()
    path = str(tmp_path / "ivf_index")
    idx.write_partitioned(assigned, path)
    n_dirs = len([d for d in os.listdir(path) if d.startswith("ivf_cluster=")])
    assert n_dirs >= 2  # clustered data spreads over several cells

    q = emb[:2]
    probed = idx.probe_paths(path, q, nprobe=3)
    assert 0 < len(probed) <= 2 * 3  # union over 2 queries, <= nprobe each
    assert len(probed) < n_dirs  # strictly pruned vs a full scan
    got = idx.search_partitioned(path, q, k=5, nprobe=3).to_pandas()
    ref = idx.search(assigned, q, k=5, nprobe=3).to_pandas()
    for qi in range(2):
        assert set(got[got.query_id == qi].vec_id) == set(ref[ref.query_id == qi].vec_id)


def test_y4m_roundtrip_and_conversion():
    """Stdlib y4m codec: encode → decode roundtrip recovers frame
    count/geometry, and the BT.601 full-range conversion matches the
    closed form (floor(x+0.5), clip 0..255) for C420, C444 and mono."""
    from raydedup.ops.multimodal import decode_y4m, encode_y4m, synth_y4m_table

    t = synth_y4m_table(5)
    for vid in range(5):
        frames, meta = decode_y4m(t["payload"][vid].as_py())
        assert (meta["width"], meta["height"]) == (32, 24)
        assert len(frames) == int(t["n_frames"][vid].as_py())
        for idx, fr in enumerate(frames):
            y = (3 * vid + 5 * idx) % 256
            u = (7 * vid + idx) % 256
            v = (11 * vid + 2 * idx) % 256
            exp = [
                y + 1.402 * (v - 128),
                y - 0.344136 * (u - 128) - 0.714136 * (v - 128),
                y + 1.772 * (u - 128),
            ]
            exp = [int(min(255, max(0, np.floor(e + 0.5)))) for e in exp]
            assert fr.shape == (24, 32, 3)
            assert (fr.reshape(-1, 3) == np.array(exp, np.uint8)).all()
    # mono and 444 layouts
    mono = encode_y4m([(np.full((4, 6), 77, np.uint8),)], 6, 4, colorspace="mono")
    fm, meta = decode_y4m(mono)
    assert meta["colorspace"] == "mono" and (fm[0][..., 0] == 77).all()
    f444 = encode_y4m(
        [(np.full((4, 4), 10, np.uint8), np.full((4, 4), 200, np.uint8), np.full((4, 4), 60, np.uint8))],
        4, 4, colorspace="444",
    )
    f4, _ = decode_y4m(f444)
    assert (f4[0][0, 0] == [0, 34, 138]).all()


def test_y4m_real_mode_stage_no_optional_deps(ray_session):
    """mode='real' over a y4m corpus decodes real pixels through the
    actor pool with NO optional dependencies — one row per frame
    (k >= max frames), frame bytes = w*h*3."""
    import ray.data as rd

    from raydedup.ops.multimodal import sample_frames, synth_y4m_table

    tbl = synth_y4m_table(6)
    out = (
        sample_frames(rd.from_arrow(tbl), k=16, mode="real", batch_size=4)
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
    )
    assert len(out) == sum(8 + v % 5 for v in range(6))
    assert all(len(p) == 32 * 24 * 3 for p in out["frame_payload"])
