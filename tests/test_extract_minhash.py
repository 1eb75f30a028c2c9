"""Extraction/shingling/MinHash kernel tests (no Ray needed)."""

import numpy as np
import pyarrow as pa

from raydedup.pipeline.extract import (
    extract_text,
    segmented_unique,
    shingle_hashes,
    text_to_shingle_sets,
    tokenize_word_hashes,
)
from raydedup.pipeline.minhash import (
    EMPTY_SLOT,
    band_keys,
    minhash_signatures,
    signature_agreement,
)
from raydedup.synth import generate_pages


def test_extract_invariant_byte_identical():
    pages, _ = generate_pages(500, seed=42)
    ext = extract_text(pages["html"].combine_chunks())
    assert ext.equals(pages["text"].combine_chunks().cast(pa.string()))


def test_extract_no_body_passthrough():
    arr = pa.array([b"plain bytes no body", b"<body>inner</body>"], pa.binary())
    out = extract_text(arr)
    assert out.to_pylist() == ["plain bytes no body", "inner"]


def test_tokenize_lowercase_whitespace():
    h1, off = tokenize_word_hashes(pa.array(["Hello World", "hello   world", ""]))
    # case-insensitive: same words → same hashes
    np.testing.assert_array_equal(h1[off[0] : off[1]], h1[off[1] : off[2]])
    assert off[2] == off[3]  # empty doc → no words


def test_shingles_match_bruteforce():
    # shingle identity == murmur over the 5 word-hash u64s
    text = pa.array(["a b c d e f g"])
    wh, off = tokenize_word_hashes(text)
    sh, soff = shingle_hashes(wh, off, k=5)
    assert soff[1] - soff[0] == 3  # 7 words → 3 shingles
    from raydedup.sketches.hashing import murmur3_128_fixed

    for i in range(3):
        mat = np.zeros((1, 6), dtype=np.uint64)
        mat[0, :5] = wh[i : i + 5]
        h1, _ = murmur3_128_fixed(mat, 40, seed=9001)
        assert sh[i] == h1[0]


def test_short_doc_single_shingle():
    sh, soff = shingle_hashes(*tokenize_word_hashes(pa.array(["one two", "x", ""])), k=5)
    assert np.diff(soff).tolist() == [1, 1, 0]
    # distinct short docs get distinct shingles
    sh2, _ = shingle_hashes(*tokenize_word_hashes(pa.array(["one two"])), k=5)
    assert sh[0] == sh2[0]


def test_segmented_unique():
    vals = np.array([5, 3, 3, 1, 7, 7, 7], dtype=np.uint64)
    offs = np.array([0, 4, 7], dtype=np.int64)
    u, uo = segmented_unique(vals, offs)
    assert u.tolist() == [1, 3, 5, 7]
    assert uo.tolist() == [0, 3, 4]


def test_minhash_identical_docs_identical_sigs():
    texts = pa.array(["the quick brown fox jumps over the lazy dog today ok"] * 2 + ["totally different words here now then"])
    sh, off, _ = text_to_shingle_sets(texts)
    sig = minhash_signatures(sh, off)
    np.testing.assert_array_equal(sig[0], sig[1])
    assert (sig[0] != sig[2]).any()


def test_minhash_agreement_tracks_jaccard():
    pages, golden = generate_pages(400, seed=7)
    sh, off, _ = text_to_shingle_sets(pages["text"].combine_chunks())
    us, uo = segmented_unique(sh, off)
    sig = minhash_signatures(sh, off)
    cid = np.array(golden["cluster_id"].to_pylist())
    kinds = golden["kind"].to_pylist()
    checked = 0
    for c in np.unique(cid[cid >= 0]):
        mem = np.nonzero(cid == c)[0]
        if len(mem) < 2 or not kinds[mem[0]].startswith("near"):
            continue
        i, j = int(mem[0]), int(mem[1])
        a, b = us[uo[i] : uo[i + 1]], us[uo[j] : uo[j + 1]]
        inter = len(np.intersect1d(a, b, assume_unique=True))
        true_j = inter / (len(a) + len(b) - inter)
        est = signature_agreement(sig[i : i + 1], sig[j : j + 1])[0]
        assert abs(est - true_j) < 0.15, (kinds[i], true_j, est)
        checked += 1
    assert checked >= 5


def test_empty_doc_sentinel():
    sig = minhash_signatures(*text_to_shingle_sets(pa.array([""]))[:2])
    assert (sig[0] == EMPTY_SLOT).all()


def test_band_keys_deterministic_and_partitioned():
    pages, _ = generate_pages(100, seed=9)
    sh, off, _ = text_to_shingle_sets(pages["text"].combine_chunks())
    sig = minhash_signatures(sh, off)
    b1 = band_keys(sig, 32, 4)
    b2 = band_keys(sig, 32, 4)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (100, 32)
    # identical signatures → identical band rows; different → (whp) different
    assert len(np.unique(b1)) > 100


def test_signature_stage_kmv_trim_oversized_docs():
    """Docs past shingle_cap keep the cap smallest unique shingle
    hashes with theta = the (cap+1)-th smallest — the reference's
    rebuild rule (theta/hash_table.rs:249-277) applied per doc —
    verified against a naive per-doc partition, mixed with small docs
    in the same batch (the vectorized mask path)."""
    from raydedup.pipeline.lsh import SignatureStage
    from raydedup.sketches.theta import MAX_THETA

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(3000)]
    texts = []
    for n_words in (800, 20, 1200, 5, 400):  # mix oversized + tiny
        texts.append(" ".join(rng.choice(vocab, size=n_words)))
    batch = pa.table({"url": pa.array([f"u{i}" for i in range(len(texts))]),
                      "text": pa.array(texts)})
    cap = 64
    out = SignatureStage(shingle_cap=cap)(batch)

    sh, off, _ = text_to_shingle_sets(batch["text"].combine_chunks())
    us, uo = segmented_unique(sh, off)
    for d in range(len(texts)):
        seg = np.sort(us[uo[d] : uo[d + 1]])
        got = np.array(out["shingles"][d].as_py(), dtype=np.uint64)
        theta = out["theta"][d].as_py()
        if len(seg) > cap:
            np.testing.assert_array_equal(got, seg[:cap])
            assert theta == seg[cap]
        else:
            np.testing.assert_array_equal(got, seg)
            assert theta == MAX_THETA
        assert out["n_shingles"][d].as_py() == len(got)
