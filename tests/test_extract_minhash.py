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


# ---------------------------------------------------------------- OPH


def _pair_sets(rng, n_shared, n_a, n_b):
    univ = rng.choice(2**62, size=n_a + n_b - n_shared, replace=False).astype(np.uint64)
    return univ[:n_a], np.concatenate([univ[:n_shared], univ[n_a:]])


def test_oph_agreement_tracks_jaccard():
    from raydedup.pipeline.minhash import oph_signatures

    rng = np.random.default_rng(7)
    ests = []
    for _ in range(40):
        a, b = _pair_sets(rng, 300, 400, 400)
        sh = np.concatenate([a, b])
        off = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
        sig = oph_signatures(sh, off, num_perms=128, seed=9001)
        ests.append((sig[0] == sig[1]).mean())
    # true J = 300/500 = 0.6; OPH is unbiased, so the mean of 40
    # trials lands well inside 3 sigma of 0.6
    assert abs(np.mean(ests) - 0.6) < 0.03, np.mean(ests)


def test_oph_invariants():
    from raydedup.pipeline.minhash import oph_signatures

    rng = np.random.default_rng(11)
    a = rng.choice(2**62, size=50, replace=False).astype(np.uint64)
    # empty rows keep EMPTY_SLOT; non-empty rows densify fully
    off = np.array([0, 0, 50, 50], dtype=np.int64)
    sig = oph_signatures(a, off, 128)
    assert (sig[0] == EMPTY_SLOT).all() and (sig[2] == EMPTY_SLOT).all()
    assert not (sig[1] == EMPTY_SLOT).any()
    # identical docs -> identical sigs; within-doc order irrelevant
    off2 = np.array([0, 50, 100], dtype=np.int64)
    s1 = oph_signatures(np.concatenate([a, a]), off2, 128)
    s2 = oph_signatures(np.concatenate([a[::-1], a]), off2, 128)
    assert (s1[0] == s1[1]).all()
    np.testing.assert_array_equal(s1, s2)
    # a single-shingle doc densifies every bin, distance-salted so the
    # 128 slots are distinct (two docs agree on a borrowed slot only
    # when they borrowed the same value at the same relative offset)
    s3 = oph_signatures(a[:1], np.array([0, 1], dtype=np.int64), 128)
    assert not (s3 == EMPTY_SLOT).any()
    assert len(np.unique(s3)) == 128


def test_oph_requires_power_of_two():
    import pytest

    from raydedup.pipeline.minhash import oph_signatures

    with pytest.raises(ValueError):
        oph_signatures(np.array([1], dtype=np.uint64), np.array([0, 1], dtype=np.int64), 96)


def test_oph_disjoint_sets_rarely_agree():
    from raydedup.pipeline.minhash import oph_signatures

    rng = np.random.default_rng(3)
    a, b = _pair_sets(rng, 0, 400, 400)
    sh = np.concatenate([a, b])
    off = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
    sig = oph_signatures(sh, off, num_perms=128, seed=9001)
    assert (sig[0] == sig[1]).mean() < 0.05
