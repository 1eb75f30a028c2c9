"""CPC sketch, hot-band salting, suffix-array confirmation."""

import numpy as np
import pytest

from raydedup.sketches.cpc import CpcSketch, cpc_union
from raydedup.ops.suffixarray import SuffixIndex, build_suffix_array, confirm_substring_batch

# ----------------------------------------------------------------- CPC


def test_cpc_accuracy_reference_point():
    # cpc_update_test.rs:27,57-60: lg_k=11, n=1e4, <=2% — we assert 3%
    for n in (1000, 10_000, 100_000):
        sk = CpcSketch(11).update_ints(np.arange(n))
        assert abs(sk.estimate() - n) / n < 0.03, n


def test_cpc_small_exact_ish():
    sk = CpcSketch(11).update_ints(np.arange(10))
    assert abs(sk.estimate() - 10) < 1


def test_cpc_duplicates():
    sk = CpcSketch(11).update_ints(np.zeros(500, dtype=np.int64))
    assert abs(sk.estimate() - 1.0) < 0.5


def test_cpc_union_matches_single_pass():
    parts = [CpcSketch(11).update_ints(np.arange(i * 4000, (i + 1) * 4000)) for i in range(8)]
    merged = cpc_union(parts)
    single = CpcSketch(11).update_ints(np.arange(32_000))
    np.testing.assert_array_equal(merged.matrix, single.matrix)


def test_cpc_union_mixed_lgk():
    a = CpcSketch(12).update_ints(np.arange(20_000))
    b = CpcSketch(10).update_ints(np.arange(10_000, 30_000))
    u = cpc_union([a, b])
    assert u.lg_k == 10
    assert abs(u.estimate() - 30_000) / 30_000 < 0.1


def test_cpc_serde():
    sk = CpcSketch(11).update_ints(np.arange(5000))
    rt = CpcSketch.from_bytes(sk.to_bytes())
    np.testing.assert_array_equal(rt.matrix, sk.matrix)
    assert rt.estimate() == sk.estimate()


def test_cpc_strings():
    sk = CpcSketch(11).update_strings([f"value_{i}" for i in range(5000)])
    assert abs(sk.estimate() - 5000) / 5000 < 0.04


# --------------------------------------------------------- hot-band salt


def test_hot_key_detection_and_salted_recall(ray_session):
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.pipeline.lsh import candidate_pairs, detect_hot_band_keys
    from raydedup.pipeline.run import build_signatures
    from raydedup.synth import generate_pages

    # heavy boilerplate fraction → guaranteed hot band keys
    pages, _ = generate_pages(3000, seed=77, boilerplate_frac=0.5)
    cfg = DedupConfig(max_band_group=64)
    sigs = build_signatures(rd.from_arrow(pages.select(["url", "text"])), cfg).materialize()
    hot = detect_hot_band_keys(sigs, cfg, sample_every=4)
    assert len(hot) > 0  # the trap is detected

    plain = candidate_pairs(sigs, cfg, n_buckets=16, salt_hot=False).to_pandas()
    salted = candidate_pairs(sigs, cfg, n_buckets=16, salt_hot=True).to_pandas()
    plain_set = {(a, b) for a, b in plain[["ha", "hb"]].itertuples(index=False)}
    salted_set = {(a, b) for a, b in salted[["ha", "hb"]].itertuples(index=False)}
    # candidate recall for true dups must survive salting: compare via
    # downstream golden test instead; here assert substantial overlap
    # and that salting didn't explode the candidate count
    assert len(salted_set & plain_set) / max(1, len(plain_set)) > 0.5
    assert len(salted_set) < 4 * len(plain_set)


# --------------------------------------------------------- suffix array


def test_suffix_array_sorted():
    data = b"banana"
    sa = build_suffix_array(data)
    suffixes = [data[i:] for i in sa]
    assert suffixes == sorted(data[i:] for i in range(len(data)))


def test_suffix_index_contains_and_count():
    data = b"the quick brown fox jumps over the lazy dog the end"
    idx = SuffixIndex(data)
    assert idx.contains(b"quick brown")
    assert idx.contains(b"the")
    assert not idx.contains(b"cat")
    assert idx.count(b"the") == 3
    assert idx.count(b"q") == 1
    assert idx.count(b"zz") == 0
    assert idx.contains(b"")


def test_suffix_index_random_vs_find():
    rng = np.random.default_rng(9)
    data = bytes(rng.integers(97, 102, size=2000, dtype=np.uint8))
    idx = SuffixIndex(data)
    for _ in range(50):
        s = int(rng.integers(0, 1990))
        ln = int(rng.integers(1, 10))
        pat = data[s : s + ln]
        assert idx.contains(pat)
        probe = bytes(rng.integers(97, 103, size=5, dtype=np.uint8))
        assert idx.contains(probe) == (probe in data)


def test_confirm_substring_batch():
    wrapper = b"prefix middle content suffix " * 20
    pats = [b"middle content", b"absent needle", b"prefix", b"suffix prefix"]
    assert confirm_substring_batch(wrapper, pats) == [True, False, True, True]