"""HLL / t-digest / count-min / frequent-items / Bloom conformance.

Tolerances mirror the reference's own tests (SURVEY.md §5-6):
HLL ~1.6% RSE at lg_k=12, count-min UB guarantee, frequent-items
NoFalseNegatives completeness, Bloom fpp target, t-digest rank
accuracy at the extremes, merge == single-pass for all.
"""

import numpy as np
import pytest

from raydedup.sketches.bloom import BloomFilter
from raydedup.sketches.codec import CodecError
from raydedup.sketches.countmin import CountMinSketch, suggest_num_buckets, suggest_num_hashes
from raydedup.sketches.frequencies import (
    NO_FALSE_NEGATIVES,
    NO_FALSE_POSITIVES,
    FrequentItemsSketch,
)
from raydedup.sketches.hll import HllSketch, coupons_for_ints, hll_union, leading_zeros64
from raydedup.sketches.tdigest import TDigest, tdigest_merge

# ---------------------------------------------------------------- HLL


def test_leading_zeros_exact():
    vals = np.array([0, 1, 2, 3, 2**63, 2**63 - 1, 2**32, 2**64 - 1], dtype=np.uint64)
    exp = [64, 63, 62, 62, 0, 1, 31, 0]
    assert leading_zeros64(vals).tolist() == exp


def test_hll_small_exact_via_linear_counting():
    sk = HllSketch(12).update_ints(np.arange(100))
    assert abs(sk.estimate() - 100) < 2


def test_hll_accuracy_lgk12():
    # hll/sketch.rs:73-75: ~1.6% RSE at lg_k=12; assert 3 sigma
    for n in (10_000, 100_000):
        sk = HllSketch(12).update_ints(np.arange(n))
        assert abs(sk.estimate() - n) / n < 0.05, (n, sk.estimate())


def test_hll_duplicates():
    sk = HllSketch(12).update_ints(np.zeros(1000, dtype=np.int64))
    assert abs(sk.estimate() - 1.0) < 0.01


def test_hll_union_matches_single_pass():
    parts = [HllSketch(12).update_ints(np.arange(i * 5000, (i + 1) * 5000)) for i in range(8)]
    merged = hll_union(parts)
    single = HllSketch(12).update_ints(np.arange(40_000))
    np.testing.assert_array_equal(merged.regs, single.regs)  # identical registers


def test_hll_union_mixed_lgk():
    a = HllSketch(12).update_ints(np.arange(0, 20_000))
    b = HllSketch(10).update_ints(np.arange(10_000, 30_000))
    u = hll_union([a, b])
    assert u.lg_k == 10
    assert abs(u.estimate() - 30_000) / 30_000 < 0.12


def test_hll_coupon_matches_reference_scheme():
    # coupon = (min(lz(h2),62)+1, h1 & mask26) — hll/mod.rs:217-228
    from raydedup.sketches.hashing import hash_u64_column

    vals = np.arange(50, dtype=np.int64)
    h1, h2 = hash_u64_column(vals)
    slot, value = coupons_for_ints(vals)
    np.testing.assert_array_equal(slot, (h1 & np.uint64((1 << 26) - 1)).astype(np.uint32))
    assert (value >= 1).all() and (value <= 63).all()


def test_hll_serde():
    sk = HllSketch(12).update_ints(np.arange(5000))
    rt = HllSketch.from_bytes(sk.to_bytes())
    np.testing.assert_array_equal(rt.regs, sk.regs)
    assert rt.lg_k == sk.lg_k


# ------------------------------------------------------------ t-digest


def test_tdigest_quantiles_uniform():
    rng = np.random.default_rng(42)
    v = rng.random(10_000)
    td = TDigest.from_values(v)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert abs(td.quantile(q) - q) < 0.02, q
    assert td.quantile(0.0) == v.min()
    assert td.quantile(1.0) == v.max()


def test_tdigest_rank_extremes_tight():
    v = np.random.default_rng(1).normal(size=10_000)
    td = TDigest.from_values(v)
    for q in (0.001, 0.999):
        true_val = np.quantile(v, q)
        assert abs(td.rank(true_val) - q) < 0.005


def test_tdigest_bounded_centroids():
    td = TDigest.from_values(np.random.default_rng(2).random(100_000))
    assert len(td.means) < 4 * td.k


def test_tdigest_merge_matches_single_pass():
    rng = np.random.default_rng(3)
    v = rng.normal(size=40_000)
    parts = [TDigest.from_values(v[i::8]) for i in range(8)]
    merged = tdigest_merge(parts)
    single = TDigest.from_values(v)
    assert merged.total_weight == 40_000
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - single.quantile(q)) < 0.05
    assert merged.min == single.min and merged.max == single.max


def test_tdigest_nan_inf_ignored():
    td = TDigest.from_values(np.array([1.0, np.nan, 2.0, np.inf, -np.inf, 3.0]))
    assert td.total_weight == 3
    assert td.min == 1.0 and td.max == 3.0


class TestTDigestMutSequential:
    """The construction-faithful sequential path (tdigest/sketch.rs
    greedy do_merge): mirrors the reference's exact-value test
    scenarios from tests/tdigest_test.rs."""

    def _mut(self, k=100):
        from raydedup.sketches.tdigest import TDigestMut

        return TDigestMut(k)

    def test_one_value(self):
        td = self._mut(100).update(1.0)
        assert td.total_weight() == 1
        assert td.rank(0.99) == 0.0
        assert td.rank(1.0) == 0.5
        assert td.rank(1.01) == 1.0
        assert td.quantile(0.0) == 1.0
        assert td.quantile(0.5) == 1.0
        assert td.quantile(1.0) == 1.0

    def test_rank_two_values(self):
        td = self._mut(100).update(1.0).update(2.0)
        assert td.rank(0.99) == 0.0
        assert td.rank(1.0) == 0.25
        assert td.rank(1.25) == 0.375
        assert td.rank(1.5) == 0.5
        assert td.rank(1.75) == 0.625
        assert td.rank(2.0) == 0.75
        assert td.rank(2.01) == 1.0

    def test_rank_repeated_values(self):
        td = self._mut(100)
        for _ in range(4):
            td.update(1.0)
        assert td.rank(0.99) == 0.0
        assert td.rank(1.0) == 0.5
        assert td.rank(1.01) == 1.0

    def test_repeated_blocks(self):
        td = self._mut(100)
        for v in (1.0, 2.0, 2.0, 3.0):
            td.update(v)
        assert td.rank(0.99) == 0.0
        assert td.rank(1.0) == 0.125
        assert td.rank(2.0) == 0.5
        assert td.rank(3.0) == 0.875
        assert td.rank(3.01) == 1.0

    def test_merge_small(self):
        a = self._mut(10).update(1.0).update(2.0)
        b = self._mut(10).update(2.0).update(3.0)
        a.merge(b)
        assert a.total_weight() == 4
        assert a.min == 1.0 and a.max == 3.0
        assert a.rank(0.99) == 0.0
        assert a.rank(1.0) == 0.125
        assert a.rank(2.0) == 0.5
        assert a.rank(3.0) == 0.875
        assert a.rank(3.01) == 1.0

    def test_many_values_and_merge_large(self):
        n = 10000
        td = self._mut(200).update_values(np.arange(n, dtype=np.float64))  # reference default k
        assert td.total_weight() == n
        assert td.min == 0.0 and td.max == n - 1
        assert abs(td.rank(n / 4) - 0.25) < 1e-4
        assert abs(td.rank(n / 2) - 0.5) < 1e-4
        assert td.rank(float(n)) == 1.0
        assert td.quantile(0.0) == 0.0
        assert td.quantile(1.0) == n - 1
        # the reference's own tolerances (tdigest_test.rs:93-105)
        assert abs(td.quantile(0.5) - n / 2) < 0.03 * (n / 2)
        assert abs(td.quantile(0.9) - n * 0.9) < 0.01 * n * 0.9
        assert abs(td.quantile(0.95) - n * 0.95) < 0.01 * n * 0.95

        a = self._mut(10).update_values(np.arange(n // 2, dtype=np.float64))
        b = self._mut(10).update_values(np.arange(n // 2, n, dtype=np.float64))
        a.merge(b)
        assert a.total_weight() == n
        assert abs(a.rank(n * 3 / 4) - 0.75) < 1e-4

    def test_invalid_inputs_ignored(self):
        td = self._mut(10)
        for _ in range(100):
            td.update(float("nan"))
            td.update(float("inf"))
            td.update(float("-inf"))
        assert td.is_empty()

    def test_bulk_equals_one_at_a_time(self):
        """update_values fires the compress trigger at the same stream
        positions as per-value update — centroids are bit-identical."""
        from raydedup.sketches.tdigest import TDigestMut

        rng = np.random.default_rng(7)
        vals = rng.normal(size=20_000)
        bulk = TDigestMut(100).update_values(vals)
        seq = TDigestMut(100)
        for v in vals:
            seq.update(float(v))
        bulk.compress()
        seq.compress()
        assert bulk._weights == seq._weights
        assert bulk._means == seq._means  # exact float equality
        assert bulk.reverse_merge == seq.reverse_merge

    def test_serde_roundtrip_preserves_merge_direction(self):
        from raydedup.sketches.tdigest import TDigestMut, from_java_bytes

        td = self._mut(100).update_values(np.arange(5000, dtype=np.float64))
        img = td.serialize()
        back = TDigestMut.deserialize(img)
        assert back._means == td._means and back._weights == td._weights
        assert back.reverse_merge == td.reverse_merge
        # continuing the stream after a round trip = continuing in place
        back.update_values(np.arange(5000, 7000, dtype=np.float64))
        td.update_values(np.arange(5000, 7000, dtype=np.float64))
        back.compress()
        td.compress()
        assert back._means == td._means
        # the frozen decoder reads the same image (layout-compatible)
        frozen = from_java_bytes(img)
        assert frozen.means.tolist() == TDigestMut.deserialize(img)._means

    def test_freeze_queries_close_to_vectorized(self):
        from raydedup.sketches.tdigest import TDigest, TDigestMut

        vals = np.random.default_rng(3).uniform(0, 1000, 50_000)
        seq = TDigestMut(200).update_values(vals).freeze()
        vec = TDigest.from_values(vals, k=200)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert abs(seq.quantile(q) - np.quantile(vals, q)) < 10.0
            assert abs(seq.quantile(q) - vec.quantile(q)) < 10.0


def test_tdigest_serde():
    td = TDigest.from_values(np.random.default_rng(4).random(1000))
    rt = TDigest.from_bytes(td.to_bytes())
    np.testing.assert_array_equal(rt.means, td.means)
    assert rt.quantile(0.5) == td.quantile(0.5)


# ------------------------------------------------------------ count-min


def test_countmin_config_helpers():
    # countmin/sketch.rs:131-151
    assert suggest_num_buckets(0.2) == 14
    assert suggest_num_hashes(0.95) == 3


def test_countmin_never_underestimates():
    rng = np.random.default_rng(5)
    items = np.array([f"item_{i}" for i in rng.zipf(1.3, 5000) % 500])
    sk = CountMinSketch(5, 256).update(items)
    uniq, true_counts = np.unique(items, return_counts=True)
    est = sk.estimate(uniq)
    assert (est >= true_counts).all()
    ub = sk.upper_bound(uniq)
    assert (ub >= est).all()
    # UB guarantee: est <= true + eps * total_weight at >=1-delta conf;
    # check the aggregate bound holds for the vast majority
    eps = sk.relative_error()
    ok = est <= true_counts + eps * sk.total_weight
    assert ok.mean() > 0.99


def test_countmin_merge():
    a = CountMinSketch(4, 128).update(["x"] * 10 + ["y"] * 3)
    b = CountMinSketch(4, 128).update(["x"] * 5)
    m = a.merge(b)
    assert m.estimate(["x"])[0] >= 15
    assert m.total_weight == 18
    with pytest.raises(CodecError):
        a.merge(CountMinSketch(3, 128))


def test_countmin_weighted_and_serde():
    sk = CountMinSketch(4, 64).update(["a", "b"], weights=[7, 2])
    assert sk.estimate(["a"])[0] >= 7
    rt = CountMinSketch.from_bytes(sk.to_bytes())
    np.testing.assert_array_equal(rt.counts, sk.counts)
    assert rt.total_weight == sk.total_weight


# ------------------------------------------------------- frequent items


def test_frequencies_exact_below_load():
    sk = FrequentItemsSketch(64)
    sk.update_batch(np.array(["a"] * 10 + ["b"] * 5 + ["c"]))
    assert sk.estimate("a") == 10 and sk.estimate("b") == 5 and sk.estimate("c") == 1
    assert sk.maximum_error() == 0


def test_frequencies_error_bound():
    # (UB-LB) <= total_weight * 3.5 / max_map_size (frequencies/mod.rs:53-54)
    rng = np.random.default_rng(6)
    items = rng.zipf(1.2, 20_000) % 2000
    sk = FrequentItemsSketch(128)
    for chunk in np.array_split(items, 20):
        sk.update_batch(chunk)
    assert sk.maximum_error() <= sk.total_weight * 3.5 / 128


def test_frequencies_no_false_negatives():
    rng = np.random.default_rng(7)
    items = np.concatenate([np.repeat(999_999, 3000), rng.integers(0, 5000, 17_000)])
    rng.shuffle(items)
    sk = FrequentItemsSketch(256)
    for chunk in np.array_split(items, 10):
        sk.update_batch(chunk)
    heavy = [r[0] for r in sk.frequent_items(NO_FALSE_NEGATIVES, threshold=2000)]
    assert 999_999 in heavy


def test_frequencies_merge_and_serde():
    a = FrequentItemsSketch(64).update_batch(np.array(["x"] * 20 + ["y"] * 2))
    b = FrequentItemsSketch(64).update_batch(np.array(["x"] * 10 + ["z"] * 4))
    m = a.merge(b)
    assert m.estimate("x") >= 30
    assert m.total_weight == 36
    rt = FrequentItemsSketch.from_bytes(m.to_bytes())
    assert rt.estimate("x") == m.estimate("x")
    assert rt.offset == m.offset


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_fpp():
    n = 10_000
    bf = BloomFilter.with_accuracy(n, 0.01)
    inserted = np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
    bf.insert(inserted)
    assert bf.contains(inserted).all()
    probe = (np.arange(n, dtype=np.uint64) + np.uint64(10**12)) * np.uint64(99991)
    fpp = bf.contains(probe).mean()
    assert fpp < 0.02, fpp
    assert abs(bf.estimated_fpp() - fpp) < 0.02


def test_bloom_union_intersect():
    a = BloomFilter(4096, 4).insert(np.arange(100, dtype=np.uint64))
    b = BloomFilter(4096, 4).insert(np.arange(50, 150, dtype=np.uint64))
    u = a.union(b)
    assert u.contains(np.arange(150, dtype=np.uint64)).all()
    i = a.intersect(b)
    assert i.contains(np.arange(50, 100, dtype=np.uint64)).all()
    with pytest.raises(CodecError):
        a.union(BloomFilter(8192, 4))


def test_bloom_strings_and_serde():
    bf = BloomFilter(4096, 3).insert_strings(["alpha", "beta", "gamma"])
    assert bf.contains_strings(["alpha", "beta", "gamma"]).all()
    assert not bf.contains_strings(["delta"])[0]
    rt = BloomFilter.from_bytes(bf.to_bytes())
    np.testing.assert_array_equal(rt.bits, bf.bits)
    assert rt.contains_strings(["alpha"])[0]


def test_tdigest_reference_golden_files():
    """Cross-implementation conformance: decode the reference's
    committed golden images (tdigest_serialization_test.rs fixtures)."""
    from raydedup.sketches.tdigest import from_compat_bytes

    base = "/root/reference/datasketches/tests/test_data"
    for name in ("double", "float"):
        with open(f"{base}/tdigest_ref_k100_n10000_{name}.sk", "rb") as f:
            td = from_compat_bytes(f.read())
        assert td.k == 100
        assert td.total_weight == 10000
        assert td.min == 0.0 and td.max == 9999.0
        # stream was 0..9999 → quantiles are near-exact
        assert abs(td.quantile(0.5) - 4999.5) < 50
        assert abs(td.rank(5000.0) - 0.5) < 0.01
        assert abs(td.quantile(0.99) - 9899) < 100


# ---------------------------------------------------------------- KLL


def test_kll_quantile_accuracy():
    from raydedup.sketches.kll import KllSketch

    rng = np.random.default_rng(0)
    v = rng.random(100_000)
    sk = KllSketch(200)
    for chunk in np.array_split(v, 50):
        sk.update_values(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert abs(sk.quantile(q) - q) < 0.01, q
    assert sk.quantile(0.0) == v.min() and sk.quantile(1.0) == v.max()
    assert abs(sk.rank(0.5) - 0.5) < 0.01
    # bounded space
    assert sum(len(l) for l in sk.levels) < 5 * sk.k


def test_kll_merge_and_serde():
    from raydedup.sketches.kll import KllSketch

    v = np.random.default_rng(1).normal(size=40_000)
    parts = [KllSketch(200).update_values(v[i::8]) for i in range(8)]
    m = parts[0]
    for p in parts[1:]:
        m = m.merge(p)
    single = KllSketch(200).update_values(v)
    assert m.n == 40_000
    for q in (0.1, 0.5, 0.9):
        assert abs(m.quantile(q) - single.quantile(q)) < 0.1
    rt = KllSketch.from_bytes(m.to_bytes())
    assert rt.n == m.n and rt.quantile(0.5) == m.quantile(0.5)


def test_kll_nan_inf_ignored():
    from raydedup.sketches.kll import KllSketch

    sk = KllSketch().update_values(np.array([1.0, np.nan, np.inf, 2.0]))
    assert sk.n == 2 and sk.min == 1.0 and sk.max == 2.0


def test_family_registry_dispatch():
    """Every family's image decodes via the generic registry
    (codec/family.rs mirror + CpcWrapper pattern)."""
    from raydedup.sketches.bloom import BloomFilter
    from raydedup.sketches.cpc import CpcSketch
    from raydedup.sketches.kll import KllSketch
    from raydedup.sketches.registry import sketch_from_bytes
    from raydedup.sketches.tdigest import TDigest
    from raydedup.sketches.theta import ThetaSketch, hashes_for_ints

    cases = [
        (ThetaSketch.from_hashes(hashes_for_ints(np.arange(50))).to_bytes(), ThetaSketch),
        (HllSketch(10).update_ints(np.arange(50)).to_bytes(), HllSketch),
        (CpcSketch(8).update_ints(np.arange(50)).to_bytes(), CpcSketch),
        (TDigest.from_values(np.arange(50.0)).to_bytes(), TDigest),
        (KllSketch(50).update_values(np.arange(50.0)).to_bytes(), KllSketch),
        (BloomFilter(512, 3).insert(np.arange(5, dtype=np.uint64)).to_bytes(), BloomFilter),
        (CountMinSketch(3, 64).update(["x"]).to_bytes(), CountMinSketch),
        (FrequentItemsSketch(32).update("x").to_bytes(), FrequentItemsSketch),
    ]
    for img, cls in cases:
        assert isinstance(sketch_from_bytes(img), cls)
    with pytest.raises(CodecError):
        sketch_from_bytes(b"\x99junk")


def test_hll_java_wire_format():
    """DataSketches HLL8 HLL-mode wire layout (hll/array8.rs:306-346):
    field-level byte assertions + round trip."""
    import struct

    from raydedup.sketches.hll import hll_from_java_bytes, hll_to_java_bytes

    sk = HllSketch(10).update_ints(np.arange(5000))
    buf = hll_to_java_bytes(sk)
    assert len(buf) == 40 + 1024
    preints, ver, fam, lg_k, unused, flags, cur_min, mode = struct.unpack_from("<BBBBBBBB", buf, 0)
    assert (preints, ver, fam, lg_k) == (10, 1, 7, 10)
    assert flags == 16  # out-of-order (merged) → composite estimator
    assert cur_min == 0 and mode == 0b1010  # HLL mode, HLL8 target
    hip, kxq0, kxq1 = struct.unpack_from("<ddd", buf, 8)
    pow2 = np.exp2(-sk.regs.astype(np.float64))
    assert kxq0 == pow2[sk.regs < 32].sum()
    assert kxq1 == pow2[sk.regs >= 32].sum()
    (num_zeros,) = struct.unpack_from("<I", buf, 32)
    assert num_zeros == int(np.count_nonzero(sk.regs == 0))
    rt = hll_from_java_bytes(buf)
    np.testing.assert_array_equal(rt.regs, sk.regs)
    assert rt.estimate() == sk.estimate()


def test_hll_composite_estimator_reference_tables():
    """Composite estimator (estimator.rs:211-263 + interpolation
    tables): accuracy across decades at several lg_k, and bound
    ordering with the reference RSE factors / quantile tables."""
    for lg_k, tol in ((4, 0.8), (8, 0.2), (12, 0.05), (16, 0.013), (21, 0.005)):
        for n in (10, 100, 10_000, 1_000_000):
            if n > 40 * (1 << lg_k):
                continue
            sk = HllSketch(lg_k)
            sk.update_ints(np.arange(n, dtype=np.int64))
            est = sk.estimate()
            assert abs(est - n) / n < max(tol, 0.05), (lg_k, n, est)
            lb1, ub1 = sk.lower_bound(1), sk.upper_bound(1)
            lb3, ub3 = sk.lower_bound(3), sk.upper_bound(3)
            assert lb3 <= lb1 <= est <= ub1 <= ub3


def test_hll_sparse_lifecycle_matches_dense():
    """Sparse coupon phase (in-memory LIST/SET, hll/list.rs:59-71,
    hash_set.rs:60-89): same registers and estimate as a dense build
    once promoted; below the promotion point the coupon-count estimate
    is exact-ish for small n."""
    small = HllSketch.sparse(12).update_ints(np.arange(50))
    assert small.is_sparse
    assert abs(small.estimate() - 50) < 1.0  # coupon interpolation, near-exact

    big = HllSketch.sparse(12).update_ints(np.arange(10_000, dtype=np.int64))
    assert not big.is_sparse  # past 3k/32 coupons → promoted
    dense = HllSketch(12).update_ints(np.arange(10_000, dtype=np.int64))
    assert np.array_equal(big.regs, dense.regs)
    assert big.estimate() == dense.estimate()


def test_hll_sparse_serde_roundtrip():
    sk = HllSketch.sparse(12).update_ints(np.arange(30))
    rt = HllSketch.from_bytes(sk.to_bytes())
    assert rt.is_sparse and np.array_equal(np.sort(rt.coupons), np.sort(sk.coupons))
    assert rt.estimate() == sk.estimate()


def test_hll_sparse_java_coupon_images():
    """LIST (≤8 coupons) and SET (>8) compact images written by
    hll_to_java_coupon_bytes decode back to the same coupon set
    (list.rs:110-162, hash_set.rs:146-203)."""
    from raydedup.sketches.hll import hll_from_java_bytes, hll_to_java_coupon_bytes

    for n in (0, 3, 8, 9, 150):  # 150 < promote point (3k/32 = 192 at lg_k=11)
        sk = HllSketch.sparse(11)
        if n:
            sk.update_ints(np.arange(n, dtype=np.int64))
        back = hll_from_java_bytes(hll_to_java_coupon_bytes(sk))
        assert back.is_sparse
        assert np.array_equal(np.sort(back.coupons), np.sort(sk.coupons)), n


def test_hll_sparse_union():
    """All-sparse unions stay sparse below the promotion point and
    match a dense single-pass build; mixed sparse+dense densifies."""
    a = HllSketch.sparse(12).update_ints(np.arange(0, 100))
    b = HllSketch.sparse(12).update_ints(np.arange(50, 150))
    u = hll_union([a, b])
    assert u.is_sparse
    assert abs(u.estimate() - 150) < 2.0

    dense = HllSketch(12).update_ints(np.arange(200, 5000))
    mixed = hll_union([a, dense])
    ref = HllSketch(12).update_ints(np.concatenate([np.arange(0, 100), np.arange(200, 5000)]))
    assert not mixed.is_sparse
    assert np.array_equal(mixed.regs, ref.regs)

    parts = [HllSketch.sparse(12).update_ints(np.arange(i * 2000, (i + 1) * 2000)) for i in range(4)]
    big = hll_union(parts)  # combined 8000 coupons > promote point
    assert not big.is_sparse
    assert np.array_equal(big.regs, HllSketch(12).update_ints(np.arange(8000)).regs)


def test_hll_mode_decode_roundtrips():
    """HLL8 / HLL6 / HLL4(+aux) images round-trip bit-identically
    (hll/array4.rs, array6.rs, array8.rs layouts)."""
    from raydedup.sketches.hll import (
        hll_from_java_bytes,
        hll_to_java_bytes,
        hll_to_java_hll4_bytes,
        hll_to_java_hll6_bytes,
    )

    sk = HllSketch(10)
    sk.update_ints(np.arange(20_000, dtype=np.int64))
    for enc in (hll_to_java_bytes, hll_to_java_hll6_bytes, hll_to_java_hll4_bytes):
        back = hll_from_java_bytes(enc(sk))
        assert np.array_equal(back.regs, sk.regs), enc.__name__
    # aux path: tiny k + huge n forces cur_min > 0 and spilled values
    sk2 = HllSketch(4)
    sk2.update_ints(np.arange(3_000_000, dtype=np.int64))
    assert sk2.regs.min() > 0
    back = hll_from_java_bytes(hll_to_java_hll4_bytes(sk2))
    assert np.array_equal(back.regs, sk2.regs)


def test_hll_list_and_set_mode_decode():
    """LIST/SET coupon images (list.rs:78-108, hash_set.rs:96-143)
    decode into registers equal to a direct coupon replay."""
    import struct

    from raydedup.sketches.hll import hll_from_java_bytes

    lg_k = 11
    vals = np.arange(9, dtype=np.int64)
    slot, value = coupons_for_ints(vals)
    coupons = (slot.astype(np.uint32) | (value.astype(np.uint32) << np.uint32(26))).astype("<u4")
    expect = HllSketch(lg_k)
    expect.update_coupons(slot, value)

    # LIST mode, compact: preints 2, lg_arr 3, flags COMPACT, state = count
    list_img = struct.pack("<BBBBBBBB", 2, 1, 7, lg_k, 3, 8, len(coupons), 0 | (2 << 2))
    list_img += coupons.tobytes()
    got = hll_from_java_bytes(list_img)
    assert got.lg_k == lg_k and np.array_equal(got.regs, expect.regs)

    # SET mode, full hash array with EMPTY sentinels: preints 3
    lg_arr = 5
    arr = np.zeros(1 << lg_arr, dtype="<u4")
    arr[: len(coupons)] = coupons  # position is irrelevant to replay
    set_img = struct.pack("<BBBBBBBB", 3, 1, 7, lg_k, lg_arr, 0, 0, 1 | (2 << 2))
    set_img += struct.pack("<I", len(coupons)) + arr.tobytes()
    got = hll_from_java_bytes(set_img)
    assert np.array_equal(got.regs, expect.regs)


def test_frequent_items_java_wire_format():
    """Family-10 layout round-trips for i64/u64/string items, byte
    positions per frequencies/sketch.rs:408-453."""
    import struct

    from raydedup.sketches.frequencies import FrequentItemsSketch

    sk = FrequentItemsSketch(64)
    for i in range(200):
        sk.update(f"item{i % 17}", 1 + i % 3)
    buf = sk.to_java_bytes("string")
    pre, ver, family, lg_max, lg_cur, flags = struct.unpack_from("<BBBBBB", buf, 0)
    assert (pre, ver, family) == (4, 1, 10)
    assert lg_max == 6 and flags == 0
    back = FrequentItemsSketch.from_java_bytes(buf, "string")
    assert back.counts == sk.counts
    assert back.offset == sk.offset and back.total_weight == sk.total_weight

    ints = FrequentItemsSketch(32)
    ints.update_batch(np.arange(100, dtype=np.int64) % 7)
    for t in ("i64", "u64"):
        rt = FrequentItemsSketch.from_java_bytes(ints.to_java_bytes(t), t)
        assert rt.counts == {int(k): v for k, v in ints.counts.items()}

    # empty image
    empty = FrequentItemsSketch(64)
    img = empty.to_java_bytes("i64")
    assert img[0] == 1 and img[5] & 5
    rt = FrequentItemsSketch.from_java_bytes(img, "i64")
    assert len(rt.counts) == 0 and rt.max_map_size == 64


def test_tdigest_java_and_compat_encode_roundtrip():
    """Family-20 LE encode/decode (tdigest/sketch.rs:404-600) and
    reference big-endian COMPAT_DOUBLE encode — including the
    committed reference golden file decoding through the same
    dispatcher (zero-preamble auto-detect)."""
    from raydedup.sketches.tdigest import (
        TDigest,
        from_compat_bytes,
        from_java_bytes,
        TDigest as _TD,
        to_compat_bytes,
        to_java_bytes,
    )

    rng = np.random.default_rng(3)
    td = TDigest.from_values(rng.normal(size=50_000), k=200)
    back = from_java_bytes(to_java_bytes(td))
    assert back.k == td.k and np.array_equal(back.means, td.means)
    assert np.array_equal(back.weights, td.weights)
    assert back.min == td.min and back.max == td.max

    # compat big-endian round trip
    c = from_compat_bytes(to_compat_bytes(td))
    assert np.allclose(np.sort(c.means), np.sort(td.means))
    assert c.min == td.min and c.max == td.max

    # zero-preamble auto-detect routes compat bytes through from_java_bytes
    c2 = from_java_bytes(to_compat_bytes(td))
    assert np.allclose(sorted(c2.means), sorted(td.means))

    # empty + single-value layouts
    assert from_java_bytes(to_java_bytes(TDigest(100))).is_empty()
    one = TDigest.from_values(np.array([42.0]), k=100)
    rt = from_java_bytes(to_java_bytes(one))
    assert rt.quantile(0.5) == 42.0 and len(rt.means) == 1


def test_binomial_bounds_bit_exact_vs_reference():
    """Ports the reference's own conformance check
    (binomial_bounds.rs:565-700, the max_num_samples=20/min_p=1e-3
    rows of STD): 57,750 bound computations per CI must reproduce the
    reference's logged aggregate sums to 1e-15 relative — covering the
    equivalence-table band, the exact Bayesian band, and both tail
    formulas."""
    import math

    from raydedup.sketches.binomial_bounds import lower_bound, upper_bound

    STD = [
        [7.083330682531043e04, 8.530373642825481e04, 3.273647725073409e04, 3.734024243699785e04, 57750.0],
        [6.539415269641498e04, 8.945522372568645e04, 3.222302546497840e04, 3.904738469737429e04, 57750.0],
        [6.006043493107306e04, 9.318105731423477e04, 3.186269956585285e04, 4.096466221922520e04, 57750.0],
    ]

    def run_aux(max_ns, ci, min_p):
        ns = 0
        s = [0.0, 0.0, 0.0, 0.0]
        count = 0
        while ns <= max_ns:
            p = 1.0
            while p >= min_p:
                s[0] += math.log(lower_bound(ns, p, ci) + 1.0)
                s[1] += math.log(upper_bound(ns, p, ci) + 1.0)
                count += 2
                if p < 1.0:
                    s[2] += math.log(lower_bound(ns, 1.0 - p, ci) + 1.0)
                    s[3] += math.log(upper_bound(ns, 1.0 - p, ci) + 1.0)
                    count += 2
                p *= 0.99
            ns = max(ns + 1, (1001 * ns) // 1000)
        return [*s, float(count)]

    for i, ci in enumerate((1, 2, 3)):
        arr = run_aux(20, ci, 1e-3)
        for j in range(5):
            assert abs(arr[j] / STD[i][j] - 1.0) < 1e-15, (ci, j)


def test_cpc_compressed_wire_roundtrip_all_flavors():
    """CPC compressed wire format (compression.rs + serialization.rs):
    bit-exact matrix round-trip through every flavor — Empty, Sparse,
    Hybrid, Pinned (window offset 0, pairs shifted by 8) and Sliding
    (offset > 0, rotated+permuted pair columns)."""
    from raydedup.sketches.cpc import CpcSketch
    from raydedup.sketches.cpc_codec import (
        cpc_from_java_bytes,
        cpc_to_java_bytes,
        determine_flavor,
        _popcount,
    )

    seen_flavors = set()
    for lg_k, ns in ((4, (16, 640)), (8, (0, 1, 16, 64, 256, 2560)), (11, (128, 512, 2048, 20480, 81920))):
        for n in ns:
            sk = CpcSketch(lg_k)
            if n:
                sk.update_ints(np.arange(n, dtype=np.int64))
            c = _popcount(sk.matrix)
            seen_flavors.add(determine_flavor(lg_k, c))
            back = cpc_from_java_bytes(cpc_to_java_bytes(sk))
            assert back.lg_k == lg_k
            assert np.array_equal(back.matrix, sk.matrix), (lg_k, n)
            # estimates identical since the matrix is identical
            assert back.estimate() == sk.estimate()
    assert seen_flavors == {0, 1, 2, 3, 4}


def test_cpc_compressed_wire_header_layout():
    """Header byte positions per cpc/sketch.rs:455-513."""
    import struct

    from raydedup.sketches.cpc import CpcSketch
    from raydedup.sketches.cpc_codec import cpc_from_java_bytes, cpc_to_java_bytes
    from raydedup.sketches.hashing import DEFAULT_SEED, compute_seed_hash

    sk = CpcSketch(10)
    sk.update_ints(np.arange(5000, dtype=np.int64))
    buf = cpc_to_java_bytes(sk)
    pre, ver, family, lg_k, fic, flags = struct.unpack_from("<BBBBBB", buf, 0)
    (seed_hash,) = struct.unpack_from("<H", buf, 6)
    assert (ver, family, lg_k) == (1, 16, 10)
    assert flags & 0b10  # FLAG_COMPRESSED
    # in-order sketches carry the HIP accumulator (cpc/sketch.rs:463-501)
    assert flags & 0b100
    assert seed_hash == compute_seed_hash(DEFAULT_SEED)
    # ...merged sketches don't (merge_flag -> ICON, cpc/sketch.rs:76-80)
    from raydedup.sketches.cpc import cpc_union

    mbuf = cpc_to_java_bytes(cpc_union([sk]))
    assert not (struct.unpack_from("<BBBBBB", mbuf, 0)[5] & 0b100)
    # seed-hash enforcement on decode
    import pytest

    with pytest.raises(ValueError):
        cpc_from_java_bytes(buf, expect_seed_hash=seed_hash ^ 1)


def test_cpc_icon_estimator_reference_parity():
    """ICON estimate (cpc/estimator.rs:388-429 polynomial +
    exponential regimes) — accuracy across decades, agreement with the
    estimator-agnostic method-of-moments inversion, bound ordering
    with the empirical lg_k<=14 tables, and exact small-count values."""
    from raydedup.sketches.cpc import CpcSketch
    from raydedup.sketches.cpc_estimator import icon_estimate

    assert icon_estimate(11, 0) == 0.0
    assert icon_estimate(11, 1) == 1.0
    for lg_k in (8, 11, 14):
        for n in (10, 100, 10_000):
            sk = CpcSketch(lg_k)
            sk.update_ints(np.arange(n, dtype=np.int64))
            est = sk.estimate()
            assert abs(est - n) / n < max(0.05, 3 * 0.5887 / np.sqrt(1 << lg_k))
            # ICON and MoM invert the same coupon count: close agreement
            assert abs(est - sk.estimate_mom()) / max(est, 1) < 0.02
            lb1, ub1 = sk.lower_bound(1), sk.upper_bound(1)
            lb3, ub3 = sk.lower_bound(3), sk.upper_bound(3)
            assert lb3 <= lb1 <= est <= ub1 <= ub3
    # exponential regime (C > 5.7K)
    sk = CpcSketch(8)
    sk.update_ints(np.arange(200_000, dtype=np.int64))
    est = sk.estimate()
    assert abs(est - 200_000) / 200_000 < 0.25  # tiny k, huge n: wide but sane


def test_cpc_peek_estimate_without_decompress():
    """CpcWrapper pattern: estimate from the compressed image header
    only — must equal the full decode's estimate exactly."""
    from raydedup.sketches.cpc import CpcSketch
    from raydedup.sketches.cpc_codec import cpc_from_java_bytes, cpc_peek_estimate, cpc_to_java_bytes

    for n in (0, 1, 500, 20_000):
        sk = CpcSketch(11)
        if n:
            sk.update_ints(np.arange(n, dtype=np.int64))
        buf = cpc_to_java_bytes(sk)
        assert cpc_peek_estimate(buf) == cpc_from_java_bytes(buf).estimate()


def test_bloom_and_countmin_java_wire_formats():
    """Family-21 (Bloom) and family-18 (Count-Min) layouts round-trip
    with header bytes at the reference's positions."""
    import struct

    from raydedup.sketches.bloom import BloomFilter
    from raydedup.sketches.countmin import CountMinSketch
    from raydedup.sketches.hashing import DEFAULT_SEED, compute_seed_hash

    bf = BloomFilter.with_accuracy(5000, 0.01)
    bf.insert(np.arange(3000, dtype=np.uint64))
    buf = bf.to_java_bytes()
    pre, ver, family, flags, num_hashes, _ = struct.unpack_from("<BBBBHH", buf, 0)
    assert (pre, ver, family, flags) == (3, 1, 21, 0)
    assert num_hashes == bf.num_hashes
    (seed,) = struct.unpack_from("<Q", buf, 8)
    assert seed == DEFAULT_SEED
    back = BloomFilter.from_java_bytes(buf)
    assert np.array_equal(back.bits, bf.bits)
    assert back.contains(np.arange(3000, dtype=np.uint64)).all()
    # empty image
    empty = BloomFilter.with_accuracy(100, 0.01)
    img = empty.to_java_bytes()
    assert img[0] == 1 and (img[3] & 4)
    rt = BloomFilter.from_java_bytes(img)
    assert rt.num_bits == empty.num_bits and rt.bits_used() == 0

    cm = CountMinSketch(5, 64)
    cm.update([f"item{i % 13}" for i in range(500)])
    buf = cm.to_java_bytes()
    pre, ver, family, flags, _ = struct.unpack_from("<BBBBI", buf, 0)
    assert (pre, ver, family, flags) == (2, 1, 18, 0)
    nb, nh, sh, _ = struct.unpack_from("<IBHB", buf, 8)
    assert (nb, nh) == (64, 5) and sh == compute_seed_hash(DEFAULT_SEED)
    back = CountMinSketch.from_java_bytes(buf)
    assert np.array_equal(back.counts, cm.counts)
    assert back.total_weight == cm.total_weight
    # wrong-seed rejection + empty image
    import pytest

    with pytest.raises(ValueError):
        CountMinSketch.from_java_bytes(buf, seed=123)
    img = CountMinSketch(3, 32).to_java_bytes()
    assert img[3] & 1 and len(img) == 16
    rt = CountMinSketch.from_java_bytes(img)
    assert rt.total_weight == 0 and rt.counts.sum() == 0


def test_hll_union_reference_scenarios():
    """Mirrors the reference's hll_union_test.rs scenario matrix with
    its own tolerances: overlapping large-cardinality union at lg_k=14
    (<5% rel err), mixed lg_k folding, bound ordering/widening at
    lg_k=12, commutativity/associativity/idempotency identities."""
    from raydedup.sketches.hll import HllSketch, hll_union

    # large cardinality with overlap (hll_union_test.rs:519-551)
    def mk(lo, hi, lg_k=14):
        sk = HllSketch(lg_k)
        sk.update_ints(np.arange(lo, hi, dtype=np.int64))
        return sk

    u = hll_union([mk(0, 100_000), mk(50_000, 150_000), mk(100_000, 200_000)])
    assert abs(u.estimate() - 200_000) / 200_000 < 0.05

    # bounds ordering + widening (hll_union_test.rs:293-340)
    u2 = hll_union([mk(0, 500, 12), mk(400, 900, 12)])
    est = u2.estimate()
    lb = [u2.lower_bound(s) for s in (1, 2, 3)]
    ub = [u2.upper_bound(s) for s in (1, 2, 3)]
    assert lb[0] <= est <= ub[0]
    assert lb[2] <= lb[1] <= lb[0] and ub[0] <= ub[1] <= ub[2]
    assert lb[2] > est * 0.5 and ub[2] < est * 1.5

    # mixed lg_k folds to the smaller config (union.rs:176-238 semantics)
    mixed = hll_union([mk(0, 5000, 14), mk(2500, 7500, 10)])
    assert mixed.lg_k == 10
    assert abs(mixed.estimate() - 7500) / 7500 < 0.10

    # algebraic identities (hll_union_test.rs:408-517)
    a, b, c = mk(0, 3000, 12), mk(1000, 4000, 12), mk(2000, 6000, 12)
    ab = hll_union([a, b]).estimate()
    ba = hll_union([b, a]).estimate()
    assert ab == ba  # commutative
    abc1 = hll_union([hll_union([a, b]), c]).estimate()
    abc2 = hll_union([a, hll_union([b, c])]).estimate()
    assert abc1 == abc2  # associative
    aa = hll_union([a, a]).estimate()
    assert aa == hll_union([a]).estimate()  # idempotent


class TestHllHip:
    """Sequential HIP estimator (hll/estimator.rs:40-115) — the
    in-order unmerged-stream path."""

    @staticmethod
    def _naive_hip(lg_k, slots, values):
        """One-coupon-at-a-time transcription of HipEstimator::update —
        the ground truth the vectorized event extraction must match."""
        k = 1 << lg_k
        regs = np.zeros(k, dtype=np.int64)
        hip, kxq0, kxq1 = 0.0, float(k), 0.0
        for s, v in zip(slots & (k - 1), values.astype(np.int64)):
            old = int(regs[s])
            v = int(v)
            if v > old:
                hip += k / (kxq0 + kxq1)
                if old < 32:
                    kxq0 -= 2.0**-old
                else:
                    kxq1 -= 2.0**-old
                if v < 32:
                    kxq0 += 2.0**-v
                else:
                    kxq1 += 2.0**-v
                regs[s] = v
        return hip, kxq0, kxq1, regs

    def test_event_extraction_matches_naive_sequential(self):
        from raydedup.sketches.hll import HllHipSketch

        rng = np.random.default_rng(5)
        lg_k = 8
        n = 5000
        slots = rng.integers(0, 1 << 26, n).astype(np.uint32)
        values = (rng.geometric(0.5, n).clip(1, 62)).astype(np.uint8)
        sk = HllHipSketch(lg_k)
        sk._coupon_mode = False  # force array path for the comparison
        # split across uneven batches: state must equal one-shot AND naive
        for lo, hi in [(0, 17), (17, 1000), (1000, 1001), (1001, n)]:
            sk.update_coupons(slots[lo:hi], values[lo:hi])
        hip, kxq0, kxq1, regs = self._naive_hip(lg_k, slots.astype(np.int64), values)
        assert sk.hip_accum == pytest.approx(hip, rel=1e-12)
        assert sk.kxq0 == pytest.approx(kxq0, rel=1e-12)
        assert sk.kxq1 == pytest.approx(kxq1, abs=1e-18)
        assert (sk.regs.astype(np.int64) == regs).all()

    def test_coupon_mode_small_n_near_exact(self):
        from raydedup.sketches.hll import HllHipSketch

        sk = HllHipSketch(12)
        sk.update_ints(np.arange(100, dtype=np.int64))
        est = sk.estimate()
        assert sk._coupon_mode  # 100 < 3k/32 = 384
        assert abs(est - 100.0) < 1.0  # coupon interpolation is near-exact

    def test_hip_mode_accuracy_and_duplicates(self):
        from raydedup.sketches.hll import HllHipSketch

        n = 100_000
        sk = HllHipSketch(12)
        vals = np.arange(n, dtype=np.int64)
        sk.update_ints(vals)
        est = sk.estimate()
        assert not sk._coupon_mode
        # HIP RSE ~= 0.836/sqrt(4096) ~ 1.3%; allow 3 sigma
        assert abs(est - n) / n < 0.04, est
        # duplicates must not move the estimate
        before = sk.estimate()
        sk.update_ints(vals[:5000])
        assert sk.estimate() == before

    def test_hip_beats_or_matches_composite_smalln(self):
        """The point of HIP: unmerged streams estimate at least as well
        as the composite path on the same registers (reference test
        scenarios: n=600, 1000 within tight tolerance)."""
        from raydedup.sketches.hll import HllHipSketch

        for n, tol in [(600, 100.0), (1000, 150.0), (10_000, 400.0)]:
            sk = HllHipSketch(12)
            sk.update_ints(np.arange(n, dtype=np.int64))
            assert abs(sk.estimate() - n) < tol, (n, sk.estimate())

    def test_to_dense_roundtrip(self):
        from raydedup.sketches.hll import HllHipSketch, hll_union

        a = HllHipSketch(12).update_ints(np.arange(2000, dtype=np.int64))
        b = HllHipSketch(12).update_ints(np.arange(1000, 3000, dtype=np.int64))
        u = hll_union([a.to_dense(), b.to_dense()])
        assert abs(u.estimate() - 3000) / 3000 < 0.05
        # coupon-mode sketch densifies too
        c = HllHipSketch(12).update_ints(np.arange(50, dtype=np.int64))
        assert abs(c.to_dense().estimate() - 50) < 5


def test_cpc_sequential_hip_matches_transcribed_loop():
    """Batched HIP fold == the reference's one-coupon-at-a-time
    accumulator (cpc/sketch.rs:250-256) transcribed literally, across
    uneven batch splits, to ~1e-12 rel."""
    from raydedup.sketches.cpc import CpcSketch, coupons_from_hashes
    from raydedup.sketches.hashing import hash_u64_column

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 40, size=20_000, dtype=np.int64)
    lg_k = 10
    h1, h2 = hash_u64_column(vals)

    # literal transcription of the sequential updater
    k = 1 << lg_k
    row, col = coupons_from_hashes(h1, h2, lg_k)
    seen = set()
    kxp, hip = float(k), 0.0
    for r, c in zip(row.tolist(), col.tolist()):
        if (r, c) in seen:
            continue
        seen.add((r, c))
        hip += k / kxp
        kxp -= 2.0 ** -(c + 1)

    for splits in (1, 3, 17):
        sk = CpcSketch(lg_k)
        for part in np.array_split(vals, splits):
            sk.update_ints(part)
        assert abs(sk.hip_est_accum - hip) <= 1e-12 * hip
        assert abs(sk.kxp - kxp) <= 1e-9
        assert sk.estimate() == sk.hip_est_accum


def test_cpc_hip_accuracy_and_merge_invalidation():
    """HIP tracks n tightly in-order; union flips to ICON exactly as
    the reference invalidates HIP on merge (cpc/sketch.rs:76-80)."""
    from raydedup.sketches.cpc import CpcSketch, cpc_union
    from raydedup.sketches.cpc_estimator import icon_estimate

    n = 50_000
    sk = CpcSketch(11).update_ints(np.arange(n, dtype=np.int64))
    assert not sk.merged
    assert abs(sk.estimate() - n) / n < 3 * 0.5887 / np.sqrt(1 << 11)
    assert sk.lower_bound(2) <= sk.estimate() <= sk.upper_bound(2)
    u = cpc_union([sk])
    assert u.merged
    assert u.estimate() == icon_estimate(11, u.num_coupons)


def test_cpc_hip_survives_serde():
    """kxp/hip ride both the internal format and the DataSketches wire
    (preamble layout serialization.rs:24-48); merged images decode
    with merge_flag set (= ICON)."""
    from raydedup.sketches.cpc import CpcSketch, cpc_union
    from raydedup.sketches.cpc_codec import cpc_from_java_bytes, cpc_to_java_bytes

    sk = CpcSketch(10).update_ints(np.arange(7000, dtype=np.int64))
    for rt in (CpcSketch.from_bytes(sk.to_bytes()), cpc_from_java_bytes(cpc_to_java_bytes(sk))):
        assert not rt.merged
        assert rt.hip_est_accum == sk.hip_est_accum
        assert rt.kxp == sk.kxp
        assert np.array_equal(rt.matrix, sk.matrix)
    m = cpc_union([sk, CpcSketch(10).update_ints(np.arange(5000, 9000, dtype=np.int64))])
    for rt in (CpcSketch.from_bytes(m.to_bytes()), cpc_from_java_bytes(cpc_to_java_bytes(m))):
        assert rt.merged
        assert rt.estimate() == m.estimate()


def test_frequent_items_custom_codec_roundtrip():
    """A user-registered item codec (tuple-typed items) round-trips
    through the family-10 wire format; the 'bytes' built-in too."""
    import struct

    from raydedup.sketches.frequencies import FrequentItemsSketch
    from raydedup.sketches.registry import register_frequent_item_codec

    def enc_pair(items):
        return b"".join(struct.pack("<qq", a, b) for a, b in items)

    def dec_pair(buf, pos, n):
        out = []
        for _ in range(n):
            a, b = struct.unpack_from("<qq", buf, pos)
            pos += 16
            out.append((a, b))
        return out, pos

    register_frequent_item_codec("pair_i64", enc_pair, dec_pair)

    sk = FrequentItemsSketch(64)
    for i in range(10):
        sk.update((i, i * i), count=i + 1)
    img = sk.to_java_bytes(item_type="pair_i64")
    back = FrequentItemsSketch.from_java_bytes(img, item_type="pair_i64")
    assert back.counts == sk.counts
    assert back.total_weight == sk.total_weight
    assert back.estimate((7, 49)) == 8

    skb = FrequentItemsSketch(64)
    skb.update(b"alpha", 3)
    skb.update(b"\x00\xffraw", 5)
    img2 = skb.to_java_bytes(item_type="bytes")
    back2 = FrequentItemsSketch.from_java_bytes(img2, item_type="bytes")
    assert back2.counts == skb.counts

    import pytest

    with pytest.raises(ValueError, match="register_item_codec"):
        sk.to_java_bytes(item_type="no_such_codec")


def test_error_taxonomy():
    """CodecError splits into InvalidData (corrupt/foreign bytes) and
    InvalidArgument (caller contract violations), both still catchable
    as CodecError — the reference's error.rs taxonomy."""
    import pytest

    from raydedup.sketches import codec
    from raydedup.sketches.bloom import BloomFilter
    from raydedup.sketches.theta import ThetaSketch, theta_from_java_bytes

    assert issubclass(codec.InvalidData, codec.CodecError)
    assert issubclass(codec.InvalidArgument, codec.CodecError)
    with pytest.raises(codec.InvalidData):
        theta_from_java_bytes(b"\x00\x01")  # truncated image
    with pytest.raises(codec.InvalidData):
        codec.unpack_header(b"\xff" * codec.HEADER_SIZE, codec.FAMILY_THETA)
    a, b = BloomFilter(128, 3), BloomFilter(256, 3)
    with pytest.raises(codec.InvalidArgument):
        a.union(b)  # mismatched configs: caller mistake, not bad bytes
