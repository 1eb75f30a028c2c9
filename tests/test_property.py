"""Property-based invariants (hypothesis) for the vectorized kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raydedup.sketches.hashing import hash_strings, murmur3_128_strings, xxhash64_bytes
from raydedup.pipeline.extract import segmented_unique


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=30))
def test_murmur_batch_equals_per_string(items):
    h1b, h2b = hash_strings(items)
    for i, it in enumerate(items):
        data = np.frombuffer(it, dtype=np.uint8)
        offs = np.array([0, len(it)], dtype=np.int64)
        a, b = murmur3_128_strings(data, offs)
        assert int(h1b[i]) == int(a[0]) and int(h2b[i]) == int(b[0])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=30))
def test_xxhash_batch_independent_of_neighbors(items):
    full = xxhash64_bytes(items)
    for i, it in enumerate(items):
        solo = xxhash64_bytes([it])
        assert int(full[i]) == int(solo[0])


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=40),
        min_size=1,
        max_size=10,
    )
)
def test_segmented_unique_equals_per_segment(segments):
    flat = np.array([v for seg in segments for v in seg], dtype=np.uint64)
    offs = np.zeros(len(segments) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segments], out=offs[1:])
    vals, uoffs = segmented_unique(flat, offs)
    for i, seg in enumerate(segments):
        got = vals[uoffs[i] : uoffs[i + 1]]
        np.testing.assert_array_equal(got, np.unique(np.array(seg, dtype=np.uint64)))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=3000))
def test_theta_estimate_upper_lower_consistency(values):
    from raydedup.sketches.theta import ThetaSketch, hashes_for_ints

    s = ThetaSketch.from_hashes(hashes_for_ints(np.array(values, dtype=np.int64)), lg_k=5)
    n_true = len(set(values))
    assert s.lower_bound(3) <= s.estimate() <= s.upper_bound(3)
    if not s.is_estimation_mode:
        assert s.estimate() == n_true


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=2000),
    st.integers(min_value=1, max_value=7),
)
def test_kll_rank_monotone_and_bounded(values, splits):
    from raydedup.sketches.kll import KllSketch

    v = np.array(values)
    parts = np.array_split(v, splits)
    sk = KllSketch(50)
    for p in parts:
        if len(p):
            sk.update_values(p)
    qs = sk.quantiles([0.0, 0.25, 0.5, 0.75, 1.0])
    assert (np.diff(qs) >= 0).all()
    assert qs[0] == v.min() and qs[-1] == v.max()
    assert 0.0 <= sk.rank(float(np.median(v))) <= 1.0

@settings(max_examples=30, deadline=None)
@given(
    lg_k=st.integers(min_value=4, max_value=12),
    density=st.floats(min_value=0.0, max_value=0.9),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_cpc_compressed_roundtrip_random_matrices(lg_k, density, seed):
    """Any bit matrix (its popcount determines flavor/offset/phase)
    round-trips bit-exactly through the compressed wire format —
    property coverage beyond the structured update-path tests."""
    from raydedup.sketches.cpc import CpcSketch
    from raydedup.sketches.cpc_codec import cpc_from_java_bytes, cpc_to_java_bytes

    rng = np.random.default_rng(seed)
    k = 1 << lg_k
    # geometric-ish column distribution like real coupons, scaled by density
    cols = np.minimum(rng.geometric(0.5, size=int(density * k * 8)), 63)
    rows = rng.integers(0, k, size=len(cols))
    matrix = np.zeros(k, dtype=np.uint64)
    if len(cols):
        np.bitwise_or.at(matrix, rows, np.uint64(1) << cols.astype(np.uint64))
    sk = CpcSketch(lg_k, matrix)
    back = cpc_from_java_bytes(cpc_to_java_bytes(sk))
    assert np.array_equal(back.matrix, matrix)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=1500,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_tdigest_rank_quantile_merge_properties(values, splits):
    """Distribution-free t-digest invariants under arbitrary inputs and
    arbitrary partition splits (the engine always merges partials):
    weight conservation, exact min/max, monotone quantiles bounded by
    the data range, and rank() in [0, 1]."""
    from raydedup.sketches.tdigest import TDigest

    v = np.array(values, dtype=np.float64)
    parts = [p for p in np.array_split(v, splits) if len(p)]
    td = TDigest.from_values(parts[0], k=100).merge(
        *(TDigest.from_values(p, k=100) for p in parts[1:])
    )
    assert td.total_weight == len(v)
    qs = td.quantiles([0.0, 0.1, 0.5, 0.9, 1.0])
    assert (np.diff(qs) >= 0).all()
    assert qs[0] == v.min() and qs[-1] == v.max()
    for probe in (float(v.min()), float(np.median(v)), float(v.max())):
        assert 0.0 <= td.rank(probe) <= 1.0


@settings(max_examples=25, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**9), max_size=400),
    st.sets(st.integers(min_value=0, max_value=10**9), max_size=400),
)
def test_theta_exact_regime_set_algebra(a, b):
    """Below k the theta sketch is an exact set: union and intersection
    estimates equal |A∪B| and |A∩B| for arbitrary int sets (the
    reference's exact-mode semantics, theta/sketch.rs:140-147)."""
    from raydedup.sketches.theta import (
        ThetaSketch,
        hashes_for_ints,
        theta_intersect,
        theta_union,
    )

    def sk(vals):
        arr = np.array(sorted(vals), dtype=np.int64)
        return ThetaSketch.from_hashes(hashes_for_ints(arr), lg_k=12)

    sa, sb = sk(a), sk(b)
    assert theta_union([sa, sb]).estimate() == len(a | b)
    assert theta_intersect(sa, sb).estimate() == len(a & b)


@settings(max_examples=30, deadline=None)
@given(
    lg_k=st.integers(min_value=4, max_value=14),
    n=st.integers(min_value=0, max_value=50_000),
)
def test_hll_mode_roundtrip_property(lg_k, n):
    """HLL4/6/8 wire round-trips hold for arbitrary (lg_k, n)."""
    from raydedup.sketches.hll import (
        HllSketch,
        hll_from_java_bytes,
        hll_to_java_bytes,
        hll_to_java_hll4_bytes,
        hll_to_java_hll6_bytes,
    )

    sk = HllSketch(lg_k)
    if n:
        sk.update_ints(np.arange(n, dtype=np.int64))
    for enc in (hll_to_java_bytes, hll_to_java_hll6_bytes, hll_to_java_hll4_bytes):
        assert np.array_equal(hll_from_java_bytes(enc(sk)).regs, sk.regs)
