"""Theta sketch semantics vs the reference's tested tolerances.

Anchors: theta_sketch_test.rs:179-218 (2% accuracy at lg_k=12 n=1e4),
theta_intersection_test.rs, theta/hash_table.rs:249-277 (rebuild rule).
"""

import numpy as np
import pytest

from raydedup.sketches.codec import CodecError
from raydedup.sketches.theta import (
    MAX_THETA,
    ThetaSketch,
    hashes_for_ints,
    hashes_for_strings,
    jaccard_estimate,
    theta_intersect,
    theta_union,
)


def sketch_of_range(lo, hi, lg_k=12, seed=9001):
    vals = [f"value_{i}" for i in range(lo, hi)]
    return ThetaSketch.from_hashes(hashes_for_strings(vals, seed=seed), lg_k=lg_k, seed=seed)


def test_empty():
    s = ThetaSketch.from_hashes(np.empty(0, dtype=np.uint64))
    assert s.empty and s.estimate() == 0.0
    assert s.lower_bound() == 0.0 and s.upper_bound() == 0.0


def test_exact_mode_below_k():
    s = sketch_of_range(0, 1000)
    assert not s.is_estimation_mode
    assert s.estimate() == 1000.0
    assert s.lower_bound() == s.upper_bound() == 1000.0


def test_duplicates_counted_once():
    vals = ["same_value"] * 100
    s = ThetaSketch.from_hashes(hashes_for_strings(vals))
    assert s.estimate() == 1.0


def test_estimation_accuracy_2pct():
    # theta_sketch_test.rs:197-203: lg_k=12, n=10^4, within 2%
    n = 10_000
    s = sketch_of_range(0, n)
    assert s.is_estimation_mode
    assert abs(s.estimate() - n) / n < 0.02
    assert s.lower_bound(1) <= s.estimate() <= s.upper_bound(1)
    assert s.lower_bound(3) <= s.lower_bound(2) <= s.lower_bound(1)
    assert s.upper_bound(1) <= s.upper_bound(2) <= s.upper_bound(3)
    assert s.lower_bound(2) <= n <= s.upper_bound(2)


def test_rebuild_rule_kth_smallest():
    # after rebuild: exactly k entries retained, theta == (k+1)-th smallest
    lg_k = 5
    k = 1 << lg_k
    h = np.unique(np.random.default_rng(1).integers(1, MAX_THETA, size=500, dtype=np.int64)).view(np.uint64)
    s = ThetaSketch.from_hashes(h, lg_k=lg_k)
    assert s.num_retained == k
    srt = np.sort(h)
    assert s.theta == int(srt[k])
    np.testing.assert_array_equal(s.entries, srt[:k])
    assert (s.entries < np.uint64(s.theta)).all()


def test_union_matches_single_pass():
    # merge of disjoint shard partials ~ single-pass sketch (SURVEY §3.2)
    n, shards = 20_000, 8
    parts = [sketch_of_range(i * n // shards, (i + 1) * n // shards) for i in range(shards)]
    merged = theta_union(parts)
    single = sketch_of_range(0, n)
    assert abs(merged.estimate() - n) / n < 0.03
    # commutativity: any merge order gives identical results
    rev = theta_union(list(reversed(parts)))
    assert rev.theta == merged.theta
    np.testing.assert_array_equal(rev.entries, merged.entries)
    # associativity: tree merge == flat merge
    tree = theta_union([theta_union(parts[:4]), theta_union(parts[4:])])
    assert tree.theta == merged.theta
    np.testing.assert_array_equal(tree.entries, merged.entries)
    assert abs(single.estimate() - merged.estimate()) / n < 0.04


def test_union_overlapping():
    a = sketch_of_range(0, 6000)
    b = sketch_of_range(3000, 9000)
    u = theta_union([a, b])
    assert abs(u.estimate() - 9000) / 9000 < 0.05


def test_intersection_exact_mode():
    a = sketch_of_range(0, 1000, lg_k=14)
    b = sketch_of_range(500, 1500, lg_k=14)
    i = theta_intersect(a, b)
    assert i.estimate() == 500.0


def test_intersection_estimation_mode():
    a = sketch_of_range(0, 20_000)
    b = sketch_of_range(10_000, 30_000)
    i = theta_intersect(a, b)
    assert abs(i.estimate() - 10_000) / 10_000 < 0.15


def test_intersection_with_empty_is_empty():
    a = sketch_of_range(0, 100)
    e = ThetaSketch.new_empty()
    i = theta_intersect(a, e)
    assert i.empty and i.estimate() == 0.0


def test_jaccard_estimate():
    a = sketch_of_range(0, 10_000)
    b = sketch_of_range(2_000, 12_000)
    # true J = 8000/12000 = 2/3
    assert abs(jaccard_estimate(a, b) - 2 / 3) < 0.08
    assert jaccard_estimate(a, a) == 1.0


def test_serde_roundtrip_byte_stable():
    s = sketch_of_range(0, 10_000)
    buf = s.to_bytes()
    s2 = ThetaSketch.from_bytes(buf)
    assert s2.theta == s.theta and s2.lg_k == s.lg_k and s2.empty == s.empty
    np.testing.assert_array_equal(s2.entries, s.entries)
    assert s2.to_bytes() == buf  # byte-stable round trip


def test_seed_hash_mismatch_rejected():
    a = sketch_of_range(0, 100, seed=9001)
    b = sketch_of_range(0, 100, seed=12345)
    with pytest.raises(CodecError):
        theta_union([a, b])
    with pytest.raises(CodecError):
        ThetaSketch.from_bytes(b.to_bytes(), expect_seed_hash=a.seed_hash)


def test_int_hashing_distinct():
    s = ThetaSketch.from_hashes(hashes_for_ints(np.arange(5000)), lg_k=14)
    assert abs(s.estimate() - 5000) / 5000 < 0.02


def test_sampling_probability():
    # sampling p<1 puts the sketch in estimation mode immediately
    h = hashes_for_ints(np.arange(1000))
    s = ThetaSketch.from_hashes(h, lg_k=12, p=0.5)
    assert s.is_estimation_mode
    assert abs(s.estimate() - 1000) / 1000 < 0.15


def test_binomial_bounds_coverage():
    """Port parity: reference bound formulas (binomial_bounds.rs) —
    coverage of the true n at 2 std dev across sizes, plus the
    zero/one-sample logarithmic special cases."""
    from raydedup.sketches.binomial_bounds import lower_bound, upper_bound

    rng = np.random.default_rng(8)
    for n in (1_000, 20_000, 200_000):
        s = sketch_of_range(0, n)
        if s.is_estimation_mode:
            assert s.lower_bound(2) <= n <= s.upper_bound(2), n
            assert s.lower_bound(3) < s.lower_bound(2) < s.lower_bound(1)
    # special cases match the reference's closed forms
    assert upper_bound(0, 0.5, 2) == np.ceil(np.log(0.0227502618904135701) / np.log(0.5))
    # 1-sample LB: raw log formula, then clamped to >= num_samples and
    # <= estimate exactly as the reference does (binomial_bounds.rs:300)
    raw = np.floor(np.log(1 - 0.0227502618904135701) / np.log(0.5))
    assert lower_bound(1, 0.5, 2) == min(1 / 0.5, max(1.0, raw)) == 1.0
    assert upper_bound(0, 0.5, 2, no_data_seen=True) == 0.0
    with pytest.raises(ValueError):
        lower_bound(5, 0.0, 2)


def test_java_v3_wire_format():
    """serVer-3 wire format parity (theta/sketch.rs:477-510): exact
    byte layout for estimation / exact / single / empty shapes, and
    round-trips through the cross-implementation codec."""
    import struct

    # estimation-mode: preamble 3, theta present
    s = sketch_of_range(0, 10_000)
    buf = s.to_java_v3_bytes()
    pre, ver, fam = struct.unpack_from("<BBB", buf, 0)
    flags, seed_hash = struct.unpack_from("<BH", buf, 5)
    assert (pre, ver, fam) == (3, 3, 3)
    assert flags == (1 << 1) | (1 << 3) | (1 << 4)
    assert seed_hash == s.seed_hash
    (n,) = struct.unpack_from("<I", buf, 8)
    (theta,) = struct.unpack_from("<Q", buf, 16)
    assert n == s.num_retained and theta == s.theta
    assert len(buf) == 24 + 8 * n
    rt = ThetaSketch.from_java_v3_bytes(buf, expect_seed_hash=s.seed_hash)
    assert rt.theta == s.theta and rt.empty == s.empty
    np.testing.assert_array_equal(rt.entries, s.entries)
    assert rt.to_java_v3_bytes() == buf  # byte-stable

    # exact mode: preamble 2, no theta
    s2 = sketch_of_range(0, 100)
    b2 = s2.to_java_v3_bytes()
    assert b2[0] == 2 and len(b2) == 16 + 8 * 100
    rt2 = ThetaSketch.from_java_v3_bytes(b2)
    assert rt2.estimate() == 100.0

    # single item: preamble 1
    s3 = sketch_of_range(0, 1)
    b3 = s3.to_java_v3_bytes()
    assert b3[0] == 1 and len(b3) == 16
    assert ThetaSketch.from_java_v3_bytes(b3).estimate() == 1.0

    # empty: preamble 1, empty flag, no entries
    s4 = ThetaSketch.from_hashes(np.empty(0, dtype=np.uint64))
    b4 = s4.to_java_v3_bytes()
    assert b4[0] == 1 and (b4[5] & (1 << 2)) and len(b4) == 8
    assert ThetaSketch.from_java_v3_bytes(b4).empty

    # seed mismatch rejected for non-empty
    with pytest.raises(CodecError):
        ThetaSketch.from_java_v3_bytes(buf, expect_seed_hash=12345)


def test_java_v4_compressed_wire_format():
    """serVer-4 delta bit-packing (theta/sketch.rs:512-578): round-trip,
    compression, and a hand-verified bitstream for a tiny case."""
    import struct

    from raydedup.sketches.theta import theta_from_java_v4_bytes, theta_to_java_v4_bytes

    s = sketch_of_range(0, 10_000)
    v4 = theta_to_java_v4_bytes(s)
    v3 = s.to_java_v3_bytes()
    # deltas average theta/k ≈ 2^51 at lg_k=12 → ~53 bits/entry vs 64
    assert len(v4) < 0.88 * len(v3)
    rt = theta_from_java_v4_bytes(v4, expect_seed_hash=s.seed_hash)
    assert rt.theta == s.theta
    np.testing.assert_array_equal(rt.entries, s.entries)
    assert theta_to_java_v4_bytes(rt) == v4  # byte-stable

    # hand-verified tiny case: entries [1, 3] → deltas [1, 2] → bits 2
    # → stream 01 10 (MSB-first) → byte 0b0110_0000 = 0x60
    tiny = ThetaSketch(12, int(np.iinfo(np.int64).max), np.array([1, 3], dtype=np.uint64), s.seed_hash, False)
    b = theta_to_java_v4_bytes(tiny)
    pre, ver, fam, bits, n_bytes, flags, sh = struct.unpack_from("<BBBBBBH", b, 0)
    assert (pre, ver, fam, bits, n_bytes) == (1, 4, 3, 2, 1)
    assert b[8] == 2          # num_entries little-endian byte
    assert b[9] == 0b01100000  # packed deltas
    rt2 = theta_from_java_v4_bytes(b)
    np.testing.assert_array_equal(rt2.entries, [1, 3])

    # exact-mode (pre 1, no theta) round trip
    s2 = sketch_of_range(0, 200)
    rt3 = theta_from_java_v4_bytes(theta_to_java_v4_bytes(s2))
    assert rt3.estimate() == 200.0

    # empty falls back to v3
    e = ThetaSketch.from_hashes(np.empty(0, dtype=np.uint64))
    assert theta_to_java_v4_bytes(e)[1] == 3


def test_theta_legacy_v1_v2_decode():
    """Version-matrix decode: serVer 1 and 2 legacy images
    (theta/sketch.rs:648-731 layouts) produce the same entries/theta
    as the modern v3 path."""
    import struct

    import numpy as np

    from raydedup.sketches.theta import (
        DEFAULT_SEED,
        MAX_THETA,
        ThetaSketch,
        compute_seed_hash,
        hashes_for_ints,
        theta_from_java_bytes,
    )

    sk = ThetaSketch.from_hashes(hashes_for_ints(np.arange(5000, dtype=np.int64)), lg_k=10)
    entries = np.sort(sk.entries)
    theta = sk.theta
    sh = compute_seed_hash(DEFAULT_SEED)

    # v1: [pre, ver, family, unused, u32 unused, u32 n, u32 unused, u64 theta, entries]
    v1 = struct.pack("<BBBBI", 3, 1, 3, 0, 0)
    v1 += struct.pack("<II", len(entries), 0)
    v1 += struct.pack("<Q", theta) + entries.tobytes()
    got = theta_from_java_bytes(v1, lg_k=10)
    assert got.theta == theta and np.array_equal(np.sort(got.entries), entries)
    assert abs(got.estimate() - sk.estimate()) < 1e-9

    # v2 estimate layout (pre_longs 3): seed hash at offset 6
    v2 = struct.pack("<BBBBHH", 3, 2, 3, 0, 0, sh)
    v2 += struct.pack("<II", len(entries), 0)
    v2 += struct.pack("<Q", theta) + entries.tobytes()
    got = theta_from_java_bytes(v2, lg_k=10)
    assert got.theta == theta and np.array_equal(np.sort(got.entries), entries)

    # v2 precise layout (pre_longs 2): exact mode, theta = MAX
    exact = ThetaSketch.from_hashes(hashes_for_ints(np.arange(100, dtype=np.int64)), lg_k=12)
    e2 = np.sort(exact.entries)
    v2p = struct.pack("<BBBBHH", 2, 2, 3, 0, 0, sh)
    v2p += struct.pack("<II", len(e2), 0) + e2.tobytes()
    got = theta_from_java_bytes(v2p, lg_k=12)
    assert got.theta == MAX_THETA and np.array_equal(np.sort(got.entries), e2)

    # v2 empty layout (pre_longs 1)
    v2e = struct.pack("<BBBBHH", 1, 2, 3, 0, 0, sh)
    got = theta_from_java_bytes(v2e)
    assert got.empty and len(got.entries) == 0

    # wrong seed hash rejected
    bad = struct.pack("<BBBBHH", 1, 2, 3, 0, 0, sh ^ 1)
    import pytest

    from raydedup.sketches.codec import CodecError

    with pytest.raises(CodecError):
        theta_from_java_bytes(bad)

    # corrupted entry (>= theta) rejected
    crooked = entries.copy()
    crooked[0] = np.uint64(theta)
    v1bad = struct.pack("<BBBBI", 3, 1, 3, 0, 0) + struct.pack("<II", len(crooked), 0)
    v1bad += struct.pack("<Q", theta) + crooked.tobytes()
    with pytest.raises(CodecError):
        theta_from_java_bytes(v1bad, lg_k=10)


def test_theta_dispatch_v3_v4():
    """The unified decoder dispatches to the existing v3/v4 paths."""
    import numpy as np

    from raydedup.sketches.theta import (
        ThetaSketch,
        hashes_for_ints,
        theta_from_java_bytes,
        theta_to_java_v4_bytes,
    )

    sk = ThetaSketch.from_hashes(hashes_for_ints(np.arange(3000, dtype=np.int64)), lg_k=9)
    for img in (sk.to_java_v3_bytes(), theta_to_java_v4_bytes(sk)):
        got = theta_from_java_bytes(img, lg_k=9)
        assert got.theta == sk.theta
        assert np.array_equal(np.sort(got.entries), np.sort(sk.entries))


# ---------------------------------------------------------------------------
# sequential ThetaMut: construction parity with the reference hash table
# ---------------------------------------------------------------------------


class _LiteralTable:
    """Literal per-value transcription of theta/hash_table.rs
    try_insert_hash / resize / rebuild — the parity oracle for
    ThetaMut's vectorized batch replay."""

    def __init__(self, lg_nom, lg_rf, p=1.0):
        from raydedup.sketches.theta import MAX_THETA, MIN_LG_K
        from raydedup.sketches.theta import _starting_sub_multiple as ssm

        self.lg_nom, self.lg_max, self.lg_rf = lg_nom, lg_nom + 1, lg_rf
        self.lg_cur = ssm(self.lg_max, MIN_LG_K, lg_rf)
        self.theta = MAX_THETA if p >= 1.0 else int(MAX_THETA * p)
        self.retained = set()
        self.is_empty = True

    def _capacity(self):
        frac = 0.5 if self.lg_cur <= self.lg_nom else 15.0 / 16.0
        return int(frac * (1 << self.lg_cur))

    def insert(self, h):
        self.is_empty = False
        if h == 0 or h >= self.theta or h in self.retained:
            return
        self.retained.add(h)
        if len(self.retained) > self._capacity():
            if self.lg_cur <= self.lg_nom:
                self.lg_cur = min(self.lg_cur + self.lg_rf, self.lg_max)
            else:
                ordered = sorted(self.retained)
                k = 1 << self.lg_nom
                self.theta = ordered[k]
                self.retained = set(ordered[:k])


@pytest.mark.parametrize("rf,lg_rf", [("X1", 0), ("X2", 1), ("X4", 2), ("X8", 3)])
def test_thetamut_matches_literal_sequential(rf, lg_rf):
    """Vectorized batch replay == one-at-a-time transcription: same
    retained set, theta, and table size, across uneven batch splits,
    duplicates, and every resize factor."""
    from raydedup.sketches.theta import ThetaMut

    rng = np.random.default_rng(7)
    stream = rng.integers(1, 1 << 62, size=4000, dtype=np.uint64)
    stream = np.concatenate([stream, stream[:1500]])  # duplicates
    rng.shuffle(stream)

    lit = _LiteralTable(5, lg_rf)
    for h in stream:
        lit.insert(int(h))

    sk = ThetaMut(lg_k=5, resize_factor=rf)
    for lo, hi in [(0, 17), (17, 1000), (1000, 1001), (1001, 5500)]:
        sk.update_hashes(stream[lo:hi])

    assert sk.theta == lit.theta
    assert sk.lg_cur == lit.lg_cur
    assert set(sk.retained.tolist()) == lit.retained
    assert not sk.is_empty and not lit.is_empty


def test_thetamut_sampling_and_screen():
    """p<1 starts theta at MAX*p (hash_table.rs:400-406); screened
    updates still clear the empty flag (hash_table.rs:177)."""
    from raydedup.sketches.theta import MAX_THETA, ThetaMut

    sk = ThetaMut(lg_k=8, p=0.5)
    assert sk.theta == int(MAX_THETA * 0.5)
    sk.update_hashes(np.array([MAX_THETA - 1], dtype=np.uint64))  # screened
    assert sk.num_retained() == 0 and not sk.is_empty
    assert sk.is_estimation_mode()


def test_thetamut_rebuild_keeps_k_smallest():
    """Mirror of hash_table.rs test_rebuild_preserves_entries_less_than_kth:
    after the first rebuild, exactly the 2^lg_k smallest inserted
    hashes survive and theta is the (k+1)-th smallest."""
    from raydedup.sketches.theta import ThetaMut, hashes_for_ints

    sk = ThetaMut(lg_k=5)
    hs = hashes_for_ints(np.arange(200, dtype=np.int64))
    # insert one at a time until the first rebuild fires
    inserted = []
    for h in hs:
        before = sk.theta
        sk.update_hashes(np.array([h], dtype=np.uint64))
        inserted.append(int(h))
        if sk.theta != before:
            break
    ordered = sorted(set(inserted))
    k = 1 << 5
    assert sk.theta == ordered[k]
    assert sk.retained.tolist() == ordered[:k]
    assert all(e < sk.theta for e in sk.retained.tolist())


def test_thetamut_trim_reset_compact():
    from raydedup.sketches.theta import ThetaMut, ThetaSketch, hashes_for_ints

    sk = ThetaMut(lg_k=5)
    sk.update_hashes(hashes_for_ints(np.arange(100, dtype=np.int64)))
    assert sk.num_retained() > 32
    sk.trim()
    assert sk.num_retained() == 32 and sk.is_estimation_mode()
    # compact feeds the existing algebra/serde unchanged
    c = sk.compact()
    assert isinstance(c, ThetaSketch)
    rt = ThetaSketch.from_bytes(c.to_bytes())
    assert rt.theta == sk.theta and len(rt.entries) == 32
    sk.reset()
    assert sk.is_empty and sk.num_retained() == 0 and sk.estimate() == 0.0


def test_thetamut_estimate_accuracy():
    """theta_sketch_test.rs:197-203 envelope: within 2% at lg_k=12, n=1e4."""
    from raydedup.sketches.theta import ThetaMut, hashes_for_ints

    sk = ThetaMut(lg_k=12)
    sk.update_hashes(hashes_for_ints(np.arange(10_000, dtype=np.int64)))
    assert abs(sk.estimate() - 10_000) / 10_000 < 0.02
