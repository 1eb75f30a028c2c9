"""theta_a_not_b (the DataSketches AnotB op, absent from the Rust
reference): exact-mode equality to true set difference, algebra
identities, estimation-mode accuracy, and the overlap op built on it."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.ops.overlap import source_unique_grams_local
from raydedup.sketches.theta import (
    ThetaSketch,
    theta_a_not_b,
    theta_intersect,
    theta_union,
)

U64 = np.uint64
GOLD = U64(0x9E3779B97F4A7C15)


def _h(lo, hi):
    """Deterministic uniform-ish 63-bit hashes for ints [lo, hi)."""
    v = (np.arange(lo, hi, dtype=np.uint64) + U64(1)) * GOLD
    return v >> U64(1)


def test_exact_mode_matches_true_difference():
    a = ThetaSketch.from_hashes(_h(0, 3000), lg_k=14)   # exact (< 2^14)
    b = ThetaSketch.from_hashes(_h(2000, 5000), lg_k=14)
    d = theta_a_not_b(a, b)
    assert not d.is_estimation_mode
    assert d.estimate() == 2000.0  # |[0,3000) \ [2000,5000)|
    # and the reverse
    assert theta_a_not_b(b, a).estimate() == 2000.0


def test_identities():
    a = ThetaSketch.from_hashes(_h(0, 4000), lg_k=10)  # estimation mode
    e = ThetaSketch.new_empty(10)
    # A \ A = empty set (estimate 0), non-empty flag preserved
    assert theta_a_not_b(a, a).estimate() == 0.0
    # A \ empty = A (rescreened; same estimate)
    assert theta_a_not_b(a, e).estimate() == pytest.approx(a.estimate())
    # empty \ A = empty
    d = theta_a_not_b(e, a)
    assert d.empty and d.estimate() == 0.0
    # partition: |A\B| + |A∩B| ≈ |A| (exactly, at the common theta)
    b = ThetaSketch.from_hashes(_h(2000, 6000), lg_k=10)
    theta = min(a.theta, b.theta)
    n_a_at_theta = (a.entries < U64(theta)).sum()
    assert (
        theta_a_not_b(a, b).num_retained + theta_intersect(a, b).num_retained
        == n_a_at_theta
    )


def test_estimation_mode_accuracy():
    a = ThetaSketch.from_hashes(_h(0, 60_000), lg_k=12)
    b = ThetaSketch.from_hashes(_h(40_000, 100_000), lg_k=12)
    d = theta_a_not_b(a, b)
    assert d.is_estimation_mode
    # true |A\B| = 40_000; theta RSE at k=4096 is ~1.6%, allow 4 sigma
    assert abs(d.estimate() - 40_000) / 40_000 < 0.065


def test_union_of_difference_and_intersection_rebuilds_a():
    a = ThetaSketch.from_hashes(_h(0, 30_000), lg_k=11)
    b = ThetaSketch.from_hashes(_h(10_000, 50_000), lg_k=11)
    u = theta_union([theta_a_not_b(a, b), theta_intersect(a, b)])
    assert abs(u.estimate() - a.estimate()) / a.estimate() < 0.05


def test_source_unique_grams_planted():
    """Source C shares nothing -> its unique estimate ~= its distinct
    gram count; A and B (heavy mutual overlap) sit far lower."""
    rng = np.random.default_rng(8)
    words = [f"w{i}" for i in range(600)]
    shared = [" ".join(rng.choice(words, size=60).tolist()) for _ in range(30)]
    rows_s, rows_t = [], []
    for s in ("A", "B"):
        for t in shared:
            rows_s.append(s)
            rows_t.append(t)
    for i in range(30):
        rows_s.append("C")
        rows_t.append(" ".join(rng.choice(words, size=60).tolist()))
    tbl = pa.table({"source": pa.array(rows_s), "text": pa.array(rows_t)})
    out = source_unique_grams_local(tbl, lg_k=14)  # exact mode at this size
    est = dict(zip(out["source"].to_pylist(), out["n_unique_est"].to_pylist()))
    assert est["A"] == 0.0 and est["B"] == 0.0  # verbatim copies of each other
    assert est["C"] > 1000  # ~30 docs * ~56 grams, minus rare collisions
