"""Cross-source overlap (ops/overlap.py): split-invariance of the
partial-union path and sanity of the Jaccard estimates on planted
overlap."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.ops.overlap import (
    pairwise_jaccard_table,
    source_overlap_local,
    source_sketch_partials,
)
from raydedup.sketches.theta import ThetaSketch, jaccard_estimate, theta_union


def _corpus(n_per_source=40, seed=3):
    """Three sources: A and B share half their docs verbatim, C is
    disjoint."""
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(800)]
    rows_src, rows_txt = [], []
    shared = [" ".join(rng.choice(words, size=50).tolist()) for _ in range(n_per_source // 2)]
    for s, pool in (("A", shared), ("B", shared), ("C", [])):
        for i in range(n_per_source):
            if i < len(pool):
                t = pool[i]
            else:
                t = " ".join(rng.choice(words, size=50).tolist())
            rows_src.append(s)
            rows_txt.append(t)
    return pa.table({"source": pa.array(rows_src), "text": pa.array(rows_txt)})


def test_partial_union_bit_identical_to_whole_set():
    """theta_union over per-block partials == from_hashes over the full
    per-source gram set, for any blocking (the sidecar's exactness
    claim) — checked at a small lg_k so estimation mode engages."""
    tbl = _corpus()
    for n_blocks in (1, 3, 7):
        merged: dict[str, list] = {}
        for chunk in np.array_split(np.arange(tbl.num_rows), n_blocks):
            part = source_sketch_partials(tbl.slice(int(chunk[0]), len(chunk)), lg_k=5)
            for s, b in zip(part["source"].to_pylist(), part["sketch"].to_pylist()):
                merged.setdefault(s, []).append(ThetaSketch.from_bytes(b))
        got = pairwise_jaccard_table({s: theta_union(v) for s, v in merged.items()})
        exp = source_overlap_local(tbl, lg_k=5)
        assert got.equals(exp), f"blocking {n_blocks} diverged"
        # estimation mode must actually engage for the test to bite
        assert any(theta_union(v).is_estimation_mode for v in merged.values())


def test_planted_overlap_ordering():
    tbl = _corpus()
    out = source_overlap_local(tbl, lg_k=12)
    j = {
        (a, b): v
        for a, b, v in zip(
            out["source_a"].to_pylist(),
            out["source_b"].to_pylist(),
            out["jaccard_est"].to_pylist(),
        )
    }
    assert j[("A", "B")] > 0.3  # half the docs are shared verbatim
    assert j[("A", "C")] < 0.05 and j[("B", "C")] < 0.05
    assert len(j) == 3  # S*(S-1)/2 pairs, a < b


def test_jaccard_estimate_identity_and_disjoint():
    h = np.arange(1, 5000, dtype=np.uint64) * np.uint64(2654435761)
    a = ThetaSketch.from_hashes(h >> np.uint64(1), lg_k=6)
    assert jaccard_estimate(a, a) == pytest.approx(1.0)
    h2 = (np.arange(6000, 11000, dtype=np.uint64)) * np.uint64(2654435761)
    b = ThetaSketch.from_hashes(h2 >> np.uint64(1), lg_k=6)
    assert jaccard_estimate(a, b) < 0.05
