"""Exact distributed order statistics by histogram bisection.

``exact_quantile`` returns the exact k-th smallest value of a column
(k = ceil(q*n), the discrete-quantile definition DuckDB's
``quantile_disc`` uses) WITHOUT a global sort: each round is one
map-only scan emitting a fixed-width histogram partial (tree-combined
by Ray's aggregate — the driver sees ``bins`` numbers, never rows),
the driver walks the cumulative counts to the bin holding rank k and
narrows the value range; when the surviving range holds few enough
rows, one filter pass materializes just those and ``np.partition``
finishes exactly.

Scale design: no shuffle at any corpus size — every round is a scan +
tree reduce, and the materialized remainder is bounded by
``max_materialize`` regardless of input size (range count shrinks
~``bins``x per round for spread-out data; all-equal ranges terminate
via the width==0 check). Iteration count is bounded by float precision
(a 52-bit mantissa halves in <= ~64 rounds), typically 2-3 rounds at
bins=4096.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _hist_partials(ds, column: str, lo: float, hi: float, bins: int):
    """One scan: per-block histogram of values in [lo, hi] plus the
    count below lo — tree-combined into a single (bins+1)-cell image."""
    from ray.data.aggregate import AggregateFnV2

    width = (hi - lo) / bins

    class Hist(AggregateFnV2):
        def __init__(self):
            super().__init__(
                "hist", zero_factory=lambda: None, on=column, ignore_nulls=True
            )

        def aggregate_block(self, block) -> bytes:
            v = block.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = int((v < lo).sum())
            inr = v[(v >= lo) & (v <= hi)]
            if width > 0:
                idx = np.minimum(((inr - lo) / width).astype(np.int64), bins - 1)
            else:
                idx = np.zeros(len(inr), dtype=np.int64)
            h = np.bincount(idx, minlength=bins).astype(np.int64)
            return np.concatenate([[below], h]).tobytes()

        def combine(self, a, b):
            if a is None:
                return b
            if b is None:
                return a
            return (
                np.frombuffer(a, np.int64) + np.frombuffer(b, np.int64)
            ).tobytes()

        def finalize(self, a):
            return a

    out = ds.aggregate(Hist())
    blob = out["hist"] if isinstance(out, dict) else out
    return np.frombuffer(blob, np.int64)


def exact_quantile(
    ds,
    column: str,
    q: float,
    bins: int = 4096,
    max_materialize: int = 1 << 20,
) -> float:
    """Exact discrete quantile (value at rank ceil(q*n), 1-based)."""
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(
        Min(column, alias_name="lo"),
        Max(column, alias_name="hi"),
        Count(column, alias_name="n"),
    )
    lo, hi, n = float(agg["lo"]), float(agg["hi"]), int(agg["n"])
    if n == 0:
        return float("nan")
    k = min(max(int(math.ceil(q * n)), 1), n)  # rank within the full column

    in_range = n  # rows in [lo, hi]
    # rank of the target within the current [lo, hi] slice
    k_in = k
    for _ in range(64):
        if lo == hi or in_range <= max_materialize:
            break
        cells = _hist_partials(ds, column, lo, hi, bins)
        hist = cells[1:]
        # target sits at rank k_in among in-range values (ascending)
        cum = np.cumsum(hist)
        b = int(np.searchsorted(cum, k_in))
        width = (hi - lo) / bins
        new_lo = lo + b * width
        new_hi = hi if b == bins - 1 else lo + (b + 1) * width
        k_in = k_in - (int(cum[b - 1]) if b > 0 else 0)
        in_range = int(hist[b])
        lo, hi = new_lo, new_hi
        if in_range == 0:  # numeric-edge safety; cannot happen logically
            break
    if lo == hi:
        return lo

    # Final pass: ONE aggregate returns BOTH the in-window values and
    # the exact count of values strictly below the window, so the final
    # rank (k - below) derives from the SAME comparisons that select
    # the window — never from the histogram cells, whose floor-binned
    # edges can disagree with a range compare by a ULP and silently
    # shift the rank (round-3 advice). Edges are padded a few ULPs
    # outward first so every value the histogram placed in the chosen
    # bin passes the range compare; stragglers from neighboring bins
    # merely enlarge the window and are re-ranked exactly.
    for _ in range(4):
        lo = float(np.nextafter(lo, -np.inf))
        hi = float(np.nextafter(hi, np.inf))
    below, vals = _window_gather(ds, column, lo, hi)
    assert below < k <= below + len(vals), (below, k, len(vals), lo, hi)
    return float(np.partition(vals, k - below - 1)[k - below - 1])


def _window_gather(ds, column: str, lo: float, hi: float):
    """One tree-combined pass → (count of values < lo, ndarray of
    values in [lo, hi]). The window side is bounded by the caller's
    ``max_materialize`` (plus ULP-edge stragglers)."""
    from ray.data.aggregate import AggregateFnV2

    class Window(AggregateFnV2):
        def __init__(self):
            super().__init__(
                "window", zero_factory=lambda: None, on=column, ignore_nulls=True
            )

        def aggregate_block(self, block) -> bytes:
            v = block.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = float((v < lo).sum())
            inw = v[(v >= lo) & (v <= hi)]
            return np.concatenate([[below], inw]).tobytes()

        def combine(self, a, b):
            if a is None:
                return b
            if b is None:
                return a
            va, vb = np.frombuffer(a, np.float64), np.frombuffer(b, np.float64)
            return np.concatenate([[va[0] + vb[0]], va[1:], vb[1:]]).tobytes()

        def finalize(self, a):
            return a

    out = ds.aggregate(Window())
    blob = out["window"] if isinstance(out, dict) else out
    arr = np.frombuffer(blob, np.float64)
    return int(arr[0]), arr[1:]
