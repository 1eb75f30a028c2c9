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

    def in_window(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~np.isnan(v) & (v >= lo) & (v <= hi)
        return pa.table({column: pa.array(v[m], pa.float64())})

    vals = (
        ds.select_columns([column])
        .map_batches(in_window, batch_format="pyarrow")
        .to_pandas()[column]
        .to_numpy()
    )
    # guard: histogram edges and the filter use the same float math, so
    # the window holds exactly `in_range` rows and rank k_in is inside it
    assert 1 <= k_in <= len(vals), (k_in, len(vals), lo, hi)
    return float(np.partition(vals, k_in - 1)[k_in - 1])
