"""Pivot (long → wide) aggregate: one output row per index key, one
column per category, cells = sum of ``value`` — the report/feature
matrix shape (``SUM(CASE WHEN ...)`` in SQL).

Scale design (100 TB lens):
- Categories are an EXPLICIT argument: the output schema of a pivot
  must be known up front to be distributable (discovering them is one
  tiny ``groupby(pivot_col).count()`` the caller can run; an unbounded
  category set is a different operator). Category count bounds the
  row width, so keep it O(100).
- Map-side completion: each block collapses to at most one wide row
  per distinct index key in the block (factorize + per-category
  bincount — no per-key groups), so the single groupby exchange
  carries |keys-per-block| wide rows, never events.
- Values accumulate as integers at ``decimals`` places → sums are
  exact under any blocking (same discipline as cumulative_per_key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pivot_sum(
    ds,
    index: str,
    pivot_col: str,
    value: str,
    categories: list[str],
    decimals: int = 2,
):
    """→ (index, <category>...) with cell = Σ value where pivot_col ==
    category, 0 when absent; one row per distinct index key."""
    from ray.data.aggregate import Sum

    scale = float(10**decimals)
    cats = list(categories)

    def partial(batch: pa.Table) -> pa.Table:
        idx = batch[index].to_numpy(zero_copy_only=False)
        piv = batch[pivot_col].to_numpy(zero_copy_only=False)
        cents = np.rint(batch[value].to_numpy(zero_copy_only=False) * scale).astype(
            np.int64
        )
        codes, uniq = pd.factorize(idx, sort=False)
        cols = {index: pa.array(uniq)}
        for c in cats:
            mask = piv == c
            s = np.bincount(codes[mask], weights=cents[mask], minlength=len(uniq))
            cols[f"_s_{c}"] = pa.array(s.astype(np.int64))
        return pa.table(cols)

    agg = (
        ds.select_columns([index, pivot_col, value])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(index)
        .aggregate(*[Sum(f"_s_{c}", alias_name=f"_s_{c}") for c in cats])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {index: batch[index]}
        for c in cats:
            s = batch[f"_s_{c}"].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[c] = pa.array(s / scale, pa.float64())
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")
