"""Column profiling: per-column row/null/distinct counts and numeric
min/max — the schema-survey pass a pipeline runs before trusting a new
table (the ``SUMMARIZE``/data-quality shape).

Scale design (100 TB lens):
- counts + min/max reduce in ONE map_batches pass to |columns| rows
  per block, then a |columns|-keyed groupby — the exchange is
  O(blocks · columns), never rows.
- distinct counts are EXACT via the engine's 128-bit value hashes:
  each block emits its DISTINCT (column, h1, h2) triples (map-side
  combine), one groupby over value triples dedups globally, and a
  second |columns|-keyed count collapses to the answer. The exchange
  carries distinct-value volume, the honest cost of exactness —
  ``HllSketch`` / ``CpcSketch`` remain the approximate alternative
  when a ±1% answer is enough.
- NULLs are excluded from distinct and min/max (SQL semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def histogram_fixed(ds, column: str, lo: float, width: float):
    """Fixed-width histogram → (bin, n) with bin = floor((x−lo)/width)
    — the distribution report next to ``profile_columns``. Each block
    collapses to its distinct (bin, count) pairs map-side (np.unique),
    so the one groupby exchange carries O(blocks · occupied-bins)
    rows; values outside any planned range keep their natural floor
    bin (no silent clamping). NULLs are dropped (SQL count semantics).
    The bin expression is the same two double ops an oracle runs, so
    bin assignment is bit-identical."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = col.drop_null()
        x = col.to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.floor((x - lo) / width).astype(np.int64)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(uniq), "n": pa.array(counts.astype(np.int64))}
        )

    agg = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.sort("bin")


def profile_columns(ds, columns: list[str]):
    """→ (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)
    sorted by col_name; min/max are DOUBLE for numeric columns, null
    otherwise."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def stats_partial(batch: pa.Table) -> pa.Table:
        names, nrows, nnull, mins, maxs = [], [], [], [], []
        for c in columns:
            col = batch[c]
            names.append(c)
            nrows.append(len(col))
            nnull.append(col.null_count)
            if _is_numeric(col.type) and len(col) > col.null_count:
                mm = pc.min_max(col)
                mins.append(float(mm["min"].as_py()))
                maxs.append(float(mm["max"].as_py()))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n_rows": pa.array(nrows, pa.int64()),
                "n_nulls": pa.array(nnull, pa.int64()),
                "min_num": pa.array(mins, pa.float64()),
                "max_num": pa.array(maxs, pa.float64()),
            }
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
        )
        .to_pandas()
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        names, h1s, h2s = [], [], []
        for c in columns:
            col = batch[c].combine_chunks() if isinstance(batch[c], pa.ChunkedArray) else batch[c]
            col = col.drop_null()
            if len(col) == 0:
                continue
            h1, h2 = _column_hashes(col)
            # block-local dedup before the exchange (map-side combine)
            order = np.lexsort((h2, h1))
            h1, h2 = h1[order], h2[order]
            keep = np.ones(len(h1), dtype=bool)
            keep[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
            names.append(np.full(int(keep.sum()), c, dtype=object))
            h1s.append(h1[keep])
            h2s.append(h2[keep])
        if not names:
            return pa.table(
                {
                    "col_name": pa.array([], pa.string()),
                    "h1": pa.array([], pa.int64()),
                    "h2": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "col_name": pa.array(np.concatenate(names), pa.string()),
                "h1": pa.array(np.concatenate(h1s).view(np.int64)),
                "h2": pa.array(np.concatenate(h2s).view(np.int64)),
            }
        )

    distinct = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["col_name", "h1", "h2"])
        .aggregate(Count(alias_name="_n"))
        .groupby("col_name")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
    )
    out = stats.merge(distinct, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[["col_name", "n_rows", "n_nulls", "n_distinct", "min_num", "max_num"]]
    return pa.Table.from_pandas(out.sort_values("col_name").reset_index(drop=True))
