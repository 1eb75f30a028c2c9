"""ROLLUP (hierarchical grouping-sets) aggregate: one result row per
prefix level of the group columns — (a, b), (a, ALL), (ALL, ALL) —
the report-cube shape of ``GROUP BY ROLLUP`` in SQL.

Scale design (100 TB lens):
- ONE pass over the data: blocks collapse map-side to per-(block,
  finest-group) integer partial sums, and the single corpus-sized
  exchange is the finest-level groupby.
- Every coarser level re-aggregates the PREVIOUS level's result — a
  groups-sized dataset, not the corpus — so adding levels costs
  exchanges over group counts only.
- Rolled-up columns carry an explicit ``'ALL'`` sentinel (no NULL
  ambiguity across engines); values accumulate as integers at
  ``decimals`` places, exact under any blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def cube_sum(
    ds,
    group_cols: list[str],
    value_cols: dict[str, int],
    sentinel: str = "ALL",
):
    """GROUP BY CUBE: every subset of ``group_cols`` as a grouping
    set (2^m sets — keep m small, it is the report shape, not a data
    axis). Same one-corpus-pass design as ``rollup_sum``: the finest
    level is the only corpus-sized exchange; every other set
    re-aggregates the finest (groups-sized) result."""
    from itertools import combinations

    sets = []
    for r in range(len(group_cols) - 1, -1, -1):
        sets.extend(combinations(group_cols, r))
    return grouping_sets_sum(ds, group_cols, value_cols, sets, sentinel)


def grouping_sets_sum(
    ds,
    group_cols: list[str],
    value_cols: dict[str, int],
    sets: list[tuple[str, ...]],
    sentinel: str = "ALL",
):
    """GROUPING SETS: the finest (all-columns) level plus one level
    per entry of ``sets`` (each a tuple of kept columns), every extra
    level re-aggregated from the finest level only. Rolled-up columns
    carry ``sentinel``; integer accumulation as in ``rollup_sum``."""
    from ray.data.aggregate import Sum

    vals = list(value_cols)
    finest = _finest_level(ds, group_cols, value_cols)
    aggs = [Sum(f"_s_{v}", alias_name=f"_s_{v}") for v in vals] + [
        Sum("n_rows", alias_name="n_rows")
    ]

    levels = [finest]
    for keep in sets:
        drop = [c for c in group_cols if c not in keep]

        def blank(batch: pa.Table, drop=tuple(drop)) -> pa.Table:
            for col in drop:
                i = batch.column_names.index(col)
                batch = batch.set_column(
                    i, col, pa.array([sentinel] * batch.num_rows, pa.string())
                )
            return batch

        blanked = finest.map_batches(blank, batch_format="pyarrow")
        if keep:
            # group over ALL group cols: blanked ones are a constant
            # sentinel, so the key cardinality is that of `keep`, and
            # every output row keeps the full column set
            levels.append(blanked.groupby(group_cols).aggregate(*aggs))
        else:
            row = blanked.aggregate(*aggs)
            tot = {c: pa.array([sentinel], pa.string()) for c in group_cols}
            for v in vals:
                tot[f"_s_{v}"] = pa.array([int(row[f"_s_{v}"] or 0)], pa.int64())
            tot["n_rows"] = pa.array([int(row["n_rows"] or 0)], pa.int64())
            import ray.data as rd

            levels.append(rd.from_arrow(pa.table(tot)))

    out = levels[0]
    for l in levels[1:]:
        out = out.union(l)
    return _finalize_levels(out, group_cols, value_cols).sort(group_cols)


def _finest_level(ds, group_cols, value_cols):
    """One corpus pass → materialized per-group integer sums at the
    finest grouping (map-side per-(block, group) partials, one
    corpus-sized groupby)."""
    from ray.data.aggregate import Sum

    vals = list(value_cols)

    def partial(batch: pa.Table) -> pa.Table:
        keys = [batch[c].to_numpy(zero_copy_only=False) for c in group_cols]
        codes, uniq = pd.factorize(pd.MultiIndex.from_arrays(keys), sort=False)
        cols = {}
        for c, lvl in zip(group_cols, range(len(group_cols))):
            cols[c] = pa.array([u[lvl] for u in uniq], pa.string())
        for v in vals:
            cents = np.rint(
                batch[v].to_numpy(zero_copy_only=False) * float(10 ** value_cols[v])
            ).astype(np.int64)
            cols[f"_s_{v}"] = pa.array(
                np.bincount(codes, weights=cents, minlength=len(uniq)).astype(np.int64)
            )
        cols["n_rows"] = pa.array(
            np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        )
        return pa.table(cols)

    aggs = [Sum(f"_s_{v}", alias_name=f"_s_{v}") for v in vals] + [
        Sum("n_rows", alias_name="n_rows")
    ]
    return (
        ds.select_columns(group_cols + vals)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols)
        .aggregate(*aggs)
        .materialize()
    )


def _finalize_levels(out, group_cols, value_cols):
    vals = list(value_cols)

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in group_cols}
        for v in vals:
            s = batch[f"_s_{v}"].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"sum_{v}"] = pa.array(s / float(10 ** value_cols[v]), pa.float64())
        cols["n_rows"] = batch["n_rows"]
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def rollup_sum(
    ds,
    group_cols: list[str],
    value_cols: dict[str, int],
    sentinel: str = "ALL",
):
    """→ one row per ROLLUP level with ``sum_<col>`` (float, scaled
    back from exact integer sums) and ``n_rows`` per group; rolled-up
    group columns hold ``sentinel``. Levels: len(group_cols) (finest)
    down to 0 (grand total)."""
    from ray.data.aggregate import Sum

    vals = list(value_cols)

    def partial(batch: pa.Table) -> pa.Table:
        keys = [batch[c].to_numpy(zero_copy_only=False) for c in group_cols]
        codes, uniq = pd.factorize(pd.MultiIndex.from_arrays(keys), sort=False)
        cols = {}
        for c, lvl in zip(group_cols, range(len(group_cols))):
            cols[c] = pa.array([u[lvl] for u in uniq], pa.string())
        for v in vals:
            cents = np.rint(
                batch[v].to_numpy(zero_copy_only=False) * float(10 ** value_cols[v])
            ).astype(np.int64)
            cols[f"_s_{v}"] = pa.array(np.bincount(codes, weights=cents, minlength=len(uniq)).astype(np.int64))
        cols["n_rows"] = pa.array(
            np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        )
        return pa.table(cols)

    aggs = [Sum(f"_s_{v}", alias_name=f"_s_{v}") for v in vals] + [
        Sum("n_rows", alias_name="n_rows")
    ]
    finest = (
        ds.select_columns(group_cols + vals)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols)
        .aggregate(*aggs)
        .materialize()
    )

    levels = [finest]
    prev = finest
    # each coarser level re-aggregates the previous (groups-sized) level
    for drop in range(len(group_cols) - 1, -1, -1):
        col = group_cols[drop]

        def blank(batch: pa.Table, col=col) -> pa.Table:
            i = batch.column_names.index(col)
            return batch.set_column(
                i, col, pa.array([sentinel] * batch.num_rows, pa.string())
            )

        blanked = prev.map_batches(blank, batch_format="pyarrow")
        if drop == 0:
            # grand total: single group — one aggregate, no groupby key
            row = blanked.aggregate(*aggs)
            tot = {c: pa.array([sentinel], pa.string()) for c in group_cols}
            for v in vals:
                tot[f"_s_{v}"] = pa.array([int(row[f"_s_{v}"] or 0)], pa.int64())
            tot["n_rows"] = pa.array([int(row["n_rows"] or 0)], pa.int64())
            import ray.data as rd

            lvl_ds = rd.from_arrow(pa.table(tot))
        else:
            lvl_ds = blanked.groupby(group_cols).aggregate(*aggs)
        levels.append(lvl_ds)
        prev = lvl_ds

    out = levels[0]
    for l in levels[1:]:
        out = out.union(l)

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in group_cols}
        for v in vals:
            s = batch[f"_s_{v}"].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"sum_{v}"] = pa.array(s / float(10 ** value_cols[v]), pa.float64())
        cols["n_rows"] = batch["n_rows"]
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow").sort(group_cols)
