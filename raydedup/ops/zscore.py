"""Per-group z-score normalization: two-pass broadcast normalize.

Pass 1 reduces the dataset to one exact integer moment row per group
(n, Σc, Σc² in scaled integer units, int128 emulated as hi/lo int64
pairs — the discipline of ops/stats.py); pass 2 broadcasts that tiny
table (``ray.put`` once, read zero-copy by every map task) and rewrites
every row with ``z = (c − Σc/n) / sqrt((Σc² − Σc·Σc/n)/(n−1))`` as ONE
fixed left-to-right double expression, so a SQL oracle mirroring the
same expression over the same exact integer sums reproduces the values
bit-for-bit (before the shared 6-decimal rounding).

Scale design (100 TB lens):
- The group-stats side is bounded by the number of groups, not rows —
  the partial collapses each block map-side, the exchange carries one
  row per (block, group), and the finished table is broadcast instead
  of shuffle-joined back (the classic small-side lookup) — but ONLY
  while it fits ``BROADCAST_GROUP_CAP`` (shared policy, ops/stats.py):
  the gather streams with an early bail, and past the cap the op runs
  ``_zscore_cogroup`` — one bucketed full-row exchange whose kernel
  owns each group outright. Corpus-shaped group domains never land on
  the driver.
- The normalize pass is stateless, embarrassingly parallel, and
  streams: no sort, no shuffle, no materialization of the input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.ops.stats import _hilo, _MASK32, BROADCAST_GROUP_CAP, gather_capped


def grouped_zscore(
    ds,
    group: str,
    x: str,
    decimals: int = 2,
    z_col: str = "z",
    broadcast_cap: int = BROADCAST_GROUP_CAP,
):
    """→ the input rows (all columns) plus ``z_col``: the per-``group``
    z-score of ``x`` (sample stddev, n−1), NULL for groups with fewer
    than 2 rows or zero variance. Values round to 6 decimals."""
    import ray
    from ray.data.aggregate import Sum

    scale = float(10**decimals)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group].to_numpy(zero_copy_only=False)
        c = np.rint(
            batch[x].to_numpy(zero_copy_only=False).astype(np.float64) * scale
        ).astype(np.int64)
        codes, uniq = pd.factorize(g, sort=False)
        s_hi, s_lo = _hilo(c)
        ss_hi, ss_lo = _hilo(c * c)
        sums = (
            pd.DataFrame(
                {
                    "_g": codes,
                    "n_rows": np.ones(len(codes), np.int64),
                    "_s_hi": s_hi,
                    "_s_lo": s_lo,
                    "_ss_hi": ss_hi,
                    "_ss_lo": ss_lo,
                }
            )
            .groupby("_g", sort=False)
            .sum()
        )
        out = {group: pa.array(uniq), "n_rows": pa.array(sums["n_rows"].to_numpy())}
        for stem in ("s", "ss"):
            hi = sums[f"_{stem}_hi"].to_numpy()
            lo = sums[f"_{stem}_lo"].to_numpy()
            hi = hi + (lo >> np.int64(32))
            lo = lo & _MASK32
            out[f"_{stem}_hi"] = pa.array(hi)
            out[f"_{stem}_lo"] = pa.array(lo)
        return pa.table(out)

    stats_ds = (
        ds.select_columns([group, x])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group)
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("_s_hi", alias_name="_s_hi"),
            Sum("_s_lo", alias_name="_s_lo"),
            Sum("_ss_hi", alias_name="_ss_hi"),
            Sum("_ss_lo", alias_name="_ss_lo"),
        )
        .materialize()
    )
    # shared small-side policy (ops/stats.py BROADCAST_GROUP_CAP): the
    # group table gathers with an early bail at the cap — broadcast is
    # worth a capped gather here because it keeps the normalize pass
    # map-only (zero data-row shuffle); past the cap fall back to ONE
    # bucketed full-row exchange whose kernel owns each group outright
    gathered = gather_capped(stats_ds, broadcast_cap)
    if gathered is None:
        return _zscore_cogroup(ds, group, x, scale, z_col)
    stats = gathered.to_pylist()

    keys = np.array([r[group] for r in stats])
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    mean = np.empty(len(keys), np.float64)
    std = np.empty(len(keys), np.float64)
    for j, i in enumerate(order):
        r = stats[i]
        n = int(r["n_rows"])
        s = (int(r["_s_hi"]) << 32) + int(r["_s_lo"])
        ss = (int(r["_ss_hi"]) << 32) + int(r["_ss_lo"])
        mean[j] = float(s) / float(n)
        if n < 2:
            std[j] = np.nan
            continue
        var = (float(ss) - float(s) * float(s) / float(n)) / float(n - 1)
        std[j] = np.sqrt(var) if var > 0.0 else np.nan
    lookup_ref = ray.put((keys, mean, std))

    def normalize(batch: pa.Table) -> pa.Table:
        lk, lm, ls = ray.get(lookup_ref)
        g = batch[group].to_numpy(zero_copy_only=False)
        c = np.rint(
            batch[x].to_numpy(zero_copy_only=False).astype(np.float64) * scale
        ).astype(np.int64)
        codes, uniq = pd.factorize(g, sort=False)
        pos_u = np.searchsorted(lk, uniq)  # probe distinct keys, not rows
        if (lk[np.minimum(pos_u, len(lk) - 1)] != uniq).any():
            raise ValueError("grouped_zscore: group key missing from stats pass")
        pos = pos_u[codes]
        z = np.round((c.astype(np.float64) - lm[pos]) / ls[pos], 6)
        return batch.append_column(z_col, pa.array(z, pa.float64()))

    return ds.map_batches(normalize, batch_format="pyarrow")


def _zscore_cogroup(
    ds, group: str, x: str, scale: float, z_col: str, n_buckets: int | None = None
):
    """Group-count-unbounded z-score: bucket the FULL rows on
    hash(group) so each kernel owns every row of its groups, derive the
    exact integer moments in-kernel with the same hi/lo int128
    discipline, and emit the rows plus ``z_col`` — identical float
    expressions to the broadcast path (``(float(ss) −
    float(s)·float(s)/float(n)) / float(n−1)`` from exact integer sums),
    so the two paths agree bit-for-bit before rounding. One data-row
    exchange, no driver state of any size."""

    from raydedup.ops._bucketed import (
        column_np,
        factorize,
        hash_bucket_appender,
        resolve_buckets,
    )

    n_buckets = resolve_buckets(ds, n_buckets, floor=256)
    add_bucket = hash_bucket_appender(group, n_buckets, "_gb")

    def kernel(g: pa.Table) -> pa.Table:
        out = g.select([c for c in g.column_names if c != "_gb"])
        c = np.rint(column_np(g[x]).astype(np.float64) * scale).astype(np.int64)
        codes = factorize(g[group])
        order = np.argsort(codes, kind="stable")
        cs = c[order]
        seg = codes[order]
        new = np.ones(len(seg), bool)
        new[1:] = seg[1:] != seg[:-1]
        starts = np.nonzero(new)[0]
        s_hi, s_lo = _hilo(cs)
        ss_hi, ss_lo = _hilo(cs * cs)
        n = np.diff(np.append(starts, len(seg))).astype(np.int64)
        sums = {}
        for stem, (hi, lo) in (("s", (s_hi, s_lo)), ("ss", (ss_hi, ss_lo))):
            hi_s = np.add.reduceat(hi, starts)
            lo_s = np.add.reduceat(lo, starts)
            # exact int128 per group: object ints, then ONE correctly-
            # rounded float conversion (matches the broadcast path's
            # Python-int -> float rounding)
            sums[stem] = (hi_s.astype(object) << 32) + lo_s.astype(object)
        f_n = n.astype(np.float64)
        f_s = np.array([float(v) for v in sums["s"]], np.float64)
        f_ss = np.array([float(v) for v in sums["ss"]], np.float64)
        mean = f_s / f_n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (f_ss - f_s * f_s / f_n) / (f_n - 1.0)
        std = np.where((n >= 2) & (var > 0.0), np.sqrt(np.maximum(var, 0.0)), np.nan)
        # per original row: seg id of codes indexes the per-group arrays
        by_code_mean = np.empty(len(starts), np.float64)
        by_code_std = np.empty(len(starts), np.float64)
        by_code_mean[seg[starts]] = mean
        by_code_std[seg[starts]] = std
        z = np.round((c.astype(np.float64) - by_code_mean[codes]) / by_code_std[codes], 6)
        return out.append_column(z_col, pa.array(z))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(kernel, batch_format="pyarrow")
    )
