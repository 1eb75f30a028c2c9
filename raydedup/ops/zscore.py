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
  of shuffle-joined back (the classic small-side lookup).
- The normalize pass is stateless, embarrassingly parallel, and
  streams: no sort, no shuffle, no materialization of the input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.ops.stats import _hilo, _MASK32


def grouped_zscore(ds, group: str, x: str, decimals: int = 2, z_col: str = "z"):
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

    stats = (
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
        .take_all()  # bounded by the number of groups (small side)
    )

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
