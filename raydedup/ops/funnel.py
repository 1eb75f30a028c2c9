"""Funnel analysis: how far each key progresses through an ORDERED
sequence of event types (view → click → purchase), where step k must
happen strictly after the first completion of step k−1 — the
behavioral-sequence operator over an event log.

Scale design (100 TB lens):
- map-side filter keeps only the funnel's event types (3 of N), so
  the single exchange carries (key, ts, step-index) rows for relevant
  events only;
- keys coarse-bucket on ``hash(key) % n_buckets`` (every key's rows
  co-locate) and ONE kernel per bucket resolves all keys: step k's
  first-completion time is a vectorized groupby-min over step-k rows
  that pass the ``ts > t_{k-1}`` filter — never a per-key Python loop;
- output is one (key, stage) row per key with at least one relevant
  event; stage = number of steps completed in order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def funnel_stages(
    ds,
    key: str,
    ts: str,
    type_col: str,
    steps: list[str],
    n_buckets: int | None = None,
):
    """→ (key, stage) with stage ∈ [0, len(steps)]: the longest prefix
    of ``steps`` completed in strict temporal order (first-completion
    semantics; step k counts only if its earliest occurrence after
    step k−1's completion time exists)."""
    from raydedup.ops._bucketed import resolve_buckets

    step_list = list(steps)
    n_buckets = resolve_buckets(ds, n_buckets)

    def keep_and_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        mask = pc.is_in(batch[type_col], value_set=pa.array(step_list))
        batch = batch.filter(mask)
        h1, _ = (
            _column_hashes(batch[key])
            if len(batch)
            else (np.empty(0, np.uint64), None)
        )
        return pa.table(
            {
                key: batch[key],
                ts: batch[ts],
                type_col: batch[type_col],
                "_fbucket": pa.array((h1 % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    def funnel_bucket(g: pa.Table) -> pa.Table:
        from raydedup.ops._bucketed import column_np, ts_us

        t = ts_us(g[ts])
        typ = column_np(g[type_col])
        keys = column_np(g[key])
        uniq, uniq_idx, codes = np.unique(keys, return_index=True, return_inverse=True)
        stage = np.zeros(len(uniq), dtype=np.int64)
        # completion time of the last completed step per key
        t_prev = np.full(len(uniq), -(2**62), dtype=np.int64)
        alive = np.ones(len(uniq), dtype=bool)
        for k, s in enumerate(step_list):
            rows = (typ == s) & alive[codes] & (t > t_prev[codes])
            if not rows.any():
                break
            # first occurrence of step s after the key's previous step
            t_step = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(t_step, codes[rows], t[rows])
            done = t_step < np.iinfo(np.int64).max
            stage[done & alive] = k + 1
            alive = alive & done
            t_prev = np.where(done, t_step, t_prev)
        return pa.table(
            {
                key: g[key].combine_chunks().take(pa.array(uniq_idx)),
                "stage": pa.array(stage),
            }
        )

    return (
        ds.select_columns([key, ts, type_col])
        .map_batches(keep_and_bucket, batch_format="pyarrow")
        .groupby("_fbucket")
        .map_groups(funnel_bucket, batch_format="pyarrow")
    )
