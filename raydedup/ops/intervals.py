"""Per-key interval coalescing (merge overlapping/touching intervals).

Gaps-and-islands over explicit [start, end) int64 intervals: within a
key, intervals sorted by (start, end) begin a new island exactly when
start exceeds the running max end of everything before them; islands
report (key, min start, max end, row count).

Scale design (100 TB lens): the repo's per-key-ordered-analytics
shape — coarse-bucket on hash(key) % n_buckets, then ONE vectorized
lexsort + segment-cummax kernel coalesces every key in the bucket
(never per-key groups; a mega-key only skews its bucket). The
segment-reset running max is computed without any Python loop by
offsetting each key-segment into a disjoint numeric range, taking one
global cummax, and shifting back."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _segment_cummax(vals: np.ndarray, seg_id: np.ndarray) -> np.ndarray:
    """Running max of ``vals`` resetting at each new segment id
    (seg_id non-decreasing)."""
    if len(vals) == 0:
        return vals
    lo = vals.min()
    span = np.int64(vals.max() - lo + 1)
    n_seg = int(seg_id[-1]) + 1
    # disjoint-range offsetting needs (n_seg+1) * span to fit int64;
    # at us resolution + year spans that is ~3e5 keys per bucket —
    # raise n_buckets if a bucket ever concentrates more
    if (n_seg + 1) > (np.iinfo(np.int64).max // int(span)):
        raise ValueError(
            "coalesce_intervals: segment-offset overflow; raise n_buckets"
        )
    shifted = (vals - lo) + seg_id * span
    return np.maximum.accumulate(shifted) - seg_id * span + lo


def coalesce_intervals(
    ds,
    key: str = "user_id",
    start: str = "s",
    end: str = "e",
    n_buckets: int = 64,
):
    """Dataset with int64 (key, start, end) → one row per merged
    island: (key, start, end, n_events), touching intervals merge."""
    from raydedup.sketches.hashing import hash_u64_column

    U64 = np.uint64

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        h1, _ = hash_u64_column(pa.chunked_array([pa.array(k, pa.int64())]))
        return pa.table(
            {
                "_gb": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                key: pa.array(k),
                start: batch[start],
                end: batch[end],
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        k = g[key].to_numpy(zero_copy_only=False)
        s = g[start].to_numpy(zero_copy_only=False).astype(np.int64)
        e = g[end].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((e, s, k))
        k, s, e = k[order], s[order], e[order]
        new_key = np.ones(len(k), bool)
        new_key[1:] = k[1:] != k[:-1]
        key_seg = np.cumsum(new_key) - 1
        run_max = _segment_cummax(e, key_seg)
        prev_max = np.empty_like(run_max)
        prev_max[1:] = run_max[:-1]
        new_island = new_key | (s > prev_max)
        isl = np.cumsum(new_island) - 1
        n_isl = int(isl[-1]) + 1 if len(isl) else 0
        starts = s[new_island]  # first row of an island has its min start
        ends = np.full(n_isl, np.iinfo(np.int64).min)
        np.maximum.at(ends, isl, e)
        counts = np.bincount(isl, minlength=n_isl)
        return pa.table(
            {
                key: pa.array(k[new_island]),
                start: pa.array(starts),
                end: pa.array(ends),
                "n_events": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(kernel, batch_format="pyarrow")
    )
