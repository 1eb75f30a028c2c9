"""Range (interval) join: left rows × small ranges table on
``lo <= value <= hi``, small-side broadcast.

Ray Data has no native range join; the engine expresses the common
case — a big fact stream joined to a SMALL set of (possibly
overlapping) intervals (promo windows, crawl snapshots, SLA tiers) —
as a pure map-side join, the companion shape to ``ops/asof.py``'s
cogrouped as-of join:

1. the ranges table is put in the object store ONCE (``ray.put``) and
   every map task reads it zero-copy — never re-shipped per batch;
2. each batch runs one vectorized containment kernel
   (``value[:, None] >= lo  &  value[:, None] <= hi`` → ``nonzero``)
   emitting one output row per (left row, matching range).

ZERO shuffle at any left size. Partitioning assumption (documented per
the engine's custom-operator rule): the ranges side is broadcast-small
— the kernel is O(|ranges| · batch_size) with an |ranges| × batch_size
boolean mask, so |ranges| should be ≲ 10⁴; beyond that a sorted
endpoint decomposition or a cogrouped equi-bucket join applies.
Overlapping intervals are first-class: a value inside several ranges
joins to each (inner-join semantics; unmatched left rows drop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def range_join_broadcast(
    left,
    ranges: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
):
    """left (…, value_col, …) ⋈ ranges (lo, hi, tags…) on
    ``lo <= value <= hi`` (both ends inclusive).

    ``ranges`` is a driver-side small pyarrow Table; every column of it
    except ``lo_col``/``hi_col`` is carried to the output (range tags,
    e.g. a range id). Returns left's columns plus those tag columns.
    """
    tag_cols = [c for c in ranges.column_names if c not in (lo_col, hi_col)]
    ref = ray.put(ranges)

    def join_batch(batch: pa.Table) -> pa.Table:
        r = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        lo = r[lo_col].to_numpy(zero_copy_only=False)
        hi = r[hi_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        li, ri = np.nonzero((v[:, None] >= lo) & (v[:, None] <= hi))
        out = {c: batch[c].take(pa.array(li)) for c in batch.column_names}
        for c in tag_cols:
            out[c] = r[c].take(pa.array(ri))
        return pa.table(out)

    return left.map_batches(join_batch, batch_format="pyarrow")
