"""As-of join: for each left row, the latest right row at or before it.

Ray Data has no native as-of join; the engine expresses it as the
guide's documented pattern (ray_guide.md "As-of / range join"): both
sides are co-partitioned on the equality key via a bucketed cogroup
(same union+groupby shape as verification — no experimental join
operator), and each bucket runs ONE vectorized kernel over the union
of its rows: lexsort by (key, ts, right-before-left), then a
segmented forward-fill of the last-seen right row — backward as-of
semantics with exact matches allowed, no per-key loop and no pandas
``merge_asof``. Partitioning assumption: all rows of one key fit one
group — as-of semantics are per-key sequential by nature.

The kernel is pure Arrow/NumPy (round-5 port): output columns are
``take``n from the original Arrow arrays, so the exact input types
(int64-with-nulls, timestamp units) survive without the float-upcast
repair the pandas kernel needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tvals(col) -> np.ndarray:
    """Order column → numpy comparable values (int64 µs for
    timestamps); nulls fill 0 — null slots belong to the other side's
    rows and are never selected as that side's sort key."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif pa.types.is_integer(t):
        col = col.cast(pa.int64())
    else:
        col = col.cast(pa.float64())
    return pc.fill_null(col, 0).to_numpy(zero_copy_only=False)


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    n_buckets: int = 32,
):
    """left (key, left_ts, ...) ⟕asof right (key, right_ts, values...).

    Returns left's columns plus ``right_values`` (and ``right_ts``)
    from the latest right row with the same key and
    ``right_ts <= left_ts``; nulls when no such row exists.
    """
    from raydedup.ops._bucketed import factorize
    from raydedup.sketches.aggregates import _column_hashes

    lsch = left.schema()
    rsch = right.schema()
    left_types = dict(zip(lsch.names, lsch.types))
    right_types = dict(zip(rsch.names, rsch.types))
    left_cols = lsch.names
    right_keep = [right_ts, *[v for v in right_values if v != right_ts]]

    def tag_left(batch: pa.Table) -> pa.Table:
        h, _ = _column_hashes(batch[key])
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        out = {"bucket": pa.array(bucket), "side": pa.array(np.zeros(len(batch), np.int8))}
        for c in left_cols:
            out[c] = batch[c]
        for c in right_keep:
            if c not in left_cols:
                out[c] = pa.nulls(len(batch), right_types[c])
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        h, _ = _column_hashes(batch[key])
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        out = {"bucket": pa.array(bucket), "side": pa.array(np.ones(len(batch), np.int8))}
        for c in left_cols:
            if c == key:
                out[c] = batch[c]
            else:
                out[c] = pa.nulls(len(batch), left_types[c])
        for c in right_keep:
            if c == key:
                continue
            out[c] = batch[c]
        return pa.table(out)

    tagged_l = left.map_batches(tag_left, batch_format="pyarrow")
    tagged_r = right.select_columns(sorted({key, *right_keep})).map_batches(
        tag_right, batch_format="pyarrow"
    )

    out_right_cols = [c for c in right_keep if c not in left_cols]
    out_cols = [*left_cols, *out_right_cols]

    def join_bucket(g: pa.Table) -> pa.Table:
        n = len(g)
        side = g["side"].to_numpy(zero_copy_only=False)
        is_right = side == 1
        kcode = factorize(g[key])
        lt = _tvals(g[left_ts])
        rt = _tvals(g[right_ts])
        t = np.where(is_right, rt, lt)
        # right rows sort BEFORE left rows at equal (key, ts): exact
        # matches are allowed, and stability keeps equal-ts right rows
        # in input order so the forward-fill picks the last one —
        # merge_asof's tie rule.
        order = np.lexsort(((~is_right).astype(np.int8), t, kcode))
        kc_s = kcode[order]
        ir_s = is_right[order]
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = kc_s[1:] != kc_s[:-1]
        pos = np.arange(n, dtype=np.int64)
        # last right row at-or-before each sorted position (positions
        # are monotone, so forward-fill == running max)
        last_right = np.maximum.accumulate(np.where(ir_s, pos, -1))
        seg_start = pos[new][np.cumsum(new) - 1]
        last_right = np.where(last_right >= seg_start, last_right, -1)
        left_pos = np.flatnonzero(~ir_s)
        lrows = order[left_pos]
        rmatch = last_right[left_pos]
        rrows = np.where(rmatch >= 0, order[np.maximum(rmatch, 0)], -1)
        lpart = g.select(left_cols).take(pa.array(lrows))
        ridx = pa.array(rrows, mask=rrows < 0)
        cols = {c: lpart[c] for c in left_cols}
        for c in out_right_cols:
            col = g[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(ridx)
        return pa.table({c: cols[c] for c in out_cols})

    return tagged_l.union(tagged_r).groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )
