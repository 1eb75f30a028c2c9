"""As-of join: for each left row, the latest right row at or before it.

Ray Data has no native as-of join; the engine expresses it as the
guide's documented pattern (ray_guide.md "As-of / range join"): both
sides are co-partitioned on the equality key via a bucketed cogroup
(same union+groupby shape as verification — no experimental join
operator), and each bucket runs a vectorized ``pd.merge_asof`` over
its keys. Partitioning assumption: all rows of one key fit one
group — as-of semantics are per-key sequential by nature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


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

    lsch = left.schema()
    rsch = right.schema()
    left_types = dict(zip(lsch.names, lsch.types))
    right_types = dict(zip(rsch.names, rsch.types))
    left_cols = lsch.names
    right_keep = [right_ts, *[v for v in right_values if v != right_ts]]

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        bucket = (np.abs(pd.util.hash_array(np.asarray(k))) % n_buckets).astype(np.int64)
        out = {"bucket": pa.array(bucket), "side": pa.array(np.zeros(len(batch), np.int8))}
        for c in left_cols:
            out[c] = batch[c]
        for c in right_keep:
            if c not in left_cols:
                out[c] = pa.nulls(len(batch), right_types[c])
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        bucket = (np.abs(pd.util.hash_array(np.asarray(k))) % n_buckets).astype(np.int64)
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
    out_types = {c: left_types.get(c, right_types.get(c)) for c in out_cols}

    def finish(df: pd.DataFrame) -> pa.Table:
        # The union of null-tagged sides float-upcasts int columns in
        # pandas; restore the exact Arrow output schema (int64 with
        # nulls, never float64) before the table leaves the group.
        arrays = {}
        for c in out_cols:
            t = out_types[c]
            s = df[c] if c in df.columns else pd.Series([None] * len(df))
            if pa.types.is_integer(t) and str(s.dtype).startswith("float"):
                s = s.astype("Int64")
            arrays[c] = pa.array(s, type=t, from_pandas=True)
        return pa.table(arrays)

    def join_bucket(df: pd.DataFrame) -> pa.Table:
        l = df[df["side"] == 0][list(left_cols)].sort_values(left_ts, kind="stable")
        r = df[df["side"] == 1][[key, *out_right_cols]].sort_values(right_ts, kind="stable")
        # normalize timestamp resolutions (merge_asof requires equal dtypes)
        for frame, col in ((l, left_ts), (r, right_ts)):
            if str(frame[col].dtype).startswith("datetime64"):
                frame[col] = frame[col].astype("datetime64[us]")
        if len(l) == 0:
            return finish(pd.DataFrame(columns=out_cols))
        if len(r) == 0:
            out = l.copy()
            for c in out_right_cols:
                out[c] = None
            return finish(out)
        merged = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction="backward",
            allow_exact_matches=True,
        )
        return finish(merged[out_cols])

    return tagged_l.union(tagged_r).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )
