"""Stream-shaped operators over an ordered event log.

Ray Data is a batch engine with no watermarks (ray_guide.md); windowed
semantics are expressed as deterministic batch transforms over the
(key, ts)-partitioned log:

- **tumbling windows**: a derived ``window_start`` column + plain
  groupby-aggregate — embarrassingly parallel, no ordering assumption.
- **session windows** (gap-based): ``groupby(key).map_groups`` with a
  vectorized sort + gap-cumsum per key group — the ordering assumption
  (events of one key fit one group, sorted in-kernel) is the
  documented partitioning contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window_aggregate(events, key: str, ts: str, value: str, width_s: int):
    """(key, window_start) count + sum over fixed-width windows."""

    def add_window(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch[ts], pa.int64())  # us since epoch
        w = pc.multiply(pc.divide(epoch, width_s * 1_000_000), width_s * 1_000_000)
        return batch.append_column("window_start", pc.cast(w, pa.timestamp("us")))

    return (
        events.map_batches(add_window, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum(value, alias_name="total_value"))
    )


def hopping_window_aggregate(
    events, key: str, ts: str, value: str, width_s: int, hop_s: int
):
    """(key, window_start) count + sum over hopping (sliding) windows
    of width ``width_s`` advancing every ``hop_s`` — each event lands
    in ``width_s // hop_s`` windows. Expressed as a vectorized
    replicate (one copy per covering window, a k-fold ``take``) + the
    same plain groupby-aggregate as tumbling: no ordering assumption,
    and the exchange carries (key, window_start, value) rows only —
    the k-fold row inflation happens map-side on 3-column rows, never
    on the full event record."""
    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch[ts], pa.int64()).to_numpy(zero_copy_only=False)
        base = (epoch // hop_us) * hop_us
        starts = base[:, None] - (np.arange(k, dtype=np.int64) * hop_us)[None, :]
        idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), k))
        return pa.table(
            {
                key: batch[key].take(idx),
                "window_start": pc.cast(pa.array(starts.ravel()), pa.timestamp("us")),
                value: batch[value].take(idx),
            }
        )

    return (
        events.map_batches(explode, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum(value, alias_name="total_value"))
    )


def cumulative_per_key(
    ds,
    key: str,
    order_cols: list[str],
    value: str,
    out_col: str = "running_total",
    decimals: int = 2,
    n_buckets: int = 64,
    window: int | None = None,
):
    """Per-key running sum of ``value`` in ``order_cols`` order — the
    ordered-window aggregate (``SUM() OVER (PARTITION BY key ORDER BY
    ...)``) Ray Data has no native form for. ``window=None`` is the
    cumulative (UNBOUNDED PRECEDING) frame; ``window=w`` is the
    rolling frame over the last w rows (``ROWS BETWEEN w-1 PRECEDING
    AND CURRENT ROW``).

    Scale shape: the same coarse-bucket contract as
    ``session_windows`` — keys bucket on ``hash(key) % n_buckets`` and
    ONE vectorized lexsort + segmented-cumsum kernel handles every key
    in a bucket (never a pandas group per key); ``order_cols`` must be
    a total order within a key (pass a unique tiebreak column last).

    Exactness: values are scaled to integers at ``decimals`` places
    and accumulated in int64, so the running sums are EXACT — immune
    to float summation-order differences across blockings, cluster
    sizes, and oracle engines. The output column is
    ``scaled / 10**decimals`` as float64.
    """
    scale = float(10**decimals)

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[key])
        return batch.append_column(
            "_cbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def cumsum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[key], sort=False)
        order_arrays = [g[c].to_numpy() for c in order_cols]
        order = np.lexsort(tuple(reversed(order_arrays)) + (codes,))
        c = codes[order]
        cents = np.rint(g[value].to_numpy()[order] * scale).astype(np.int64)
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        cs = np.cumsum(cents)
        starts = np.flatnonzero(new)
        seg_start = starts[np.cumsum(new) - 1]
        if window is None:
            lo = seg_start
        else:
            lo = np.maximum(np.arange(len(cs), dtype=np.int64) - (window - 1), seg_start)
        base = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        running = cs - base
        out = {key: g[key].to_numpy()[order]}
        for col in order_cols:
            out[col] = g[col].to_numpy()[order]
        out[out_col] = running / scale
        return pd.DataFrame(out)

    cols = [key, *order_cols, value]
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_cbucket")
        .map_groups(cumsum_bucket, batch_format="pandas")
    )


def rank_per_key(ds, key: str, order_cols: list[str], n_buckets: int = 64):
    """Per-key rank analytics: 1-based ``rnk`` and ``pct_rank`` =
    (rnk−1)/(n−1) (0 for singleton keys — SQL percent_rank semantics)
    in ``order_cols`` order. ``order_cols`` must end in a unique
    tiebreak so rank == row_number == RANK. Same coarse-bucket
    lexsort kernel as the other window ops — no per-key groups."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[key])
        return batch.append_column(
            "_rbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[key], sort=False)
        order_arrays = [g[c].to_numpy() for c in order_cols]
        order = np.lexsort(tuple(reversed(order_arrays)) + (codes,))
        c = codes[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        rnk = np.arange(len(c), dtype=np.int64) - starts[grp] + 1
        sizes = np.diff(np.append(starts, len(c)))
        n_of = sizes[grp].astype(np.float64)
        pct = np.where(n_of > 1, (rnk - 1) / (n_of - 1), 0.0)
        out = {key: g[key].to_numpy()[order]}
        for col in order_cols:
            out[col] = g[col].to_numpy()[order]
        out["rnk"] = rnk
        out["pct_rank"] = np.round(pct, 6)
        return pd.DataFrame(out)

    cols = [key, *order_cols]
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_rbucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def path_per_key(
    ds,
    key: str,
    order_cols: list[str],
    step_col: str,
    sep: str = ">",
    n_buckets: int = 64,
):
    """Per-key ordered path string (``string_agg(step, sep ORDER BY
    ...)``): the session-path / clickstream-journey aggregate. Same
    coarse-bucket lexsort kernel; each bucket assembles every key's
    joined path in one pass (string assembly is inherently per-key,
    but keys never cross buckets and no per-key exchange happens).
    ``order_cols`` must end in a unique tiebreak for a deterministic
    path. → (key, path, n_steps)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[key])
        return batch.append_column(
            "_pbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def path_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g[key], sort=False)
        order_arrays = [g[c].to_numpy() for c in order_cols]
        order = np.lexsort(tuple(reversed(order_arrays)) + (codes,))
        c = codes[order]
        steps = pd.Series(g[step_col].to_numpy()[order])
        paths = steps.groupby(c, sort=True).agg(sep.join)
        counts = np.bincount(c, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {
                key: uniq[paths.index.to_numpy()],
                "path": paths.to_numpy(),
                "n_steps": counts[paths.index.to_numpy()],
            }
        )

    cols = list(dict.fromkeys([key, *order_cols, step_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_pbucket")
        .map_groups(path_bucket, batch_format="pandas")
    )


def ntile_dense_per_key(
    ds,
    key: str,
    order_cols: list[str],
    k: int,
    dense_col: str,
    n_buckets: int = 64,
):
    """Per-key NTILE(k) + DENSE_RANK window analytics: ``rnk`` =
    row_number in ``order_cols`` order (must end in a unique
    tiebreak), ``tile`` = SQL NTILE semantics (first n%k tiles get
    ⌈n/k⌉ rows), ``drnk`` = dense rank over ``dense_col`` — which must
    be a PREFIX of the sort order (typically ``order_cols[0]``) so one
    lexsort serves both. Same coarse-bucket kernel as the other window
    ops: hash(key) % n_buckets, one vectorized pass per bucket, no
    per-key groups."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[key])
        return batch.append_column(
            "_nbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def ntile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[key], sort=False)
        order_arrays = [g[c].to_numpy() for c in order_cols]
        order = np.lexsort(tuple(reversed(order_arrays)) + (codes,))
        c = codes[order]
        n = len(c)
        new = np.ones(n, dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        i0 = np.arange(n, dtype=np.int64) - starts[grp]
        sizes = np.diff(np.append(starts, n))
        nn = sizes[grp]
        q, r = nn // k, nn % k
        cut = r * (q + 1)
        tile = (
            np.where(i0 < cut, i0 // (q + 1), r + (i0 - cut) // np.maximum(q, 1)) + 1
        )
        dv = g[dense_col].to_numpy()[order]
        ch = np.ones(n, dtype=bool)
        ch[1:] = dv[1:] != dv[:-1]
        ch |= new
        cs = np.cumsum(ch)
        drnk = cs - cs[starts[grp]] + 1
        out = {key: g[key].to_numpy()[order]}
        for col in order_cols:
            out[col] = g[col].to_numpy()[order]
        out["rnk"] = i0 + 1
        out["tile"] = tile.astype(np.int64)
        out["drnk"] = drnk.astype(np.int64)
        return pd.DataFrame(out)

    cols = list(dict.fromkeys([key, *order_cols, dense_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_nbucket")
        .map_groups(ntile_bucket, batch_format="pandas")
    )


def lag_delta_per_key(ds, key: str, ts: str, order_cols: list[str], n_buckets: int = 64):
    """Per-key delta to the previous row: ``delta_us`` = ts − lag(ts)
    in microseconds (null for each key's first row) — the
    inter-arrival-time signal. Same bucketed kernel; ``order_cols``
    must be a total order within a key and start with ``ts``."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[key])
        return batch.append_column(
            "_lbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def delta_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[key], sort=False)
        order_arrays = [g[c].to_numpy() for c in order_cols]
        order = np.lexsort(tuple(reversed(order_arrays)) + (codes,))
        c = codes[order]
        t = g[ts].to_numpy()[order].astype("datetime64[us]").view(np.int64)
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        delta = np.empty(len(t), dtype=np.float64)
        delta[0] = np.nan
        delta[1:] = (t[1:] - t[:-1]).astype(np.float64)
        delta[new] = np.nan
        out = {key: g[key].to_numpy()[order]}
        for col in order_cols:
            out[col] = g[col].to_numpy()[order]
        out["delta_us"] = delta
        return pd.DataFrame(out)

    cols = list(dict.fromkeys([key, ts, *order_cols]))
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_lbucket")
        .map_groups(delta_bucket, batch_format="pandas")
    )


def debounce_events(
    events,
    user_col: str,
    type_col: str,
    ts: str,
    id_col: str,
    gap_s: int,
    n_buckets: int = 64,
):
    """Event-stream dedup (telemetry debounce): keep an event iff it is
    the first of its (user, type) key or its gap to the key's PREVIOUS
    event (by ``(ts, id)`` order) exceeds ``gap_s`` — LAG semantics, so
    each row's keep decision depends only on its immediate predecessor,
    not on which predecessors were kept. Returns the kept rows
    (id, user, type, ts).

    Scale shape: same coarse-bucket + one-lexsort-kernel-per-bucket
    pattern as ``session_windows`` — keys co-locate by hashing the user
    column only, the type column subdivides inside the kernel."""

    gap_us = gap_s * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[user_col])
        return batch.append_column(
            "_sbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def keep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tcodes, _ = pd.factorize(g[type_col], sort=False)
        uid = g[user_col].to_numpy()
        # normalize to µs regardless of the pandas datetime unit
        # (Arrow timestamp[us] arrives as datetime64[us], but ns-unit
        # frames would silently misscale a bare astype(int64))
        t = g[ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, t, tcodes, uid))
        su, sc, st = uid[order], tcodes[order], t[order]
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = (
            (su[1:] != su[:-1]) | (sc[1:] != sc[:-1]) | ((st[1:] - st[:-1]) > gap_us)
        )
        sel = order[keep]
        return g.iloc[sel][[id_col, user_col, type_col, ts]]

    return (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_sbucket")
        .map_groups(keep_bucket, batch_format="pandas")
    )


def session_windows(events, key: str, ts: str, gap_s: int, n_buckets: int = 64):
    """Per-key gap-based sessions: (key, session_start, session_end,
    n_events). A new session begins when the gap to the previous event
    of the same key exceeds ``gap_s``.

    Scale shape: keys are COARSE-BUCKETED on ``hash(key) % n_buckets``
    and every key in a bucket is sessionized by ONE vectorized
    lexsort-by-(key, ts) + gap-cumsum kernel (the ``emit_pairs_bucket``
    pattern) — never one pandas group per key, so 10⁷ tiny key groups
    cost ~n_buckets tasks and a mega-key (bot user) only skews its
    bucket, not a per-key group."""

    gap_us = gap_s * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[key])
        return batch.append_column(
            "_sbucket", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[key], sort=False)
        # normalize to µs (see debounce_events: a bare astype(int64)
        # yields ns for ns-unit frames and breaks gap_us)
        t = g[ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((t, codes))
        codes, t = codes[order], t[order]
        new = np.ones(len(t), dtype=bool)
        new[1:] = (codes[1:] != codes[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new) - 1
        counts = np.bincount(sid)
        # t is sorted within key, so first/last element per session = min/max
        boundaries = np.nonzero(new)[0]
        starts = t[boundaries]
        ends = t[np.concatenate([boundaries[1:] - 1, [len(t) - 1]])]
        return pd.DataFrame(
            {
                key: g[key].to_numpy()[order][boundaries],
                "session_start": pd.to_datetime(starts, unit="us"),
                "session_end": pd.to_datetime(ends, unit="us"),
                "n_events": counts,
            }
        )

    return (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_sbucket")
        .map_groups(sessionize_bucket, batch_format="pandas")
    )
