"""Snapshot consolidation: newest capture per URL.

The canonical Common-Crawl pre-dedup step — a crawl re-fetches URLs
across snapshots, and downstream dedup wants exactly one (the latest)
capture per URL. Input is the input_hint page shape
``(url, warc_ts, ...payload)``.

Scale design: the output is full winning ROWS, so one payload shuffle
is unavoidable — but only one. Rows are coarse-bucketed on a 64-bit
url hash (``hash(url) % n_buckets`` — the ONE partitioning key the
dedup pipeline already uses, so consolidated output lands co-located
for the stages that follow), and each bucket resolves EVERY url in it
with a single Arrow multi-key sort + vectorized last-of-run selection —
no per-url groups, mega-urls only skew a bucket. At 100 TB, prune the
payload first (``select_columns``) and re-attach wide columns by key
afterwards if the full page body is needed.

Tie-break on equal ``(url, warc_ts)`` is the descending order of
``tiebreak_column`` (SQL-expressible: ``ORDER BY warc_ts DESC,
<tiebreak> DESC``); with no tiebreak column, ties are broken by the
url hash order of arrival (deterministic only when (url, ts) is
unique, which a crawl's capture timestamps guarantee in practice).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.hashing import hash_strings

U64 = np.uint64


def latest_per_url(
    ds,
    url_column: str = "url",
    ts_column: str = "warc_ts",
    n_buckets: int = 256,
    tiebreak_column: str | None = None,
):
    """Dataset of captures → Dataset of one newest row per url."""

    def tag(batch: pa.Table) -> pa.Table:
        h1, h2 = hash_strings(batch[url_column])
        return batch.append_column(
            "_ub", pa.array((h1 % U64(n_buckets)).astype(np.int64))
        ).append_column("_uh1", pa.array(h1, pa.uint64())).append_column(
            "_uh2", pa.array(h2, pa.uint64())
        )

    sort_keys = [("_uh1", "ascending"), ("_uh2", "ascending"), (ts_column, "ascending")]
    if tiebreak_column is not None:
        sort_keys.append((tiebreak_column, "ascending"))

    def pick(g: pa.Table) -> pa.Table:
        # one multi-key Arrow sort resolves every url in the bucket;
        # the last row of each (uh1, uh2) run is the newest capture
        idx = pa.compute.sort_indices(g, sort_keys=sort_keys)
        g = g.take(idx)
        h1 = g["_uh1"].to_numpy(zero_copy_only=False)
        h2 = g["_uh2"].to_numpy(zero_copy_only=False)
        last = np.ones(len(g), bool)
        if len(g) > 1:
            last[:-1] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return g.filter(pa.array(last)).drop_columns(["_ub", "_uh1", "_uh2"])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_ub")
        .map_groups(pick, batch_format="pyarrow")
    )


def snapshot_churn(
    old_ds,
    new_ds,
    url_column: str = "url",
    content_column: str = "text",
    n_buckets: int = 256,
):
    """Crawl-delta report: which urls were ``added`` / ``removed`` /
    ``changed`` between two CONSOLIDATED snapshots (≤1 row per url per
    side — run ``latest_per_url`` first on raw captures). Unchanged
    urls are dropped (they dominate at crawl scale and carry no
    signal).

    Scale design: each side collapses map-side to narrow
    (url, url-hash, content-hash, side) rows — the page payload never
    shuffles; ONE bucketed exchange on ``hash(url) % n_buckets``; each
    bucket classifies every url with one lexsort + run analysis (runs
    have ≤2 rows by the consolidation contract). → (url, status).
    """

    def narrow(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h1, h2 = hash_strings(batch[url_column])
            c1, _ = hash_strings(batch[content_column])
            return pa.table(
                {
                    url_column: batch[url_column],
                    "_b": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                    "_h1": pa.array(h1.view(np.int64)),
                    "_h2": pa.array(h2.view(np.int64)),
                    "_c1": pa.array(c1.view(np.int64)),
                    "_side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int64)
                    ),
                }
            )

        return fn

    both = old_ds.map_batches(narrow(0), batch_format="pyarrow").union(
        new_ds.map_batches(narrow(1), batch_format="pyarrow")
    )

    def classify(g: pa.Table) -> pa.Table:
        h1 = g["_h1"].to_numpy(zero_copy_only=False)
        h2 = g["_h2"].to_numpy(zero_copy_only=False)
        side = g["_side"].to_numpy(zero_copy_only=False)
        c1 = g["_c1"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, h2, h1))
        h1, h2, side, c1 = h1[order], h2[order], side[order], c1[order]
        n = len(h1)
        new = np.ones(n, bool)
        if n > 1:
            new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        if sizes.max(initial=0) > 2:
            raise ValueError(
                "snapshot_churn: >1 row per url per side — consolidate "
                "with latest_per_url first"
            )
        single = sizes == 1
        s_at = starts[single]
        # singles: side 0 -> removed, side 1 -> added
        pair_starts = starts[~single]
        if len(pair_starts) and (
            (side[pair_starts] != 0).any() or (side[pair_starts + 1] != 1).any()
        ):
            raise ValueError(
                "snapshot_churn: duplicate url within one snapshot — "
                "consolidate with latest_per_url first"
            )
        changed = pair_starts[c1[pair_starts] != c1[pair_starts + 1]]
        urls = g[url_column].to_numpy(zero_copy_only=False)[order]
        out_idx = np.concatenate([s_at, changed])
        status = np.concatenate(
            [
                np.where(side[s_at] == 0, "removed", "added"),
                np.full(len(changed), "changed", dtype=object),
            ]
        )
        return pa.table(
            {
                url_column: pa.array(urls[out_idx]),
                "status": pa.array(status, pa.string()),
            }
        )

    return both.groupby("_b").map_groups(classify, batch_format="pyarrow")
