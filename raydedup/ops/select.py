"""Quality-weighted representative selection after near-dup clustering.

``cluster_assignments`` labels every corpus doc with its cluster
(`pipeline/cluster.py`); a training-data pipeline then keeps ONE
representative per cluster — and the useful policy is not "arbitrary
min-id member" but "highest-quality member" (here: most whitespace
tokens, ties broken by id, the common keep-the-longest heuristic).

Shape at 10^12 docs: the score stage is a vectorized per-batch kernel
(the `token_stats` counter), the label↔score attach is ONE hash join on
the doc id, and the per-cluster argmax runs through the coarse-bucket
idiom (`hash(cluster) % n_buckets`, one vectorized lexsort + cumcount
kernel per bucket — no per-cluster pandas groups, mega-clusters only
skew a bucket). Nothing touches the driver.

Reference anchor: the reference stops at mergeable-sketch set algebra
(`theta/intersection.rs`, `hll/union.rs`); representative selection is
an engine-added corpus operator (SURVEY §2 set-ops row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def best_in_cluster(
    assignments,
    pages,
    *,
    id_column: str = "url",
    cluster_column: str = "cluster_id",
    text_column: str = "text",
    n_buckets: int | None = None,
    num_partitions: int = 8,
):
    """(id, cluster_id) assignments × (id, text) corpus → one row per
    cluster: (cluster_id, keeper_url, keeper_tokens, n_members), the
    member with the most whitespace tokens (ties → lexicographically
    smallest id). Singleton clusters keep their only member.
    """

    from raydedup.ops._bucketed import resolve_buckets
    from raydedup.ops.text_stats import token_stats
    from raydedup.sketches.aggregates import _column_hashes

    n_buckets = resolve_buckets(assignments, n_buckets, floor=32)

    def score_fn(batch: pa.Table) -> pa.Table:
        t = token_stats(batch, id_column, text_column)
        return t.select([id_column, "n_tokens"])

    scores = pages.select_columns([id_column, text_column]).map_batches(
        score_fn, batch_format="pyarrow"
    )
    joined = assignments.select_columns([id_column, cluster_column]).join(
        scores,
        join_type="inner",
        num_partitions=num_partitions,
        on=(id_column,),
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        h1, _ = _column_hashes(batch[cluster_column])
        return batch.append_column(
            "_bkt", pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    def pick_bucket(g: pa.Table) -> pa.Table:
        from raydedup.ops._bucketed import column_np

        cl = column_np(g[cluster_column])
        nt = column_np(g["n_tokens"]).astype(np.int64)
        ids = column_np(g[id_column])
        order = np.lexsort((ids, -nt, cl))
        sc = cl[order]
        new = np.ones(len(sc), dtype=bool)
        if len(sc) > 1:
            new[1:] = sc[1:] != sc[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(sc))).astype(np.int64)
        sel = pa.array(order[starts])
        return pa.table(
            {
                cluster_column: g[cluster_column].combine_chunks().take(sel),
                "keeper_url": g[id_column].combine_chunks().take(sel),
                "keeper_tokens": g["n_tokens"].combine_chunks().take(sel),
                "n_members": pa.array(sizes),
            }
        )

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(pick_bucket, batch_format="pyarrow")
    )
