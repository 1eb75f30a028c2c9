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
    n_buckets: int = 32,
    num_partitions: int = 8,
):
    """(id, cluster_id) assignments × (id, text) corpus → one row per
    cluster: (cluster_id, keeper_url, keeper_tokens, n_members), the
    member with the most whitespace tokens (ties → lexicographically
    smallest id). Singleton clusters keep their only member.
    """
    import pandas as pd

    from raydedup.ops.text_stats import token_stats
    from raydedup.sketches.aggregates import _column_hashes

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

    def pick_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [cluster_column, "n_tokens", id_column],
            ascending=[True, False, True],
            kind="mergesort",
        )
        grp = g.groupby(cluster_column, sort=False)
        out = g[grp.cumcount() == 0].copy()
        out["n_members"] = grp[id_column].size().to_numpy().astype(np.int64)
        out = out.rename(columns={id_column: "keeper_url", "n_tokens": "keeper_tokens"})
        return out[[cluster_column, "keeper_url", "keeper_tokens", "n_members"]]

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(pick_bucket, batch_format="pandas")
    )
