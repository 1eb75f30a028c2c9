"""Cross-bucket candidate-pair dedup without per-pair groups.

A pair surfacing from several LSH bands/blocks must be emitted once.
``groupby([id_a, id_b])`` creates one pandas group *per pair* —
millions of size-<=4 groups with per-group Python overhead (the
round-1 bench showed this costing ~6x the useful work). Instead the
pairs shuffle on a coarse hash bucket (``n_buckets`` groups sized to
the cluster's task count) and each bucket drops duplicates with one
vectorized ``drop_duplicates`` — the same shape ``pipeline/lsh.py``
uses for MinHash pair dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def dedup_pairs(pairs, id_a: str = "id_a", id_b: str = "id_b", n_buckets: int = 64):
    """Dataset of (id_a, id_b, ...) → same rows with each pair once.

    Both occurrences of one pair hash to one bucket, so per-bucket
    ``drop_duplicates`` is global dedup. Extra columns ride along
    (first occurrence kept — callers emit identical metrics for every
    copy of a pair, so which copy survives is immaterial).
    """

    def add_pbucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("pbucket", pa.array([], pa.int64()))
        ha = pd.util.hash_array(np.asarray(batch[id_a].to_numpy(zero_copy_only=False)))
        hb = pd.util.hash_array(np.asarray(batch[id_b].to_numpy(zero_copy_only=False)))
        pb = ((ha ^ (hb * _MIX)) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("pbucket", pa.array(pb))

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates([id_a, id_b]).drop(columns="pbucket")

    return (
        pairs.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(drop, batch_format="pandas")
    )
