"""Cross-bucket candidate-pair dedup without per-pair groups.

A pair surfacing from several LSH bands/blocks must be emitted once.
``groupby([id_a, id_b])`` creates one group *per pair* — millions of
size-<=4 groups with per-group overhead (the round-1 bench showed this
costing ~6x the useful work). Instead the pairs shuffle on a coarse
hash bucket (``n_buckets`` groups sized to the cluster's task count)
and each bucket drops duplicates with one vectorized Arrow
first-occurrence kernel — the same shape ``pipeline/lsh.py`` uses for
MinHash pair dedup. The bucket key is the engine's own murmur3 column
hash mixed with fmix64 (round-5: replaced ``pd.util.hash_array`` — no
pandas hashing in any exchange key, one determinism surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dedup_pairs(
    pairs, id_a: str = "id_a", id_b: str = "id_b", n_buckets: int | None = None
):
    """Dataset of (id_a, id_b, ...) → same rows with each pair once.

    Both occurrences of one pair hash to one bucket, so per-bucket
    first-occurrence selection is global dedup. Extra columns ride
    along (first occurrence kept — callers emit identical metrics for
    every copy of a pair, so which copy survives is immaterial).
    """
    from raydedup.ops._bucketed import resolve_buckets
    from raydedup.sketches.aggregates import _column_hashes
    from raydedup.sketches.hashing import fmix64

    n_buckets = resolve_buckets(pairs, n_buckets)

    def add_pbucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("pbucket", pa.array([], pa.int64()))
        ha, _ = _column_hashes(batch[id_a])
        hb, _ = _column_hashes(batch[id_b])
        pb = (fmix64(ha ^ np.left_shift(hb, np.uint64(1))) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return batch.append_column("pbucket", pa.array(pb))

    def drop(g: pa.Table) -> pa.Table:
        cols = [c for c in g.column_names if c != "pbucket"]
        out = g.select(cols)
        if len(g) == 0:
            return out
        gg = out.append_column("_i", pa.array(np.arange(len(g), dtype=np.int64)))
        first = gg.group_by([id_a, id_b], use_threads=False).aggregate([("_i", "min")])
        sel = np.sort(first["_i_min"].combine_chunks().to_numpy(zero_copy_only=False))
        return out.take(pa.array(sel))

    return (
        pairs.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(drop, batch_format="pyarrow")
    )
