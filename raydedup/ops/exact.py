"""Exact deduplication: content-hash partition + per-group first.

The engine-level analog of the reference's "same value hashes to the
same 64-bit token" guarantee (``theta/hash_table.rs:123-128``): docs are
keyed by murmur3-128 of their text (both words, 128 bits — collisions
at 10^12 docs: ~3e-14), hash-partitioned, and each group keeps the
row with the minimal id. One shuffle over (hash, id) pairs only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Min

from raydedup.sketches.hashing import hash_strings


def add_content_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    h1, h2 = hash_strings(batch[column])
    return batch.append_column("content_h1", pa.array(h1, pa.uint64())).append_column(
        "content_h2", pa.array(h2, pa.uint64())
    )


def exact_dedup_representatives(ds, id_column: str, text_column: str = "text"):
    """One row per distinct text: (id minimal in group, n_copies).

    ``groupby(content_hash).aggregate(min(id), count)`` — the shuffle
    carries only (hash128, id), never the text payload.
    """
    hashed = ds.select_columns([id_column, text_column]).map_batches(
        lambda b: add_content_hash(b, text_column).drop_columns([text_column]),
        batch_format="pyarrow",
    )
    out = hashed.groupby(["content_h1", "content_h2"]).aggregate(
        Min(id_column, alias_name=id_column),
        Count(alias_name="n_copies"),
    )
    return out.select_columns([id_column, "n_copies"])


def distinct_texts_theta(ds, text_column: str = "text", lg_k: int = 16):
    """Distinct-text count via per-block theta partials + tree merge.

    Exact below 2^lg_k distincts (theta stays at MAX), the reference's
    estimate above (``theta/sketch.rs:371-383``). Returns the merged
    ThetaSketch — callers take ``.estimate()``.
    """
    from raydedup.sketches.theta import ThetaSketch, theta_union

    def partial(batch: pa.Table) -> pa.Table:
        h1, _ = hash_strings(batch[text_column])
        sk = ThetaSketch.from_hashes(h1 >> np.uint64(1), lg_k=lg_k)
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary())})

    parts = ds.select_columns([text_column]).map_batches(partial, batch_format="pyarrow")
    sketches = [
        ThetaSketch.from_bytes(blob)
        for b in parts.iter_batches(batch_format="pyarrow")
        for blob in b["sketch"].to_pylist()
    ]
    if not sketches:
        return ThetaSketch.new_empty(lg_k)
    return theta_union(sketches)
