"""Sequence packing: concat-then-chunk pack assignment for training.

The pretraining data-prep step after curation/dedup: documents are
(logically) concatenated in a fixed deterministic order (ascending id)
into one token stream, which is split at fixed ``seq_len`` boundaries;
each document is assigned the pack (training sequence) where its first
token lands and its token offset within that pack. This is the
GPT-style "pack by concatenation" layout — document boundaries do not
reset the position counter, so the assignment is a pure function of
the (id, n_tokens) multiset and is exactly SQL-expressible as a window
cumsum (the oracle).

Scale shape — a textbook distributed prefix sum, nothing proportional
to the corpus ever sits on the driver:

1. **token counts** (map-only): the shared whitespace-token kernel
   (``text_stats.token_stats``).
2. **order-preserving buckets**: B-1 split ids chosen from a bounded
   global min-k murmur-priority sample (ONE tree-reduced aggregate,
   O(B·oversample) driver state); bucket = searchsorted(splits, id).
3. **bucket partials** (ONE tree-reduced aggregate): per-block
   ``bincount(bucket, weights=n_tokens)`` vectors of length B+1,
   merged by addition — the driver exclusive-scans B+1 numbers.
4. **in-bucket cumsum** (the only shuffle): ``groupby(bucket)`` +
   one vectorized argsort-by-id + cumsum kernel per bucket group,
   offset by the bucket's global prefix. Rows entering the shuffle
   are (id, n_tokens, bucket) — never text.

A mega-document larger than ``seq_len`` simply spans several packs
(its pack_id is where it starts), matching the concat-chunk semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _min_k_ids(ids: pa.ChunkedArray | pa.Array, k: int):
    """Per-block partial: k smallest (murmur priority, id) pairs."""
    import pyarrow.compute as pc

    from raydedup.sketches.hashing import hash_strings

    vals = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    svals = pc.cast(vals, pa.string())
    arr = svals.to_numpy(zero_copy_only=False)
    h1, _ = hash_strings(svals)  # Arrow path: zero-copy, no Python list
    if len(h1) > k:
        sel = np.argpartition(h1, k)[:k]
        return h1[sel], arr[sel]
    return h1, arr


def _merge_min_k(a, b, k: int):
    h = np.concatenate([a[0], b[0]])
    v = np.concatenate([a[1], b[1]])
    if len(h) > k:
        sel = np.argpartition(h, k)[:k]
        return h[sel], v[sel]
    return h, v


def split_points(docs, id_col: str, n_buckets: int, oversample: int = 8):
    """B-1 order-preserving split ids from a global min-k priority
    sample (deterministic: murmur3 of the id, no RNG state)."""
    from raydedup.sketches.aggregates import block_reduce

    k = max(n_buckets * oversample, 64)
    acc = docs.select_columns([id_col]).aggregate(
        block_reduce(
            lambda blk: _min_k_ids(blk[id_col], k),
            lambda a, b: _merge_min_k(a, b, k),
            name="sample",
        )
    )["sample"]
    if acc is None or len(acc[1]) == 0:
        return np.empty(0, dtype=object)
    sample = np.sort(acc[1].astype(str))
    idx = np.linspace(0, len(sample), n_buckets, endpoint=False)[1:].astype(np.int64)
    return np.unique(sample[idx])


def pack_concat_chunks(
    docs,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
):
    """docs (id, text) → Dataset (id, n_tokens, pack_id, pack_pos).

    ``pack_id`` = floor(exclusive_cumsum(n_tokens) / seq_len) over docs
    in ascending id order; ``pack_pos`` = that cumsum mod seq_len.
    """
    from raydedup.ops._bucketed import resolve_buckets
    from raydedup.ops.text_stats import token_stats
    from raydedup.sketches.aggregates import block_reduce

    # the in-bucket cumsum exchange carries (id, n_tokens) rows only
    n_buckets = resolve_buckets(docs, n_buckets)

    counts = docs.map_batches(
        lambda b: token_stats(b, id_col, text_column=text_col).select([id_col, "n_tokens"]),
        batch_format="pyarrow",
    ).materialize()

    splits = split_points(counts, id_col, n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(str)
        bkt = np.searchsorted(splits, ids, side="right").astype(np.int64)
        return batch.append_column("_pbucket", pa.array(bkt))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow").materialize()

    nb = len(splits) + 1

    def bucket_sums(blk: pa.Table) -> np.ndarray:
        b = blk["_pbucket"].combine_chunks().to_numpy(zero_copy_only=False)
        w = blk["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        return np.bincount(b, weights=w, minlength=nb).astype(np.int64)

    sums = bucketed.aggregate(block_reduce(bucket_sums, lambda a, b: a + b, name="sums"))[
        "sums"
    ]
    if sums is None:
        sums = np.zeros(nb, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    def pack_bucket(g: pa.Table) -> pa.Table:
        bkt = int(g["_pbucket"][0].as_py())
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(str)
        order = np.argsort(ids, kind="stable")
        nt = g["n_tokens"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        start = offsets[bkt] + np.concatenate([[0], np.cumsum(nt)[:-1]])
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "n_tokens": pa.array(nt),
                "pack_id": pa.array(start // seq_len),
                "pack_pos": pa.array(start % seq_len),
            }
        )

    return bucketed.groupby("_pbucket").map_groups(pack_bucket, batch_format="pyarrow")
