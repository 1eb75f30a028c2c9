"""Sorted-neighborhood dedup (Hernandez & Stolfo, SIGMOD 1995).

The third classic blocking family in the engine, alongside hash
blocking (LSH bands, linkage block keys) and content fingerprints:
sort the corpus by a cheap domain sort key, then compare only records
within a fixed window ``w`` of one another in the GLOBAL sort order.
It catches near-duplicates whose key prefixes agree (typo'd tails,
truncated mirrors, re-serialized records) without any equality
blocking key, at a guaranteed ``w - 1`` comparisons per record.

Distributed plan (100 TB lens) — nothing corpus-shaped on the driver:

1. **key map** (map-only): caller-supplied normalized sort key
   (see :func:`normalize_sort_key`), padded to a fixed-width binary
   column at emission so the shuffles carry fixed-size rows.
2. **global rank by (key, id)**: order-preserving range buckets from
   a bounded min-k murmur sample of keys (ONE tree aggregate — the
   same prefix-sum shape as ``ops/packing.py``), per-bucket count
   partials (ONE tree aggregate; the driver exclusive-scans B
   numbers), then ONE in-bucket lexsort: rank = bucket offset +
   in-bucket position. ``searchsorted(splits, key)`` sends all equal
   keys to one bucket, so ties break globally by id.
3. **window pair emission** (ONE hash-bucket exchange): each row
   emits ``w`` rows keyed ``rank .. rank + w - 1`` — role ``anchor``
   at its own rank, ``probe`` above it. In each key group the single
   anchor (ranks are unique) pairs with every probe, so every
   unordered pair at rank distance ``1 .. w-1`` is emitted exactly
   once (at the higher rank), with no block-boundary cases at all.
4. **verify**: the shared pair-axis-batched Wagner-Fischer kernel
   (``ops/linkage.batched_levenshtein``) over the carried keys;
   keep ``dist <= max_dist``.

Exchange cost: ``w`` fixed-width rows per record through one hash
shuffle — linear in the corpus for the small windows (4-10) the
method is defined for. The range buckets bound per-group state; size
``n_range_buckets`` to the cluster so one bucket fits a worker.

Comparison is BYTE-level on the padded UTF-8 keys (identical to
char-level for ASCII keys; same contract as ``linkage_pairs``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.ops.linkage import _pad_codes, batched_levenshtein
from raydedup.sketches.hashing import fmix64

U64 = np.uint64


def normalize_sort_key(col, key_len: int = 48):
    """lower -> collapse whitespace -> trim spaces -> first
    ``key_len`` codepoints. Mirrors the SQL
    ``substr(trim(regexp_replace(lower(x), '\\s+', ' ', 'g')), 1, n)``
    (both regex engines are RE2)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    x = pc.utf8_trim(x, " ")
    return pc.utf8_slice_codeunits(x, 0, key_len)


def _global_ranks(narrow, id_col: str, key_col: str, n_range_buckets: int):
    """(id, key) Dataset -> (id, key, rank) Dataset; rank is the
    0-based position in the global (key, id) ascending order."""
    from raydedup.ops.packing import split_points
    from raydedup.sketches.aggregates import block_reduce

    splits = split_points(narrow, key_col, n_range_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(str)
        bkt = np.searchsorted(splits, keys, side="right").astype(np.int64)
        return batch.append_column("_rb", pa.array(bkt))

    bucketed = narrow.map_batches(add_bucket, batch_format="pyarrow").materialize()
    nb = len(splits) + 1

    def bucket_counts(blk: pa.Table) -> np.ndarray:
        b = blk["_rb"].combine_chunks().to_numpy(zero_copy_only=False)
        return np.bincount(b, minlength=nb).astype(np.int64)

    sums = bucketed.aggregate(
        block_reduce(bucket_counts, lambda a, b: a + b, name="sums")
    )["sums"]
    if sums is None:
        sums = np.zeros(nb, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    def rank_bucket(g: pa.Table) -> pa.Table:
        bkt = int(g["_rb"][0].as_py())
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        keys = g[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((ids, keys))
        rank = offsets[bkt] + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                key_col: g[key_col].combine_chunks().take(pa.array(order)),
                "rank": pa.array(rank),
            }
        )

    return bucketed.groupby("_rb").map_groups(rank_bucket, batch_format="pyarrow")


def snm_pairs(
    ds,
    id_col: str,
    key_col: str,
    window: int = 6,
    max_dist: int = 4,
    key_len: int = 48,
    n_range_buckets: int = 32,
    n_buckets: int = 64,
):
    """ds with (``id_col`` int64, ``key_col`` string) -> Dataset
    (doc_a, doc_b, dist): pairs within ``window`` positions of each
    other in the global (key, id) sort order whose keys are within
    Levenshtein ``max_dist``. ``doc_a < doc_b`` by id."""
    if window < 2:
        raise ValueError("snm_pairs: window must be >= 2")
    narrow = ds.select_columns([id_col, key_col])
    ranked = _global_ranks(narrow, id_col, key_col, n_range_buckets)
    w = int(window)

    def emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        ranks = batch["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes, ln = _pad_codes(keys, key_len)
        gk = (ranks[:, None] + np.arange(w, dtype=np.int64)[None, :]).ravel()
        role = np.tile((np.arange(w) > 0).astype(np.int8), n)
        rep = np.repeat(np.arange(n, dtype=np.int64), w)
        hb = (fmix64(gk.astype(U64)) % U64(n_buckets)).astype(np.int64)
        nm = pa.Array.from_buffers(
            pa.binary(key_len),
            len(ln),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())],
        ).take(pa.array(rep))
        return pa.table(
            {
                "_hb": pa.array(hb),
                "gk": pa.array(gk),
                "role": pa.array(role),
                "id": pa.array(ids[rep]),
                "ln": pa.array(ln.astype(np.int64)[rep]),
                "nm": nm,
            }
        )

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        gk = g["gk"].to_numpy(zero_copy_only=False)
        role = g["role"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        ln = g["ln"].to_numpy(zero_copy_only=False).astype(np.int32)
        nmarr = g["nm"]
        if isinstance(nmarr, pa.ChunkedArray):
            nmarr = nmarr.combine_chunks()
        width = nmarr.type.byte_width
        buf = np.frombuffer(nmarr.buffers()[1], dtype=np.uint8)
        start = nmarr.offset * width
        nm = buf[start : start + len(nmarr) * width].reshape(-1, width)
        order = np.lexsort((role, gk))
        gk, role, ids, ln, nm = gk[order], role[order], ids[order], ln[order], nm[order]
        new = np.ones(len(gk), bool)
        new[1:] = gk[1:] != gk[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        anchor_of = starts[run_id]
        # a run's first element is its anchor iff role 0 (ranks are
        # globally unique, so at most one anchor lands in any group)
        sel = (role == 1) & (role[anchor_of] == 0)
        if not sel.any():
            return empty
        ia = np.flatnonzero(sel)
        ib = anchor_of[ia]
        dist = batched_levenshtein(nm[ia], ln[ia], nm[ib], ln[ib])
        keep = dist <= max_dist
        if not keep.any():
            return empty
        a, b = ids[ia[keep]], ids[ib[keep]]
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(a, b).astype(np.int64)),
                "doc_b": pa.array(np.maximum(a, b).astype(np.int64)),
                "dist": pa.array(dist[keep].astype(np.int64)),
            }
        )

    return (
        ranked.map_batches(emit, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(kernel, batch_format="pyarrow")
    )
