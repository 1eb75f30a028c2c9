"""SimHash near-duplicate detection (64-bit charikar fingerprints).

``simhash(doc) = bit-majority over the doc's shingle hashes``: bit j
of the fingerprint is 1 iff more than half the shingles have bit j
set. Hamming distance between fingerprints tracks cosine similarity
of the shingle multisets — a cheaper, lower-resolution complement to
MinHash (SURVEY.md §2.10 engine additions).

Candidate generation uses the standard block-permutation trick: a
64-bit fingerprint splits into ``n_blocks`` chunks; two docs within
hamming distance d must share at least one chunk exactly when
``n_blocks > d``. Chunks become groupby keys (same shuffle shape as
the MinHash LSH stage); survivors are verified by exact hamming
distance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.pipeline.extract import text_to_shingle_sets

U64 = np.uint64


def simhash_from_shingles(shingles: np.ndarray, offsets: np.ndarray, slab: int = 1 << 14) -> np.ndarray:
    """(n_docs,) uint64 fingerprints, vectorized via per-bit reduceat.

    Processed in doc-aligned shingle slabs with a reusable bit buffer
    so the working set stays cache-resident (same rationale as the
    MinHash workspace — node-level contention is memory bandwidth).
    """
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=U64)
    if len(shingles) == 0:
        return out
    counts = np.diff(offsets)
    ne_idx = np.nonzero(counts > 0)[0]
    # int16 halves the slab's memory traffic vs int32; reduceat
    # accumulates in-dtype, safe while per-doc shingle counts < 2^15
    # (the signature stage KMV-caps docs at 4096 shingles)
    buf = np.empty((slab, 16), dtype=np.int16)
    lo = 0
    while lo < len(ne_idx):
        base = offsets[ne_idx[lo]]
        hi = lo + 1
        while hi < len(ne_idx) and offsets[ne_idx[hi] + 1] - base <= slab:
            hi += 1
        end = offsets[ne_idx[hi - 1] + 1]
        sl = shingles[base:end]
        starts = offsets[:-1][ne_idx[lo:hi]] - base
        half = (counts[ne_idx[lo:hi]] / 2.0)[:, None]
        acc = np.zeros(hi - lo, dtype=U64)
        for b0 in range(0, 64, 16):
            shifts = np.arange(b0, b0 + 16, dtype=U64)
            if len(sl) <= slab:
                bits = buf[: len(sl)]
                np.bitwise_and(sl[:, None] >> shifts[None, :], U64(1), out=bits, casting="unsafe")
            else:  # single giant doc: one-off buffer (int64 sums, no overflow)
                bits = ((sl[:, None] >> shifts[None, :]) & U64(1)).astype(np.int64)
            sums = np.add.reduceat(bits, starts, axis=0)
            maj = sums > half
            weights = (U64(1) << shifts)[None, :]
            acc |= (maj * weights).sum(axis=1, dtype=U64)
        out[ne_idx[lo:hi]] |= acc
        lo = hi
    return out


def simhash_column(text: pa.Array, k: int = 5, seed: int = 9001) -> np.ndarray:
    sh, off, _ = text_to_shingle_sets(text, k=k, seed=seed)
    return simhash_from_shingles(sh, off)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(np.asarray(a, U64), np.asarray(b, U64))
    # SWAR popcount
    x = x - ((x >> U64(1)) & U64(0x5555555555555555))
    x = (x & U64(0x3333333333333333)) + ((x >> U64(2)) & U64(0x3333333333333333))
    x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    return ((x * U64(0x0101010101010101)) >> U64(56)).astype(np.int64)


class SimHashStage:
    """Actor-pool stage: (id, text) batch → (id, simhash)."""

    def __init__(self, id_column: str = "url", text_column: str = "text", k: int = 5, seed: int = 9001):
        self.id_column = id_column
        self.text_column = text_column
        self.k = k
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sh = simhash_column(text, self.k, self.seed)
        return pa.table({self.id_column: batch[self.id_column], "simhash": pa.array(sh, pa.uint64())})


def simhash_batch_fn(batch: pa.Table, id_column: str = "url", text_column: str = "text", k: int = 5, seed: int = 9001) -> pa.Table:
    """Task-form simhash stage (see lsh.signature_batch_fn rationale)."""
    return SimHashStage(id_column, text_column, k, seed)(batch)


def simhash_from_signatures(signatures, id_column: str = "url"):
    """MinHash-signature Dataset (id, shingles, ...) → (id, simhash).

    When the MinHash dedup pipeline and the SimHash fingerprint both
    run over one corpus, the shingle computation (tokenize + k-gram
    murmur — the dominant per-doc cost) should be paid ONCE: this stage
    reads the signature stage's stored per-doc shingle sets instead of
    re-parsing text. The stored set is unique + KMV-trimmed (uniform
    sample of the shingle set above the cap), so the bit-majority is
    taken over the set rather than the raw multiset — an unbiased
    estimate of the same majority; identical whenever a doc's shingles
    are distinct and below the cap.
    """

    def fp(batch: pa.Table) -> pa.Table:
        col = batch["shingles"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(U64, copy=False)
        base = off[0]
        sh = simhash_from_shingles(vals[base : off[-1]], off - base)
        return pa.table({id_column: batch[id_column], "simhash": pa.array(sh, pa.uint64())})

    return signatures.select_columns([id_column, "shingles"]).map_batches(
        fp, batch_format="pyarrow"
    )


def simhash_pairs(
    fingerprints,
    id_column: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    n_buckets: int | None = None,
):
    """fingerprints Dataset (id, simhash) → pairs within hamming distance.

    Block-permutation candidates + exact hamming verify; same coarse-
    bucket vectorized grouping as the MinHash LSH stage.
    """
    from raydedup.ops._bucketed import resolve_buckets
    from raydedup.sketches.hashing import fmix64

    # the explode stage emits n_blocks rows per fingerprint row
    n_buckets = resolve_buckets(fingerprints, n_buckets, blowup=float(n_blocks))
    assert n_blocks > max_hamming, "need n_blocks > max_hamming for completeness"
    width = 64 // n_blocks

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(U64)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        mask = U64((1 << width) - 1)
        chunks = np.stack([(sh >> U64(width * j)) & mask for j in range(n_blocks)], axis=1)
        block_ids = np.tile(np.arange(n_blocks, dtype=np.int64), n)
        flat = chunks.reshape(-1)
        bucket = (fmix64(flat ^ fmix64(block_ids.astype(U64))) % U64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "block": pa.array(block_ids.astype(np.int32)),
                "chunk": pa.array(flat, pa.uint64()),
                "id": pa.array(np.repeat(ids, n_blocks)),
                "simhash": pa.array(np.repeat(sh, n_blocks), pa.uint64()),
            }
        )

    def emit(g: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        idtype = g["id"].type
        empty = pa.table(
            {
                "id_a": pa.array([], idtype),
                "id_b": pa.array([], idtype),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        block = g["block"].to_numpy(zero_copy_only=False)
        chunk = g["chunk"].to_numpy(zero_copy_only=False).astype(U64)
        ids = g["id"].to_numpy(zero_copy_only=False)
        sh = g["simhash"].to_numpy(zero_copy_only=False).astype(U64)
        # tiebreak on a u64 id hash, not the id itself: string ids would
        # make the lexsort a Python-compare sort (the ordering inside a
        # run only affects emission order, never which pairs survive)
        idh, _ = _column_hashes(g["id"])
        order = np.lexsort((idh, chunk, block))
        block, chunk, ids, sh = block[order], chunk[order], ids[order], sh[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = (block[1:] != block[:-1]) | (chunk[1:] != chunk[:-1])
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.zeros(len(run_len), dtype=np.int64)
        np.cumsum(run_len[:-1], out=run_start[1:])
        out_a, out_b, out_d = [], [], []
        for s in np.unique(run_len[run_len >= 2]):
            starts = run_start[run_len == s]
            members = starts[:, None] + np.arange(s)[None, :]
            ia, ib = np.triu_indices(int(s), k=1)
            a_idx = members[:, ia].reshape(-1)
            b_idx = members[:, ib].reshape(-1)
            d = hamming_distance(sh[a_idx], sh[b_idx])
            keep = d <= max_hamming
            out_a.append(ids[a_idx][keep])
            out_b.append(ids[b_idx][keep])
            out_d.append(d[keep])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        d = np.concatenate(out_d)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        tbl = pa.table(
            {
                "id_a": pa.array(lo[keep], type=idtype),
                "id_b": pa.array(hi[keep], type=idtype),
                "hamming": pa.array(d[keep].astype(np.int64)),
            }
        )
        if len(tbl) == 0:
            return tbl
        gg = tbl.append_column("_i", pa.array(np.arange(len(tbl), dtype=np.int64)))
        first = gg.group_by(["id_a", "id_b"], use_threads=False).aggregate([("_i", "min")])
        sel = np.sort(first["_i_min"].combine_chunks().to_numpy(zero_copy_only=False))
        return tbl.take(pa.array(sel))

    from raydedup.ops.pairs import dedup_pairs

    rows = fingerprints.map_batches(explode, batch_format="pyarrow")
    pairs = rows.groupby("bucket").map_groups(emit, batch_format="pyarrow")
    # cross-bucket dedup (a pair can surface from several blocks):
    # coarse-bucket drop_duplicates, never one group per pair
    return dedup_pairs(pairs, n_buckets=n_buckets)