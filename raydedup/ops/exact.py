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
    from raydedup.sketches.aggregates import block_reduce
    from raydedup.sketches.theta import ThetaSketch, theta_union

    def partial(block: pa.Table):
        h1, _ = hash_strings(block[text_column])
        return ThetaSketch.from_hashes(h1 >> np.uint64(1), lg_k=lg_k)

    sk = ds.select_columns([text_column]).aggregate(
        block_reduce(partial, lambda a, b: theta_union([a, b]), name="sketch")
    )["sketch"]
    return sk if sk is not None else ThetaSketch.new_empty(lg_k)


def paragraph_dedup(
    ds,
    id_column: str,
    text_column: str = "text",
    chunk_words: int = 32,
    n_buckets: int = 64,
):
    """Sub-document exact dedup (the RefinedWeb/CCNet paragraph pass):
    per-doc fraction of fixed-word-count chunks whose text appears
    byte-identically at an earlier ``(doc_id, chunk_idx)`` anywhere in
    the corpus. Returns (id, n_chunks, n_dup_chunks, dup_frac).

    Scale design: chunks are derived and hashed inside their own block
    (``chunk_docs`` + murmur3-128 — chunk text never shuffles); the
    content exchange groups coarse hash-buckets, not per-chunk groups,
    and one lexsort-by-(h, id, idx) run-boundary kernel marks every
    duplicate in a bucket; per-doc counts pre-aggregate inside the
    bucket so the second shuffle carries one row per (doc, bucket),
    not per chunk. ``id_column`` must be numeric (the engine's doc ids
    are int64).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from raydedup.ops.text_stats import chunk_docs

    U64 = np.uint64

    def to_hashed_chunks(batch: pa.Table) -> pa.Table:
        ch = chunk_docs(batch, id_column, text_column, chunk_words)
        h1, h2 = hash_strings(ch["chunk_text"])
        return pa.table(
            {
                "_bkt": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                "h1": pa.array(h1, pa.uint64()),
                "h2": pa.array(h2, pa.uint64()),
                id_column: ch[id_column],
                "chunk_idx": ch["chunk_idx"],
            }
        )

    def mark_bucket(g: pa.Table) -> pa.Table:
        h1 = g["h1"].to_numpy(zero_copy_only=False)
        h2 = g["h2"].to_numpy(zero_copy_only=False)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        cidx = g["chunk_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cidx, ids, h2, h1))
        sh1, sh2 = h1[order], h2[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])
        uid, inv = np.unique(ids[order], return_inverse=True)
        n = np.bincount(inv, minlength=len(uid)).astype(np.int64)
        ndup = np.bincount(inv, weights=(~first).astype(np.int64), minlength=len(uid)).astype(
            np.int64
        )
        return pa.table(
            {
                id_column: pa.array(uid),
                "n_chunks": pa.array(n),
                "n_dup_chunks": pa.array(ndup),
            }
        )

    hashed = ds.select_columns([id_column, text_column]).map_batches(
        to_hashed_chunks, batch_format="pyarrow"
    )
    partials = hashed.groupby("_bkt").map_groups(mark_bucket, batch_format="pyarrow")
    out = partials.groupby(id_column).aggregate(
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("n_dup_chunks", alias_name="n_dup_chunks"),
    )

    def add_frac(batch: pa.Table) -> pa.Table:
        frac = pc.round(
            pc.divide(
                pc.cast(batch["n_dup_chunks"], pa.float64()),
                pc.cast(batch["n_chunks"], pa.float64()),
            ),
            ndigits=6,
        )
        return batch.append_column("dup_frac", frac)

    return out.map_batches(add_frac, batch_format="pyarrow")


def flag_new_docs(
    new_ds,
    base_ds,
    id_column: str,
    text_column: str = "text",
    n_buckets: int = 64,
    bloom_fpp: float = 0.01,
):
    """Incremental (cross-snapshot) exact dedup: (id, is_new) for every
    row of ``new_ds`` — ``is_new`` False iff its text appears
    byte-identically in ``base_ds``. The continuous-crawl shape.

    Scale design (base snapshot >> delta, so nothing proportional to
    the base may shuffle):

    1. hash both sides to 128-bit content hashes (the text never
       travels past its own block);
    2. tree-reduce a Bloom filter of the BASE hashes
       (``block_reduce`` — bounded image, the driver sees one blob),
       broadcast it once via ``ray.put``;
    3. Bloom-prune the delta: misses are definitely new and skip the
       shuffle entirely; hits become *candidates* (true dups + fpp);
    4. a second Bloom over the candidates prunes the BASE side to the
       rows that could confirm anything;
    5. candidates and surviving base rows meet in a bucketed cogroup
       (``hash % n_buckets``) where one vectorized 128-bit
       searchsorted per bucket clears the Bloom false positives.
    """
    import pyarrow.compute as pc

    import ray

    from raydedup.sketches.aggregates import block_reduce
    from raydedup.sketches.bloom import BloomFilter

    U64 = np.uint64

    def hashed(ds, with_id: bool):
        cols = [id_column, text_column] if with_id else [text_column]

        def f(b: pa.Table) -> pa.Table:
            out = add_content_hash(b, text_column).drop_columns([text_column])
            return out

        return ds.select_columns(cols).map_batches(f, batch_format="pyarrow")

    new_hashed = hashed(new_ds, with_id=True).materialize()
    base_hashed = hashed(base_ds, with_id=False).materialize()
    n_base = base_hashed.count()  # metadata on a materialized ds

    def bloom_of(ds, expected: int):
        proto = BloomFilter.with_accuracy(max(expected, 64), bloom_fpp)
        m, k = proto.num_bits, proto.num_hashes

        def partial(batch: pa.Table):
            bf = BloomFilter(m, k)
            bf.insert(batch["content_h1"].to_numpy(zero_copy_only=False).astype(U64))
            return bf.to_bytes()

        def merge(a: bytes, b: bytes):
            return BloomFilter.from_bytes(a).union(BloomFilter.from_bytes(b)).to_bytes()

        row = ds.aggregate(block_reduce(partial, merge, name="bloom"))
        blob = row.get("bloom") if row else None
        return BloomFilter.from_bytes(blob) if blob else BloomFilter(m, k)

    base_bloom = bloom_of(base_hashed, n_base)
    bref = ray.put(
        (base_bloom.num_bits, base_bloom.num_hashes, base_bloom.seed, base_bloom.bits)
    )

    def add_hit(batch: pa.Table, ref) -> pa.Table:
        nb, nh, seed, bits = ray.get(ref)
        bf = BloomFilter(nb, nh, seed=seed, bits=bits)
        h = batch["content_h1"].to_numpy(zero_copy_only=False).astype(U64)
        return batch.append_column("maybe_dup", pa.array(bf.contains(h)))

    flagged = new_hashed.map_batches(add_hit, fn_args=(bref,), batch_format="pyarrow")
    flagged = flagged.materialize()  # feeds the miss path and the confirm path
    misses = flagged.filter(expr="maybe_dup == False").select_columns([id_column])  # noqa: E712
    cands = flagged.filter(expr="maybe_dup")

    n_cands = cands.count()
    if n_cands == 0:
        return misses.map_batches(
            lambda b: pa.table({id_column: b[id_column]}).append_column(
                "is_new", pa.array(np.ones(len(b), dtype=bool))
            ),
            batch_format="pyarrow",
        )

    cand_bloom = bloom_of(cands, n_cands)
    cref = ray.put(
        (cand_bloom.num_bits, cand_bloom.num_hashes, cand_bloom.seed, cand_bloom.bits)
    )

    sch = new_hashed.schema()
    id_type = sch.types[sch.names.index(id_column)]

    def base_hits(batch: pa.Table, ref) -> pa.Table:
        nb, nh, seed, bits = ray.get(ref)
        bf = BloomFilter(nb, nh, seed=seed, bits=bits)
        h1 = batch["content_h1"].to_numpy(zero_copy_only=False).astype(U64)
        keep = bf.contains(h1)
        t = batch.filter(pa.array(keep))
        n = len(t)
        return pa.table(
            {
                "_cbucket": pa.array(
                    (t["content_h1"].to_numpy(zero_copy_only=False).astype(U64) % U64(n_buckets)).astype(np.int64)
                ),
                "content_h1": t["content_h1"],
                "content_h2": t["content_h2"],
                id_column: pa.nulls(n, id_type),
                "_side": pa.array(np.ones(n, np.uint8)),
            }
        )

    def tag_cands(batch: pa.Table) -> pa.Table:
        h1 = batch["content_h1"].to_numpy(zero_copy_only=False).astype(U64)
        return pa.table(
            {
                "_cbucket": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                "content_h1": batch["content_h1"],
                "content_h2": batch["content_h2"],
                id_column: batch[id_column].combine_chunks(),
                "_side": pa.array(np.zeros(len(batch), np.uint8)),
            }
        )

    KEY = np.dtype([("a", "<u8"), ("b", "<u8")])

    def confirm_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        h1 = g["content_h1"].to_numpy(zero_copy_only=False).astype(U64)
        h2 = g["content_h2"].to_numpy(zero_copy_only=False).astype(U64)
        keys = np.empty(len(h1), dtype=KEY)
        keys["a"], keys["b"] = h1, h2
        is_cand = side == 0
        base_keys = np.sort(keys[~is_cand])
        ck = keys[is_cand]
        pos = np.searchsorted(base_keys, ck)
        hit = np.zeros(len(ck), dtype=bool)
        inb = pos < len(base_keys)
        hit[inb] = base_keys[pos[inb]] == ck[inb]
        ids = g[id_column].combine_chunks().take(pa.array(np.nonzero(is_cand)[0]))
        return pa.table({id_column: ids, "is_new": pa.array(~hit)})

    union = cands.map_batches(tag_cands, batch_format="pyarrow").union(
        base_hashed.map_batches(base_hits, fn_args=(cref,), batch_format="pyarrow")
    )
    confirmed = union.groupby("_cbucket").map_groups(confirm_bucket, batch_format="pyarrow")
    new_true = misses.map_batches(
        lambda b: pa.table({id_column: b[id_column]}).append_column(
            "is_new", pa.array(np.ones(len(b), dtype=bool))
        ),
        batch_format="pyarrow",
    )
    return confirmed.union(new_true)
