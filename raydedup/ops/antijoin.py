"""Semi / anti join on an arbitrary key column — "rows of LEFT that
have (semi) / don't have (anti) a key match in RIGHT", the existence
joins behind decontamination, allow/deny-list filtering, and referential
checks.

Scale design (the ``flag_new_docs`` shape generalized from content
hashes to any key; see ops/exact.py:150):

1. both sides hash their key to 128 bits map-side (values never travel);
2. a Bloom filter of the RIGHT keys tree-reduces to one bounded image
   and broadcasts once via ``ray.put``;
3. Bloom MISSES on the left are definitively matchless (no false
   negatives) and never shuffle — for anti they stream straight to the
   output, for semi they drop;
4. Bloom hits are candidates (true matches + fpp); a second Bloom over
   the candidate keys back-prunes the RIGHT side to the rows that
   could confirm anything;
5. candidates and surviving right keys meet in a bucketed cogroup
   (``h1 % n_buckets``) where one vectorized 128-bit searchsorted per
   bucket clears the false positives.

Nothing proportional to the right side shuffles; left rows shuffle only
when the Bloom says they might match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
_KEY = np.dtype([("a", "<u8"), ("b", "<u8")])


def key_match_flags(
    left,
    right,
    id_column: str,
    left_on: str,
    right_on: str,
    n_buckets: int = 64,
    bloom_fpp: float = 0.01,
):
    """(id, matched) for every left row: ``matched`` True iff the
    row's ``left_on`` value appears in RIGHT's ``right_on`` column."""
    import ray

    from raydedup.sketches.aggregates import _column_hashes, block_reduce
    from raydedup.sketches.bloom import BloomFilter

    def hash_side(ds, on: str, with_id: bool):
        cols = [id_column, on] if with_id else [on]

        def f(b: pa.Table) -> pa.Table:
            h1, h2 = (
                _column_hashes(b[on]) if len(b) else (np.empty(0, U64), np.empty(0, U64))
            )
            out = {
                "_h1": pa.array(h1.view(np.int64)),
                "_h2": pa.array(h2.view(np.int64)),
            }
            if with_id:
                out[id_column] = b[id_column]
            return pa.table(out)

        return ds.select_columns(list(dict.fromkeys(cols))).map_batches(
            f, batch_format="pyarrow"
        )

    left_hashed = hash_side(left, left_on, with_id=True).materialize()
    right_hashed = hash_side(right, right_on, with_id=False).materialize()
    n_right = right_hashed.count()

    def bloom_of(ds, expected: int):
        proto = BloomFilter.with_accuracy(max(expected, 64), bloom_fpp)
        m, k = proto.num_bits, proto.num_hashes

        def partial(batch: pa.Table):
            bf = BloomFilter(m, k)
            bf.insert(batch["_h1"].to_numpy(zero_copy_only=False).view(U64))
            return bf.to_bytes()

        def merge(a: bytes, b: bytes):
            return BloomFilter.from_bytes(a).union(BloomFilter.from_bytes(b)).to_bytes()

        row = ds.aggregate(block_reduce(partial, merge, name="bloom"))
        blob = row.get("bloom") if row else None
        return BloomFilter.from_bytes(blob) if blob else BloomFilter(m, k)

    rbloom = bloom_of(right_hashed, n_right)
    bref = ray.put((rbloom.num_bits, rbloom.num_hashes, rbloom.seed, rbloom.bits))

    def add_hit(batch: pa.Table, ref) -> pa.Table:
        nb, nh, seed, bits = ray.get(ref)
        bf = BloomFilter(nb, nh, seed=seed, bits=bits)
        h = batch["_h1"].to_numpy(zero_copy_only=False).view(U64)
        return batch.append_column("_maybe", pa.array(bf.contains(h)))

    flagged = left_hashed.map_batches(add_hit, fn_args=(bref,), batch_format="pyarrow")
    flagged = flagged.materialize()
    misses = flagged.filter(expr="_maybe == False").map_batches(  # noqa: E712
        lambda b: pa.table(
            {
                id_column: b[id_column],
                "matched": pa.array(np.zeros(len(b), dtype=bool)),
            }
        ),
        batch_format="pyarrow",
    )
    cands = flagged.filter(expr="_maybe")
    n_cands = cands.count()
    if n_cands == 0:
        return misses

    cbloom = bloom_of(cands, n_cands)
    cref = ray.put((cbloom.num_bits, cbloom.num_hashes, cbloom.seed, cbloom.bits))

    sch = left_hashed.schema()
    id_type = sch.types[sch.names.index(id_column)]

    def right_survivors(batch: pa.Table, ref) -> pa.Table:
        nb, nh, seed, bits = ray.get(ref)
        bf = BloomFilter(nb, nh, seed=seed, bits=bits)
        h1 = batch["_h1"].to_numpy(zero_copy_only=False).view(U64)
        t = batch.filter(pa.array(bf.contains(h1)))
        n = len(t)
        return pa.table(
            {
                "_b": pa.array(
                    (t["_h1"].to_numpy(zero_copy_only=False).view(U64) % U64(n_buckets)).astype(np.int64)
                ),
                "_h1": t["_h1"],
                "_h2": t["_h2"],
                id_column: pa.nulls(n, id_type),
                "_side": pa.array(np.ones(n, np.uint8)),
            }
        )

    def tag_cands(batch: pa.Table) -> pa.Table:
        h1 = batch["_h1"].to_numpy(zero_copy_only=False).view(U64)
        return pa.table(
            {
                "_b": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                "_h1": batch["_h1"],
                "_h2": batch["_h2"],
                id_column: batch[id_column].combine_chunks(),
                "_side": pa.array(np.zeros(len(batch), np.uint8)),
            }
        )

    def confirm_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        keys = np.empty(len(g), dtype=_KEY)
        keys["a"] = g["_h1"].to_numpy(zero_copy_only=False).view(U64)
        keys["b"] = g["_h2"].to_numpy(zero_copy_only=False).view(U64)
        is_cand = side == 0
        rk = np.sort(keys[~is_cand])
        ck = keys[is_cand]
        pos = np.searchsorted(rk, ck)
        hit = np.zeros(len(ck), dtype=bool)
        inb = pos < len(rk)
        hit[inb] = rk[pos[inb]] == ck[inb]
        ids = g[id_column].combine_chunks().take(pa.array(np.nonzero(is_cand)[0]))
        return pa.table({id_column: ids, "matched": pa.array(hit)})

    union = cands.map_batches(tag_cands, batch_format="pyarrow").union(
        right_hashed.map_batches(right_survivors, fn_args=(cref,), batch_format="pyarrow")
    )
    confirmed = union.groupby("_b").map_groups(confirm_bucket, batch_format="pyarrow")
    return confirmed.union(misses)


def anti_join_keys(left, right, id_column: str, left_on: str, right_on: str, **kw):
    """ids of left rows whose key has NO match in right."""
    flags = key_match_flags(left, right, id_column, left_on, right_on, **kw)
    return flags.filter(expr="matched == False").select_columns([id_column])  # noqa: E712


def semi_join_keys(left, right, id_column: str, left_on: str, right_on: str, **kw):
    """ids of left rows whose key HAS a match in right."""
    flags = key_match_flags(left, right, id_column, left_on, right_on, **kw)
    return flags.filter(expr="matched").select_columns([id_column])
