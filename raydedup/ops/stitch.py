"""Shard-overlap stitching: find (a, b) pairs where a's last K chars
equal b's first K chars.

The ingestion-side repair op for content split across fetch shards or
pagination: a page captured as two shards with a K-char overlap window
is re-joinable by matching tail keys to head keys. Semantics are the
exact cross join ``right(a.text, K) = left(b.text, K) AND a != b`` over
docs with at least K chars.

Scale shape: each block emits two narrow rows per doc — a 128-bit hash
of its K-char tail (side 0) and of its K-char head (side 1) — bucketed
by the coarse hash so every occurrence of a key lands in one group; a
single lexsort kernel per bucket expands tail×head cross products
per key, fully vectorized (no per-key groups). Text never shuffles.
A boilerplate head/tail shared by many docs produces its full
quadratic pair set — that is the operator's defined output, same as
the SQL equi-join; callers wanting a cap should pre-dedup inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def stitch_pairs(ds, id_column: str, text_column: str = "text", k: int = 48, n_buckets: int = 64):
    """(id_a, id_b) pairs with a K-char suffix→prefix overlap (a ≠ b)."""
    from raydedup.sketches.hashing import hash_strings

    U64 = np.uint64

    def key_rows(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        okm = n >= k
        ok = pa.array(okm)
        text = text.filter(ok)
        ids = ids[okm]
        head = pc.utf8_slice_codeunits(text, 0, k)
        # per-row tail needs a varying start; slice offsets are scalars,
        # so take the tail as reverse(first-k(reverse(text)))
        tail = pc.utf8_reverse(pc.utf8_slice_codeunits(pc.utf8_reverse(text), 0, k))
        th1, th2 = hash_strings(tail)
        hh1, hh2 = hash_strings(head)
        h1 = np.concatenate([th1, hh1])
        h2 = np.concatenate([th2, hh2])
        side = np.concatenate(
            [np.zeros(len(ids), np.int64), np.ones(len(ids), np.int64)]
        )
        return pa.table(
            {
                "_bkt": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "side": pa.array(side),
                id_column: pa.array(np.concatenate([ids, ids])),
            }
        )

    def pair_bucket(g: pa.Table) -> pa.Table:
        h1 = g["h1"].to_numpy(zero_copy_only=False)
        h2 = g["h2"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, side, h2, h1))
        s1, s2, ss, si = h1[order], h2[order], side[order], ids[order]
        new = np.ones(len(order), dtype=bool)
        new[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        run_id = np.cumsum(new) - 1
        n_runs = int(run_id[-1]) + 1 if len(run_id) else 0
        # per run: tails first (side 0), then heads (side 1)
        n_tail = np.bincount(run_id, weights=(ss == 0), minlength=n_runs).astype(np.int64)
        n_head = np.bincount(run_id, weights=(ss == 1), minlength=n_runs).astype(np.int64)
        starts = np.flatnonzero(new)
        tot = n_tail * n_head
        total = int(tot.sum())
        if total == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        # cross-product expansion: run r contributes n_tail[r]*n_head[r]
        # rows; tail index advances every n_head rows, head index cycles
        run_of_pair = np.repeat(np.arange(n_runs), tot)
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(tot)[:-1]]), tot
        )
        ia = si[starts[run_of_pair] + off // n_head[run_of_pair]]
        ib = si[starts[run_of_pair] + n_tail[run_of_pair] + off % n_head[run_of_pair]]
        keep = ia != ib
        return pa.table(
            {"id_a": pa.array(ia[keep]), "id_b": pa.array(ib[keep])}
        )

    rows = ds.select_columns([id_column, text_column]).map_batches(
        key_rows, batch_format="pyarrow"
    )
    return rows.groupby("_bkt").map_groups(pair_bucket, batch_format="pyarrow")
