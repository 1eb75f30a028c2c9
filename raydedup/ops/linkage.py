"""Record linkage: blocked string-similarity join via batched
Levenshtein.

Classic entity-resolution shape: a cheap BLOCKING key (exact equality,
e.g. brand / zip / phonetic key) bounds the candidate space, then an
edit-distance verify keeps pairs within ``max_dist``. The verify is a
fully vectorized Wagner-Fischer DP batched across the PAIR axis: the
only Python loop is over the (short) left-string length; the
insertion recurrence — a prefix-min along the row, normally
sequential — is closed-form as ``j + running_min(cur[k] - k)`` via
``np.minimum.accumulate``.

Scale design (100 TB lens):
- One bucketed exchange of (bucket, block-key, id, padded-name bytes)
  rows; each bucket kernel handles every block that hashes into it as
  equal-key runs of one lexsort — never per-block Python groups.
- Pair emission is run-length all-pairs (ids ascending → a < b); a hot
  block with d members emits d²/2 pairs — cap or sub-block when a
  blocking key degenerates (documented, same class as LSH mega-bands).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.hashing import hash_strings

U64 = np.uint64


def batched_levenshtein(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Unit-cost Levenshtein for P string pairs. ``A``: (P, Ma) uint8
    codes padded with zeros, ``la``: true lengths; same for B."""
    P, Ma = A.shape
    Mb = B.shape[1]
    ar = np.arange(Mb + 1, dtype=np.int32)
    prev = np.tile(ar, (P, 1))
    res = np.empty(P, dtype=np.int32)
    done = la == 0
    res[done] = lb[done]
    for i in range(1, Ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]
        sub = prev[:, :-1] + (ai != B).astype(np.int32)
        cur[:, 1:] = np.minimum(sub, prev[:, 1:] + 1)
        # insertion = prefix-min along the row: min_k<=j (cur[k] + j-k)
        cur = np.minimum.accumulate(cur - ar[None, :], axis=1) + ar[None, :]
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def _pad_codes(names: pa.Array, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized zero-padded byte matrix from an Arrow string array:
    offsets + one scatter, no per-row Python."""
    arr = names.cast(pa.large_utf8())
    off_buf = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    offs = off_buf[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    n = len(arr)
    full = offs[1:] - offs[:-1]
    take = np.minimum(full, width).astype(np.int64)
    out = np.zeros((n, width), dtype=np.uint8)
    total = int(take.sum())
    if total:
        cum = np.cumsum(take)
        within = np.arange(total, dtype=np.int64) - np.repeat(cum - take, take)
        src = np.repeat(offs[:-1], take) + within
        rows_idx = np.repeat(np.arange(n, dtype=np.int64), take)
        out[rows_idx, within] = data[src]
    return out, take.astype(np.int32)


def linkage_pairs(
    ds,
    block_col: str,
    name_col: str,
    id_col: str,
    max_dist: int = 3,
    max_len: int = 64,
    n_buckets: int = 32,
):
    """→ Dataset (id_a, id_b, dist): pairs sharing ``block_col`` with
    Levenshtein(name_a, name_b) <= ``max_dist``; names longer than
    ``max_len`` bytes are compared on their first ``max_len`` bytes."""

    def rows(batch: pa.Table) -> pa.Table:
        bk = batch[block_col]
        if isinstance(bk, pa.ChunkedArray):
            bk = bk.combine_chunks()
        bh, _ = hash_strings(bk)
        nm = batch[name_col]
        if isinstance(nm, pa.ChunkedArray):
            nm = nm.combine_chunks()
        codes, ln = _pad_codes(nm, max_len)
        return pa.table(
            {
                "_gb": pa.array((bh % U64(n_buckets)).astype(np.int64)),
                "bk": pa.array(bh.view(np.int64)),
                "id": pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "ln": pa.array(ln.astype(np.int64)),
                "nm": pa.Array.from_buffers(
                    pa.binary(max_len), len(ln), [None, pa.py_buffer(codes.tobytes())]
                ),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        bk = g["bk"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        ln = g["ln"].to_numpy(zero_copy_only=False).astype(np.int32)
        nmarr = g["nm"]
        if isinstance(nmarr, pa.ChunkedArray):
            nmarr = nmarr.combine_chunks()
        width = nmarr.type.byte_width
        buf = np.frombuffer(nmarr.buffers()[1], dtype=np.uint8)
        start = nmarr.offset * width
        nm = buf[start : start + len(nmarr) * width].reshape(-1, width)
        order = np.lexsort((ids, bk))
        bk, ids, ln, nm = bk[order], ids[order], ln[order], nm[order]
        new = np.ones(len(bk), bool)
        new[1:] = bk[1:] != bk[:-1]
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.zeros(len(run_len), np.int64)
        np.cumsum(run_len[:-1], out=run_start[1:])
        ia_all, ib_all = [], []
        for s in np.unique(run_len[run_len >= 2]):
            starts = run_start[run_len == s]
            members = starts[:, None] + np.arange(s)[None, :]
            ia, ib = np.triu_indices(int(s), k=1)
            ia_all.append(members[:, ia].reshape(-1))
            ib_all.append(members[:, ib].reshape(-1))
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        dist = batched_levenshtein(nm[ia], ln[ia], nm[ib], ln[ib])
        keep = dist <= max_dist
        return pa.table(
            {
                "id_a": pa.array(ids[ia[keep]], pa.int64()),
                "id_b": pa.array(ids[ib[keep]], pa.int64()),
                "dist": pa.array(dist[keep].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(kernel, batch_format="pyarrow")
    )
