"""b-bit MinHash (Li & Koenig 2010) — one-bit signature Jaccard.

Storing only the LOWEST BIT of each MinHash slot shrinks a P-perm
signature from 4P bytes to P/8 bytes (32x for the u32 slots here). Two
docs with Jaccard J agree on an unbiased slot's bit with probability
C + (1-C)·J, where C -> 1/2 as the shingle universe grows, so
``J_est = 2·agree - 1`` (clipped at 0) recovers J with variance ~1/P
at a fraction of the storage/bandwidth — the estimator a 100-TB
near-dup index would keep hot in memory.

Scale shape: folding is map-side over the signature table (one pass,
packed to ceil(P/64) u64 words per doc); pair estimates attach the
folded words to each pair side via narrow hash joins (ids + 16 bytes
per row through the exchange — never the 4P-byte signature).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.int64)


def _popcount_u64(words: np.ndarray) -> np.ndarray:
    """Per-row popcount of an (n, W) uint64 matrix (LUT over bytes)."""
    by = words.reshape(len(words), -1).view(np.uint8)
    return _POP8[by].sum(axis=1)


def fold_sig_bits(sig_matrix: np.ndarray) -> np.ndarray:
    """(n, P) signature slots → (n, ceil(P/64)) packed low-bit words."""
    n, p = sig_matrix.shape
    nw = (p + 63) // 64
    bits = (sig_matrix & 1).astype(np.uint64)
    words = np.zeros((n, nw), dtype=np.uint64)
    for j in range(p):
        words[:, j // 64] |= bits[:, j] << np.uint64(j % 64)
    return words


def _sig_matrix(sig_col, num_perms: int) -> np.ndarray:
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    flat = sig_col.flatten()
    return flat.to_numpy(zero_copy_only=False).reshape(-1, num_perms)


def fold_signatures(signatures, id_column: str, num_perms: int, out_id: str, suffix: str):
    """Signature dataset → (out_id, f0<suffix>, f1<suffix>) folded words
    (map-side only). Assumes num_perms <= 128 (two words)."""
    assert num_perms <= 128

    def fold(batch: pa.Table) -> pa.Table:
        words = fold_sig_bits(_sig_matrix(batch["sig"], num_perms))
        if words.shape[1] < 2:
            words = np.pad(words, ((0, 0), (0, 2 - words.shape[1])))
        return pa.table(
            {
                out_id: batch[id_column],
                f"f0{suffix}": pa.array(words[:, 0].view(np.int64), pa.int64()),
                f"f1{suffix}": pa.array(words[:, 1].view(np.int64), pa.int64()),
            }
        )

    return signatures.select_columns([id_column, "sig"]).map_batches(
        fold, batch_format="pyarrow"
    )


def bbit_jaccard_pairs(
    signatures,
    pairs,
    id_column: str = "url",
    a_column: str = "url_a",
    b_column: str = "url_b",
    num_perms: int = 128,
    num_partitions: int = 8,
):
    """(a, b, agree_bits, j_b1) per pair from 1-bit folded signatures.

    ``agree_bits`` = matching low bits of ``num_perms``; ``j_b1`` =
    max(2·agree/P − 1, 0) — the b=1 estimator. Folds attach to the pair
    table via two narrow hash joins."""
    import pyarrow.compute as pc

    fa = fold_signatures(signatures, id_column, num_perms, a_column, "a")
    fb = fold_signatures(signatures, id_column, num_perms, b_column, "b")
    joined = pairs.select_columns([a_column, b_column]).join(
        fa, join_type="inner", num_partitions=num_partitions, on=(a_column,)
    )
    joined = joined.join(
        fb, join_type="inner", num_partitions=num_partitions, on=(b_column,)
    )

    mask_hi = (
        np.uint64(0xFFFFFFFFFFFFFFFF)
        if num_perms >= 128
        else np.uint64((1 << max(num_perms - 64, 0)) - 1)
    )

    def estimate(batch: pa.Table) -> pa.Table:
        f0a = batch["f0a"].to_numpy(zero_copy_only=False).view(np.uint64)
        f1a = batch["f1a"].to_numpy(zero_copy_only=False).view(np.uint64)
        f0b = batch["f0b"].to_numpy(zero_copy_only=False).view(np.uint64)
        f1b = batch["f1b"].to_numpy(zero_copy_only=False).view(np.uint64)
        x0 = ~(f0a ^ f0b)
        x1 = (~(f1a ^ f1b)) & mask_hi
        if num_perms < 64:
            x0 &= np.uint64((1 << num_perms) - 1)
            x1 &= np.uint64(0)
        agree = _popcount_u64(np.stack([x0, x1], axis=1))
        j = np.maximum(2.0 * (agree / float(num_perms)) - 1.0, 0.0)
        return pa.table(
            {
                a_column: batch[a_column],
                b_column: batch[b_column],
                "agree_bits": pa.array(agree, pa.int64()),
                "j_b1": pa.array(j, pa.float64()),
            }
        )

    return joined.map_batches(estimate, batch_format="pyarrow")
