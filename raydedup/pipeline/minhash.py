"""MinHash signatures and LSH band keys, vectorized.

The signature scheme (BASELINE.json north_star: 128 permutations over
5-gram shingles): permutation ``p`` of a shingle hash ``s`` is
``fmix64(s XOR salt_p)`` with 128 deterministic salts derived from the
run seed — the same hash-once/fan-out economics as the reference's HLL
coupons (``hll/mod.rs:169-174``): the expensive string hashing happened
in the shingle stage; each permutation is 5 integer ops.

``sig[d][p] = min over shingles s of doc d of fmix64(s ^ salt_p)``.

By min-wise hashing, P(sig_a[p] == sig_b[p]) ≈ Jaccard(A, B), so the
expected fraction of agreeing signature slots estimates Jaccard with
stderr ~ sqrt(J(1-J)/128).

LSH banding: the 128 slots split into ``bands`` groups of ``rows``;
each band's key is murmur3-128 h1 of its rows as a fixed-width record.
Two docs collide in a band iff all its rows agree — P(collision in
>=1 band) = 1 - (1 - J^rows)^bands (the standard S-curve).
"""

from __future__ import annotations

import numpy as np

from raydedup.sketches.hashing import fmix64, murmur3_128_fixed

U64 = np.uint64

#: signature slot for documents with zero shingles — never matches a
#: real minimum (fmix64 output of 2^64-1 is astronomically unlikely to
#: tie across 128 slots); empty docs are excluded from banding anyway.
EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)

_SALT_STRIDE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio increment


def perm_salts(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation salts from the run seed."""
    idx = np.arange(1, num_perms + 1, dtype=U64)
    return fmix64(idx * _SALT_STRIDE + U64(seed))


def minhash_signatures(
    shingles: np.ndarray,
    offsets: np.ndarray,
    num_perms: int = 128,
    seed: int = 9001,
    perm_chunk: int = 16,
) -> np.ndarray:
    """(n_docs, num_perms) uint64 signature matrix from ragged shingles.

    Permutations are evaluated ``perm_chunk`` at a time so the working
    set stays ~perm_chunk * n_shingles * 8 bytes; per-doc minima use
    ``np.minimum.reduceat`` on the flat axis (no Python per-row loop).
    """
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, num_perms), EMPTY_SLOT, dtype=U64)
    if len(shingles) == 0 or n_docs == 0:
        return sig
    salts = perm_salts(num_perms, seed)
    counts = np.diff(offsets)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    for c0 in range(0, num_perms, perm_chunk):
        chunk = salts[c0 : c0 + perm_chunk]
        # (chunk, n_shingles): permuted values
        vals = fmix64(shingles[None, :] ^ chunk[:, None])
        mins = np.minimum.reduceat(vals, starts, axis=1)
        sig[nonempty, c0 : c0 + len(chunk)] = mins.T
    return sig


def band_keys(sig: np.ndarray, bands: int, rows: int, seed: int = 9001) -> np.ndarray:
    """(n_docs, bands) uint64 band-hash matrix.

    Each band hashes its ``rows`` signature slots as one fixed-width
    record through murmur3-128 (collision-safe vs simple XOR folding,
    which boilerplate-heavy rows would defeat).
    """
    n, p = sig.shape
    assert bands * rows == p, f"bands*rows != num_perms ({bands}*{rows} != {p})"
    recs = sig.reshape(n * bands, rows)
    pad_words = ((rows * 8 + 15) // 16) * 2
    mat = np.zeros((n * bands, pad_words), dtype=U64)
    mat[:, :rows] = recs
    h1, _ = murmur3_128_fixed(mat, 8 * rows, seed=seed)
    return h1.reshape(n, bands)


def signature_agreement(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Row-wise fraction of agreeing slots — the MinHash Jaccard estimate.

    ``sig_a``/``sig_b`` are (m, num_perms) matrices of paired docs.
    """
    return (sig_a == sig_b).mean(axis=1)
