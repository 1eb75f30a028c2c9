"""MinHash signatures and LSH band keys, vectorized.

The signature scheme (BASELINE.json north_star: 128 permutations over
5-gram shingles): permutation ``p`` of a shingle hash ``s`` is the u64
bijection ``v = a_p*s + b_p; v ^= v>>31; v *= C`` with 128
deterministic (a, b) pairs derived from the run seed — the same
hash-once/fan-out economics as the reference's HLL coupons
(``hll/mod.rs:169-174``): the expensive string hashing happened in the
shingle stage; each permutation is 4 in-place vector ops.

``sig[d][p] = min over shingles s of doc d of perm_p(s)``.

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
_MIX_C = np.uint64(0xC4CEB9FE1A85EC53)  # murmur fmix constant


def perm_salts(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-permutation (multiplier, addend) pairs.

    The permutation family is ``v = (a_p * s + b_p); v ^= v >> 31;
    v *= C`` — a bijection on u64 (odd multipliers), 4 vector ops per
    permutation vs 6 alloc-heavy ones for full fmix64. Shingle hashes
    are already murmur3-uniform, so this family's minima behave
    min-wise (validated against exact Jaccard in the e2e tests).
    """
    idx = np.arange(1, num_perms + 1, dtype=U64)
    a = fmix64(idx * _SALT_STRIDE + U64(seed)) | U64(1)
    b = fmix64(a ^ U64(seed) ^ _MIX_C)
    return a, b


class MinHashWorkspace:
    """Reusable permutation buffers (page-fault once per actor, not per
    batch). ``slab`` bounds the flat-shingle working set: batches larger
    than the slab are processed in doc-aligned slices so peak memory is
    ~2 * perm_chunk * slab * 8 bytes regardless of batch size."""

    def __init__(self, num_perms: int = 128, seed: int = 9001, perm_chunk: int = 8, slab: int = 1 << 14):
        # slab * perm_chunk * 8B * 2 buffers = 2 MiB — sized to stay
        # cache-resident per core; the kernel is ~2x faster under full
        # 32-way parallelism than with streaming-sized buffers (memory
        # bandwidth, not ALU, is the contended resource on a node)
        self.num_perms = num_perms
        self.seed = seed
        self.perm_chunk = perm_chunk
        self.slab = slab
        self.a, self.b = perm_salts(num_perms, seed)
        self.buf = np.empty((perm_chunk, slab), dtype=U64)
        self.tmp = np.empty_like(self.buf)

    def _permute_min(self, shingles: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """(len(starts), num_perms) minima for one slab of flat shingles."""
        n = len(shingles)
        out = np.empty((len(starts), self.num_perms), dtype=U64)
        big = n > self.slab  # single giant doc: one-off buffers
        for c0 in range(0, self.num_perms, self.perm_chunk):
            m = min(self.perm_chunk, self.num_perms - c0)
            if big:
                v = shingles[None, :] * self.a[c0 : c0 + m, None]
                v += self.b[c0 : c0 + m, None]
                v ^= v >> U64(31)
            else:
                v, t = self.buf[:m, :n], self.tmp[:m, :n]
                np.multiply(shingles[None, :], self.a[c0 : c0 + m, None], out=v)
                v += self.b[c0 : c0 + m, None]
                np.right_shift(v, U64(31), out=t)
                v ^= t
            v *= _MIX_C
            out[:, c0 : c0 + m] = np.minimum.reduceat(v, starts, axis=1).T
        return out

    def signatures(self, shingles: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        n_docs = len(offsets) - 1
        sig = np.full((n_docs, self.num_perms), EMPTY_SLOT, dtype=U64)
        if len(shingles) == 0 or n_docs == 0:
            return sig
        nonempty = np.diff(offsets) > 0
        ne_idx = np.nonzero(nonempty)[0]
        # walk doc-aligned slabs: [lo, hi) docs whose shingles fit the slab
        lo = 0
        while lo < len(ne_idx):
            base = offsets[ne_idx[lo]]
            hi = lo + 1
            while hi < len(ne_idx) and offsets[ne_idx[hi] + 1] - base <= self.slab:
                hi += 1
            end = offsets[ne_idx[hi - 1] + 1]
            starts = offsets[:-1][ne_idx[lo:hi]] - base
            sig[ne_idx[lo:hi]] = self._permute_min(shingles[base:end], starts)
            lo = hi
        return sig


def minhash_signatures(
    shingles: np.ndarray,
    offsets: np.ndarray,
    num_perms: int = 128,
    seed: int = 9001,
    perm_chunk: int = 8,
    workspace: MinHashWorkspace | None = None,
) -> np.ndarray:
    """(n_docs, num_perms) uint64 signature matrix from ragged shingles.

    Permutations are evaluated ``perm_chunk`` at a time into
    preallocated slab buffers (no per-op allocations; buffers persist
    across batches when a ``workspace`` is passed — the actor-pool
    pattern); per-doc minima use ``np.minimum.reduceat``. No per-row
    Python loop anywhere.
    """
    ws = workspace or MinHashWorkspace(num_perms, seed, perm_chunk)
    return ws.signatures(shingles, offsets)


def oph_signatures(
    shingles: np.ndarray,
    offsets: np.ndarray,
    num_perms: int = 128,
    seed: int = 9001,
) -> np.ndarray:
    """One-permutation MinHash with densification (OPH).

    Li, Owen & Zhang (NIPS 2012) "One Permutation Hashing": instead of
    ``num_perms`` independent permutation passes, hash each shingle
    ONCE and split the hash universe into ``num_perms`` equal bins (the
    high bits pick the bin); the signature slot for a bin is the
    minimum hash that landed in it. Empty bins are filled by
    densification (Shrivastava & Li, ICML 2014): each empty bin borrows
    from the nearest non-empty bin to its left in circular order, with
    the borrow distance mixed into the borrowed value so two docs agree
    on a densified slot iff they borrowed the SAME value from the SAME
    relative offset — preserving P(agree) ~= J.

    Cost per shingle is one fmix64 + one argsort share, vs 128
    multiply/xor/min passes for the permutation family — the ALU-cheap
    signature path. Slot agreement has somewhat higher variance than
    true 128-perm MinHash for short docs (few filled bins), so the
    flagship default stays ``perm``; OPH is the opt-in scale mode and
    its candidates feed the same exact-Jaccard verify.

    Returns (n_docs, num_perms) uint64; all-empty docs keep EMPTY_SLOT
    rows (excluded from banding upstream, same contract as
    ``minhash_signatures``).
    """
    if num_perms & (num_perms - 1):
        raise ValueError(f"num_perms must be a power of two for OPH (got {num_perms})")
    n_docs = len(offsets) - 1
    k = num_perms
    sig = np.full((n_docs, k), EMPTY_SLOT, dtype=U64)
    if n_docs == 0 or len(shingles) == 0:
        return sig
    shift = U64(64 - int(np.log2(k)))
    salt = fmix64((np.asarray(seed, dtype=U64) * _SALT_STRIDE) ^ _MIX_C)
    h = fmix64(shingles ^ salt)  # one hash per shingle — the whole point
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    key = doc * k + (h >> shift).astype(np.int64)
    order = np.argsort(key, kind="stable")
    ks, hs = key[order], h[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    filled_key = ks[starts]
    flat = sig.reshape(-1)
    flat[filled_key] = np.minimum.reduceat(hs, starts)
    filled = np.zeros(n_docs * k, dtype=bool)
    filled[filled_key] = True
    filled = filled.reshape(n_docs, k)

    if filled.all():
        return sig
    # densify: circular left-fill via a doubled position index.
    # idx2[r, j] = doubled position j where filled, else -1; a running
    # max over the doubled axis yields, at position k+j, the nearest
    # filled bin at-or-before j in circular order.
    pos2 = np.arange(2 * k, dtype=np.int64)
    filled2 = np.concatenate([filled, filled], axis=1)
    idx2 = np.where(filled2, pos2[None, :], -1)
    ff = np.maximum.accumulate(idx2, axis=1)[:, k:]
    any_row = filled.any(axis=1)
    d = (np.arange(k, dtype=np.int64)[None, :] + k) - ff  # 0 for filled slots
    src = ff % k
    rows_idx = np.nonzero(any_row)[0]
    if len(rows_idx):
        vals = sig[rows_idx[:, None], src[rows_idx]]
        dd = d[rows_idx].astype(U64)
        borrowed = fmix64(vals ^ (dd * _SALT_STRIDE))
        sig[rows_idx] = np.where(d[rows_idx] == 0, vals, borrowed)
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
