"""ICWS: Improved Consistent Weighted Sampling (Ioffe 2010).

The weighted-MinHash family: for token multisets with positive
weights (term frequencies), ICWS draws, per signature slot, a sample
(token, t) such that two sets' slots collide with probability exactly
their weighted Jaccard

    J_w(A, B) = sum_t min(a_t, b_t) / sum_t max(a_t, b_t)

— the weighted analog of what unweighted MinHash does for plain sets.
This gives corpus-scale candidate generation where tf matters ("the
the the cat" vs "the cat cat cat"); exact verification of survivors is
``ops/wjaccard.py::weighted_jaccard_pairs``.

Per Ioffe's construction, for token hash h with weight w > 0 and slot
k (all randomness is deterministic fmix64 chains of (h, k) — no RNG
state, so signatures are reproducible anywhere):

    r ~ Gamma(2,1) = -ln(u1 u2)
    c ~ Gamma(2,1) = -ln(u3 u4)
    b ~ Uniform(0,1]
    t = floor(ln(w)/r + b)
    a = c * exp(-r * (t - b + 1))

The slot's sample is the token minimizing ``a``; its identity is
fmix64(h ^ fmix64(t)) so both the winning token AND its quantized
weight level must agree for a slot collision — the property that makes
collision probability equal J_w.

Vectorization: one pass per slot (like the 128-permutation MinHash),
each pass a flat NumPy expression over all (doc, token) rows with a
segment-min reduce per doc; ``ln w`` is hoisted out of the slot loop.
"""

from __future__ import annotations

import numpy as np

from raydedup.sketches.hashing import fmix64

U64 = np.uint64
_C1 = U64(0x9E3779B97F4A7C15)
_C2 = U64(0xC2B2AE3D27D4EB4F)
_C3 = U64(0x165667B19E3779F9)
_C4 = U64(0x27D4EB2F165667C5)
_C5 = U64(0x85EBCA77C2B2AE63)


def _u01(x: np.ndarray) -> np.ndarray:
    """uint64 -> Uniform(0, 1]: top 53 bits, +1 so 0 is excluded."""
    return ((x >> U64(11)).astype(np.float64) + 1.0) * (2.0**-53)


def icws_signatures(
    tok: np.ndarray,
    weight: np.ndarray,
    doc_of: np.ndarray,
    n_docs: int,
    num_hashes: int = 128,
    seed: int = 9001,
) -> np.ndarray:
    """(rows) token-hash u64 / weight>0 / doc index (non-decreasing)
    -> (n_docs, num_hashes) uint64 slot samples. Docs with zero rows
    get slot value 0 (they have no weighted set; compare only docs
    with tokens)."""
    tok = tok.astype(U64, copy=False)
    weight = np.asarray(weight, dtype=np.float64)
    doc_of = np.asarray(doc_of, dtype=np.int64)
    if len(tok) and (np.diff(doc_of) < 0).any():
        raise ValueError("icws_signatures: doc_of must be non-decreasing")
    if (weight <= 0).any():
        raise ValueError("icws_signatures: weights must be positive")
    out = np.zeros((n_docs, num_hashes), dtype=U64)
    if len(tok) == 0:
        return out
    starts = np.flatnonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])
    seg_docs = doc_of[starts]
    seg_id = np.cumsum(np.r_[True, doc_of[1:] != doc_of[:-1]]) - 1
    lnw = np.log(weight)
    for k in range(num_hashes):
        # uint64 wraparound is intended; array arithmetic avoids the
        # numpy scalar-overflow warning
        ck = fmix64(np.array([seed], U64) + np.array([k], U64) * _C1)[0]
        base = tok ^ ck
        r = -np.log(_u01(fmix64(base + _C1)) * _u01(fmix64(base + _C2)))
        c = -np.log(_u01(fmix64(base + _C3)) * _u01(fmix64(base + _C4)))
        bta = _u01(fmix64(base + _C5))
        t = np.floor(lnw / r + bta)
        a = c * np.exp(-r * (t - bta + 1.0))
        minv = np.minimum.reduceat(a, starts)
        is_min = a == minv[seg_id]
        idx = np.flatnonzero(is_min)
        first = np.r_[True, seg_id[idx][1:] != seg_id[idx][:-1]]
        win = idx[first]
        sample = fmix64(tok[win] ^ fmix64(t[win].astype(np.int64).view(U64)))
        out[seg_docs, k] = sample
    return out


def icws_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Slot-agreement fraction: unbiased estimate of J_w. Accepts
    (P,) or (n, P) arrays (row-wise estimates)."""
    return (np.asarray(sig_a) == np.asarray(sig_b)).mean(axis=-1)
