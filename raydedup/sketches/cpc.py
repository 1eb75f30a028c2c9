"""CPC (Compressed Probabilistic Counting / FM85) sketch — bit-matrix form.

Follows the reference's coupon scheme exactly
(``cpc/sketch.rs:193-209``): murmur3-128 of the value,
``row = h1 & (k-1)``, ``col = min(lz(h2), 63)``; a coupon is the bit
``(row, col)``. State is kept as the full k x 64 bit matrix
(``uint64[k]``, bit ``col`` of word ``row``) — the same matrix
``CpcUnion`` accumulates (``cpc/union.rs:26-62``), so union is a
plain ``bitwise_or`` and is associative/commutative for any mix of
sketches at equal lg_k (downsampling to smaller lg_k ORs row groups,
mirroring ``cpc/union.rs``'s case analysis without the windowed
compression forms, which are memory optimizations for tiny sketches).

Estimator: method-of-moments inversion of the expected coupon count

    E[C](n) = k * sum_c (1 - exp(-n * 2^-(c+1) / k))

solved for n by bisection — statistically sound on the OR-merged
matrix (every merge order gives the same matrix, hence the same
estimate), with RSE comparable to the reference's ICON estimator
(asserted at the reference's tested operating point lg_k=11, n=1e4,
``cpc_update_test.rs:27,57-60``). The compressed DataSketches wire
format (flavors, Golomb pair coding, high-entropy window tables) is
implemented in ``cpc_codec.py`` (``cpc_to_java_bytes`` /
``cpc_from_java_bytes``); the internal fast format remains the raw
bit matrix (``codec.py`` header).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codec
from .hashing import DEFAULT_SEED, hash_strings, hash_u64_column
from .hll import leading_zeros64

U64 = np.uint64
MIN_LG_K, MAX_LG_K = 4, 26


def coupons_from_hashes(h1: np.ndarray, h2: np.ndarray, lg_k: int) -> tuple[np.ndarray, np.ndarray]:
    """(row, col) per cpc/sketch.rs:193-209."""
    k = 1 << lg_k
    row = (h1 & U64(k - 1)).astype(np.int64)
    col = np.minimum(leading_zeros64(h2), 63).astype(np.int64)
    # reference avoids the row_col == u32::MAX sentinel by flipping a row bit
    sentinel = (row == (k - 1)) & (col == 63) & (k - 1 == (1 << 26) - 1)
    row = np.where(sentinel, row ^ 1, row)
    return row, col


@dataclass
class CpcSketch:
    lg_k: int = 11
    matrix: np.ndarray = field(default=None)
    # sequential HIP accumulator state (cpc/sketch.rs:83-85,250-256):
    # valid only while the sketch is a single in-order stream. ``merged``
    # mirrors the reference's merge_flag — any union/deserialize sets it
    # and estimation falls back to ICON (cpc/estimator.rs:91-97), exactly
    # as the reference invalidates HIP on merge.
    kxp: float = field(default=None)
    hip_est_accum: float = 0.0
    merged: bool = False

    def __post_init__(self):
        if not MIN_LG_K <= self.lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K}, {MAX_LG_K}]")
        if self.matrix is None:
            self.matrix = np.zeros(1 << self.lg_k, dtype=U64)
        if self.kxp is None:
            self.kxp = float(1 << self.lg_k)

    @property
    def num_coupons(self) -> int:
        m = self.matrix
        # vectorized popcount over the matrix
        x = m.copy()
        x = x - ((x >> U64(1)) & U64(0x5555555555555555))
        x = (x & U64(0x3333333333333333)) + ((x >> U64(2)) & U64(0x3333333333333333))
        x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
        return int(((x * U64(0x0101010101010101)) >> U64(56)).sum())

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> "CpcSketch":
        row, col = coupons_from_hashes(h1, h2, self.lg_k)
        if not self.merged and len(row):
            # sequential HIP fold (cpc/sketch.rs:250-256), replayed
            # batched: novel coupons in STREAM order (first occurrence
            # within the batch, not already in the matrix), then
            #   hip += k/kxp;  kxp -= 2^-(col+1)
            # per novel coupon. The running kxp values are the prefix
            # sums of the decrements — cumsum matches the one-at-a-time
            # f64 sequence to ~1e-16 rel (tested vs a transcribed loop).
            key = (row << 6) | col
            _, first = np.unique(key, return_index=True)
            first.sort()
            r, c = row[first], col[first]
            novel = (self.matrix[r] >> c.astype(U64)) & U64(1) == 0
            c_novel = c[novel]
            if len(c_novel):
                k = float(1 << self.lg_k)
                dec = np.exp2(-(c_novel + 1).astype(np.float64))
                kxp_before = self.kxp - np.concatenate(([0.0], np.cumsum(dec[:-1])))
                self.hip_est_accum += float(np.sum(k / kxp_before))
                self.kxp -= float(dec.sum())
        np.bitwise_or.at(self.matrix, row, U64(1) << col.astype(U64))
        return self

    def update_strings(self, column, seed: int = DEFAULT_SEED) -> "CpcSketch":
        return self.update_hashes(*hash_strings(column, seed=seed))

    def update_ints(self, values, seed: int = DEFAULT_SEED) -> "CpcSketch":
        return self.update_hashes(*hash_u64_column(np.asarray(values), seed=seed))

    def _expected_coupons(self, n: float) -> float:
        k = float(1 << self.lg_k)
        c = np.arange(64, dtype=np.float64)
        return float(k * np.sum(-np.expm1(-n * np.exp2(-(c + 1.0)) / k)))

    def estimate_mom(self) -> float:
        """Method-of-moments inversion of E[C](n) — estimator-agnostic
        cross-check used by the accuracy tests."""
        c = self.num_coupons
        if c == 0:
            return 0.0
        lo, hi = 1.0, 2.0
        while self._expected_coupons(hi) < c and hi < 1e18:
            lo, hi = hi, hi * 2
        for _ in range(80):
            mid = (lo + hi) / 2
            if self._expected_coupons(mid) < c:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    def estimate(self) -> float:
        """Estimator dispatch exactly as ``cpc/estimator.rs:91-97``:
        the sequential HIP accumulator while the sketch is a single
        in-order stream, ICON (the merge-surviving estimator) once
        merged/deserialized."""
        if not self.merged:
            return self.hip_est_accum
        from .cpc_estimator import icon_estimate

        return icon_estimate(self.lg_k, self.num_coupons)

    def lower_bound(self, num_std_dev: int = 2) -> float:
        from .cpc_estimator import hip_confidence_lb, icon_confidence_lb

        if not self.merged:
            return hip_confidence_lb(self.lg_k, self.num_coupons, self.hip_est_accum, num_std_dev)
        return icon_confidence_lb(self.lg_k, self.num_coupons, num_std_dev)

    def upper_bound(self, num_std_dev: int = 2) -> float:
        from .cpc_estimator import hip_confidence_ub, icon_confidence_ub

        if not self.merged:
            return hip_confidence_ub(self.lg_k, self.num_coupons, self.hip_est_accum, num_std_dev)
        return icon_confidence_ub(self.lg_k, self.num_coupons, num_std_dev)

    def merge(self, other: "CpcSketch") -> "CpcSketch":
        return cpc_union([self, other])

    def to_bytes(self) -> bytes:
        """Internal fast format: header + matrix [+ (kxp, hip) when
        unmerged, mirroring the reference's has_hip serde —
        cpc/sketch.rs:463-501]."""
        flags = 0 if self.merged else codec.FLAG_HAS_HIP
        head = codec.pack_header(codec.FAMILY_CPC, self.lg_k, flags, 1)
        body = head + self.matrix.tobytes()
        if not self.merged:
            body += np.array([self.kxp, self.hip_est_accum], np.float64).tobytes()
        return body

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CpcSketch":
        lg_k, flags, _ = codec.unpack_header(buf, codec.FAMILY_CPC)
        k = 1 << lg_k
        m = np.frombuffer(buf, U64, k, codec.HEADER_SIZE).copy()
        if flags & codec.FLAG_HAS_HIP:
            kxp, hip = np.frombuffer(buf, np.float64, 2, codec.HEADER_SIZE + 8 * k)
            return cls(lg_k, m, kxp=float(kxp), hip_est_accum=float(hip), merged=False)
        return cls(lg_k, m, merged=True)


def downsample(matrix: np.ndarray, lg_from: int, lg_to: int) -> np.ndarray:
    """OR row groups to fold k down — valid because col derives from h2
    alone and row low bits are preserved (cpc/union.rs case analysis)."""
    if lg_from == lg_to:
        return matrix
    assert lg_from > lg_to
    folded = matrix.reshape(1 << (lg_from - lg_to), 1 << lg_to)
    return np.bitwise_or.reduce(folded, axis=0)


def cpc_union(sketches: list[CpcSketch]) -> CpcSketch:
    if not sketches:
        raise ValueError("cpc_union needs at least one sketch")
    lg_min = min(s.lg_k for s in sketches)
    out = np.zeros(1 << lg_min, dtype=U64)
    for s in sketches:
        np.bitwise_or(out, downsample(s.matrix, s.lg_k, lg_min), out=out)
    # merged sketches estimate via ICON (reference invalidates HIP on
    # merge — cpc/sketch.rs:76-80)
    return CpcSketch(lg_min, out, merged=True)
