"""HLL sketch: dense 8-bit registers, vectorized coupons, mergeable.

Reimplements the reference's HLL semantics
(``/root/reference/datasketches/src/hll/``) with the Hll8 dense
representation only — the List/Set/Hll4 modes are memory optimizations
for tiny or static sketches (``hll/mod.rs:135-148``) that a
distributed engine doesn't need (SURVEY.md §2.3).

Coupon scheme (bit-exact vs ``hll/mod.rs:217-228``): murmur3-128 of
the value, ``slot = h1 & ((1<<26)-1)``, ``value = min(lz(h2), 62)+1``.
A sketch with lg_k < 26 indexes registers by the slot's low lg_k bits;
because the register value derives entirely from h2, sketches of
different lg_k fold together by elementwise max over slot groups —
exactly why the reference's union supports heterogeneous lg_k
(``hll/union.rs:110-151``).

Estimator: the classic HLL harmonic-mean estimator with linear
counting for the low range (Flajolet et al., + HyperLogLog++ alpha) —
statistically equivalent to the reference's composite/HIP estimators
(~1.6% RSE at lg_k=12, ``hll/sketch.rs:73-75``) without porting its
4.8k-line interpolation tables; accuracy is asserted against the same
tolerances the reference's tests use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codec
from .hashing import DEFAULT_SEED, hash_strings, hash_u64_column

U64 = np.uint64
KEY_MASK_26 = np.uint64((1 << 26) - 1)
MIN_LG_K, MAX_LG_K = 4, 21  # hll/mod.rs:130-134


def leading_zeros64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count of leading zeros (6 binary-search passes)."""
    v = np.asarray(x, dtype=U64).copy()
    lz = np.zeros(len(v), dtype=np.uint32)
    for s in (32, 16, 8, 4, 2, 1):
        m = v < (U64(1) << U64(64 - s))
        lz[m] += s
        v[m] <<= U64(s)
    lz[np.asarray(x, dtype=U64) == 0] = 64
    return lz


def coupons_from_hashes(h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(slot26, value) pairs per hll/mod.rs:217-228."""
    slot = (h1 & KEY_MASK_26).astype(np.uint32)
    value = (np.minimum(leading_zeros64(h2), 62) + 1).astype(np.uint8)
    return slot, value


def coupons_for_strings(column, seed: int = DEFAULT_SEED):
    return coupons_from_hashes(*hash_strings(column, seed=seed))


def coupons_for_ints(values, seed: int = DEFAULT_SEED):
    return coupons_from_hashes(*hash_u64_column(np.asarray(values), seed=seed))


@dataclass
class HllSketch:
    """Dense Hll8 sketch: 2^lg_k uint8 registers."""

    lg_k: int = 12
    regs: np.ndarray = field(default=None)

    def __post_init__(self):
        if not MIN_LG_K <= self.lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K}, {MAX_LG_K}], got {self.lg_k}")
        if self.regs is None:
            self.regs = np.zeros(1 << self.lg_k, dtype=np.uint8)

    def update_coupons(self, slot26: np.ndarray, value: np.ndarray) -> "HllSketch":
        idx = slot26 & np.uint32((1 << self.lg_k) - 1)
        np.maximum.at(self.regs, idx, value)
        return self

    def update_strings(self, column, seed: int = DEFAULT_SEED) -> "HllSketch":
        return self.update_coupons(*coupons_for_strings(column, seed))

    def update_ints(self, values, seed: int = DEFAULT_SEED) -> "HllSketch":
        return self.update_coupons(*coupons_for_ints(values, seed))

    def estimate(self) -> float:
        m = len(self.regs)
        zeros = int(np.count_nonzero(self.regs == 0))
        # linear counting for the low range
        if zeros > 0:
            lc = m * np.log(m / zeros)
            if lc <= 2.5 * m:
                return float(lc)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / float(np.sum(np.exp2(-self.regs.astype(np.float64))))
        return float(raw)

    def _rse(self) -> float:
        return 1.04 / np.sqrt(len(self.regs))

    def upper_bound(self, num_std_dev: int = 2) -> float:
        return self.estimate() * (1 + num_std_dev * self._rse())

    def lower_bound(self, num_std_dev: int = 2) -> float:
        return self.estimate() * (1 - num_std_dev * self._rse())

    def merge(self, other: "HllSketch") -> "HllSketch":
        return hll_union([self, other])

    def to_bytes(self) -> bytes:
        head = codec.pack_header(codec.FAMILY_HLL, self.lg_k, 0, 1)
        return head + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HllSketch":
        lg_k, _, _ = codec.unpack_header(buf, codec.FAMILY_HLL)
        regs = np.frombuffer(buf, dtype=np.uint8, offset=codec.HEADER_SIZE).copy()
        if len(regs) != 1 << lg_k:
            raise codec.CodecError(f"register array size {len(regs)} != 2^{lg_k}")
        return cls(lg_k, regs)


def hll_to_java_bytes(sk: HllSketch, out_of_order: bool = True) -> bytes:
    """Serialize in the DataSketches HLL8/HLL-mode wire format,
    byte-compatible with Java/C++/Rust (``hll/array8.rs:306-346``;
    constants ``hll/serialization.rs``): 40-byte preamble (preints 10,
    serVer 1, family 7, lg_k, flags, cur_min 0, mode byte HLL|HLL8,
    HIP accum + kxq0/kxq1 registers, num-at-cur-min, aux count 0)
    followed by the 2^lg_k register bytes. Engine sketches are merged
    (out-of-order), so the HIP accumulator is written as 0 and the OOO
    flag directs readers to the composite estimator — exactly what the
    reference's union produces.
    """
    import struct

    regs = sk.regs
    k = len(regs)
    pow2 = np.exp2(-regs.astype(np.float64))
    kxq0 = float(pow2[regs < 32].sum())
    kxq1 = float(pow2[regs >= 32].sum())
    num_zeros = int(np.count_nonzero(regs == 0))
    flags = 16 if out_of_order else 0  # OUT_OF_ORDER_FLAG_MASK
    mode_byte = (2 & 0x3) | ((2 & 0x3) << 2)  # CUR_MODE_HLL | TGT_HLL8
    head = struct.pack(
        "<BBBBBBBB", 10, 1, 7, sk.lg_k, 0, flags, 0, mode_byte
    )
    head += struct.pack("<ddd", 0.0, kxq0, kxq1)
    head += struct.pack("<II", num_zeros, 0)
    return head + regs.tobytes()


def hll_from_java_bytes(buf: bytes) -> HllSketch:
    """Decode a DataSketches HLL image in HLL mode with HLL8 registers
    (the shape this engine writes; List/Set/HLL4/HLL6 modes raise)."""
    import struct

    if len(buf) < 40:
        raise ValueError(f"insufficient data: {len(buf)} < 40")
    preints, ver, family, lg_k, _, flags, cur_min, mode_byte = struct.unpack_from("<BBBBBBBB", buf, 0)
    if family != 7:
        raise ValueError(f"family mismatch: expected 7, got {family}")
    if ver != 1:
        raise ValueError(f"unsupported HLL serial version {ver}")
    cur_mode = mode_byte & 0x3
    tgt_type = (mode_byte >> 2) & 0x3
    if cur_mode != 2 or tgt_type != 2:
        raise NotImplementedError(
            f"only HLL-mode HLL8 images supported (cur_mode={cur_mode}, tgt={tgt_type})"
        )
    regs = np.frombuffer(buf, dtype=np.uint8, count=1 << lg_k, offset=40).copy()
    return HllSketch(lg_k, regs)


def downsample(regs: np.ndarray, lg_from: int, lg_to: int) -> np.ndarray:
    """Fold registers to a smaller lg_k by max over slot groups.

    Valid because register values derive from h2 alone (coupon scheme)
    — mirrors the reference's union downsampling (hll/union.rs:176-238).
    """
    if lg_from == lg_to:
        return regs
    assert lg_from > lg_to
    return regs.reshape(1 << (lg_from - lg_to), 1 << lg_to).max(axis=0)


def hll_union(sketches: list[HllSketch]) -> HllSketch:
    """Union at the smallest participating lg_k (elementwise max)."""
    if not sketches:
        raise ValueError("hll_union needs at least one sketch")
    lg_min = min(s.lg_k for s in sketches)
    out = np.zeros(1 << lg_min, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, downsample(s.regs, s.lg_k, lg_min), out=out)
    return HllSketch(lg_min, out)
