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

Estimator: the reference's composite estimator — raw HLL with small-k
correction factors, cubic interpolation over the composite X tables,
linear counting (harmonic numbers) for the low range, with the same
crossover blending (``hll/estimator.rs:211-263``, tables in
``hll_estimator.py`` / ``_hll_tables.npz``). Engine sketches are
built per-partition and merged, so they are permanently in the
out-of-order regime — the exact path the reference dispatches to
after any union (``hll/estimator.rs:115-121``); the sequential HIP
accumulator (in-order-only, invalidated by merge) is intentionally
not simulated. Bounds use the reference's RSE factors and the
lg_k<=12 empirical quantile tables.
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


class HllSketch:
    """Mergeable HLL sketch: dense Hll8 registers, with an optional
    sparse coupon phase mirroring the reference's in-memory LIST/SET
    modes (``hll/list.rs:59-71``, ``hll/hash_set.rs:60-89``).

    ``HllSketch(lg_k)`` starts dense (the engine default — partition
    partials see enough rows to densify immediately anyway).
    ``HllSketch.sparse(lg_k)`` starts in the coupon phase: state is a
    unique ``uint32`` array of raw coupons (``value<<26 | slot26``,
    full 26-bit slot granularity exactly like the reference's
    Coupon — ``hll/mod.rs:217-228``) and promotes to dense registers
    past 3k/32 distinct coupons, the reference's SET→HLL point (SET
    resizes at 75% load and promotes at lg_arr == lg_k-3:
    ``hll/sketch.rs:224-232``, ``hll/mod.rs:157-158``). Per-group
    aggregates use the sparse start so a groupby with millions of
    tiny groups shuffles ~4 bytes/coupon instead of k register
    bytes per group."""

    __slots__ = ("lg_k", "_regs", "_coupons")

    def __init__(self, lg_k: int = 12, regs: np.ndarray | None = None, coupons: np.ndarray | None = None):
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K}, {MAX_LG_K}], got {lg_k}")
        self.lg_k = lg_k
        if coupons is not None:
            if regs is not None:
                raise ValueError("a sketch is sparse or dense, not both")
            self._regs = None
            self._coupons = np.asarray(coupons, dtype=np.uint32)
        else:
            self._regs = np.zeros(1 << lg_k, dtype=np.uint8) if regs is None else regs
            self._coupons = None

    @classmethod
    def sparse(cls, lg_k: int = 12) -> "HllSketch":
        return cls(lg_k, coupons=np.empty(0, dtype=np.uint32))

    @property
    def is_sparse(self) -> bool:
        return self._coupons is not None

    @property
    def coupons(self) -> np.ndarray | None:
        return self._coupons

    @property
    def _promote_at(self) -> int:
        return max(16, (3 << self.lg_k) >> 5)

    @property
    def regs(self) -> np.ndarray:
        """Dense registers; a sparse sketch densifies in place (the
        reference's promote_container_to_array, hll/sketch.rs:450)."""
        if self._coupons is not None:
            self._regs = _regs_from_coupons(self.lg_k, self._coupons)
            self._coupons = None
        return self._regs

    @regs.setter
    def regs(self, value: np.ndarray) -> None:
        self._regs = value
        self._coupons = None

    def update_coupons(self, slot26: np.ndarray, value: np.ndarray) -> "HllSketch":
        if self._coupons is not None:
            raw = (np.asarray(value, dtype=np.uint32) << np.uint32(26)) | np.asarray(
                slot26, dtype=np.uint32
            )
            self._coupons = np.union1d(self._coupons, raw)
            if len(self._coupons) > self._promote_at:
                _ = self.regs  # densify
            return self
        idx = slot26 & np.uint32((1 << self.lg_k) - 1)
        np.maximum.at(self._regs, idx, value)
        return self

    def update_strings(self, column, seed: int = DEFAULT_SEED) -> "HllSketch":
        return self.update_coupons(*coupons_for_strings(column, seed))

    def update_ints(self, values, seed: int = DEFAULT_SEED) -> "HllSketch":
        return self.update_coupons(*coupons_for_ints(values, seed))

    def estimate(self) -> float:
        """Reference composite estimate (hll/estimator.rs:211-263) —
        the out-of-order path, which is what the reference itself uses
        for every merged or deserialized sketch. A sparse sketch uses
        the coupon-count cubic interpolation, the reference's LIST/SET
        estimate (hll/container.rs:108-112)."""
        if self._coupons is not None:
            n = float(len(self._coupons))
            return max(n, _interp_coupon_count(n))
        from .hll_estimator import composite_estimate, kxq_from_regs

        zeros = int(np.count_nonzero(self.regs == 0))
        return float(
            composite_estimate(self.lg_k, kxq_from_regs(self.regs), 0, zeros)
        )

    def upper_bound(self, num_std_dev: int = 2) -> float:
        from .hll_estimator import rel_err

        return self.estimate() / (1.0 + rel_err(self.lg_k, True, True, num_std_dev))

    def lower_bound(self, num_std_dev: int = 2) -> float:
        from .hll_estimator import rel_err

        return self.estimate() / (1.0 + rel_err(self.lg_k, False, True, num_std_dev))

    def merge(self, other: "HllSketch") -> "HllSketch":
        return hll_union([self, other])

    def to_bytes(self) -> bytes:
        if self._coupons is not None:
            head = codec.pack_header(codec.FAMILY_HLL, self.lg_k, codec.FLAG_SPARSE, 1)
            return head + self._coupons.astype("<u4").tobytes()
        head = codec.pack_header(codec.FAMILY_HLL, self.lg_k, 0, 1)
        return head + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HllSketch":
        lg_k, flags, _ = codec.unpack_header(buf, codec.FAMILY_HLL)
        if flags & codec.FLAG_SPARSE:
            coupons = np.frombuffer(buf, dtype="<u4", offset=codec.HEADER_SIZE).astype(np.uint32)
            return cls(lg_k, coupons=coupons)
        regs = np.frombuffer(buf, dtype=np.uint8, offset=codec.HEADER_SIZE).copy()
        if len(regs) != 1 << lg_k:
            raise codec.InvalidData(f"register array size {len(regs)} != 2^{lg_k}")
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


_EMPTY_FLAG, _COMPACT_FLAG, _OOO_FLAG = 4, 8, 16  # hll/serialization.rs:27-31


def _regs_from_coupons(lg_k: int, coupons: np.ndarray) -> np.ndarray:
    """Replay raw u32 coupons (slot:26 low bits, value:6 high bits —
    hll/mod.rs:238-246) into a dense HLL8 register array; EMPTY (0)
    sentinels are skipped."""
    regs = np.zeros(1 << lg_k, dtype=np.uint8)
    coupons = coupons[coupons != 0]
    if len(coupons):
        slot = (coupons & np.uint32((1 << 26) - 1)) & np.uint32((1 << lg_k) - 1)
        value = (coupons >> np.uint32(26)).astype(np.uint8)
        np.maximum.at(regs, slot, value)
    return regs


def hll_from_java_bytes(buf: bytes) -> HllSketch:
    """Decode any DataSketches HLL image into a dense HLL8 sketch.

    All serialized modes are accepted (``hll/sketch.rs:302-400``):

    - LIST / SET coupon images (compact or full hash array,
      ``list.rs:78-108``, ``hash_set.rs:96-143``) — coupons replayed
      into registers;
    - HLL mode with HLL8 (raw bytes), HLL6 (6-bit packed,
      ``array6.rs:70-82``) or HLL4 registers (nibbles offset by
      cur_min with AUX_TOKEN=15 exceptions resolved from the aux map,
      ``array4.rs:74-104``, ``aux_map.rs:87-219``).
    """
    import struct

    if len(buf) < 8:
        raise ValueError(f"insufficient data: {len(buf)} < 8")
    preints, ver, family, lg_k, lg_arr, flags, state, mode_byte = struct.unpack_from(
        "<BBBBBBBB", buf, 0
    )
    if family != 7:
        raise ValueError(f"family mismatch: expected 7, got {family}")
    if ver != 1:
        raise ValueError(f"unsupported HLL serial version {ver}")
    if not MIN_LG_K <= lg_k <= MAX_LG_K:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    cur_mode = mode_byte & 0x3
    tgt_type = (mode_byte >> 2) & 0x3
    empty = bool(flags & _EMPTY_FLAG)
    compact = bool(flags & _COMPACT_FLAG)

    if cur_mode == 0:  # LIST (preamble 8 bytes; state = coupon count)
        if preints != 2:
            raise ValueError(f"LIST preamble: expected 2 ints, got {preints}")
        n = 0 if empty else (state if compact else (1 << lg_arr))
        coupons = np.frombuffer(buf, dtype="<u4", count=n, offset=8)
        coupons = np.unique(coupons[coupons != 0])  # drop EMPTY sentinels
        return HllSketch(lg_k, coupons=coupons.astype(np.uint32))

    if cur_mode == 1:  # SET (preamble 12 bytes; u32 count at offset 8)
        if preints != 3:
            raise ValueError(f"SET preamble: expected 3 ints, got {preints}")
        (count,) = struct.unpack_from("<I", buf, 8)
        n = count if compact else (1 << lg_arr)
        coupons = np.frombuffer(buf, dtype="<u4", count=n, offset=12)
        coupons = np.unique(coupons[coupons != 0])
        return HllSketch(lg_k, coupons=coupons.astype(np.uint32))

    if cur_mode != 2:
        raise ValueError(f"invalid HLL mode {cur_mode}")
    if preints != 10 or len(buf) < 40:
        raise ValueError(f"HLL-mode preamble: expected 10 ints / 40 bytes")
    k = 1 << lg_k
    if tgt_type == 2:  # HLL8: raw register bytes
        regs = np.frombuffer(buf, dtype=np.uint8, count=k, offset=40).copy()
        return HllSketch(lg_k, regs)
    if tgt_type == 1:  # HLL6: 6-bit packed, little-endian bit stream
        num_bytes = ((k * 3) >> 2) + 1  # array6.rs:278-281
        data = np.frombuffer(buf, dtype=np.uint8, count=num_bytes, offset=40)
        slots = np.arange(k, dtype=np.int64)
        start_bit = slots * 6
        byte_idx = start_bit >> 3
        shift = (start_bit & 7).astype(np.uint16)
        window = data[byte_idx].astype(np.uint16) | (
            data[byte_idx + 1].astype(np.uint16) << np.uint16(8)
        )
        regs = ((window >> shift) & np.uint16(0x3F)).astype(np.uint8)
        return HllSketch(lg_k, regs)
    if tgt_type == 0:  # HLL4: nibbles + cur_min offset + aux exceptions
        cur_min = state
        (aux_count,) = struct.unpack_from("<I", buf, 36)
        num_bytes = 1 << (lg_k - 1)
        data = np.frombuffer(buf, dtype=np.uint8, count=num_bytes, offset=40)
        lo = data & np.uint8(0x0F)
        hi = data >> np.uint8(4)
        raw = np.empty(k, dtype=np.uint8)
        raw[0::2] = lo
        raw[1::2] = hi
        regs = (raw + np.uint8(cur_min)).astype(np.uint8)
        is_aux = raw == 15  # AUX_TOKEN (array4.rs:41)
        if aux_count:
            aux = np.frombuffer(buf, dtype="<u4", count=aux_count, offset=40 + num_bytes)
            slot = (aux & np.uint32((1 << 26) - 1)) & np.uint32(k - 1)
            value = (aux >> np.uint32(26)).astype(np.uint8)
            regs[slot] = value
            resolved = np.zeros(k, dtype=bool)
            resolved[slot] = True
            is_aux &= ~resolved
        # unresolved AUX_TOKEN slots fall back to cur_min (array4.rs:98-104)
        regs[is_aux] = cur_min
        return HllSketch(lg_k, regs)
    raise ValueError(f"invalid HLL target type {tgt_type}")


def hll_to_java_hll6_bytes(sk: HllSketch, out_of_order: bool = True) -> bytes:
    """Serialize as an HLL6 image (6-bit packed registers,
    ``array6.rs:233-275``) — readable by Java/C++/Rust."""
    import struct

    regs = sk.regs
    k = len(regs)
    num_bytes = ((k * 3) >> 2) + 1
    packed = np.zeros(num_bytes, dtype=np.uint8)
    slots = np.arange(k, dtype=np.int64)
    start_bit = slots * 6
    byte_idx = start_bit >> 3
    shift = (start_bit & 7).astype(np.uint16)
    window = regs.astype(np.uint16) << shift
    np.bitwise_or.at(packed, byte_idx, (window & np.uint16(0xFF)).astype(np.uint8))
    np.bitwise_or.at(packed, byte_idx + 1, (window >> np.uint16(8)).astype(np.uint8))
    pow2 = np.exp2(-regs.astype(np.float64))
    kxq0 = float(pow2[regs < 32].sum())
    kxq1 = float(pow2[regs >= 32].sum())
    flags = _OOO_FLAG if out_of_order else 0
    head = struct.pack("<BBBBBBBB", 10, 1, 7, sk.lg_k, 0, flags, 0, (2 & 0x3) | ((1 & 0x3) << 2))
    head += struct.pack("<ddd", 0.0, kxq0, kxq1)
    head += struct.pack("<II", int(np.count_nonzero(regs == 0)), 0)
    return head + packed.tobytes()


def hll_to_java_hll4_bytes(sk: HllSketch, out_of_order: bool = True) -> bytes:
    """Serialize as an HLL4 image (nibbles offset by cur_min, values
    past cur_min+14 spilled to the aux coupon map —
    ``array4.rs:370-470``, ``aux_map.rs``)."""
    import struct

    regs = sk.regs
    k = len(regs)
    cur_min = int(regs.min())
    delta = regs.astype(np.int64) - cur_min
    is_aux = delta >= 15
    raw = np.where(is_aux, 15, delta).astype(np.uint8)
    packed = (raw[0::2] | (raw[1::2] << np.uint8(4))).astype(np.uint8)
    aux_slots = np.nonzero(is_aux)[0].astype(np.uint32)
    aux = (aux_slots | (regs[aux_slots].astype(np.uint32) << np.uint32(26))).astype("<u4")
    pow2 = np.exp2(-regs.astype(np.float64))
    kxq0 = float(pow2[regs < 32].sum())
    kxq1 = float(pow2[regs >= 32].sum())
    flags = _OOO_FLAG if out_of_order else 0
    head = struct.pack(
        "<BBBBBBBB", 10, 1, 7, sk.lg_k, 0, flags, cur_min, (2 & 0x3) | ((0 & 0x3) << 2)
    )
    head += struct.pack("<ddd", 0.0, kxq0, kxq1)
    head += struct.pack("<II", int(np.count_nonzero(regs == cur_min)), len(aux))
    return head + packed.tobytes() + aux.tobytes()


def hll_to_java_coupon_bytes(sk: HllSketch) -> bytes:
    """Serialize a SPARSE sketch as a compact LIST or SET image —
    byte-compatible with the reference's writers (``list.rs:110-162``,
    ``hash_set.rs:146-203``): LIST (preints 2, lg_arr 3) up to 8
    coupons, else SET (preints 3, count u32 at offset 8, coupons
    sorted). Target type HLL8 to match the engine's dense layout."""
    import struct

    if not sk.is_sparse:
        raise ValueError("coupon image requires a sparse sketch; use hll_to_java_bytes")
    coupons = np.sort(sk.coupons.astype("<u4"))
    n = len(coupons)
    mode_tgt = (2 & 0x3) << 2  # TGT_HLL8
    if n <= 8:
        flags = _COMPACT_FLAG | (_EMPTY_FLAG if n == 0 else 0)
        head = struct.pack("<BBBBBBBB", 2, 1, 7, sk.lg_k, 3, flags, n, 0 | mode_tgt)
        return head + coupons.tobytes()
    # SET: lg_arr sized for <=75% load within [5, lg_k-3] (mod.rs:157-158)
    lg_arr = 5
    while (3 << lg_arr) >> 2 < n and lg_arr < sk.lg_k - 3:
        lg_arr += 1
    head = struct.pack("<BBBBBBBB", 3, 1, 7, sk.lg_k, lg_arr, _COMPACT_FLAG, 0, 1 | mode_tgt)
    return head + struct.pack("<I", n) + coupons.tobytes()


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
    """Union at the smallest participating lg_k (elementwise max).

    All-sparse inputs whose combined coupon set stays below the
    promotion point union sparsely (coupons are lg_k-independent:
    they carry the full 26-bit slot) — the memory-lean path per-group
    aggregates rely on when combining millions of tiny partials."""
    if not sketches:
        raise ValueError("hll_union needs at least one sketch")
    lg_min = min(s.lg_k for s in sketches)
    if all(s.is_sparse for s in sketches):
        merged = sketches[0].coupons
        for s in sketches[1:]:
            merged = np.union1d(merged, s.coupons)
        out = HllSketch(lg_min, coupons=merged)
        if len(merged) > out._promote_at:
            _ = out.regs  # past the SET->HLL point: densify
        return out
    out = np.zeros(1 << lg_min, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, downsample(s.regs, s.lg_k, lg_min), out=out)
    return HllSketch(lg_min, out)


# ---------------------------------------------------------------------------
# In-order (sequential) sketch with HIP estimator
# ---------------------------------------------------------------------------

# Coupon-count → cardinality interpolation tables
# (hll/coupon_mapping.rs:24-74; published Apache DataSketches constants)
_COUPON_X = np.array(
    [0.0, 1.0, 20.0, 400.0, 8000.0, 160000.0]
    + [300000.0 + 300000.0 * i for i in range(34)]
)
_COUPON_Y = np.array(
    [
        0.0,
        1.0,
        20.00000094374026,
        400.0003963713384,
        8000.158929460209,
        160063.60677637596,
        300223.70715976635,
        600895.593385617,
        902016.8065120955,
        1203588.498319951,
        1505611.8245524743,
        1808087.9449319066,
        2111018.0231759353,
        2414403.22701425,
        2718244.728205189,
        3022543.702552454,
        3327301.329921909,
        3632518.794258454,
        3938197.283602969,
        4244337.990109356,
        4550942.110061649,
        4858010.843891189,
        5165545.396193897,
        5473546.975747645,
        5782016.7955296505,
        6090956.072734016,
        6400366.028789296,
        6710247.889376201,
        7020602.884445314,
        7331432.248234972,
        7642737.219289148,
        7954519.0404754765,
        8266778.959003342,
        8579518.226442046,
        8892738.098739047,
        9206439.836238328,
        9520624.703698829,
        9835293.97031292,
        10150448.909725029,
        10466090.800050326,
    ]
)


def _interp_coupon_count(n: float) -> float:
    """Cubic interpolation over the coupon mapping tables
    (hll/cubic_interpolation.rs:24-46): 4-point Lagrange window chosen
    by the straddle position."""
    from .hll_estimator import _cubic_interpolate

    x_arr, y_arr = _COUPON_X, _COUPON_Y
    last = len(x_arr) - 1
    if n >= x_arr[last]:
        return float(y_arr[last])
    offset = int(np.searchsorted(x_arr, n, side="right")) - 1
    if offset == 0:
        o = 0
    elif offset == last - 1:
        o = offset - 2
    else:
        o = offset - 1
    return float(
        _cubic_interpolate(
            x_arr[o], y_arr[o], x_arr[o + 1], y_arr[o + 1],
            x_arr[o + 2], y_arr[o + 2], x_arr[o + 3], y_arr[o + 3], n,
        )
    )


_INV_POW2 = 2.0 ** -np.arange(64, dtype=np.float64)


class HllHipSketch:
    """Sequential (in-order) HLL with the HIP estimator — the reference's
    unmerged-stream path (``hll/estimator.rs:40-115``).

    State mirrors the reference: a coupon phase whose estimate is the
    cubic coupon-count interpolation (``hll/container.rs:108-112``,
    promotion point 3k/32 distinct coupons like the Set→Array rule,
    ``hll/sketch.rs:222-232``), then dense registers plus the
    (hip_accum, kxq0, kxq1) accumulator, ``hip += k/(kxq0+kxq1)`` per
    register-raising update BEFORE applying it. Updates stream in
    batches but the accumulator is bit-faithful to one-at-a-time
    processing: per-slot running maxima extract the register-raising
    EVENTS in stream order (a segmented-cummax trick), and the
    sequential additions are replayed as f64 cumulative sums over the
    event list. Merged / deserialized sketches must use ``HllSketch``
    (composite estimate): the reference itself invalidates HIP after
    any merge (``hll/estimator.rs:81-89``).
    """

    def __init__(self, lg_k: int = 12):
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K}, {MAX_LG_K}], got {lg_k}")
        self.lg_k = lg_k
        self.k = 1 << lg_k
        self.regs = np.zeros(self.k, dtype=np.uint8)
        self.hip_accum = 0.0
        self.kxq0 = float(self.k)
        self.kxq1 = 0.0
        self._coupon_mode = True
        self._coupons: "dict[int, None]" = {}  # insertion-ordered distinct set
        self._promote_at = max(16, (3 * self.k) // 32)

    # -- internals ----------------------------------------------------------

    def _hip_update_events(self, slot: np.ndarray, value: np.ndarray) -> None:
        """Apply register-raising events extracted from a coupon batch
        (stream order preserved) to (regs, hip, kxq)."""
        n = len(slot)
        if n == 0:
            return
        idx = np.arange(n, dtype=np.int64)
        order = np.lexsort((idx, slot))
        s, v, i0 = slot[order], value[order].astype(np.int64), idx[order]
        starts = np.ones(n, dtype=bool)
        starts[1:] = s[1:] != s[:-1]
        run_id = np.cumsum(starts) - 1
        # segmented running max: run_id*64+v is per-run monotone under
        # cummax because a run boundary jumps the key past any prior run
        cm = np.maximum.accumulate(run_id * 64 + v)
        within_prev = np.empty(n, dtype=np.int64)
        within_prev[0] = -1
        within_prev[1:] = cm[:-1] - run_id[1:] * 64  # prev in-run max (or negative)
        within_prev[starts] = -1
        reg0 = self.regs[s].astype(np.int64)
        old = np.maximum(reg0, within_prev)
        ev = v > old
        if not ev.any():
            return
        # back to stream order
        ei = np.argsort(i0[ev], kind="stable")
        es, eold, enew = s[ev][ei], old[ev][ei], v[ev][ei]
        d0 = np.where(eold < 32, -_INV_POW2[eold], 0.0) + np.where(enew < 32, _INV_POW2[enew], 0.0)
        d1 = np.where(eold >= 32, -_INV_POW2[eold], 0.0) + np.where(enew >= 32, _INV_POW2[enew], 0.0)
        k0 = np.empty(len(d0))
        k0[0] = self.kxq0
        np.cumsum(d0[:-1], out=k0[1:])
        k0[1:] += self.kxq0
        k1 = np.empty(len(d1))
        k1[0] = self.kxq1
        np.cumsum(d1[:-1], out=k1[1:])
        k1[1:] += self.kxq1
        self.hip_accum += float(np.sum(self.k / (k0 + k1)))
        self.kxq0 = float(k0[-1] + d0[-1])
        self.kxq1 = float(k1[-1] + d1[-1])
        np.maximum.at(self.regs, es, enew.astype(np.uint8))

    # -- public API ---------------------------------------------------------

    def update_coupons(self, slot26: np.ndarray, value: np.ndarray) -> "HllHipSketch":
        value = np.asarray(value)
        slot = (np.asarray(slot26).astype(np.int64)) & (self.k - 1)
        if self._coupon_mode:
            # coupon distinctness is at full 26-bit slot granularity
            # (Coupon = value<<26 | slot26, hll/mod.rs:217-228); the
            # lg_k mask applies only once registers exist
            combined = (value.astype(np.int64) << 26) | np.asarray(slot26).astype(np.int64)
            for pos, c in enumerate(combined.tolist()):
                if c not in self._coupons:
                    self._coupons[c] = None
                    if len(self._coupons) > self._promote_at:
                        # promote: replay stored coupons in insertion
                        # order, then stream the rest of this batch
                        self._coupon_mode = False
                        replay = np.fromiter(self._coupons, dtype=np.int64)
                        self._coupons = {}
                        self._hip_update_events(
                            (replay & ((1 << 26) - 1)) & (self.k - 1), replay >> 26
                        )
                        self._hip_update_events(slot[pos + 1 :], value[pos + 1 :])
                        return self
            return self
        self._hip_update_events(slot, value)
        return self

    def update_strings(self, column, seed: int = DEFAULT_SEED) -> "HllHipSketch":
        return self.update_coupons(*coupons_for_strings(column, seed))

    def update_ints(self, values, seed: int = DEFAULT_SEED) -> "HllHipSketch":
        return self.update_coupons(*coupons_for_ints(values, seed))

    def estimate(self) -> float:
        if self._coupon_mode:
            n = float(len(self._coupons))
            return max(n, _interp_coupon_count(n))
        return self.hip_accum

    def to_dense(self) -> HllSketch:
        """Downgrade to the mergeable dense sketch (HIP is forfeited on
        merge, exactly like the reference's out-of-order transition)."""
        out = HllSketch(self.lg_k)
        if self._coupon_mode:
            arr = np.fromiter(self._coupons, dtype=np.int64)
            if len(arr):
                out.update_coupons(
                    (arr & ((1 << 26) - 1)).astype(np.uint32),
                    (arr >> 26).astype(np.uint8),
                )
            return out
        out.regs = self.regs.copy()
        return out
