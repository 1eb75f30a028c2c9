"""Theta (KMV) sketch: vectorized batch build, union, intersection.

Reimplements the reference's theta sketch semantics
(``/root/reference/datasketches/src/theta/``) as NumPy set algebra over
sorted 63-bit hash arrays instead of an incremental open-addressing
table — the batch-rebuild rule is the same math the reference applies
at rebuild time (``theta/hash_table.rs:249-277``: select the k-th
smallest retained entry as the new theta, keep the k lesser entries):

- update hash: ``h = murmur3_128(value, seed).h1 >> 1`` (Java-compatible
  63-bit hash, ``theta/hash_table.rs:123-128``); retained iff
  ``0 < h < theta`` (``theta/hash_table.rs:176-208``).
- estimate = num_retained / (theta / MAX_THETA)
  (``theta/sketch.rs:371-383``).
- intersection: theta = min(thetas), keep hashes present in both,
  empty propagates (``theta/intersection.rs:64-196``).
- union (absent from the Rust port, spec'd from the rebuild rule and
  Java semantics): concat, filter ``< min(theta)``, dedupe, and if over
  k rebuild exactly like ``theta/hash_table.rs:249-277``.

The sketch is associatively and commutatively mergeable, so per-block
partials built inside ``map_batches`` combine in any order in a tree
reduce (the reference's distributed pattern, SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import codec
from .hashing import DEFAULT_SEED, compute_seed_hash, hash_strings, hash_u64_column

U64 = np.uint64
MAX_THETA = (1 << 63) - 1  # i64::MAX, Java compat (theta/mod.rs:55)
MIN_LG_K, MAX_LG_K, DEFAULT_LG_K = 5, 26, 12  # theta/mod.rs:57-61



def hashes_for_strings(column, seed: int = DEFAULT_SEED) -> np.ndarray:
    """63-bit theta update hashes for a string/binary column."""
    h1, _ = hash_strings(column, seed=seed)
    return h1 >> U64(1)


def hashes_for_ints(values, seed: int = DEFAULT_SEED) -> np.ndarray:
    """63-bit theta update hashes for an int64 column (8 LE bytes)."""
    h1, _ = hash_u64_column(np.asarray(values), seed=seed)
    return h1 >> U64(1)


@dataclass
class ThetaSketch:
    """Compact theta sketch: sorted unique 63-bit entries below theta."""

    lg_k: int
    theta: int  # exclusive upper bound, in [1, MAX_THETA]
    entries: np.ndarray  # sorted uint64, unique, all in (0, theta)
    seed_hash: int
    empty: bool

    # -- construction ------------------------------------------------------

    @classmethod
    def new_empty(cls, lg_k: int = DEFAULT_LG_K, seed: int = DEFAULT_SEED, p: float = 1.0) -> "ThetaSketch":
        theta = MAX_THETA if p >= 1.0 else int(MAX_THETA * p)
        return cls(lg_k, theta, np.empty(0, dtype=U64), compute_seed_hash(seed), True)

    @classmethod
    def from_hashes(
        cls,
        hashes: np.ndarray,
        lg_k: int = DEFAULT_LG_K,
        seed: int = DEFAULT_SEED,
        p: float = 1.0,
    ) -> "ThetaSketch":
        """Build from precomputed 63-bit update hashes (one batch pass).

        Equivalent to feeding every value through ``update()`` then
        ``trim()+compact(true)`` in the reference: screen by theta,
        dedupe, and if more than k survive keep the k smallest with
        theta = (k+1)-th smallest (``theta/hash_table.rs:249-277``).
        """
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K}, {MAX_LG_K}], got {lg_k}")
        theta = MAX_THETA if p >= 1.0 else int(MAX_THETA * p)
        h = np.asarray(hashes, dtype=U64)
        h = h[(h > U64(0)) & (h < U64(theta))]
        empty = len(hashes) == 0 and p >= 1.0
        entries, theta = _rebuild(np.unique(h), theta, lg_k)
        return cls(lg_k, theta, entries, compute_seed_hash(seed), empty)

    # -- queries -----------------------------------------------------------

    @property
    def num_retained(self) -> int:
        return len(self.entries)

    @property
    def is_estimation_mode(self) -> bool:
        return self.theta < MAX_THETA and not self.empty

    def estimate(self) -> float:
        """num_retained / theta_fraction (theta/sketch.rs:371-383)."""
        if self.empty:
            return 0.0
        if self.theta == MAX_THETA:
            return float(self.num_retained)
        return self.num_retained / (self.theta / MAX_THETA)

    def upper_bound(self, num_std_dev: int = 2) -> float:
        """Binomial UB (port of common/binomial_bounds.rs::upper_bound)."""
        from raydedup.sketches.binomial_bounds import upper_bound

        if self.empty:
            return 0.0
        return upper_bound(self.num_retained, self.theta / MAX_THETA, num_std_dev)

    def lower_bound(self, num_std_dev: int = 2) -> float:
        """Binomial LB (port of common/binomial_bounds.rs::lower_bound)."""
        from raydedup.sketches.binomial_bounds import lower_bound

        if self.empty:
            return 0.0
        return lower_bound(self.num_retained, self.theta / MAX_THETA, num_std_dev)

    # -- set algebra -------------------------------------------------------

    def union(self, *others: "ThetaSketch") -> "ThetaSketch":
        return theta_union([self, *others])

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        return theta_intersect(self, other)

    # -- serde -------------------------------------------------------------

    def to_bytes(self) -> bytes:
        flags = codec.FLAG_ORDERED | (codec.FLAG_EMPTY if self.empty else 0)
        head = codec.pack_header(codec.FAMILY_THETA, self.lg_k, flags, self.seed_hash)
        return head + np.uint64(self.theta).tobytes() + np.ascontiguousarray(self.entries).tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, expect_seed_hash: int | None = None) -> "ThetaSketch":
        lg_k, flags, seed_hash = codec.unpack_header(buf, codec.FAMILY_THETA, expect_seed_hash)
        theta = int(np.frombuffer(buf, dtype=U64, count=1, offset=codec.HEADER_SIZE)[0])
        entries = np.frombuffer(buf, dtype=U64, offset=codec.HEADER_SIZE + 8).copy()
        return cls(lg_k, theta, entries, seed_hash, bool(flags & codec.FLAG_EMPTY))

    # -- cross-implementation wire format (Java/C++/Rust serVer 3) ---------

    def to_java_v3_bytes(self) -> bytes:
        """Serialize in the DataSketches compact theta serVer-3 wire
        format, byte-compatible with the Java/C++/Rust implementations
        (``theta/sketch.rs:477-510``, constants
        ``theta/serialization.rs:20-30``)."""
        import struct

        est = self.is_estimation_mode
        n = self.num_retained
        if est:
            pre = 3
        elif self.empty or n == 1:
            pre = 1
        else:
            pre = 2
        flags = (1 << 1) | (1 << 3) | (1 << 4)  # READ_ONLY | COMPACT | ORDERED
        if self.empty:
            flags |= 1 << 2
        out = struct.pack("<BBB", pre, 3, codec.FAMILY_THETA)
        out += struct.pack(">H", 0)  # unused for compact (written BE in ref)
        out += struct.pack("<BH", flags, self.seed_hash)
        if pre > 1:
            out += struct.pack("<I", n) + struct.pack(">I", 0)
        if est:
            out += struct.pack("<Q", self.theta)
        out += np.ascontiguousarray(self.entries).tobytes()
        return out

    @classmethod
    def from_java_v3_bytes(cls, buf: bytes, lg_k: int = DEFAULT_LG_K, expect_seed_hash: int | None = None) -> "ThetaSketch":
        """Decode a DataSketches compact theta serVer-3 image
        (``theta/sketch.rs:598-630`` validation semantics: family,
        version, seed hash unless empty)."""
        import struct

        if len(buf) < 8:
            raise codec.InvalidData(f"insufficient data: {len(buf)} < 8")
        pre, ver, family = struct.unpack_from("<BBB", buf, 0)
        flags, seed_hash = struct.unpack_from("<BH", buf, 5)
        if family != codec.FAMILY_THETA:
            raise codec.InvalidData(f"family mismatch: expected {codec.FAMILY_THETA}, got {family}")
        if ver != 3:
            raise codec.InvalidData(f"unsupported theta serial version {ver} (only v3)")
        empty = bool(flags & (1 << 2))
        if expect_seed_hash is not None and not empty and seed_hash != expect_seed_hash:
            raise codec.InvalidData(
                f"incompatible seed hash: expected {expect_seed_hash}, got {seed_hash}"
            )
        off = 8
        theta = MAX_THETA
        if pre == 1:
            n = 0 if empty else (len(buf) - off) // 8
        else:
            (n,) = struct.unpack_from("<I", buf, off)
            off += 8  # num_entries u32 + unused u32
            if pre >= 3:
                (theta,) = struct.unpack_from("<Q", buf, off)
                off += 8
        entries = np.frombuffer(buf, dtype=U64, count=n, offset=off).copy()
        return cls(lg_k, int(theta), entries, seed_hash, empty)


def _theta_v4_pack(entries: np.ndarray) -> tuple[int, bytes]:
    """Delta bit-pack sorted entries, MSB-first (theta/bit_pack.rs order).

    Full 8-value blocks are byte-aligned (8*bits bits == bits bytes), so
    the whole stream is one continuous big-endian bitstream with the
    final byte zero-padded — packed here via one big int.
    """
    deltas = np.diff(entries, prepend=np.uint64(0)).astype(np.uint64)
    bits = int(np.bitwise_or.reduce(deltas)).bit_length()
    acc = 0
    for d in deltas.tolist():
        acc = (acc << bits) | d
    total_bits = bits * len(deltas)
    pad = (-total_bits) % 8
    acc <<= pad
    return bits, acc.to_bytes((total_bits + pad) // 8, "big")


def _theta_v4_unpack(data: bytes, n: int, bits: int) -> np.ndarray:
    total_bits = bits * n
    nbytes = (total_bits + 7) // 8
    acc = int.from_bytes(data[:nbytes], "big") >> ((nbytes * 8) - total_bits)
    mask = (1 << bits) - 1
    deltas = np.fromiter(
        ((acc >> ((n - 1 - i) * bits)) & mask for i in range(n)), dtype=np.uint64, count=n
    )
    return np.cumsum(deltas).astype(np.uint64)


def theta_to_java_v4_bytes(s: ThetaSketch) -> bytes:
    """serVer-4 compressed wire format (theta/sketch.rs:512-578):
    delta-encoded entries bit-packed at the minimal width. Empty
    sketches use v3 (the reference's serialize_compressed fallback)."""
    import struct

    if s.empty or s.num_retained == 0:
        return s.to_java_v3_bytes()
    pre = 2 if s.is_estimation_mode else 1
    n = s.num_retained
    bits, packed = _theta_v4_pack(s.entries)
    n_bytes = (n.bit_length() + 7) // 8
    flags = (1 << 1) | (1 << 3) | (1 << 4)  # READ_ONLY | COMPACT | ORDERED
    out = struct.pack("<BBBBBBH", pre, 4, codec.FAMILY_THETA, bits, n_bytes, flags, s.seed_hash)
    if pre > 1:
        out += struct.pack("<Q", s.theta)
    out += n.to_bytes(n_bytes, "little")
    out += packed
    return out


def theta_from_java_v4_bytes(buf: bytes, lg_k: int = DEFAULT_LG_K, expect_seed_hash: int | None = None) -> ThetaSketch:
    """Decode serVer-4 (theta/sketch.rs:806-880 semantics)."""
    import struct

    pre, ver, family, bits, n_bytes, flags, seed_hash = struct.unpack_from("<BBBBBBH", buf, 0)
    if family != codec.FAMILY_THETA:
        raise codec.InvalidData(f"family mismatch: expected {codec.FAMILY_THETA}, got {family}")
    if ver != 4:
        raise codec.InvalidData(f"not a v4 theta image (version {ver})")
    empty = bool(flags & (1 << 2))
    if expect_seed_hash is not None and not empty and seed_hash != expect_seed_hash:
        raise codec.InvalidData(
            f"incompatible seed hash: expected {expect_seed_hash}, got {seed_hash}"
        )
    off = 8
    theta = MAX_THETA
    if pre > 1:
        (theta,) = struct.unpack_from("<Q", buf, off)
        off += 8
    n = int.from_bytes(buf[off : off + n_bytes], "little")
    off += n_bytes
    entries = _theta_v4_unpack(buf[off:], n, bits) if n else np.empty(0, dtype=U64)
    return ThetaSketch(lg_k, int(theta), entries, seed_hash, empty)


def _check_entries(entries: np.ndarray, theta: int) -> np.ndarray:
    """read_entries validation (theta/sketch.rs:632-648): every retained
    hash must satisfy 0 < h < theta."""
    if len(entries) and ((entries == 0).any() or (entries >= U64(theta)).any()):
        raise codec.InvalidData("corrupted: invalid retained hash value")
    return entries


def theta_from_java_v1_bytes(buf: bytes, lg_k: int = DEFAULT_LG_K, seed: int = DEFAULT_SEED) -> ThetaSketch:
    """Decode legacy serVer-1 (theta/sketch.rs:648-684): no stored seed
    hash (computed from the expected seed), theta at offset 16, entries
    from offset 24."""
    import struct

    if len(buf) < 24:
        raise codec.InvalidData(f"insufficient data: {len(buf)} < 24")
    (n,) = struct.unpack_from("<I", buf, 8)
    (theta,) = struct.unpack_from("<Q", buf, 16)
    seed_hash = compute_seed_hash(seed)
    if n == 0 and theta == MAX_THETA:
        return ThetaSketch(lg_k, MAX_THETA, np.empty(0, U64), seed_hash, True)
    entries = _check_entries(np.frombuffer(buf, dtype=U64, count=n, offset=24).copy(), theta)
    return ThetaSketch(lg_k, int(theta), entries, seed_hash, False)


def theta_from_java_v2_bytes(buf: bytes, lg_k: int = DEFAULT_LG_K, seed: int = DEFAULT_SEED) -> ThetaSketch:
    """Decode legacy serVer-2 (theta/sketch.rs:686-731): stored seed
    hash at offset 6; preamble length selects empty (1), precise (2,
    theta = MAX) or estimate (3, explicit theta) layout. Matches the
    reference's quirk of flagging precise-mode images empty."""
    import struct

    if len(buf) < 8:
        raise codec.InvalidData(f"insufficient data: {len(buf)} < 8")
    pre = buf[0]
    (seed_hash,) = struct.unpack_from("<H", buf, 6)
    expect = compute_seed_hash(seed)
    if seed_hash != expect:
        raise codec.InvalidData(f"incompatible seed hash: expected {expect}, got {seed_hash}")
    if pre == 1:  # empty
        return ThetaSketch(lg_k, MAX_THETA, np.empty(0, U64), seed_hash, True)
    if pre == 2:  # precise (exact mode)
        (n,) = struct.unpack_from("<I", buf, 8)
        entries = _check_entries(np.frombuffer(buf, dtype=U64, count=n, offset=16).copy(), MAX_THETA)
        return ThetaSketch(lg_k, MAX_THETA, entries, seed_hash, True)
    if pre == 3:  # estimate (explicit theta)
        (n,) = struct.unpack_from("<I", buf, 8)
        (theta,) = struct.unpack_from("<Q", buf, 16)
        entries = _check_entries(np.frombuffer(buf, dtype=U64, count=n, offset=24).copy(), theta)
        empty = n == 0 and theta == MAX_THETA
        return ThetaSketch(lg_k, int(theta), entries, seed_hash, empty)
    raise codec.InvalidData(f"invalid v2 preamble longs {pre} (expected 1, 2, or 3)")


def theta_from_java_bytes(buf: bytes, lg_k: int = DEFAULT_LG_K, seed: int = DEFAULT_SEED) -> ThetaSketch:
    """Version-dispatching decoder for DataSketches compact theta
    images, serVer 1-4 (theta/sketch.rs:598-630)."""
    if len(buf) < 3:
        raise codec.InvalidData(f"insufficient data: {len(buf)} < 3")
    ver = buf[1]
    family = buf[2]
    if family != codec.FAMILY_THETA:
        raise codec.InvalidData(f"family mismatch: expected {codec.FAMILY_THETA}, got {family}")
    expect_hash = compute_seed_hash(seed)
    if ver == 1:
        return theta_from_java_v1_bytes(buf, lg_k, seed)
    if ver == 2:
        return theta_from_java_v2_bytes(buf, lg_k, seed)
    if ver == 3:
        return ThetaSketch.from_java_v3_bytes(buf, lg_k, expect_seed_hash=expect_hash)
    if ver == 4:
        return theta_from_java_v4_bytes(buf, lg_k, expect_seed_hash=expect_hash)
    raise codec.InvalidData(f"unsupported serial version: expected 1, 2, 3, or 4, got {ver}")


def _rebuild(entries: np.ndarray, theta: int, lg_k: int) -> tuple[np.ndarray, int]:
    """Apply the k-th-smallest rebuild rule; returns (sorted entries, theta)."""
    k = 1 << lg_k
    if len(entries) > k:
        part = np.partition(entries, k)
        theta = int(part[k])
        entries = np.sort(part[:k])
    else:
        entries = np.sort(entries)
    return entries, theta


def theta_union(sketches: list[ThetaSketch]) -> ThetaSketch:
    """Theta union — concat, screen by min theta, dedupe, rebuild.

    Not present in the Rust reference (only intersection is,
    ``theta/mod.rs:42-52``); semantics follow the rebuild rule
    ``theta/hash_table.rs:249-277`` and the Java union. Associative and
    commutative, so usable as a tree-reduce combiner.
    """
    if not sketches:
        raise ValueError("theta_union needs at least one sketch")
    seed_hash = sketches[0].seed_hash
    lg_k = min(s.lg_k for s in sketches)
    for s in sketches:
        if s.seed_hash != seed_hash and not s.empty:
            raise codec.InvalidData(
                f"incompatible seed hash: expected {seed_hash}, got {s.seed_hash}"
            )
    theta = min(s.theta for s in sketches)
    merged = np.concatenate([s.entries for s in sketches])
    merged = np.unique(merged[merged < U64(theta)])
    entries, theta = _rebuild(merged, theta, lg_k)
    return ThetaSketch(lg_k, theta, entries, seed_hash, all(s.empty for s in sketches))


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Theta intersection (theta/intersection.rs:64-196).

    theta = min(theta_a, theta_b); retain hashes present in both,
    screened below theta; empty if either input is empty.
    """
    if not a.empty and not b.empty and a.seed_hash != b.seed_hash:
        raise codec.InvalidData(
            f"incompatible seed hash: expected {a.seed_hash}, got {b.seed_hash}"
        )
    theta = min(a.theta, b.theta)
    common = np.intersect1d(a.entries, b.entries, assume_unique=True)
    common = common[common < U64(theta)]
    empty = a.empty or b.empty
    return ThetaSketch(min(a.lg_k, b.lg_k), theta, common, a.seed_hash, empty)


def theta_a_not_b(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Theta set difference A\\B (the DataSketches AnotB operation —
    absent from the Rust reference 0.3.0, which ships only
    intersection; semantics follow the published Java/C++ AnotB and
    the same screening rule as ``theta_intersect``).

    theta = min(theta_a, theta_b); retain A's entries NOT present in
    B, screened below theta; empty iff A is empty (B empty → result is
    A rescreened). Unbiased for |A\\B| by the standard theta argument:
    every retained hash is a uniform sample of A\\B at rate
    theta/MAX_THETA."""
    if not a.empty and not b.empty and a.seed_hash != b.seed_hash:
        raise codec.InvalidData(
            f"incompatible seed hash: expected {a.seed_hash}, got {b.seed_hash}"
        )
    theta = min(a.theta, b.theta)
    keep = a.entries[~np.isin(a.entries, b.entries, assume_unique=True)]
    keep = keep[keep < U64(theta)]
    return ThetaSketch(min(a.lg_k, b.lg_k), theta, keep, a.seed_hash, a.empty)


def jaccard_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """Estimated Jaccard similarity |A∩B| / |A∪B| from two theta sketches.

    The verification-stage primitive of the dedup pipeline (SURVEY.md §2
    ThetaIntersection mapping): both estimates are taken at the union's
    theta so the ratio is consistent.
    """
    u = theta_union([a, b])
    i = theta_intersect(a, b)
    ue = u.estimate()
    return 0.0 if ue == 0.0 else i.estimate() / ue


# ---------------------------------------------------------------------------
# sequential (construction-faithful) update sketch
# ---------------------------------------------------------------------------

_RESIZE_FACTORS = {"X1": 0, "X2": 1, "X4": 2, "X8": 3}  # common/resize.rs:45-77


def _starting_sub_multiple(lg_target: int, lg_min: int, lg_rf: int) -> int:
    """theta/hash_table.rs:389-397: lg_target = lg_init + n*lg_rf, lg_init >= lg_min."""
    if lg_target <= lg_min:
        return lg_min
    if lg_rf == 0:
        return lg_target
    return (lg_target - lg_min) % lg_rf + lg_min


class ThetaMut:
    """Sequential theta update sketch, construction-faithful to the
    reference's incremental hash table (``theta/hash_table.rs``): the
    retained set, theta, current table size and rebuild cadence evolve
    exactly as one-at-a-time ``try_insert_hash`` calls would —

    - screen ``hash == 0 or hash >= theta`` (``hash_table.rs:176-208``);
      any attempted update (even screened) clears the empty flag;
    - while ``lg_cur <= lg_nom``: grow by the resize factor whenever
      ``num_retained > floor(0.5 * size)`` (``hash_table.rs:210-245``,
      ``RESIZE_THRESHOLD``, ``starting_sub_multiple``);
    - at full size (``lg_max = lg_nom + 1``): on
      ``num_retained > floor(15/16 * size)`` rebuild — theta becomes the
      (k+1)-th smallest retained entry and exactly the k smaller entries
      survive (``hash_table.rs:247-277``, ``REBUILD_THRESHOLD``).

    Unlike the batch ``ThetaSketch.from_hashes`` (one rebuild at the
    end), the final retained set and theta therefore match the
    reference bit-exactly for any update stream and resize factor —
    the parity mode for single-partition streams. Batch updates replay
    the sequential schedule vectorized (insert events = first stream
    occurrence of each new hash; the rebuild point is the insert that
    pushes the count past the trigger), asserted equal to a literal
    per-value transcription in pytest. The distributed engine keeps
    using the batch path — the estimates differ only in which KMV
    prefix survives, not accuracy (both obey the same rebuild rule).
    """

    RESIZE_THRESHOLD = 0.5  # theta/mod.rs:63
    REBUILD_THRESHOLD = 15.0 / 16.0  # theta/mod.rs:65

    def __init__(
        self,
        lg_k: int = DEFAULT_LG_K,
        seed: int = DEFAULT_SEED,
        p: float = 1.0,
        resize_factor: str = "X8",
    ):
        if not MIN_LG_K <= lg_k <= MAX_LG_K:
            raise ValueError(f"lg_k must be in [{MIN_LG_K}, {MAX_LG_K}], got {lg_k}")
        if resize_factor not in _RESIZE_FACTORS:
            raise ValueError(f"resize_factor must be one of {sorted(_RESIZE_FACTORS)}")
        self.lg_nom = lg_k
        self.lg_max = lg_k + 1
        self.lg_rf = _RESIZE_FACTORS[resize_factor]
        self.seed = seed
        self.p = p
        self._start_theta = MAX_THETA if p >= 1.0 else int(MAX_THETA * p)
        self._start_lg_cur = _starting_sub_multiple(self.lg_max, MIN_LG_K, self.lg_rf)
        self.theta = self._start_theta
        self.lg_cur = self._start_lg_cur
        self.retained = np.empty(0, dtype=U64)  # kept sorted unique
        self.is_empty = True

    # -- update ------------------------------------------------------------

    def _rebuild_trigger(self) -> int:
        return int(self.REBUILD_THRESHOLD * (1 << self.lg_max))

    def _advance_lg(self) -> None:
        """Replay the resize schedule for the current retained count
        (resizes never change the retained set, only the table size)."""
        while self.lg_cur <= self.lg_nom and len(self.retained) > ((1 << self.lg_cur) >> 1):
            self.lg_cur = min(self.lg_cur + max(self.lg_rf, 1), self.lg_max)

    def update_hashes(self, hashes) -> "ThetaMut":
        """Batch update with pre-computed 63-bit hashes, replaying the
        sequential insert/resize/rebuild schedule in stream order."""
        h = np.ascontiguousarray(np.asarray(hashes, dtype=U64))
        if len(h):
            self.is_empty = False  # any attempt clears empty (hash_table.rs:177)
        h = h[h != 0]
        while len(h):
            h = h[h < U64(self.theta)]
            if not len(h):
                break
            # insert events = first stream occurrence of each hash not
            # yet retained, in stream order
            uniq, first = np.unique(h, return_index=True)
            if len(self.retained):
                pos = np.minimum(np.searchsorted(self.retained, uniq), len(self.retained) - 1)
                is_new = self.retained[pos] != uniq
            else:
                is_new = np.ones(len(uniq), dtype=bool)
            firsts = np.sort(first[is_new])
            until_rebuild = self._rebuild_trigger() + 1 - len(self.retained)
            if len(firsts) < until_rebuild:
                self.retained = np.union1d(self.retained, h[firsts])
                self._advance_lg()
                break
            # the insert at stream position j pushes the count past the
            # trigger; rebuild fires inside that insert (hash_table.rs:198-206)
            j = int(firsts[until_rebuild - 1])
            grown = np.union1d(self.retained, h[firsts[:until_rebuild]])
            k = 1 << self.lg_nom
            self.theta = int(grown[k])  # (k+1)-th smallest (hash_table.rs:249-254)
            self.retained = grown[:k]
            self.lg_cur = self.lg_max
            h = h[j + 1 :]
        return self

    def update_strings(self, column) -> "ThetaMut":
        return self.update_hashes(hashes_for_strings(column, seed=self.seed))

    def update_ints(self, values) -> "ThetaMut":
        return self.update_hashes(hashes_for_ints(values, seed=self.seed))

    # -- queries / lifecycle (theta/sketch.rs:126-205) -----------------------

    def num_retained(self) -> int:
        return len(self.retained)

    def theta64(self) -> int:
        return self.theta

    def is_estimation_mode(self) -> bool:
        return self.theta < MAX_THETA

    def estimate(self) -> float:
        if self.is_empty:
            return 0.0
        return len(self.retained) / (self.theta / MAX_THETA)

    def trim(self) -> "ThetaMut":
        """Reduce to nominal size k (theta/hash_table.rs:279-284)."""
        k = 1 << self.lg_nom
        if len(self.retained) > k:
            self.theta = int(self.retained[k])
            self.retained = self.retained[:k]
        return self

    def reset(self) -> "ThetaMut":
        """Back to the initial state (theta/hash_table.rs:286-304)."""
        self.theta = self._start_theta
        self.lg_cur = self._start_lg_cur
        self.retained = np.empty(0, dtype=U64)
        self.is_empty = True
        return self

    def compact(self) -> ThetaSketch:
        """Ordered compact image (theta/sketch.rs:222-241) — feeds the
        engine's serde/union/intersection algebra unchanged."""
        return ThetaSketch(
            self.lg_nom,
            self.theta,
            self.retained.copy(),
            compute_seed_hash(self.seed),
            self.is_empty,
        )
