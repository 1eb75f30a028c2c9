"""Count-Min sketch: num_hashes × num_buckets count matrix.

Faithful to the reference (``countmin/sketch.rs``): per-row seeds are
``murmur3(row_index as 8 LE bytes, seed).h1`` (``make_hash_seeds``,
``countmin/sketch.rs:493-503``); an item's bucket in row r is
``murmur3(item, seed_r).h1 % num_buckets`` (``bucket_index``,
``:405-410``); estimate = min over rows; upper bound adds
``relative_error * total_weight`` (``:201-225``); merge = elementwise
matrix add for matching configs (``:246-259``). Config helpers use the
same formulas (``:131-151``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import codec
from .hashing import DEFAULT_SEED, compute_seed_hash, hash_strings, hash_u64_column

U64 = np.uint64


def suggest_num_buckets(relative_error: float) -> int:
    """ceil(e / relative_error) — countmin/sketch.rs:131-140."""
    if relative_error <= 0:
        raise ValueError("relative_error must be positive")
    return math.ceil(math.e / relative_error)


def suggest_num_hashes(confidence: float) -> int:
    """ceil(ln(1/(1-confidence))) — countmin/sketch.rs:142-151."""
    if not 0 < confidence < 1:
        raise ValueError("confidence must be in (0,1)")
    return math.ceil(math.log(1.0 / (1.0 - confidence)))


def _row_seeds(seed: int, num_hashes: int) -> np.ndarray:
    h1, _ = hash_u64_column(np.arange(num_hashes, dtype=np.int64), seed=seed)
    return h1


@dataclass
class CountMinSketch:
    num_hashes: int
    num_buckets: int
    seed: int = DEFAULT_SEED
    counts: np.ndarray = field(default=None)
    total_weight: int = 0

    def __post_init__(self):
        if self.num_hashes < 1 or self.num_buckets < 3:
            raise ValueError("num_hashes >= 1 and num_buckets >= 3 required")
        if self.counts is None:
            self.counts = np.zeros((self.num_hashes, self.num_buckets), dtype=np.int64)
        self.row_seeds = _row_seeds(self.seed, self.num_hashes)
        self.seed_hash = compute_seed_hash(self.seed)

    def relative_error(self) -> float:
        return math.e / self.num_buckets

    def _buckets(self, column) -> np.ndarray:
        """(num_hashes, n) bucket indices for a string/bytes column."""
        out = np.empty((self.num_hashes, len(column)), dtype=np.int64)
        for r in range(self.num_hashes):
            h1, _ = hash_strings(column, seed=int(self.row_seeds[r]))
            out[r] = (h1 % U64(self.num_buckets)).astype(np.int64)
        return out

    def update(self, column, weights=None) -> "CountMinSketch":
        """Vectorized update of a whole column (optionally weighted)."""
        n = len(column)
        w = np.ones(n, dtype=np.int64) if weights is None else np.asarray(weights, dtype=np.int64)
        live = w != 0
        self.total_weight += int(np.abs(w).sum())
        b = self._buckets(column)
        for r in range(self.num_hashes):
            np.add.at(self.counts[r], b[r][live], w[live])
        return self

    def estimate(self, column) -> np.ndarray:
        b = self._buckets(column)
        ests = self.counts[np.arange(self.num_hashes)[:, None], b]
        return ests.min(axis=0)

    def lower_bound(self, column) -> np.ndarray:
        return self.estimate(column)

    def upper_bound(self, column) -> np.ndarray:
        err = int(self.relative_error() * self.total_weight)
        return self.estimate(column) + err

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.num_hashes, self.num_buckets, self.seed_hash) != (
            other.num_hashes,
            other.num_buckets,
            other.seed_hash,
        ):
            raise codec.InvalidArgument("incompatible CountMin configs")
        out = CountMinSketch(self.num_hashes, self.num_buckets, self.seed)
        out.counts = self.counts + other.counts
        out.total_weight = self.total_weight + other.total_weight
        return out

    def halve(self) -> "CountMinSketch":
        """Divide every counter by two (decay) — countmin/sketch.rs:427."""
        self.counts //= 2
        self.total_weight //= 2
        return self

    # -- DataSketches COUNTMIN (family 18, serVer 1) wire format -----------

    def to_java_bytes(self) -> bytes:
        """Serialize in the DataSketches layout
        (``countmin/sketch.rs:273-304``, constants
        ``countmin/serialization.rs:18-20``): [pre-longs 2, serVer 1,
        family 18, flags, u32 unused][u32 num_buckets, u8 num_hashes,
        u16 seed_hash, u8 unused] then (non-empty) i64 total weight +
        the row-major i64 count matrix."""
        import struct

        empty = self.total_weight == 0
        out = struct.pack("<BBBBI", 2, 1, 18, 1 if empty else 0, 0)
        out += struct.pack("<IBHB", self.num_buckets, self.num_hashes, self.seed_hash, 0)
        if empty:
            return out
        out += struct.pack("<q", self.total_weight)
        return out + self.counts.astype("<i8").reshape(-1).tobytes()

    @classmethod
    def from_java_bytes(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "CountMinSketch":
        """Decode the family-18 image (``countmin/sketch.rs:306-380``
        validation semantics incl. seed-hash enforcement)."""
        import struct

        if len(buf) < 16:
            raise ValueError(f"insufficient data: {len(buf)} < 16")
        pre, ver, family, flags, _ = struct.unpack_from("<BBBBI", buf, 0)
        if family != 18:
            raise ValueError(f"family mismatch: expected 18, got {family}")
        if ver != 1:
            raise ValueError(f"unsupported countmin serial version {ver}")
        num_buckets, num_hashes, seed_hash, _ = struct.unpack_from("<IBHB", buf, 8)
        expect = compute_seed_hash(seed)
        if seed_hash != expect:
            raise ValueError(f"incompatible seed hash: expected {expect}, got {seed_hash}")
        if flags & 1:
            return cls(int(num_hashes), int(num_buckets), seed)
        (total_w,) = struct.unpack_from("<q", buf, 16)
        counts = (
            np.frombuffer(buf, "<i8", int(num_hashes) * int(num_buckets), 24)
            .reshape(int(num_hashes), int(num_buckets))
            .copy()
        )
        return cls(int(num_hashes), int(num_buckets), seed, counts, int(total_w))

    def to_bytes(self) -> bytes:
        head = codec.pack_header(codec.FAMILY_COUNTMIN, self.num_hashes, 0, self.seed_hash)
        meta = np.array([self.num_buckets, self.total_weight], dtype=np.int64)
        return head + meta.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "CountMinSketch":
        num_hashes, _, seed_hash = codec.unpack_header(
            buf, codec.FAMILY_COUNTMIN, compute_seed_hash(seed)
        )
        o = codec.HEADER_SIZE
        num_buckets, total_w = np.frombuffer(buf, np.int64, 2, o)
        counts = (
            np.frombuffer(buf, np.int64, int(num_hashes) * int(num_buckets), o + 16)
            .reshape(int(num_hashes), int(num_buckets))
            .copy()
        )
        sk = cls(int(num_hashes), int(num_buckets), seed, counts, int(total_w))
        return sk
