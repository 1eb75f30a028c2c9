"""Bloom filter: vectorized Kirsch-Mitzenmacher double hashing.

Follows the reference (``bloom/sketch.rs``, ``bloom/builder.rs``):

- sizing: ``m = ceil(-n ln p / ln^2 2)``, ``k = round((m/n) ln 2)``
  (``bloom/builder.rs:183-215``);
- probes: ``h0 = xxhash64(item, seed)``, ``h1 = xxhash64(item, h0)``,
  bit i (1-based) at ``((h0 + i*h1) >> 1) % m``
  (``bloom/sketch.rs:495-543``);
- union/intersect/invert as bitwise ops over compatible filters
  (``bloom/sketch.rs:174-255``), stats ``bits_used``, ``load_factor``
  and ``estimated_fpp = (bits_used/m)^k`` (``:263-307``).

Items enter as 64-bit tokens (murmur3 h1 of the value — the engine's
universal value token), which then go through the reference's exact
xxhash64 double-hash path for u64 inputs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import codec
from .hashing import DEFAULT_SEED, hash_strings, xxhash64_u64

U64 = np.uint64


def optimal_bits(n: int, fpp: float) -> int:
    return max(64, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))


def optimal_hashes(n: int, m: int) -> int:
    return max(1, round((m / n) * math.log(2)))


@dataclass
class BloomFilter:
    num_bits: int
    num_hashes: int
    seed: int = DEFAULT_SEED
    bits: np.ndarray = field(default=None)

    def __post_init__(self):
        self.num_bits = ((self.num_bits + 63) // 64) * 64
        if self.bits is None:
            self.bits = np.zeros(self.num_bits // 64, dtype=U64)

    @classmethod
    def with_accuracy(cls, n: int, fpp: float, seed: int = DEFAULT_SEED) -> "BloomFilter":
        m = optimal_bits(n, fpp)
        return cls(m, optimal_hashes(n, m), seed)

    def _bit_indices(self, tokens: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing."""
        t = np.asarray(tokens, dtype=U64)
        h0 = xxhash64_u64(t, self.seed)
        h1 = xxhash64_u64(t, h0)
        i = np.arange(1, self.num_hashes + 1, dtype=U64)[:, None]
        return ((h0[None, :] + i * h1[None, :]) >> U64(1)) % U64(self.num_bits)

    def insert(self, tokens: np.ndarray) -> "BloomFilter":
        idx = self._bit_indices(tokens).reshape(-1)
        np.bitwise_or.at(self.bits, (idx >> U64(6)).astype(np.int64), U64(1) << (idx & U64(63)))
        return self

    def contains(self, tokens: np.ndarray) -> np.ndarray:
        idx = self._bit_indices(tokens)
        word = self.bits[(idx >> U64(6)).astype(np.int64)]
        hit = (word >> (idx & U64(63))) & U64(1)
        return hit.all(axis=0)

    def contains_and_insert(self, tokens: np.ndarray) -> np.ndarray:
        """Single-pass probe-and-set (``bloom/sketch.rs:120-123``
        ``query_and_update`` analog, batch form): membership of every
        token vs the PRE-CALL state, then all tokens inserted — the
        double-hash bit positions are computed once instead of twice.
        Batch semantics match the streaming probe-then-commit contract:
        within-call duplicates all report their pre-call membership
        (the reference's sequential per-item form would report later
        copies as present)."""
        idx = self._bit_indices(tokens)
        w = (idx >> U64(6)).astype(np.int64)
        b = U64(1) << (idx & U64(63))
        hit = ((self.bits[w] & b) != 0).all(axis=0)
        np.bitwise_or.at(self.bits, w.reshape(-1), b.reshape(-1))
        return hit

    def insert_strings(self, column, hash_seed: int = DEFAULT_SEED) -> "BloomFilter":
        h1, _ = hash_strings(column, seed=hash_seed)
        return self.insert(h1)

    def contains_strings(self, column, hash_seed: int = DEFAULT_SEED) -> np.ndarray:
        h1, _ = hash_strings(column, seed=hash_seed)
        return self.contains(h1)

    def _check_compat(self, other: "BloomFilter") -> None:
        if (self.num_bits, self.num_hashes, self.seed) != (
            other.num_bits,
            other.num_hashes,
            other.seed,
        ):
            raise codec.InvalidArgument("incompatible Bloom filter configs")

    def union(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        return BloomFilter(self.num_bits, self.num_hashes, self.seed, self.bits | other.bits)

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        return BloomFilter(self.num_bits, self.num_hashes, self.seed, self.bits & other.bits)

    def invert(self) -> "BloomFilter":
        return BloomFilter(self.num_bits, self.num_hashes, self.seed, ~self.bits)

    # -- stats (bloom/sketch.rs:263-307) -----------------------------------

    def bits_used(self) -> int:
        return int(sum(bin(int(w)).count("1") for w in self.bits))

    def load_factor(self) -> float:
        return self.bits_used() / self.num_bits

    def estimated_fpp(self) -> float:
        return self.load_factor() ** self.num_hashes

    def to_bytes(self) -> bytes:
        head = codec.pack_header(codec.FAMILY_BLOOM, self.num_hashes, 0, 1)
        meta = np.array([self.num_bits], dtype=np.int64)
        return head + meta.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, seed: int = DEFAULT_SEED) -> "BloomFilter":
        num_hashes, _, _ = codec.unpack_header(buf, codec.FAMILY_BLOOM)
        num_bits = int(np.frombuffer(buf, np.int64, 1, codec.HEADER_SIZE)[0])
        bits = np.frombuffer(buf, U64, num_bits // 64, codec.HEADER_SIZE + 8).copy()
        return cls(num_bits, int(num_hashes), seed, bits)

    # -- DataSketches BLOOMFILTER (family 21, serVer 1) wire format ---------

    def to_java_bytes(self) -> bytes:
        """Serialize in the DataSketches layout (``bloom/sketch.rs:
        339-380``): [pre-longs 1 empty / 3 non-empty, serVer 1,
        family 21, flags][u16 num_hashes][u64 seed][i32 num_longs]
        then (non-empty) u64 bits-set count + the bit array words."""
        import struct

        bits_set = self.bits_used()
        empty = bits_set == 0
        head = struct.pack("<BBBBHH", 1 if empty else 3, 1, 21, 4 if empty else 0, self.num_hashes, 0)
        head += struct.pack("<Q", self.seed)
        head += struct.pack("<iI", len(self.bits), 0)
        if empty:
            return head
        return head + struct.pack("<Q", bits_set) + self.bits.astype("<u8").tobytes()

    @classmethod
    def from_java_bytes(cls, buf: bytes) -> "BloomFilter":
        """Decode the family-21 image (``bloom/sketch.rs:397-470``
        validation semantics: family, version, empty flag)."""
        import struct

        if len(buf) < 24:
            raise ValueError(f"insufficient data: {len(buf)} < 24")
        pre, ver, family, flags, num_hashes, _ = struct.unpack_from("<BBBBHH", buf, 0)
        if family != 21:
            raise ValueError(f"family mismatch: expected 21, got {family}")
        if ver != 1:
            raise ValueError(f"unsupported bloom serial version {ver}")
        (seed,) = struct.unpack_from("<Q", buf, 8)
        (num_longs,) = struct.unpack_from("<i", buf, 16)
        empty = bool(flags & 4)
        bits = (
            np.zeros(num_longs, U64)
            if empty
            else np.frombuffer(buf, "<u8", num_longs, 32).astype(U64)
        )
        return cls(num_longs * 64, int(num_hashes), int(seed), bits)
