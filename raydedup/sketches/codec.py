"""Binary codec: family-ID'd headers for serialized sketches.

Mirrors the reference's family registry (``codec/family.rs:37-109``) so
every sketch image that flows through a Dataset (as an Arrow ``binary``
cell) or lands in a checkpoint is self-describing: family byte, serial
version, config, and a 16-bit seed-hash fingerprint
(``hash/mod.rs:72-81``) that makes cross-config merges fail fast —
the same guarantee the reference enforces at merge time
(``theta/intersection.rs:81-87``, ``cpc/union.rs:216``).

Internal layout (little-endian, not byte-compatible with the Java/C++
wire formats — SURVEY.md §2.2: "v3-equivalent plain bytes suffice
internally"):

    byte 0: family id
    byte 1: serial version (1)
    byte 2: lg_k / num_hashes / k-low (family-specific config byte)
    byte 3: flags (bit0 = empty, bit1 = ordered, bit2 = merged)
    bytes 4-5: seed_hash (u16 LE)
    bytes 6-7: reserved (0)
    payload: family-specific
"""

from __future__ import annotations

import struct

# Family IDs — identical constants to codec/family.rs:37-99.
FAMILY_THETA = 3
FAMILY_HLL = 7
FAMILY_FREQUENCY = 10
FAMILY_CPC = 16
FAMILY_COUNTMIN = 18
FAMILY_TDIGEST = 20
FAMILY_BLOOM = 21

SERIAL_VERSION = 1

FLAG_EMPTY = 1
FLAG_ORDERED = 2
FLAG_MERGED = 4
FLAG_HAS_HIP = 8
FLAG_SPARSE = 16

_HEADER = struct.Struct("<BBBBHH")
HEADER_SIZE = _HEADER.size


class CodecError(ValueError):
    """Base for sketch codec failures (``error.rs:25-80``). The two
    subclasses mirror the reference's taxonomy: catch ``CodecError``
    for either, or the subclass to distinguish caller mistakes from
    corrupt data."""


class InvalidArgument(CodecError):
    """Caller-supplied parameter is out of contract (``error.rs``
    ``InvalidArgument``): bad lg_k, mismatched seeds at merge time,
    unsupported config requested."""


class InvalidData(CodecError):
    """The bytes themselves are corrupt or foreign (``error.rs``
    ``InvalidData``): truncated image, family/version mismatch,
    failed internal invariant while decoding."""


def pack_header(family: int, config: int, flags: int, seed_hash: int) -> bytes:
    return _HEADER.pack(family, SERIAL_VERSION, config, flags, seed_hash, 0)


def unpack_header(buf: bytes, expect_family: int, expect_seed_hash: int | None = None):
    """Validate + decode a header; returns (config, flags).

    Family / version / seed-hash mismatches raise, mirroring the
    reference's deserialize validation (``theta/sketch.rs:598-630``).
    """
    if len(buf) < HEADER_SIZE:
        raise InvalidData(f"insufficient data: {len(buf)} < {HEADER_SIZE}")
    family, version, config, flags, seed_hash, _ = _HEADER.unpack_from(buf)
    if family != expect_family:
        raise InvalidData(f"family mismatch: expected {expect_family}, got {family}")
    if version != SERIAL_VERSION:
        raise InvalidData(f"unsupported serial version {version}")
    if expect_seed_hash is not None and seed_hash != expect_seed_hash and not (flags & FLAG_EMPTY):
        raise InvalidArgument(
            f"incompatible seed hash: expected {expect_seed_hash}, got {seed_hash}"
        )
    return config, flags, seed_hash
