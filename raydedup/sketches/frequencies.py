"""Frequent-items sketch (Misra-Gries variant with count offsets).

Follows the reference (``frequencies/sketch.rs``): a bounded map of
item → (count, offset-corrected) with purge-by-median when full
(``reverse_purge_item_hash_map.rs:130-146``: subtract the sampled
median of counts, drop non-positives, add the subtracted amount to the
global offset so error bounds hold); merge replays the other sketch's
(item, count) pairs and adds offsets (``frequencies/sketch.rs:282-295``).
Guarantees (``frequencies/mod.rs:43-54``): exact if distinct items <
0.75 * max_map_size; otherwise (UB - LB) <= 3.5 * total_weight / M.

Error types for queries mirror ``ErrorType`` (``frequencies/sketch.rs:48``):
NO_FALSE_POSITIVES returns items whose lower bound exceeds the
threshold; NO_FALSE_NEGATIVES uses the upper bound.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NO_FALSE_POSITIVES = "no_false_positives"
NO_FALSE_NEGATIVES = "no_false_negatives"

LOAD_FACTOR = 0.75  # frequencies/mod.rs:43-44


# -- item codec registry ----------------------------------------------------
# The engine-side analog of the reference's ``FrequentItemValue`` trait
# (``frequencies/serialization.rs:36-43``): the wire format is generic
# over the item type, so users register an (encode, decode) pair per
# type name and pass that name to to_java_bytes/from_java_bytes. The
# three reference-native types plus raw ``bytes`` ship registered.
#
#   encode(items: list) -> bytes
#   decode(buf: bytes, pos: int, n: int) -> (items: list, new_pos: int)

_ITEM_CODECS: dict = {}


def register_item_codec(name: str, encode, decode) -> None:
    """Register a FrequentItems wire codec for arbitrary item types
    (tuples, composite keys, pre-encoded bytes, ...). Items must stay
    hashable — the sketch map is a dict — and ``decode`` must return
    exactly the values ``encode`` consumed."""
    _ITEM_CODECS[name] = (encode, decode)


def _enc_i64(items):
    return np.asarray(items, dtype="<i8").tobytes()


def _dec_i64(buf, pos, n):
    return np.frombuffer(buf, dtype="<i8", count=n, offset=pos).tolist(), pos + 8 * n


def _enc_u64(items):
    return np.asarray(items, dtype="<u8").tobytes()


def _dec_u64(buf, pos, n):
    return np.frombuffer(buf, dtype="<u8", count=n, offset=pos).tolist(), pos + 8 * n


def _enc_str(items):
    import struct

    parts = []
    for it in items:
        bs = str(it).encode()
        parts.append(struct.pack("<I", len(bs)) + bs)
    return b"".join(parts)


def _dec_str(buf, pos, n):
    import struct

    items = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        items.append(buf[pos : pos + ln].decode())
        pos += ln
    return items, pos


def _enc_bytes(items):
    import struct

    return b"".join(struct.pack("<I", len(it)) + bytes(it) for it in items)


def _dec_bytes(buf, pos, n):
    import struct

    items = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        items.append(bytes(buf[pos : pos + ln]))
        pos += ln
    return items, pos


register_item_codec("i64", _enc_i64, _dec_i64)
register_item_codec("u64", _enc_u64, _dec_u64)
register_item_codec("string", _enc_str, _dec_str)
register_item_codec("bytes", _enc_bytes, _dec_bytes)


@dataclass
class FrequentItemsSketch:
    max_map_size: int
    counts: dict = field(default_factory=dict)
    offset: int = 0
    total_weight: int = 0

    @property
    def capacity(self) -> int:
        return int(self.max_map_size * LOAD_FACTOR)

    def _purge(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        median = int(np.median(vals))
        self.offset += median
        self.counts = {k: v - median for k, v in self.counts.items() if v > median}

    def update(self, item, count: int = 1) -> "FrequentItemsSketch":
        if count <= 0:
            return self
        self.total_weight += count
        self.counts[item] = self.counts.get(item, 0) + count
        self._purge()
        return self

    def update_batch(self, items, counts=None) -> "FrequentItemsSketch":
        """Vectorized batch update: aggregate within the batch first."""
        items = np.asarray(items)
        if counts is None:
            uniq, c = np.unique(items, return_counts=True)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            order = np.argsort(items, kind="stable")
            si, sc = items[order], counts[order]
            new = np.ones(len(si), dtype=bool)
            new[1:] = si[1:] != si[:-1]
            starts = np.nonzero(new)[0]
            uniq, c = si[starts], np.add.reduceat(sc, starts)
        self.total_weight += int(c.sum())
        for item, cnt in zip(uniq.tolist(), c.tolist()):
            self.counts[item] = self.counts.get(item, 0) + int(cnt)
        self._purge()
        return self

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        out = FrequentItemsSketch(min(self.max_map_size, other.max_map_size))
        out.total_weight = self.total_weight + other.total_weight
        out.offset = self.offset + other.offset
        merged = dict(self.counts)
        for k, v in other.counts.items():
            merged[k] = merged.get(k, 0) + v
        out.counts = merged
        out._purge()
        return out

    # -- queries -----------------------------------------------------------

    def estimate(self, item) -> int:
        c = self.counts.get(item)
        return (c + self.offset) if c is not None else 0

    def lower_bound(self, item) -> int:
        c = self.counts.get(item)
        return c if c is not None else 0

    def upper_bound(self, item) -> int:
        c = self.counts.get(item, 0)
        return c + self.offset

    def maximum_error(self) -> int:
        return self.offset

    def frequent_items(self, error_type: str = NO_FALSE_POSITIVES, threshold: int | None = None):
        """[(item, estimate, lb, ub)] sorted by estimate desc."""
        t = self.offset if threshold is None else threshold
        rows = []
        for item, c in self.counts.items():
            lb, ub = c, c + self.offset
            bound = lb if error_type == NO_FALSE_POSITIVES else ub
            if bound > t:
                rows.append((item, c + self.offset, lb, ub))
        rows.sort(key=lambda r: (-r[1], str(r[0])))
        return rows

    # -- DataSketches family-10 wire format --------------------------------

    def to_java_bytes(self, item_type: str = "string") -> bytes:
        """Serialize in the DataSketches FREQUENCY (family 10) layout
        (``frequencies/sketch.rs:408-453``, constants
        ``frequencies/serialization.rs:25-33``): preamble byte 0 is
        pre-longs (1 empty / 4 non-empty), then serVer 1, family 10,
        lg_max_map_size, lg_cur_map_size, flags; non-empty adds
        active-item count, stream weight, offset, the raw stored
        counts (u64 each) and the items encoded per
        ``FrequentItemValue`` (``serialization.rs:45-95``): the item
        codec is looked up by ``item_type`` in the extensible registry
        (built-ins i64/u64 fixed 8 bytes, string/bytes u32-length-
        prefixed; arbitrary types via ``register_item_codec``)."""
        import math
        import struct

        lg_max = max(1, math.ceil(math.log2(max(self.max_map_size, 2))))
        active = len(self.counts)
        lg_cur = min(max(3, math.ceil(math.log2(max(active / LOAD_FACTOR, 1) + 1))), lg_max)
        if active == 0:
            return struct.pack("<BBBBBBH", 1, 1, 10, lg_max, lg_cur, 5, 0)
        out = struct.pack("<BBBBBBH", 4, 1, 10, lg_max, lg_cur, 0, 0)
        out += struct.pack("<II", active, 0)
        out += struct.pack("<QQ", self.total_weight, self.offset)
        items = list(self.counts.keys())
        vals = np.fromiter(self.counts.values(), dtype=np.uint64, count=active)
        out += vals.tobytes()
        if item_type not in _ITEM_CODECS:
            raise ValueError(
                f"unsupported item_type {item_type}; register one with "
                "register_item_codec"
            )
        out += _ITEM_CODECS[item_type][0](items)
        return out

    @classmethod
    def from_java_bytes(cls, buf: bytes, item_type: str = "string") -> "FrequentItemsSketch":
        """Decode a DataSketches family-10 image
        (``frequencies/sketch.rs:455-526`` validation semantics)."""
        import struct

        if len(buf) < 8:
            raise ValueError(f"insufficient data: {len(buf)} < 8")
        pre, ver, family, lg_max, lg_cur, flags, _ = struct.unpack_from("<BBBBBBH", buf, 0)
        pre &= 0x3F
        if family != 10:
            raise ValueError(f"family mismatch: expected 10, got {family}")
        if ver != 1:
            raise ValueError(f"unsupported FI serial version {ver}")
        if lg_cur > lg_max:
            raise ValueError("lg_cur_map_size exceeds lg_max_map_size")
        if flags & 5:
            if pre != 1:
                raise ValueError(f"empty image preamble longs {pre} != 1")
            return cls(1 << lg_max)
        if pre != 4:
            raise ValueError(f"non-empty image preamble longs {pre} != 4")
        active, _ = struct.unpack_from("<II", buf, 8)
        stream_weight, offset = struct.unpack_from("<QQ", buf, 16)
        vals = np.frombuffer(buf, dtype="<u8", count=active, offset=32).astype(np.int64)
        pos = 32 + active * 8
        if item_type not in _ITEM_CODECS:
            raise ValueError(
                f"unsupported item_type {item_type}; register one with "
                "register_item_codec"
            )
        items, pos = _ITEM_CODECS[item_type][1](buf, pos, active)
        if len(items) != active:
            raise ValueError("item count mismatch during deserialization")
        sk = cls(1 << lg_max, dict(zip(items, vals.tolist())), int(offset), int(stream_weight))
        return sk

    # -- serde (string/int items) -----------------------------------------

    def to_bytes(self) -> bytes:
        import json

        from . import codec

        payload = json.dumps(
            {
                "max": self.max_map_size,
                "offset": self.offset,
                "total": self.total_weight,
                "items": list(self.counts.keys()),
                "counts": list(self.counts.values()),
            }
        ).encode()
        return codec.pack_header(codec.FAMILY_FREQUENCY, 0, 0, 1) + payload

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FrequentItemsSketch":
        import json

        from . import codec

        codec.unpack_header(buf, codec.FAMILY_FREQUENCY)
        d = json.loads(buf[codec.HEADER_SIZE :])
        sk = cls(d["max"], dict(zip(d["items"], d["counts"])), d["offset"], d["total"])
        return sk
