"""CPC compressed wire format (DataSketches family 16, serVer 1).

Ports the reference's compression codec
(``/root/reference/datasketches/src/cpc/compression.rs``,
``serialization.rs``, ``sketch.rs:455-610``) so engine CPC sketches
interchange with Java/C++/Rust deployments. The engine keeps CPC
state as the full k x 64 bit matrix (``cpc.py``); the windowed
decomposition the wire format needs is derived canonically from the
matrix using the reference's own invariant (``sketch.rs:418-452``
``build_bit_matrix``): with window offset ``o``, columns below ``o``
default to 1, the window byte covers ``[o, o+8)``, and "surprising"
pairs are exactly the bits where the matrix differs from
``default | window``.

Encodings (compression.rs:214-345, 537-640): the sliding window is a
byte stream through phase-selected 12-bit-lookahead Huffman tables;
pairs are delta-coded as (column-delta via length-limited unary-65,
row-delta via Golomb with unary high bits). Tables are numeric data
from the Apache DataSketches project (``_cpc_tables.npz``).
"""

from __future__ import annotations

import os
import struct

import numpy as np

U64 = np.uint64

_tables = None


def _t():
    global _tables
    if _tables is None:
        _tables = np.load(os.path.join(os.path.dirname(__file__), "_cpc_tables.npz"))
    return _tables


# -- flavor / offset / phase (cpc/mod.rs:59-102, compression.rs:641-675) ----

EMPTY, SPARSE, HYBRID, PINNED, SLIDING = range(5)


def determine_flavor(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if c == 0:
        return EMPTY
    if (c << 5) < 3 * k:
        return SPARSE
    if (c << 1) < k:
        return HYBRID
    if (c << 3) < 27 * k:
        return PINNED
    return SLIDING


def determine_correct_offset(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    tmp = (c << 3) - 19 * k
    return 0 if tmp < 0 else tmp >> (lg_k + 3)


def determine_pseudo_phase(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 17
        if 100 * c < 132 * k:
            return 18
        if 3 * c < 5 * k:
            return 19
        if 1000 * c < 1965 * k:
            return 20
        if 1000 * c < 2275 * k:
            return 21
        return 6
    return (c >> (lg_k - 4)) & 15


def _golomb_base_bits(k: int, count: int) -> int:
    q = (k - count) // count
    return 0 if q == 0 else q.bit_length() - 1


# -- bit stream helpers (compression.rs:677-758) ----------------------------


class _BitWriter:
    def __init__(self):
        self.words: list[int] = []
        self.bitbuf = 0
        self.bufbits = 0

    def put(self, value: int, nbits: int) -> None:
        self.bitbuf |= value << self.bufbits
        self.bufbits += nbits
        while self.bufbits >= 32:
            self.words.append(self.bitbuf & 0xFFFFFFFF)
            self.bitbuf >>= 32
            self.bufbits -= 32

    def put_unary(self, value: int) -> None:
        remaining = value
        while remaining >= 16:
            remaining -= 16
            self.put(0, 16)
        self.put(1 << remaining, remaining + 1)

    def finish(self, padding: int) -> np.ndarray:
        self.put(0, padding)
        if self.bufbits > 0:
            self.words.append(self.bitbuf & 0xFFFFFFFF)
            self.bitbuf = 0
            self.bufbits = 0
        return np.array(self.words, dtype=np.uint32)


class _BitReader:
    def __init__(self, words: np.ndarray):
        self.words = words
        self.idx = 0
        self.bitbuf = 0
        self.bufbits = 0

    def _fill(self, minbits: int) -> None:
        if self.bufbits < minbits:
            self.bitbuf |= int(self.words[self.idx]) << self.bufbits
            self.idx += 1
            self.bufbits += 32

    def take(self, nbits: int) -> int:
        self._fill(nbits)
        v = self.bitbuf & ((1 << nbits) - 1)
        self.bitbuf >>= nbits
        self.bufbits -= nbits
        return v

    def read_unary(self) -> int:
        subtotal = 0
        while True:
            self._fill(8)
            peek8 = self.bitbuf & 0xFF
            if peek8:
                tz = (peek8 & -peek8).bit_length() - 1
                self.bitbuf >>= tz + 1
                self.bufbits -= tz + 1
                return subtotal + tz
            subtotal += 8
            self.bitbuf >>= 8
            self.bufbits -= 8

    def read_coded(self, decoding_table: np.ndarray) -> int:
        """12-bit peek through a (length<<8 | symbol) lookup table."""
        self._fill(12)
        lookup = int(decoding_table[self.bitbuf & 0xFFF])
        length = lookup >> 8
        self.bitbuf >>= length
        self.bufbits -= length
        return lookup & 0xFF


# -- low-level codecs (compression.rs:214-345, 537-640) ---------------------


def _compress_bytes(byte_array: np.ndarray, encoding_table: np.ndarray) -> np.ndarray:
    w = _BitWriter()
    infos = encoding_table[byte_array]
    for info in infos.tolist():
        w.put(info & 0xFFF, info >> 12)
    return w.finish(11)


def _uncompress_bytes(words: np.ndarray, n: int, decoding_table: np.ndarray) -> np.ndarray:
    r = _BitReader(words)
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        out[i] = r.read_coded(decoding_table)
    return out


def _compress_pairs(pairs: np.ndarray, num_base_bits: int, enc65: np.ndarray) -> np.ndarray:
    w = _BitWriter()
    lo_mask = (1 << num_base_bits) - 1
    pred_row, pred_col = 0, 0
    for row_col in pairs.tolist():
        row = row_col >> 6
        col = row_col & 63
        if row != pred_row:
            pred_col = 0
        x_delta = col - pred_col
        y_delta = row - pred_row
        pred_row, pred_col = row, col + 1
        info = int(enc65[x_delta])
        w.put(info & 0xFFF, info >> 12)
        w.put_unary(y_delta >> num_base_bits)
        w.put(y_delta & lo_mask, num_base_bits)
    return w.finish(max(0, 10 - num_base_bits))


def _uncompress_pairs(words: np.ndarray, num_pairs: int, num_base_bits: int, dec65: np.ndarray) -> np.ndarray:
    r = _BitReader(words)
    out = np.empty(num_pairs, dtype=np.uint32)
    pred_row, pred_col = 0, 0
    for i in range(num_pairs):
        x_delta = r.read_coded(dec65)
        hi = r.read_unary()
        lo = r.take(num_base_bits) if num_base_bits else 0
        y_delta = (hi << num_base_bits) | lo
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        out[i] = (row << 6) | col
        pred_row, pred_col = row, col + 1
    return out


# -- matrix <-> windowed decomposition --------------------------------------


def _popcount(matrix: np.ndarray) -> int:
    return int(np.bitwise_count(matrix).sum()) if hasattr(np, "bitwise_count") else int(
        sum(bin(int(x)).count("1") for x in matrix)
    )


def _bits_of(words: np.ndarray) -> np.ndarray:
    """Sorted (row<<6 | col) pairs for every set bit of a u64-row matrix."""
    rows, = np.nonzero(words)
    out = []
    for row in rows.tolist():
        word = int(words[row])
        while word:
            col = (word & -word).bit_length() - 1
            word &= word - 1
            out.append((row << 6) | col)
    return np.array(out, dtype=np.uint32)


def compress_matrix(lg_k: int, matrix: np.ndarray):
    """matrix → (flavor, window_words, window_count, table_words,
    table_num_entries, num_coupons, first_interesting_column)."""
    t = _t()
    k = 1 << lg_k
    c = _popcount(matrix)
    flavor = determine_flavor(lg_k, c)
    offset = determine_correct_offset(lg_k, c)
    window_words = np.empty(0, np.uint32)
    table_words = np.empty(0, np.uint32)
    table_entries = 0
    fic = 0
    if flavor in (SPARSE, HYBRID):
        pairs = _bits_of(matrix)
        table_entries = len(pairs)
        nbb = _golomb_base_bits(k + table_entries, table_entries)
        table_words = _compress_pairs(pairs, nbb, t["unary_enc"])
    elif flavor in (PINNED, SLIDING):
        default = U64((1 << offset) - 1)
        window = ((matrix >> U64(offset)) & U64(0xFF)).astype(np.uint8)
        phase = determine_pseudo_phase(lg_k, c)
        window_words = _compress_bytes(window, t["he_enc"][phase])
        surprising = matrix ^ default ^ (window.astype(U64) << U64(offset))
        ored = int(np.bitwise_or.reduce(surprising)) if len(surprising) else 0
        fic = min((ored & -ored).bit_length() - 1 if ored else 64, offset)
        pairs = _bits_of(surprising)
        if len(pairs):
            if flavor == PINNED:
                assert (pairs & 63).min() >= 8, "pinned pair column < 8"
                pairs = pairs - 8
            else:  # SLIDING: rotate then permute columns before sorting
                perm = t["perm_enc"][phase]
                row = pairs >> 6
                col = ((pairs & 63) + 56 - offset) & 63
                assert col.max(initial=0) < 56
                pairs = np.sort((row << 6) | perm[col].astype(np.uint32))
            table_entries = len(pairs)
            nbb = _golomb_base_bits(k + table_entries, table_entries)
            table_words = _compress_pairs(pairs, nbb, t["unary_enc"])
    return flavor, window_words, table_words, table_entries, c, fic


def uncompress_to_matrix(lg_k: int, c: int, window_words, table_words, table_entries: int) -> np.ndarray:
    t = _t()
    k = 1 << lg_k
    flavor = determine_flavor(lg_k, c)
    matrix = np.zeros(k, dtype=U64)
    if flavor == EMPTY:
        return matrix
    if flavor in (SPARSE, HYBRID):
        nbb = _golomb_base_bits(k + table_entries, table_entries)
        pairs = _uncompress_pairs(table_words, table_entries, nbb, t["unary_dec"])
        np.bitwise_or.at(matrix, (pairs >> 6).astype(np.int64), U64(1) << (pairs & U64(63)).astype(U64))
        return matrix
    offset = determine_correct_offset(lg_k, c)
    phase = determine_pseudo_phase(lg_k, c)
    window = _uncompress_bytes(window_words, k, t["he_dec"][phase])
    matrix[:] = U64((1 << offset) - 1)
    matrix |= window.astype(U64) << U64(offset)
    if table_entries:
        nbb = _golomb_base_bits(k + table_entries, table_entries)
        pairs = _uncompress_pairs(table_words, table_entries, nbb, t["unary_dec"])
        if flavor == PINNED:
            assert (pairs & 63).max() < 56, "pinned pair column invalid"
            pairs = pairs + 8
        else:
            perm = t["perm_dec"][phase]
            row = pairs >> 6
            col = (perm[(pairs & 63).astype(np.int64)].astype(np.uint32) + offset + 8) & 63
            pairs = (row << 6) | col
        # surprising pairs FLIP the default bits (sketch.rs:442-450)
        np.bitwise_xor.at(matrix, (pairs >> 6).astype(np.int64), U64(1) << (pairs & U64(63)).astype(U64))
    return matrix


# -- wire format (cpc/sketch.rs:455-610, serialization.rs) ------------------

_FLAG_COMPRESSED, _FLAG_HAS_HIP, _FLAG_HAS_TABLE, _FLAG_HAS_WINDOW = 1, 2, 3, 4


def cpc_to_java_bytes(sk, seed_hash: int | None = None) -> bytes:
    """Serialize an engine CpcSketch (bit matrix) in the compressed
    DataSketches wire format. Unmerged sketches carry their sequential
    HIP accumulator (kxp, hip_est_accum) exactly like the reference
    (``cpc/sketch.rs:463-501``, preamble layout
    ``serialization.rs:24-48``); merged sketches write has_hip=false
    and readers use ICON (``cpc/sketch.rs:76-80``)."""
    from .hashing import DEFAULT_SEED, compute_seed_hash

    if seed_hash is None:
        seed_hash = compute_seed_hash(DEFAULT_SEED)
    flavor, window_words, table_words, table_entries, c, fic = compress_matrix(sk.lg_k, sk.matrix)
    has_table = len(table_words) > 0
    has_window = len(window_words) > 0
    has_hip = not getattr(sk, "merged", True)
    pre = 2
    if c > 0:
        pre += 1
        if has_hip:
            pre += 4
        if has_table:
            pre += 1 + (1 if has_window else 0)
        if has_window:
            pre += 1
    flags = (
        (1 << _FLAG_COMPRESSED)
        | (has_hip << _FLAG_HAS_HIP)
        | (has_table << _FLAG_HAS_TABLE)
        | (has_window << _FLAG_HAS_WINDOW)
    )
    hip_bytes = struct.pack("<dd", sk.kxp, sk.hip_est_accum) if has_hip else b""
    out = struct.pack("<BBBBBBH", pre, 1, 16, sk.lg_k, fic, flags, seed_hash)
    if c > 0:
        out += struct.pack("<I", c)
        if has_table and has_window:
            out += struct.pack("<I", table_entries)
            out += hip_bytes
        if has_table:
            out += struct.pack("<I", len(table_words))
        if has_window:
            out += struct.pack("<I", len(window_words))
        if not (has_table and has_window):
            out += hip_bytes
        out += window_words.astype("<u4").tobytes()
        out += table_words.astype("<u4").tobytes()
    return out


def cpc_peek_estimate(buf: bytes) -> float:
    """Estimate from a compressed CPC image WITHOUT decompressing the
    body — the reference's ``CpcWrapper`` pattern
    (``cpc/wrapper.rs:49-182``). ICON needs only (lg_k, num_coupons),
    both in the first 12 header bytes, so metrics readers can inspect
    checkpoints at O(header) cost."""
    from .cpc_estimator import icon_estimate

    if len(buf) < 8:
        raise ValueError(f"insufficient data: {len(buf)} < 8")
    _, ver, family, lg_k, _, flags, _ = struct.unpack_from("<BBBBBBH", buf, 0)
    if family != 16 or ver != 1:
        raise ValueError("not a CPC serVer-1 image")
    has_hip = bool(flags & (1 << _FLAG_HAS_HIP))
    has_table = bool(flags & (1 << _FLAG_HAS_TABLE))
    has_window = bool(flags & (1 << _FLAG_HAS_WINDOW))
    if not (has_table or has_window):
        return 0.0
    if has_hip:
        # in-order images carry (kxp, hip_est_accum) at bytes 16..32 in
        # every c>0 layout: one u32 always follows the coupon count
        # (table_entries when both table and window are present, else
        # the single table/window length) — serialization.rs:24-48; the
        # stored accumulator IS the estimate (cpc/wrapper.rs:49-62)
        (hip,) = struct.unpack_from("<d", buf, 24)
        return hip
    (c,) = struct.unpack_from("<I", buf, 8)
    return icon_estimate(lg_k, c)


def cpc_from_java_bytes(buf: bytes, expect_seed_hash: int | None = None):
    """Decode a compressed DataSketches CPC image into an engine
    CpcSketch (full bit matrix)."""
    from .cpc import CpcSketch

    if len(buf) < 8:
        raise ValueError(f"insufficient data: {len(buf)} < 8")
    pre, ver, family, lg_k, fic, flags, seed_hash = struct.unpack_from("<BBBBBBH", buf, 0)
    if family != 16:
        raise ValueError(f"family mismatch: expected 16, got {family}")
    if ver != 1:
        raise ValueError(f"unsupported CPC serial version {ver}")
    if not (flags & (1 << _FLAG_COMPRESSED)):
        raise ValueError("only compressed CPC images are supported")
    if expect_seed_hash is not None and seed_hash != expect_seed_hash:
        raise ValueError(f"incompatible seed hash: expected {expect_seed_hash}, got {seed_hash}")
    if fic > 63:
        raise ValueError(f"first_interesting_column out of range: {fic}")
    has_hip = bool(flags & (1 << _FLAG_HAS_HIP))
    has_table = bool(flags & (1 << _FLAG_HAS_TABLE))
    has_window = bool(flags & (1 << _FLAG_HAS_WINDOW))
    pos = 8
    c = 0
    table_entries = 0
    table_len = window_len = 0
    kxp, hip_accum = float(1 << lg_k), 0.0
    if has_table or has_window:
        (c,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if has_table and has_window:
            (table_entries,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if has_hip:
                kxp, hip_accum = struct.unpack_from("<dd", buf, pos)
                pos += 16
        if has_table:
            (table_len,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        if has_window:
            (window_len,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        if has_hip and not (has_table and has_window):
            kxp, hip_accum = struct.unpack_from("<dd", buf, pos)
            pos += 16
        window_words = np.frombuffer(buf, dtype="<u4", count=window_len, offset=pos)
        pos += 4 * window_len
        table_words = np.frombuffer(buf, dtype="<u4", count=table_len, offset=pos)
        pos += 4 * table_len
        if has_table and not has_window:
            table_entries = c
    else:
        window_words = np.empty(0, np.uint32)
        table_words = np.empty(0, np.uint32)
    matrix = uncompress_to_matrix(lg_k, c, window_words, table_words, table_entries)
    # merge_flag = !has_hip (cpc/sketch.rs:649): images written by an
    # in-order updater keep their HIP accumulator through the wire
    return CpcSketch(lg_k, matrix, kxp=kxp, hip_est_accum=hip_accum, merged=not has_hip)
