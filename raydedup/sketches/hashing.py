"""Vectorized hashing kernels for the sketch core.

Bit-exact NumPy reimplementations of the hash functions the reference
engine (`/root/reference`, Apache DataSketches Rust) pins its sketch
semantics to:

- MurmurHash3 x64 128 (reference ``datasketches/src/hash/murmurhash.rs``,
  public-domain algorithm by Austin Appleby) with the DataSketches
  default seed 9001 (``hash/mod.rs:61``). Known-answer vectors from
  ``hash/murmurhash.rs:189-231`` are asserted in
  ``tests/test_hashing.py``.
- XxHash64 (reference ``datasketches/src/hash/xxhash.rs``), used by the
  Bloom filter's Kirsch-Mitzenmacher double hashing
  (``bloom/sketch.rs:495-543``).
- ``compute_seed_hash`` (``hash/mod.rs:72-81``): 16-bit seed fingerprint
  carried in serialized sketch headers.
- Float canonicalization (``hash_value/canonical_float.rs``,
  ``hash_value/mod.rs:24-36``): +-0.0 -> +0.0, every NaN -> one
  canonical NaN, f32 widened to f64, so equal values hash equally.

All kernels operate on whole columns (NumPy arrays / Arrow arrays) at
once; the per-string path packs a batch of variable-length byte strings
into one zero-padded ``(n, blocks)`` uint64 matrix and runs the block
mixer column-by-column, so cost is O(max_len/16) vectorized passes per
batch rather than a Python loop per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

DEFAULT_SEED = 9001  # DataSketches default update seed (hash/mod.rs:61)

_C1 = U64(0x87C37B91114253D5)
_C2 = U64(0x4CF5AD432745937F)
_M5 = U64(5)
_A1 = U64(0x52DCE729)
_A2 = U64(0x38495AB5)
_F1 = U64(0xFF51AFD7ED558CCD)
_F2 = U64(0xC4CEB9FE1A85EC53)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = U64(r)
    return (x << r) | (x >> (U64(64) - r))


def fmix64(k: np.ndarray) -> np.ndarray:
    """Murmur3 64-bit finalizer; also used as a cheap mixing permutation."""
    k = np.asarray(k, dtype=U64).copy()
    k ^= k >> U64(33)
    k *= _F1
    k ^= k >> U64(33)
    k *= _F2
    k ^= k >> U64(33)
    return k


def _pack_strings(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack ragged byte strings into a zero-padded (n, 2*ceil(max/16)) u64 matrix.

    ``data`` is the concatenated value bytes (uint8), ``offsets`` the
    (n+1,) int64 row boundaries into it. Returns (padded_u64, lengths).
    """
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    max_len = int(lengths.max()) if n else 0
    # round up to a multiple of 16 bytes (one murmur block), min one block
    pad = max(16, ((max_len + 15) // 16) * 16)
    out = np.zeros((n, pad), dtype=np.uint8)
    if len(data):
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
        col_idx = np.arange(len(data), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        out[row_idx, col_idx] = data
    return out.view("<u8"), lengths.astype(np.int64)


def murmur3_128_strings(
    data: np.ndarray, offsets: np.ndarray, seed: int = DEFAULT_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """MurmurHash3 x64 128 of ``n`` variable-length byte strings at once.

    Parameters are the flattened Arrow-style representation: ``data`` the
    concatenated bytes (uint8), ``offsets`` (n+1,) row boundaries.
    Returns ``(h1, h2)`` uint64 arrays of shape (n,). Bit-exact vs the
    reference (``hash/murmurhash.rs:28-177``): strings are hashed as raw
    bytes with no length prefix (the ``raw_bytes`` policy,
    ``hash_value/mod.rs:59-73``).
    """
    words, lengths = _pack_strings(data, offsets)
    n = len(lengths)
    h1 = np.full(n, U64(seed))
    h2 = np.full(n, U64(seed))
    nblocks = lengths // 16  # full 16-byte blocks per row
    tail = lengths % 16

    max_blocks = int(nblocks.max()) if n else 0
    for j in range(max_blocks):
        live = nblocks > j
        if not live.any():
            break
        k1 = words[:, 2 * j].copy()
        k2 = words[:, 2 * j + 1].copy()
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        nh1 = h1 ^ k1
        nh1 = _rotl(nh1, 27)
        nh1 += h2
        nh1 = nh1 * _M5 + _A1
        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        nh2 = h2 ^ k2
        nh2 = _rotl(nh2, 31)
        nh2 += nh1
        nh2 = nh2 * _M5 + _A2
        h1 = np.where(live, nh1, h1)
        h2 = np.where(live, nh2, h2)

    # Tail: rows are zero-padded, so the tail words already hold exactly
    # the remaining bytes little-endian with zero fill.
    if n:
        rows = np.arange(n)
        word_base = 2 * nblocks
        # guard index overflow for rows whose length is an exact multiple of 16
        safe_base = np.minimum(word_base, words.shape[1] - 2)
        tk1 = words[rows, safe_base]
        tk2 = words[rows, safe_base + 1]

        has_k2 = tail > 8
        k2 = np.where(has_k2, tk2, U64(0))
        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        h2 = np.where(has_k2, h2 ^ k2, h2)

        has_k1 = tail > 0
        k1 = np.where(has_k1, tk1, U64(0))
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 = np.where(has_k1, h1 ^ k1, h1)

    ulen = lengths.astype(U64)
    h1 ^= ulen
    h2 ^= ulen
    h1 += h2
    h2 += h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 += h2
    h2 += h1
    return h1, h2


def murmur3_128_fixed(words: np.ndarray, nbytes: int, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """MurmurHash3 x64 128 over fixed-width records.

    ``words`` is an (n, w) uint64 matrix holding each record's bytes
    little-endian; ``nbytes`` is the true record length (w*8 >= nbytes,
    excess must be zero). Fully vectorized with preallocated in-place
    temporaries — used for hashing shingles represented as concatenated
    word-hash tuples (fixed 8*k bytes) and for LSH band records.
    """
    n = words.shape[0]
    h1 = np.full(n, U64(seed))
    h2 = np.full(n, U64(seed))
    k = np.empty(n, U64)
    t = np.empty(n, U64)

    def rotl_ip(x, r):
        np.right_shift(x, U64(64 - r), out=t)
        np.left_shift(x, U64(r), out=x)
        x |= t

    def mix_k(col, c_in, c_out, rot, h):
        np.multiply(words[:, col], c_in, out=k)
        rotl_ip(k, rot)
        np.multiply(k, c_out, out=k)
        h ^= k

    nblocks = nbytes // 16
    for j in range(nblocks):
        mix_k(2 * j, _C1, _C2, 31, h1)
        rotl_ip(h1, 27)
        h1 += h2
        h1 *= _M5
        h1 += _A1
        mix_k(2 * j + 1, _C2, _C1, 33, h2)
        rotl_ip(h2, 31)
        h2 += h1
        h2 *= _M5
        h2 += _A2
    tail = nbytes % 16
    if tail > 8:
        mix_k(2 * nblocks + 1, _C2, _C1, 33, h2)
    if tail > 0:
        mix_k(2 * nblocks, _C1, _C2, 31, h1)
    h1 ^= U64(nbytes)
    h2 ^= U64(nbytes)
    h1 += h2
    h2 += h1

    def fmix_ip(x):
        np.right_shift(x, U64(33), out=t)
        x ^= t
        x *= _F1
        np.right_shift(x, U64(33), out=t)
        x ^= t
        x *= _F2
        np.right_shift(x, U64(33), out=t)
        x ^= t

    fmix_ip(h1)
    fmix_ip(h2)
    h1 += h2
    h2 += h1
    return h1, h2


def _string_array_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Extract (data_uint8, offsets_int64) from an Arrow string/binary array.

    Handles string, large_string, binary, large_binary, and chunked
    arrays (by combining), with offset-sliced arrays normalized.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(t):
        arr = arr.cast(pa.large_binary())
    if arr.offset != 0 or arr.null_count:
        arr = pa.concat_arrays([arr.fill_null(b"")])
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    # slice data to this array's window
    data = data[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    return data, offsets.astype(np.int64)


def hash_strings(column, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Murmur3-128 of an Arrow string/binary column (or list of bytes/str).

    Returns (h1, h2) uint64 arrays. Raw-bytes policy (no length prefix).
    """
    if isinstance(column, (pa.Array, pa.ChunkedArray)):
        data, offsets = _string_array_bytes(column)
    else:
        vals = [v.encode() if isinstance(v, str) else bytes(v) for v in column]
        lengths = np.array([len(v) for v in vals], dtype=np.int64)
        offsets = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        data = np.frombuffer(b"".join(vals), dtype=np.uint8) if vals else np.empty(0, np.uint8)
    return murmur3_128_strings(data, offsets, seed=seed)


def hash_u64_column(values: np.ndarray, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Murmur3-128 of each uint64/int64 value as its 8 little-endian bytes.

    Matches the reference's integer hashing (``sign_extend`` widening to
    64-bit then hashing the 8-byte LE image, ``hash_value/mod.rs:37-57``).
    """
    v = np.ascontiguousarray(values).astype(np.int64, copy=False).view(U64)
    words = np.zeros((len(v), 2), dtype=U64)
    words[:, 0] = v
    return murmur3_128_fixed(words, 8, seed=seed)


def canonicalize_floats(values: np.ndarray) -> np.ndarray:
    """Reference float canonicalization (``hash_value/mod.rs:24-36``).

    f32 input is widened to f64; -0.0 maps to +0.0; every NaN maps to the
    canonical quiet NaN. Returns the canonical f64 bit pattern as uint64,
    ready for ``hash_u64_column``-style byte hashing.
    """
    v = np.asarray(values, dtype=np.float64).copy()
    v[v == 0.0] = 0.0  # collapses -0.0 to +0.0
    bits = v.view(U64)
    bits[np.isnan(v)] = U64(0x7FF8000000000000)
    return bits


def compute_seed_hash(seed: int) -> int:
    """16-bit seed fingerprint stored in serialized sketches (hash/mod.rs:72-81).

    Defined as the low 16 bits of murmur3_128(seed_as_8_le_bytes, seed=0);
    a result of 0 is disallowed in the reference (it errors) — we follow.
    """
    h1, _ = hash_u64_column(np.array([seed], dtype=np.uint64).view(np.int64), seed=0)
    sh = int(h1[0]) & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to reserved seed-hash 0")
    return sh


# ---------------------------------------------------------------------------
# XxHash64 (for Bloom; reference hash/xxhash.rs)
# ---------------------------------------------------------------------------

_XXP1 = U64(0x9E3779B185EBCA87)
_XXP2 = U64(0xC2B2AE3D27D4EB4F)
_XXP3 = U64(0x165667B19E3779F9)
_XXP4 = U64(0x85EBCA77C2B2AE63)
_XXP5 = U64(0x27D4EB2F165667C5)


def xxhash64_strings(data: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """XxHash64 of ``n`` variable-length byte strings at once, bit-exact
    vs the reference streaming implementation (``hash/xxhash.rs``):
    32-byte stripes into four lane accumulators, merge, then 8-/4-/1-
    byte remainder rounds and the avalanche. Vectorized with per-row
    masks over a zero-padded matrix (padding never contributes because
    every load is masked by the true length).
    """
    n = len(offsets) - 1
    lengths = np.diff(offsets).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    pad = max(32, ((max_len + 31) // 32) * 32)
    mat = np.zeros((n, pad), dtype=np.uint8)
    if len(data):
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
        col_idx = np.arange(len(data), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        mat[row_idx, col_idx] = data
    words = mat.view("<u8")  # (n, pad//8)

    sd = U64(seed)
    big = lengths >= 32
    v1 = np.full(n, sd) + _XXP1 + _XXP2  # array ops wrap silently
    v2 = np.full(n, sd) + _XXP2
    v3 = np.full(n, sd)
    v4 = np.full(n, sd) - _XXP1
    nstripes = np.where(big, lengths // 32, 0)

    def xround(acc, lane):
        acc = acc + lane * _XXP2
        acc = _rotl(acc, 31)
        return acc * _XXP1

    for j in range(int(nstripes.max()) if n else 0):
        live = nstripes > j
        nv1 = xround(v1, words[:, 4 * j])
        nv2 = xround(v2, words[:, 4 * j + 1])
        nv3 = xround(v3, words[:, 4 * j + 2])
        nv4 = xround(v4, words[:, 4 * j + 3])
        v1 = np.where(live, nv1, v1)
        v2 = np.where(live, nv2, v2)
        v3 = np.where(live, nv3, v3)
        v4 = np.where(live, nv4, v4)

    def merge_round(acc, v):
        v = v * _XXP2
        v = _rotl(v, 31)
        v *= _XXP1
        acc = acc ^ v
        return acc * _XXP1 + _XXP4

    acc = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
    acc = merge_round(acc, v1)
    acc = merge_round(acc, v2)
    acc = merge_round(acc, v3)
    acc = merge_round(acc, v4)
    h = np.where(big, acc, sd + _XXP5) + lengths.astype(U64)

    base_word = nstripes * 4  # u64 index where the remainder starts
    rem = lengths - nstripes * 32
    rows = np.arange(n)
    # up to three 8-byte rounds
    for c in range(3):
        has = rem >= (c + 1) * 8
        idx = np.minimum(base_word + c, pad // 8 - 1)
        k1 = words[rows, idx] * _XXP2
        k1 = _rotl(k1, 31)
        k1 *= _XXP1
        nh = h ^ k1
        nh = _rotl(nh, 27) * _XXP1 + _XXP4
        h = np.where(has, nh, h)
    n8 = rem // 8
    rem4 = rem - n8 * 8
    # one 4-byte round (the 4 bytes are the low half of an aligned word)
    has4 = rem4 >= 4
    idx = np.minimum(base_word + n8, pad // 8 - 1)
    k1 = (words[rows, idx] & U64(0xFFFFFFFF)) * _XXP1
    nh = h ^ k1
    nh = _rotl(nh, 23) * _XXP2 + _XXP3
    h = np.where(has4, nh, h)
    # up to three single-byte rounds
    nbytes_done = n8 * 8 + np.where(has4, 4, 0)
    for b in range(3):
        has = rem > nbytes_done + b
        byte_off = nbytes_done + b
        widx = np.minimum(base_word + byte_off // 8, pad // 8 - 1)
        shift = ((byte_off % 8) * 8).astype(U64)
        byte = (words[rows, widx] >> shift) & U64(0xFF)
        nh = h ^ (byte * _XXP5)
        nh = _rotl(nh, 11) * _XXP1
        h = np.where(has, nh, h)

    h ^= h >> U64(33)
    h *= _XXP2
    h ^= h >> U64(29)
    h *= _XXP3
    h ^= h >> U64(32)
    return h


def xxhash64_bytes(items, seed: int = 0) -> np.ndarray:
    """Convenience: XxHash64 of a list of bytes/str or an Arrow column."""
    if isinstance(items, (pa.Array, pa.ChunkedArray)):
        data, offsets = _string_array_bytes(items)
    else:
        vals = [v.encode() if isinstance(v, str) else bytes(v) for v in items]
        lengths = np.array([len(v) for v in vals], dtype=np.int64)
        offsets = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        data = np.frombuffer(b"".join(vals), dtype=np.uint8) if vals else np.empty(0, np.uint8)
    return xxhash64_strings(data, offsets, seed=seed)


def xxhash64_u64(values: np.ndarray, seed) -> np.ndarray:
    """XxHash64 of each uint64 value's 8 LE bytes, vectorized.

    ``seed`` may be a scalar or a per-row uint64 array (the Bloom filter
    re-seeds the second hash with the first: ``bloom/sketch.rs:495-543``).
    Matches the xxHash reference algorithm for len==8 inputs.
    """
    v = np.ascontiguousarray(values, dtype=U64)
    seed = np.asarray(seed, dtype=U64)
    h = seed + _XXP5 + U64(8)
    k1 = v * _XXP2
    k1 = _rotl(k1, 31)
    k1 *= _XXP1
    h ^= k1
    h = _rotl(h, 27) * _XXP1 + _XXP4
    h ^= h >> U64(33)
    h *= _XXP2
    h ^= h >> U64(29)
    h *= _XXP3
    h ^= h >> U64(32)
    return h
