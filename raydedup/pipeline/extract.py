"""HTML→text extraction, normalization, and 5-gram shingling.

All kernels are batch-vectorized (Arrow compute + NumPy) — no Python
loop touches a row in the hot path. The shingle representation follows
the reference's pay-the-hash-once pattern (``hll/mod.rs:169-174``:
compute the expensive hash once, fan it out): each word is murmur3
-hashed once, and a shingle's identity is the murmur3-128 h1 of its
k consecutive 64-bit word hashes (a fixed-width 8k-byte record), so
shingle hashing never re-touches string bytes.

The extraction invariant (BASELINE.json input_hint): ``extract_text``
is a pure function of the ``html`` bytes and must equal the ``text``
column byte-for-byte on the synthetic corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.sketches.hashing import (
    DEFAULT_SEED,
    _string_array_bytes,
    hash_strings,
    murmur3_128_fixed,
)

U64 = np.uint64

_BODY_OPEN = b"<body>"
_BODY_CLOSE = b"</body>"


def extract_text(html: pa.Array) -> pa.Array:
    """Extract the text payload between <body> and </body>, vectorized.

    Pure function of the bytes (no parser state, no library versions),
    so re-runs and retries are byte-identical per url. Rows without a
    body section yield the full payload unchanged.
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    data, offsets = _string_array_bytes(html)
    n = len(offsets) - 1
    starts = offsets[:-1].copy()
    ends = offsets[1:].copy()
    # vectorized find via Arrow kernels
    pos_open = pc.find_substring(html, _BODY_OPEN).to_numpy(zero_copy_only=False)
    pos_close = pc.find_substring(html, _BODY_CLOSE).to_numpy(zero_copy_only=False)
    has = (pos_open >= 0) & (pos_close >= 0)
    starts = np.where(has, starts + pos_open + len(_BODY_OPEN), starts)
    ends = np.where(has, offsets[:-1] + pos_close, ends)
    lengths = np.maximum(ends - starts, 0)
    # gather the substring bytes into a fresh contiguous buffer
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=new_offsets[1:])
    flat_idx = np.repeat(starts, lengths) + (
        np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(new_offsets[:-1], lengths)
    )
    new_data = data[flat_idx]
    return pa.Array.from_buffers(
        pa.large_utf8(),
        n,
        [None, pa.py_buffer(new_offsets.tobytes()), pa.py_buffer(new_data.tobytes())],
    ).cast(pa.string())


def tokenize_word_hashes(text: pa.Array, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Normalize (lowercase), split on whitespace, murmur3 each word.

    Returns ``(word_h1 flat uint64, doc_offsets int64 (n+1,))``.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    words = pc.utf8_split_whitespace(lower)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    doc_offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_offsets = doc_offsets - doc_offsets[0]
    if len(flat) == 0:
        return np.empty(0, dtype=U64), doc_offsets
    # Arrow's split emits empty tokens at boundaries ("a " → ["a", ""]);
    # drop them and rebuild per-doc offsets from kept-token counts.
    n_docs = len(doc_offsets) - 1
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not nonempty.all():
        doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(doc_offsets))
        flat = flat.filter(pa.array(nonempty))
        counts = np.bincount(doc_of_word[nonempty], minlength=n_docs)
        doc_offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=doc_offsets[1:])
        if len(flat) == 0:
            return np.empty(0, dtype=U64), doc_offsets
    # pay-the-hash-once at the vocabulary level: words repeat heavily
    # (natural-language vocab ≪ token count), so murmur3 runs once per
    # *unique* word and fans out by dictionary index — 10-20x cheaper
    # than hashing every token, bit-identical results.
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    h_uniq, _ = hash_strings(enc.dictionary, seed=seed)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return h_uniq[idx], doc_offsets


def shingle_hashes(
    word_h1: np.ndarray, doc_offsets: np.ndarray, k: int = 5, seed: int = DEFAULT_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle hashes from per-word hashes, fully vectorized.

    A shingle is k consecutive words; its hash is murmur3-128 h1 over
    the k word-hashes as a fixed 8k-byte record. Documents shorter than
    k words produce one shingle over all their words (zero-padded
    record, length encoded via nbytes) so short docs still dedup.
    Returns ``(flat shingle hashes uint64, shingle_offsets (n+1,))``.
    """
    n_docs = len(doc_offsets) - 1
    w = np.diff(doc_offsets)
    n_sh = np.where(w >= k, w - k + 1, np.where(w > 0, 1, 0)).astype(np.int64)
    sh_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=sh_offsets[1:])
    total = int(sh_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=U64), sh_offsets

    # window start index (into flat word array) of every shingle
    doc_of_sh = np.repeat(np.arange(n_docs), n_sh)
    local = np.arange(total, dtype=np.int64) - np.repeat(sh_offsets[:-1], n_sh)
    win_start = doc_offsets[:-1][doc_of_sh] + local

    w_of_sh = w[doc_of_sh]
    full = w_of_sh >= k
    ncols = ((k * 8 + 15) // 16) * 2
    out = np.empty(total, dtype=U64)

    # Full windows: slab the window build + hash so the working set
    # stays cache-resident per core (the node-level contended resource
    # is memory bandwidth, not ALU).
    all_full = full.all()
    full_pos = None if all_full else np.nonzero(full)[0]
    ws_full = win_start if all_full else win_start[full_pos]
    nf = len(ws_full)
    S = 1 << 14
    words_mat = np.zeros((min(S, max(nf, 1)), ncols), dtype=U64)
    for s0 in range(0, nf, S):
        s1 = min(s0 + S, nf)
        m = words_mat[: s1 - s0]
        ws = ws_full[s0:s1]
        for j in range(k):
            m[:, j] = word_h1[ws + j]
        h1, _ = murmur3_128_fixed(m, 8 * k, seed=seed)
        if all_full:
            out[s0:s1] = h1
        else:
            out[full_pos[s0:s1]] = h1

    if not all_full:  # short docs (<k words), grouped by word count
        short_idx = np.nonzero(~full)[0]
        for wlen in np.unique(w_of_sh[short_idx]):
            sel = short_idx[w_of_sh[short_idx] == wlen]
            sm = np.zeros((len(sel), ncols), dtype=U64)
            for j in range(int(wlen)):
                sm[:, j] = word_h1[win_start[sel] + j]
            h1, _ = murmur3_128_fixed(sm, 8 * int(wlen), seed=seed)
            out[sel] = h1
    return out, sh_offsets


def segmented_unique(values: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted-unique of a ragged uint64 array, vectorized.

    Returns (flat unique values sorted within each segment, new offsets).
    Used to turn per-doc shingle multisets into sets for exact Jaccard.
    """
    n = len(offsets) - 1
    if len(values) == 0:
        return values, offsets.copy()
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((values, seg))
    sv = values[order]
    ss = seg[order]
    keep = np.ones(len(sv), dtype=bool)
    keep[1:] = (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])
    out_vals = sv[keep]
    out_seg = ss[keep]
    counts = np.bincount(out_seg, minlength=n)
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_offsets[1:])
    return out_vals, new_offsets


def text_to_shingle_sets(
    text: pa.Array, k: int = 5, seed: int = DEFAULT_SEED
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """text column → (flat multiset shingle hashes, offsets, n_words).

    Composition of the three kernels above; the unit the MinHash and
    theta stages both consume (hash paid once — SURVEY.md §4.1).
    """
    word_h1, doc_offsets = tokenize_word_hashes(text, seed=seed)
    sh, sh_offsets = shingle_hashes(word_h1, doc_offsets, k=k, seed=seed)
    return sh, sh_offsets, np.diff(doc_offsets)
