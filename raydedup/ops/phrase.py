"""Positional phrase search over whitespace token streams.

Finds every occurrence of an exact k-word phrase in each document's
lowercase token stream and reports per-doc match count + first match
position (1-based in words). Matching is over murmur3 word hashes
(the shared `tokenize_word_hashes` kernel, so the token derivation is
identical to every other word-level operator and to the SQL oracles);
a cross-word hash collision would need a 2^-64 event — documented,
not defended.

Scale design (100 TB lens):
- Pure map-side scan: no shuffle, no index materialization, streams
  block by block. The k-shift AND over the flat hash array is one
  vectorized pass (k tiny); doc boundaries are enforced by comparing
  the doc-id of a window's first and last token.
- The phrase is a constant broadcast in the closure (k hashes), not a
  joined side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def phrase_hashes(phrase: str, seed: int | None = None) -> np.ndarray:
    from raydedup.pipeline.extract import DEFAULT_SEED
    from raydedup.sketches.hashing import hash_strings

    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("phrase_match: empty phrase")
    h, _ = hash_strings(
        pa.chunked_array([pa.array(words)]),
        seed=DEFAULT_SEED if seed is None else seed,
    )
    return h


def phrase_match(docs, phrase: str, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset → (id_col, n_matches, first_pos) rows for docs with at
    least one occurrence; ``first_pos`` is 1-based word position."""
    ph = phrase_hashes(phrase)
    k = len(ph)

    def scan(batch: pa.Table) -> pa.Table:
        from raydedup.pipeline.extract import tokenize_word_hashes

        empty = pa.table(
            {
                id_col: pa.array([], batch[id_col].type),
                "n_matches": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64()),
            }
        )
        wh, offs = tokenize_word_hashes(batch[text_col])
        n_words = len(wh)
        if n_words < k:
            return empty
        n_win = n_words - k + 1
        match = wh[:n_win] == ph[0]
        for j in range(1, k):
            match &= wh[j : n_win + j] == ph[j]
        n_docs = len(offs) - 1
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        match &= doc_of[:n_win] == doc_of[k - 1 :]  # window inside one doc
        hit_idx = np.nonzero(match)[0]
        if len(hit_idx) == 0:
            return empty
        docs_hit = doc_of[hit_idx]
        pos = hit_idx - offs[docs_hit] + 1  # 1-based within doc
        uniq, first = np.unique(docs_hit, return_index=True)
        counts = np.bincount(docs_hit, minlength=n_docs)[uniq]
        ids = batch[id_col].take(pa.array(uniq))
        return pa.table(
            {
                id_col: ids,
                "n_matches": pa.array(counts.astype(np.int64)),
                # hit_idx ascending within each doc → first index is min pos
                "first_pos": pa.array(pos[first].astype(np.int64)),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")
