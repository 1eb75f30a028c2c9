"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints. All vectorized Arrow/NumPy inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.sketches.hashing import hash_strings

_PUNCT = ".,;:!?\"'()[]{}"

# tiny deterministic stopword sets per language for n-gram-free lang id
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


def token_stats(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """(id, n_chars, n_tokens) — whitespace tokens, unicode chars."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text)
    words = pc.utf8_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    n_docs = len(offs) - 1
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    counts = np.bincount(doc_of_word[nonempty], minlength=n_docs)
    return pa.table(
        {
            id_column: batch[id_column],
            "n_chars": n_chars.cast(pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
        }
    )


def quality_scores(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """Heuristic quality features per doc:
    (id, punct_ratio, digit_ratio, mean_word_len)."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    out = {
        id_column: batch[id_column],
    }
    total = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    total = np.maximum(total, 1.0)

    def count_matching(chars: str) -> np.ndarray:
        c = np.zeros(n)
        for ch in chars:
            c += pc.count_substring(text, ch).to_numpy(zero_copy_only=False)
        return c

    punct = count_matching(_PUNCT)
    digits = count_matching("0123456789")
    ws = pc.count_substring(text, " ").to_numpy(zero_copy_only=False)
    n_tokens = np.maximum(ws + 1.0, 1.0)
    out["punct_ratio"] = pa.array(punct / total, pa.float64())
    out["digit_ratio"] = pa.array(digits / total, pa.float64())
    out["mean_word_len"] = pa.array((total - ws) / n_tokens, pa.float64())
    return pa.table(out)


class LangIdStage:
    """Stopword-marker language ID (actor pool; markers compiled once).

    Picks the language whose marker-set hit count over the doc's tokens
    is highest; ties and zero-marker docs fall back to 'unknown'.
    """

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.utf8_split_whitespace(pc.utf8_lower(text))
        preds = []
        for wl in words.to_pylist():
            ws = set(wl)
            best, best_n = "unknown", 0
            for lang, markers in self.markers.items():
                hits = len(ws & markers)
                if hits > best_n:
                    best, best_n = lang, hits
            preds.append(best)
        out = pa.table(
            {c: batch[c] for c in batch.column_names if c != "text"}
            | {"lang_pred": pa.array(preds, pa.string())}
        )
        return out


def fingerprint(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """128-bit content fingerprint (murmur3 h1/h2 hex) per document."""
    h1, h2 = hash_strings(batch[text_column])
    fp = [f"{int(a):016x}{int(b):016x}" for a, b in zip(h1, h2)]
    return pa.table({id_column: batch[id_column], "fingerprint": pa.array(fp, pa.string())})
