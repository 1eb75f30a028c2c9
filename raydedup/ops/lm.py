"""Bigram language-model quality scoring (the CCNet perplexity-filter
shape, arXiv:1911.00359).

A curation pipeline scores every document against a FIXED language
model and thresholds on the result. Here the model is a word-bigram
stupid-backoff LM (Brants et al. 2007): for each in-document word pair
(w1, w2),

    p = c(w1 w2) / c(w1)        if the bigram was seen in training
      = alpha * c(w2) / T       else, if w2 was seen
      = alpha * alpha / T       else (unknown-word penalty)

and the document score is mean(ln p) over its bigrams.

Scale design: the trained count tables are the model — vocabulary-
bounded, built once with map-side combined partials (each block
collapses to its distinct grams before the groupby, the `tfidf` /
`top_ngrams` exchange shape), then `ray.put` ONCE and probed map-side
by every scoring task with two sorted-array searchsorted lookups. The
scoring pass is zero-shuffle at any corpus size; only the training
reduction exchanges vocabulary-sized rows. Gram identity is a mixed
64-bit murmur hash (distinct-gram collision odds ~B^2/2^65; a
production LM carries a real vocabulary, this engine's tables are
hash-keyed like its dedup stages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.sketches.hashing import fmix64, hash_strings

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Collision-resistant 64-bit key for an (h_prev, h_cur) pair."""
    with np.errstate(over="ignore"):
        return fmix64(a * _P1 + b * _P2)


def _doc_words(batch: pa.Table, text_column: str):
    """Lowercased whitespace words of every doc in one flat Arrow array
    plus per-doc offsets (empty split tokens dropped) — the tokenizer
    shared with tfidf/top_ngrams."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.utf8_split_whitespace(pc.utf8_lower(text))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    n_docs = len(off) - 1
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not nonempty.all():
        doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(nonempty))
        counts = np.bincount(doc_of_word[nonempty], minlength=n_docs)
        off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
    return flat, off


def _pair_indices(off: np.ndarray, n_words: int) -> np.ndarray:
    """Flat indices i such that word i and i+1 belong to the same doc."""
    if n_words < 2:
        return np.empty(0, dtype=np.int64)
    last = np.zeros(n_words, dtype=bool)
    last[off[1:] - 1] = True
    return np.nonzero(~last[: n_words - 1])[0]


def _count_partial(batch: pa.Table, text_column: str) -> pa.Table:
    """Map-side combined (gram-hash, count, is_bigram) partials for one
    block: distinct unigram and bigram hashes with their in-block
    counts — the exchange carries vocabulary-sized rows."""
    flat, off = _doc_words(batch, text_column)
    empty = pa.table(
        {
            "h": pa.array([], pa.int64()),
            "count": pa.array([], pa.int64()),
            "is_bigram": pa.array([], pa.int8()),
        }
    )
    if len(flat) == 0:
        return empty
    h, _ = hash_strings(flat)
    lead = _pair_indices(off, len(h))
    # hash keys travel as int64 bit-views: Ray's groupby key path
    # round-trips values through Python ints and overflows on uint64
    uh, uc = np.unique(h.view(np.int64), return_counts=True)
    parts = [(uh, uc, 0)]
    if len(lead):
        bh, bc = np.unique(
            _mix_pair(h[lead], h[lead + 1]).view(np.int64), return_counts=True
        )
        parts.append((bh, bc, 1))
    return pa.table(
        {
            "h": pa.array(np.concatenate([p[0] for p in parts]), pa.int64()),
            "count": pa.array(np.concatenate([p[1] for p in parts]).astype(np.int64)),
            "is_bigram": pa.array(
                np.concatenate([np.full(len(p[0]), p[2], dtype=np.int8) for p in parts])
            ),
        }
    )


def train_bigram_lm(ds, text_column: str = "text"):
    """Reduce a corpus to stupid-backoff count tables.

    Returns (uni_h, uni_c, bi_h, bi_c, total_words): sorted int64
    hash-bit-view arrays with aligned int64 counts, ready for
    searchsorted probes.
    Driver state is vocabulary-bounded (the model), not corpus-bounded.
    """
    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(lambda b: _count_partial(b, text_column), batch_format="pyarrow")
        .groupby(["is_bigram", "h"])
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    if len(counts) == 0:  # zero trained words: the groupby loses the schema
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy(), 0
    uni = counts[counts.is_bigram == 0]
    bi = counts[counts.is_bigram == 1]
    uni_h = uni["h"].to_numpy().astype(np.int64)
    uni_c = uni["count"].to_numpy().astype(np.int64)
    bi_h = bi["h"].to_numpy().astype(np.int64)
    bi_c = bi["count"].to_numpy().astype(np.int64)
    o = np.argsort(uni_h)
    uni_h, uni_c = uni_h[o], uni_c[o]
    o = np.argsort(bi_h)
    bi_h, bi_c = bi_h[o], bi_c[o]
    return uni_h, uni_c, bi_h, bi_c, int(uni_c.sum())


def _lookup(sorted_h: np.ndarray, counts: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """count per key (0 when absent) via one searchsorted probe."""
    if len(sorted_h) == 0 or len(keys) == 0:
        return np.zeros(len(keys), dtype=np.int64)
    idx = np.searchsorted(sorted_h, keys)
    idx = np.minimum(idx, len(sorted_h) - 1)
    hit = sorted_h[idx] == keys
    return np.where(hit, counts[idx], 0)


def score_batch(
    batch: pa.Table,
    model,
    id_column: str,
    text_column: str = "text",
    alpha: float = 0.4,
) -> pa.Table:
    """Score one block of docs against broadcast count tables.

    Output: (id, n_words, n_bigrams, lm_score) with
    lm_score = round(mean ln p, 6), 0.0 for docs with < 2 words.
    Per-doc sums run in document order (bincount), so the result is a
    pure function of the model and the row — retry-deterministic.
    """
    uni_h, uni_c, bi_h, bi_c, total = model
    ids = batch[id_column]
    flat, off = _doc_words(batch, text_column)
    n_docs = len(batch)
    words_per_doc = np.diff(off)
    if len(flat):
        h, _ = hash_strings(flat)
    else:
        h = np.empty(0, dtype=np.uint64)
    lead = _pair_indices(off, len(h))
    n_pairs_per_doc = np.maximum(words_per_doc - 1, 0)
    score = np.zeros(n_docs, dtype=np.float64)
    if len(lead):
        prev_h, cur_h = h[lead], h[lead + 1]
        cb = _lookup(bi_h, bi_c, _mix_pair(prev_h, cur_h).view(np.int64)).astype(np.float64)
        cp = _lookup(uni_h, uni_c, prev_h.view(np.int64)).astype(np.float64)
        cc = _lookup(uni_h, uni_c, cur_h.view(np.int64)).astype(np.float64)
        # empty model (zero trained words): every pair takes the
        # unknown-word branch with T treated as 1 -> finite alpha^2
        t = float(total) if total > 0 else 1.0
        p = np.where(
            cb > 0,
            np.divide(cb, cp, out=np.ones_like(cb), where=cp > 0),
            np.where(cc > 0, alpha * cc / t, alpha * alpha / t),
        )
        lp = np.log(p)
        doc_of_pair = np.searchsorted(off[1:], lead, side="right")
        sums = np.bincount(doc_of_pair, weights=lp, minlength=n_docs)
        score = np.divide(
            sums,
            n_pairs_per_doc.astype(np.float64),
            out=np.zeros(n_docs, dtype=np.float64),
            where=n_pairs_per_doc > 0,
        )
    return pa.table(
        {
            id_column: ids,
            "n_words": pa.array(words_per_doc.astype(np.int64)),
            "n_bigrams": pa.array(n_pairs_per_doc.astype(np.int64)),
            "lm_score": pa.array(np.round(score, 6)),
        }
    )


def lm_score(
    ds,
    train_ds,
    id_column: str,
    text_column: str = "text",
    alpha: float = 0.4,
):
    """Score every doc of ``ds`` against a bigram LM trained on
    ``train_ds``: train (vocabulary-sized groupby reduce) → `ray.put`
    the tables once → zero-shuffle map-side scoring."""
    import ray

    model = train_bigram_lm(train_ds, text_column)
    ref = ray.put(model)

    def f(batch: pa.Table, r) -> pa.Table:
        return score_batch(batch, ray.get(r), id_column, text_column, alpha)

    return ds.select_columns([id_column, text_column]).map_batches(
        f, fn_args=(ref,), batch_format="pyarrow"
    )
