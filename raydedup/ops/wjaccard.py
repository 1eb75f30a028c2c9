"""Weighted Jaccard: exact pairwise computation over tf-weighted
token multisets.

Unweighted Jaccard treats "the the the cat" and "the cat cat cat" as
identical token SETS; the weighted form

    J_w(A, B) = sum_t min(a_t, b_t) / sum_t max(a_t, b_t)

(over term frequencies a_t, b_t) is the similarity a tf-weighted
near-dup / plagiarism check actually wants. This module computes it
EXACTLY for a given candidate pair list (pairs come from any blocking
stage — LSH, SNM, PPJoin); the sketch-based estimator for corpus-scale
candidate generation is ``sketches/icws.py`` (ICWS weighted MinHash).

Plan (100 TB lens):
1. **tf map** (map-only): (doc, token_hash u64, tf) rows — the
   whitespace tokenizer shared with ``ops/text_stats``, counts folded
   in-block, token identity by murmur h1 (content never shuffles).
2. **pair fan-out**: the candidate pair list is report-shaped (it is a
   verify input, not a corpus); it broadcasts once (``ray.put``-style
   closure capture) as doc -> [(pair, side)]. Each tf row emits one
   row per pair membership.
3. **ONE bucketed exchange** on hash(pair): the per-bucket kernel
   lexsorts (pair, token, side), folds the <=2 rows of each
   (pair, token) into (min, max) contributions, and bincount-reduces
   per pair — emitting (doc_a, doc_b, w_jaccard) directly.

A doc in P pairs ships its tokens P times; candidate lists from a
sane blocking stage keep P small (the LSH pipeline's per-doc candidate
cap applies upstream). ``max_pairs`` guards the broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.hashing import fmix64, hash_strings

U64 = np.uint64


def token_tf_rows(batch: pa.Table, id_col: str, text_col: str = "text") -> pa.Table:
    """(id, tok u64-as-i64, tf) — per-doc term frequencies of
    whitespace tokens, token identity = murmur3 h1 of the token."""
    import pyarrow.compute as pc

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.utf8_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    n_docs = len(offs) - 1
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    th, _ = hash_strings(flat)
    doc_of_word, th = doc_of_word[nonempty], th[nonempty]
    # fold duplicate (doc, token) to tf counts in-block
    order = np.lexsort((th, doc_of_word))
    d, t = doc_of_word[order], th[order]
    new = np.ones(len(d), bool)
    new[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
    run_id = np.cumsum(new) - 1
    tf = np.bincount(run_id).astype(np.int64)
    firsts = np.flatnonzero(new)
    return pa.table(
        {
            id_col: pa.array(ids[d[firsts]]),
            "tok": pa.array(t[firsts].view(np.int64)),
            "tf": pa.array(tf),
        }
    )


def weighted_jaccard_pairs(
    docs,
    pairs: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    max_pairs: int = 2_000_000,
):
    """docs (id, text) x pairs (doc_a, doc_b) -> Dataset
    (doc_a, doc_b, w_jaccard). A pair with tokens on only one side
    yields 0.0; a pair whose BOTH texts are empty emits no row (it has
    no token evidence at all)."""
    if pairs.num_rows > max_pairs:
        raise ValueError(
            f"weighted_jaccard_pairs: {pairs.num_rows} candidate pairs exceed "
            f"max_pairs={max_pairs}; verify lists must be blocking-bounded"
        )
    a = pairs["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    # membership table sorted by doc for vectorized range lookup:
    # (mdoc, mpair, mside) — one row per (pair, side)
    mdoc = np.concatenate([a, b])
    mpair = np.tile(np.arange(len(a), dtype=np.int64), 2)
    mside = np.repeat(np.array([0, 1], np.int8), len(a))
    morder = np.argsort(mdoc, kind="stable")
    mdoc, mpair, mside = mdoc[morder], mpair[morder], mside[morder]

    _empty = pa.table(
        {
            "_b": pa.array([], pa.int64()),
            "pair": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "tok": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )

    def fan_out(batch: pa.Table) -> pa.Table:
        tf_tbl = token_tf_rows(batch, id_col, text_col)
        ids = tf_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = tf_tbl["tok"].to_numpy(zero_copy_only=False)
        tf = tf_tbl["tf"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(mdoc, ids, side="left")
        hi = np.searchsorted(mdoc, ids, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return _empty
        ki = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        mi = np.repeat(lo, cnt) + within
        pr = mpair[mi]
        return pa.table(
            {
                "_b": pa.array((fmix64(pr.astype(U64)) % U64(n_buckets)).astype(np.int64)),
                "pair": pa.array(pr),
                "side": pa.array(mside[mi]),
                "tok": pa.array(tok[ki]),
                "tf": pa.array(tf[ki]),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        pr = g["pair"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        tok = g["tok"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, tok, pr))
        pr, side, tok, tf = pr[order], side[order], tok[order], tf[order]
        new = np.ones(len(pr), bool)
        new[1:] = (pr[1:] != pr[:-1]) | (tok[1:] != tok[:-1])
        run_id = np.cumsum(new) - 1
        fa = np.zeros(run_id[-1] + 1 if len(run_id) else 0, np.int64)
        fb = np.zeros_like(fa)
        np.add.at(fa, run_id[side == 0], tf[side == 0])
        np.add.at(fb, run_id[side == 1], tf[side == 1])
        run_pair = pr[np.flatnonzero(new)]
        upairs, pinv = np.unique(run_pair, return_inverse=True)
        num = np.zeros(len(upairs), np.int64)
        den = np.zeros(len(upairs), np.int64)
        np.add.at(num, pinv, np.minimum(fa, fb))
        np.add.at(den, pinv, np.maximum(fa, fb))
        wj = np.where(den > 0, num / np.maximum(den, 1), 0.0)
        return pa.table(
            {
                "doc_a": pa.array(a[upairs]),
                "doc_b": pa.array(b[upairs]),
                "w_jaccard": pa.array(wj, pa.float64()),
            }
        )

    out = (
        docs.map_batches(fan_out, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(kernel, batch_format="pyarrow")
    )
    return out
