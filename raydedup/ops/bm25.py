"""BM25 keyword retrieval (Robertson & Zaragoza 2009): score every
document against a fixed bag-of-words query and return the top-k — the
lexical-search baseline next to the engine's embedding ANN
(``ops/ann.py``).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))

Scale design (100 TB lens):
- ONE tokenize pass reduces every doc to a |Q|+2-column narrow row
  (id, dl, tf per query term) — the text never travels further.
- N / Σdl / per-term df come from ONE tree aggregate over the narrow
  table (df as a map-side >0 indicator summed); the driver holds |Q|+2
  numbers, never rows.
- Scoring is a zero-shuffle map over the narrow table with the
  constants in the task closure; the top-k is a per-block partial
  top-k followed by a sort+limit over blocks·k candidate rows only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _narrow_batch(batch: pa.Table, terms: list[str], id_column: str, text_column: str) -> pa.Table:
    """(id, dl, tf_i..., gt_i...) per doc — tf for each query term plus
    a 0/1 document-frequency indicator, complete within the block."""
    from raydedup.ops.lm import _doc_words

    flat, off = _doc_words(batch, text_column)
    n_docs = len(batch)
    dl = np.diff(off).astype(np.int64)
    cols = {id_column: batch[id_column], "dl": pa.array(dl)}
    doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), dl)
    for i, t in enumerate(terms):
        hit = (
            pc.equal(flat, t).to_numpy(zero_copy_only=False)
            if len(flat)
            else np.empty(0, bool)
        )
        tf = np.bincount(doc_of_word[hit], minlength=n_docs).astype(np.int64)
        cols[f"tf_{i}"] = pa.array(tf)
        cols[f"gt_{i}"] = pa.array((tf > 0).astype(np.int64))
    return pa.table(cols)


def bm25_topk(
    docs,
    query_terms: list[str],
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-k docs by BM25 → (id, bm25) sorted by (bm25 desc, id).

    ``bm25`` is rounded to 6 decimals; contributions accumulate in
    query-term order.
    """
    from ray.data.aggregate import Count, Sum

    terms = list(query_terms)
    m = len(terms)
    narrow = (
        docs.select_columns([id_column, text_column])
        .map_batches(
            lambda bt: _narrow_batch(bt, terms, id_column, text_column),
            batch_format="pyarrow",
        )
        .materialize()
    )
    aggs = [Count(alias_name="n"), Sum("dl", alias_name="sum_dl")]
    aggs += [Sum(f"gt_{i}", alias_name=f"df_{i}") for i in range(m)]
    stats = narrow.aggregate(*aggs)
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"] or 0) / n if n else 1.0
    df = np.array([float(stats[f"df_{i}"] or 0) for i in range(m)])
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def score_block(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch), dtype=np.float64)
        for i in range(m):
            tf = batch[f"tf_{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
            s += idf[i] * tf * (k1 + 1.0) / (tf + norm)
        s = np.round(s, 6)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        # per-block partial top-k: only blocks*k rows reach the sort
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {id_column: batch[id_column].take(pa.array(order)), "bm25": pa.array(s[order])}
        )

    return (
        narrow.map_batches(score_block, batch_format="pyarrow")
        .sort(["bm25", id_column], descending=[True, False])
        .limit(k)
    )
