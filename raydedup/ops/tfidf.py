"""Distributed TF-IDF: per-(doc, term) weights with corpus-wide DF.

The canonical two-shuffle text-statistics shape:

1. **map-side complete TF**: a document lives in exactly one block, so
   per-(doc, term) counts finish inside ``map_batches`` (lower →
   whitespace split → one vectorized factorize+bincount per batch) —
   the exchange never carries per-token rows;
2. **DF**: one vocabulary-sized ``groupby(term).count()`` over the
   already-distinct (doc, term) rows (a doc contributes each term
   once by construction, so ``Count`` IS the document frequency);
3. **weight join**: TF rows ⋈ DF rows on ``term`` — a hash-shuffle
   ``Dataset.join`` keyed on the term string; the joined rows carry
   (doc_id, term, tf, df) only.

``tfidf = tf · ln(N / df)`` with N = corpus doc count. Skewed terms
(stopwords) concentrate DF rows, not data: DF rows are one per
distinct term per block, so a term appearing in every doc still ships
O(blocks) rows into the count, and the join's term key distributes
doc-term rows across partitions by hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _doc_term_counts(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc, term) → count, complete within the batch (docs never
    split across batches in a row-based Dataset)."""
    split = pc.utf8_split_whitespace(pc.utf8_lower(batch[text_col].combine_chunks()))
    words = pc.list_flatten(split)
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    keep = pc.utf8_length(words).to_numpy(zero_copy_only=False) > 0
    w = words.to_numpy(zero_copy_only=False)[keep]
    p = parents[keep]
    if len(w) == 0:
        return pa.table(
            {
                id_col: pa.array([], batch[id_col].type),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    term_codes, terms = pd.factorize(w, sort=False)
    pair = p.astype(np.int64) * len(terms) + term_codes
    uniq, counts = np.unique(pair, return_counts=True)
    doc_idx = (uniq // len(terms)).astype(np.int64)
    t_idx = (uniq % len(terms)).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(doc_idx)),
            "term": pa.array(terms[t_idx], pa.string()),
            "tf": pa.array(counts.astype(np.int64)),
        }
    )


def doc_term_tfidf(docs, id_col: str = "doc_id", text_col: str = "text"):
    """docs (id, text) → Dataset (id, term, tf, df, tfidf)."""
    from ray.data.aggregate import Count

    n_docs = docs.count()
    tf = docs.map_batches(
        lambda b: _doc_term_counts(b, id_col, text_col), batch_format="pyarrow"
    ).materialize()
    df = tf.groupby("term").aggregate(Count(alias_name="df"))
    joined = tf.join(df, join_type="inner", num_partitions=8, on=("term",))

    def weight(batch: pa.Table) -> pa.Table:
        t = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.round(t * np.log(float(n_docs) / d), 6)
        return batch.append_column("tfidf", pa.array(w))

    return joined.map_batches(weight, batch_format="pyarrow")
