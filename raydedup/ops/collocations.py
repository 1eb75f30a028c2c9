"""PMI collocation mining: corpus-wide word pairs that co-occur far
more than chance (Church & Hanks 1990) — the phrase/boilerplate
analysis step next to ``top_ngrams``'s raw-frequency scan.

    pmi(a b) = ln( (c_ab / T_b) / ((c_a / T_u) · (c_b / T_u)) )

with c_ab the bigram count, c_a/c_b unigram counts, T_b/T_u the
corpus bigram/word totals, thresholded at ``min_count`` occurrences
(PMI is noise below a support floor).

Scale design (100 TB lens):
- Both count tables reduce with map-side combined partials
  (``bigram_counts`` / ``word_counts`` — each block collapses to its
  distinct grams BEFORE the groupby), so the two exchanges carry
  vocabulary-sized rows, never per-token rows.
- Totals are scalar tree aggregates over the already-reduced tables.
- The support filter (``c_ab >= min_count``) runs before the two
  unigram hash joins, so joined rows are bounded by the collocation
  candidate set, not the bigram vocabulary.
- PMI math is one vectorized kernel; the final top-k is a sort+limit
  over candidates only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def word_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-block partial word counts → (word, count) rows — the
    unigram twin of ``text_stats.bigram_counts`` (same tokenizer:
    lowercase, whitespace split, empty tokens dropped)."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    empty = pa.table({"word": pa.array([], pa.string()), "count": pa.array([], pa.int64())})
    if len(text) == 0:
        return empty
    words = pc.utf8_split_whitespace(pc.utf8_lower(text))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    if len(flat) == 0:
        return empty
    vc = pc.value_counts(flat)
    return pa.table(
        {"word": vc.field("values"), "count": vc.field("counts").cast(pa.int64())}
    )


def _attach_count(
    cand,
    uni,
    key_col: str,
    out_col: str,
    cand_schema: pa.Schema,
    n_buckets: int = 16,
):
    """Attach ``uni``'s (word, c) count to every ``cand`` row whose
    ``key_col`` matches — a hash-join expressed as the repo's bucketed
    union-cogroup (hash(word) % n_buckets → one vectorized
    sorted-lookup kernel per bucket), immune to Ray's
    schema-less-empty-partition join quirk. Inner semantics: cand rows
    without a matching word drop (impossible here — a word's count
    always >= any bigram containing it)."""

    from raydedup.sketches.aggregates import _column_hashes

    cand_cols = [f.name for f in cand_schema]

    def tag_cand(b: pa.Table) -> pa.Table:
        n = b.num_rows
        h = _column_hashes(b[key_col])[0] if n else np.empty(0, np.uint64)
        return pa.table(
            {
                **{c: b[c] for c in cand_cols},
                "_c": pa.array(np.zeros(n, np.int64)),
                "_u": pa.array(np.zeros(n, np.int8)),
                "_b": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    def tag_uni(b: pa.Table) -> pa.Table:
        n = b.num_rows
        h = _column_hashes(b["word"])[0] if n else np.empty(0, np.uint64)
        cols = {}
        for f in cand_schema:
            if f.name == key_col:
                cols[f.name] = b["word"]
            elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
                # string nulls keep pandas object dtype intact
                cols[f.name] = pa.nulls(n, f.type)
            else:
                # numeric nulls would float-ify the unioned column in
                # the pandas kernel — fill typed zeros instead
                cols[f.name] = pa.array(np.zeros(n, np.int64)).cast(f.type)
        cols["_c"] = b["c"].cast(pa.int64())
        cols["_u"] = pa.array(np.ones(n, np.int8))
        cols["_b"] = pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        return pa.table(cols)

    tagged = cand.map_batches(tag_cand, batch_format="pyarrow").union(
        uni.map_batches(tag_uni, batch_format="pyarrow")
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        from raydedup.ops._bucketed import column_np

        u = column_np(g["_u"])
        keys = column_np(g[key_col])
        cvals = column_np(g["_c"]).astype(np.int64)
        is_u = u == 1
        lk, lv = keys[is_u], cvals[is_u]
        lorder = np.argsort(lk, kind="stable")
        lk, lv = lk[lorder], lv[lorder]
        cand_idx = np.flatnonzero(~is_u)
        base = g.select(cand_cols)
        if len(lk) == 0 or len(cand_idx) == 0:
            out = base.take(pa.array(np.empty(0, np.int64)))
            return out.append_column(out_col, pa.array([], pa.int64()))
        ck = keys[cand_idx]
        pos = np.searchsorted(lk, ck)
        pos_c = np.minimum(pos, len(lk) - 1)
        ok = (pos < len(lk)) & (lk[pos_c] == ck)
        sel = cand_idx[ok]
        out = base.take(pa.array(sel))
        return out.append_column(out_col, pa.array(lv[pos_c[ok]]))

    return tagged.groupby("_b").map_groups(merge_bucket, batch_format="pyarrow")


def collocations(ds, text_column: str = "text", min_count: int = 5, top_k: int = 20):
    """Top-k collocations → (gram, n, pmi) sorted by (pmi desc, gram).

    ``pmi`` is rounded to 6 decimals and computed in one fixed
    left-to-right double expression (``c_ab / T_b * T_u / c_a * T_u /
    c_b``) so an oracle evaluating the same expression reproduces it
    bit-for-bit.
    """
    from ray.data.aggregate import Sum

    from raydedup.ops.text_stats import bigram_counts

    text = ds.select_columns([text_column])
    uni = (
        text.map_batches(lambda b: word_counts(b, text_column), batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("count", alias_name="c"))
        .materialize()
    )
    bi = (
        text.map_batches(lambda b: bigram_counts(b, text_column), batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("count", alias_name="n"))
        .materialize()
    )
    t_u = float(uni.sum("c") or 0)
    t_b = float(bi.sum("n") or 0)

    def split_and_filter(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["n"], min_count)
        batch = batch.filter(keep)
        parts = pc.split_pattern(batch["gram"].combine_chunks(), " ")
        return pa.table(
            {
                "gram": batch["gram"],
                "n": batch["n"].cast(pa.int64()),
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
            }
        )

    cand = bi.map_batches(split_and_filter, batch_format="pyarrow")

    # Count attachment uses the repo's bucketed union-cogroup shape
    # instead of Dataset.join: Ray's hash join crashes when a hash
    # partition receives zero left rows (schema-less empty partition —
    # the quirk class documented in ops/substring.py). Candidates and
    # the unigram table coarse-bucket on hash(word) % n_buckets and ONE
    # vectorized pandas merge per bucket attaches the count — same
    # exchange volume as a hash join, no per-key groups.
    cand_schema = pa.schema(
        [
            ("gram", pa.string()),
            ("n", pa.int64()),
            ("w1", pa.string()),
            ("w2", pa.string()),
        ]
    )
    joined = _attach_count(cand, uni, "w1", "c1", cand_schema)
    joined = _attach_count(
        joined, uni, "w2", "c2", cand_schema.append(pa.field("c1", pa.int64()))
    )

    def score(batch: pa.Table) -> pa.Table:
        c_ab = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = batch["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_b = batch["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(np.log(c_ab / t_b * t_u / c_a * t_u / c_b), 6)
        return pa.table(
            {
                "gram": batch["gram"],
                "n": batch["n"],
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "gram"], descending=[True, False])
        .limit(top_k)
    )
