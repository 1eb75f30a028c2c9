"""Cross-source corpus overlap: per-source theta sketches over distinct
shingle hashes, pairwise Jaccard via sketch set algebra.

The curation question this answers: "how much of source A's content
already exists in source B?" — the slice a mixing recipe consults
before weighting sources (a Common-Crawl snapshot vs a curated dump,
two crawler frontiers, etc.). Exact distinct-gram Jaccard would need an
all-to-all exchange of every gram occurrence; the sketch form ships
only k-truncated KMV partials (≤ 8·2^lg_k bytes per (block, source))
through one tiny groupby, then does the O(S²) pairwise set algebra on
S source-level sketches.

Split-invariance (what makes the sidecar twin value-exact): a partial
theta built by ``ThetaSketch.from_hashes`` retains exactly
{x : x < theta_partial}, and ``theta_union`` screens by min theta and
rebuilds by the same (k+1)-th-smallest rule — so the union of
per-block partials is bit-identical to ``from_hashes`` over the whole
per-source gram set regardless of blocking (pytest pins this).

Reference parity: intersection semantics follow the reference's
``theta/intersection.rs:64-196``; the union is the SURVEY §2 #15
extension. This op is the engine's showcase of both as a *pipeline*
stage rather than a standalone sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.pipeline.extract import segmented_unique, text_to_shingle_sets
from raydedup.sketches.theta import (
    ThetaSketch,
    jaccard_estimate,
    theta_a_not_b,
    theta_union,
)

U64 = np.uint64


def source_sketch_partials(
    batch: pa.Table,
    k: int = 5,
    lg_k: int = 12,
    source_column: str = "source",
    text_column: str = "text",
) -> pa.Table:
    """One block → one partial theta per source present in the block.

    Grams hash once (the shared shingle kernel); the theta update
    hashes are the 63-bit folds ``gram >> 1`` (the ThetaDistinct
    convention, sketches/aggregates.py). Output rows: (source,
    sketch binary) — at most n_sources_in_block rows per block.
    """
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    sh, off, _ = text_to_shingle_sets(text, k=k)
    uvals, uoff = segmented_unique(sh, off)
    src = batch[source_column].to_numpy(zero_copy_only=False)
    # row index per distinct gram, then one sketch per source slice
    row_of = np.repeat(np.arange(len(src), dtype=np.int64), np.diff(uoff))
    out_src, out_sk = [], []
    for s in np.unique(src):
        h = uvals[(src == s)[row_of]]
        out_src.append(str(s))
        out_sk.append(ThetaSketch.from_hashes(h >> U64(1), lg_k=lg_k).to_bytes())
    return pa.table(
        {"source": pa.array(out_src, pa.string()), "sketch": pa.array(out_sk, pa.large_binary())}
    )


def source_gram_sketches(ds, k: int = 5, lg_k: int = 12):
    """documents Dataset (source, text) → Dataset (source, sketch).

    map-side partials (sketch-sized, never gram-occurrence-sized)
    through ONE tiny groupby; the union folds per group.
    """

    def union_group(g) -> pa.Table:
        sks = [ThetaSketch.from_bytes(b) for b in g["sketch"].to_pylist()]
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "sketch": pa.array([theta_union(sks).to_bytes()], pa.large_binary()),
            }
        )

    parts = ds.map_batches(
        source_sketch_partials, fn_kwargs={"k": k, "lg_k": lg_k}, batch_format="pyarrow"
    )
    return parts.groupby("source").map_groups(union_group, batch_format="pyarrow")


def pairwise_jaccard_table(sketches: dict[str, ThetaSketch]) -> pa.Table:
    """S source sketches → all S·(S-1)/2 (source_a < source_b) rows.

    Estimates round to 6 decimals (the board's float canonicalization
    grid). O(S²) on the caller by design — the output IS the matrix.
    """
    names = sorted(sketches)
    sa, sb, est = [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            sa.append(a)
            sb.append(b)
            est.append(round(jaccard_estimate(sketches[a], sketches[b]), 6))
    return pa.table(
        {
            "source_a": pa.array(sa, pa.string()),
            "source_b": pa.array(sb, pa.string()),
            "jaccard_est": pa.array(est, pa.float64()),
        }
    )


def source_overlap(ds, k: int = 5, lg_k: int = 12) -> pa.Table:
    """Full pipeline: documents Dataset → pairwise overlap table.

    The final gather is S rows of ≤ 8·2^lg_k+24 bytes each — bounded
    by the SOURCE domain (a mixing recipe's source list, not the
    corpus), the one intentionally driver-sized step.
    """
    rows = source_gram_sketches(ds, k=k, lg_k=lg_k).take_all()
    return pairwise_jaccard_table(
        {r["source"]: ThetaSketch.from_bytes(r["sketch"]) for r in rows}
    )


def unique_grams_table(sketches: dict[str, ThetaSketch]) -> pa.Table:
    """Per source: estimated distinct grams unique to it vs the union
    of every other source (theta A-NOT-B over the union — the "what
    does this source contribute that nothing else has" slice a mixing
    recipe weighs). O(S²) sketch unions on the caller; estimates round
    to 6 decimals."""
    names = sorted(sketches)
    est = []
    for s in names:
        others = theta_union([sketches[t] for t in names if t != s])
        est.append(round(theta_a_not_b(sketches[s], others).estimate(), 6))
    return pa.table(
        {
            "source": pa.array(names, pa.string()),
            "n_unique_est": pa.array(est, pa.float64()),
        }
    )


def source_unique_grams(ds, k: int = 5, lg_k: int = 12) -> pa.Table:
    """Full pipeline: documents Dataset → per-source unique-gram table
    (same bounded S-row gather as ``source_overlap``)."""
    rows = source_gram_sketches(ds, k=k, lg_k=lg_k).take_all()
    return unique_grams_table(
        {r["source"]: ThetaSketch.from_bytes(r["sketch"]) for r in rows}
    )


def source_unique_grams_local(tbl: pa.Table, k: int = 5, lg_k: int = 12) -> pa.Table:
    """Single-process twin (same from_hashes sketches, same algebra)."""
    sh, off, _ = text_to_shingle_sets(tbl["text"].combine_chunks(), k=k)
    uvals, uoff = segmented_unique(sh, off)
    src = tbl["source"].to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(len(src), dtype=np.int64), np.diff(uoff))
    sketches = {
        str(s): ThetaSketch.from_hashes(uvals[(src == s)[row_of]] >> U64(1), lg_k=lg_k)
        for s in np.unique(src)
    }
    return unique_grams_table(sketches)


def source_overlap_local(tbl: pa.Table, k: int = 5, lg_k: int = 12) -> pa.Table:
    """Single-process twin: per-source from_hashes over ALL distinct
    grams at once (no blocking, no partials, no union) — ground truth
    for the distributed path's split-invariance."""
    sh, off, _ = text_to_shingle_sets(tbl["text"].combine_chunks(), k=k)
    uvals, uoff = segmented_unique(sh, off)
    src = tbl["source"].to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(len(src), dtype=np.int64), np.diff(uoff))
    sketches = {}
    for s in np.unique(src):
        h = uvals[(src == s)[row_of]]
        sketches[str(s)] = ThetaSketch.from_hashes(h >> U64(1), lg_k=lg_k)
    return pairwise_jaccard_table(sketches)
