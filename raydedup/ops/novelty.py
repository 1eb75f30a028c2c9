"""Per-document n-gram novelty vs earlier documents.

The "duplicate n-gram fraction" curation signal (RefinedWeb-style): for
every document, the fraction of its DISTINCT word 5-grams that already
occur in some earlier document (smaller ``doc_id``). A doc that is a
mosaic of previously-seen text scores near 1 even when no single pair
crosses a Jaccard threshold — it complements the pairwise near-dup
passes (MinHash-LSH, exact-substring) as a per-doc quality feature.

Scale design: grams never leave their block as strings — each block
emits DISTINCT (gram-hash, doc_id) pairs (``text_to_shingle_sets`` +
``segmented_unique``), bucketed by a coarse hash of the GRAM so every
occurrence of a gram lands in one group. One lexsort kernel per bucket
marks instances whose doc is not the gram's minimum doc, and
pre-aggregates to one row per (doc, bucket); a final Sum groupby
finishes. Both exchanges carry narrow int64 rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def gram_novelty(
    ds, id_column: str, text_column: str = "text", k: int = 5, n_buckets: int | None = None
):
    """(id, n_grams, dup_grams, dup_frac) per doc with >=1 word.

    ``dup_grams`` counts this doc's distinct k-gram shingles whose
    first corpus occurrence (min doc id over all docs containing the
    gram) is an EARLIER doc. Distinctness is over murmur3 u64 gram
    hashes (collision odds ~n²/2⁶⁵). Docs shorter than k words form
    one shingle over all their words (the engine-wide convention,
    ``pipeline/extract.py::shingle_hashes``).
    """
    from ray.data.aggregate import Sum

    from raydedup.ops._bucketed import resolve_buckets
    from raydedup.pipeline.extract import segmented_unique, text_to_shingle_sets
    from raydedup.sketches.hashing import fmix64

    # gram rows are ~16 B per corpus word (~4x the text bytes); size the
    # gram-bucket exchange so one bucket fits a worker (floor = the
    # historical 64)
    n_buckets = resolve_buckets(ds, n_buckets, blowup=4.0)

    U64 = np.uint64

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        sh, offs, _ = text_to_shingle_sets(batch[text_column], k=k)
        su, uoffs = segmented_unique(sh, offs)
        doc = np.repeat(ids, np.diff(uoffs))
        bkt = (fmix64(su) % U64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "_bkt": pa.array(bkt),
                "g": pa.array(su.view(np.int64), pa.int64()),
                id_column: pa.array(doc),
            }
        )

    def mark_bucket(g: pa.Table) -> pa.Table:
        gh = g["g"].to_numpy(zero_copy_only=False)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, gh))
        sg, sd = gh[order], ids[order]
        run_start = np.ones(len(order), dtype=bool)
        run_start[1:] = sg[1:] != sg[:-1]
        # rows are distinct (gram, doc) pairs sorted by (gram, doc), so
        # the run head holds each gram's minimum doc id
        first_doc = sd[np.maximum.accumulate(np.where(run_start, np.arange(len(sd)), 0))]
        dup = sd > first_doc
        uid, inv = np.unique(sd, return_inverse=True)
        tot = np.bincount(inv, minlength=len(uid)).astype(np.int64)
        ndup = np.bincount(inv, weights=dup.astype(np.int64), minlength=len(uid)).astype(np.int64)
        return pa.table(
            {
                id_column: pa.array(uid),
                "n_grams": pa.array(tot),
                "dup_grams": pa.array(ndup),
            }
        )

    rows = ds.select_columns([id_column, text_column]).map_batches(
        gram_rows, batch_format="pyarrow"
    )
    partials = rows.groupby("_bkt").map_groups(mark_bucket, batch_format="pyarrow")
    out = partials.groupby(id_column).aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("dup_grams", alias_name="dup_grams"),
    )

    def add_frac(batch: pa.Table) -> pa.Table:
        frac = pc.divide(
            pc.cast(batch["dup_grams"], pa.float64()),
            pc.cast(batch["n_grams"], pa.float64()),
        )
        return batch.append_column("dup_frac", frac)

    return out.map_batches(add_frac, batch_format="pyarrow")
