"""End-to-end near-duplicate detection pipeline (the flagship).

Stages (each a streaming Dataset transform; BASELINE.json north_star):

1. **signatures** — ``map_batches(SignatureStage)`` actor pool: text →
   5-gram shingle sets (KMV-trimmed), 128-perm MinHash signature, 32
   LSH band hashes. The html column is pruned at the read
   (``columns=["url","text"]``) so wide binary never enters the object
   store.
2. **candidates** — band-row explode + coarse-bucket shuffle +
   vectorized run detection → distinct candidate pairs (lsh.py).
3. **verified** — semi-filtered hash join of signatures onto pairs →
   signature agreement, exact/KMV Jaccard, containment (verify.py).
4. **clusters** — union-find over dup edges, broadcast assignment back
   over the corpus (cluster.py).

``run_dedup`` wires them together and optionally checkpoints each
stage boundary as partitioned parquet with a manifest
(checkpoint.py) for resume.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.compute as pc

import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.pipeline.cluster import cluster_assignments
from raydedup.pipeline.lsh import candidate_pairs
from raydedup.pipeline.verify import confirm_substrings, verify_pairs


@dataclass
class DedupResult:
    signatures: "rd.Dataset"
    candidates: "rd.Dataset"
    verified: "rd.Dataset"
    dup_pairs: "rd.Dataset"
    assignments: "rd.Dataset"
    substring_pairs: "rd.Dataset | None" = None


def build_signatures(pages, cfg: DedupConfig, concurrency=None):
    """Signature stage as cached tasks (state amortized per worker
    process — see lsh.signature_batch_fn). ``concurrency`` caps
    in-flight tasks when given; default lets the scheduler fill idle
    CPUs."""
    from raydedup.pipeline.lsh import signature_batch_fn

    kwargs = {}
    if isinstance(concurrency, int):
        kwargs["concurrency"] = concurrency
    return pages.map_batches(
        signature_batch_fn,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        **kwargs,
    )


def run_dedup(
    pages,
    cfg: DedupConfig | None = None,
    n_buckets: int = 256,
    num_join_partitions: int = 32,
    with_substring_confirm: bool = False,
    concurrency=(1, 8),
    salt_hot: bool = True,
    timings: dict | None = None,
) -> DedupResult:
    """pages Dataset (url, text[, html...]) → DedupResult of lazy Datasets.

    Consumers drive execution: ``result.assignments.write_parquet(...)``
    or ``.to_pandas()`` on the small outputs.

    ``timings``, when given, is filled with per-stage wall seconds
    (sig/cand/verify) and the byte volumes entering each shuffle
    (sig_bytes feeds the band shuffle, cand_bytes the verify attach) —
    the inputs the scaling-decomposition bench records.
    """
    cfg = cfg or DedupConfig()
    names = pages.schema().names
    if "text" in names:
        pages_slim = pages.select_columns(["url", "text"])
    else:
        # input_hint shape without a text column: extract from html
        # (byte-identical pure function of the bytes — extract.py) and
        # drop the wide binary immediately so it never enters a shuffle
        from raydedup.pipeline.extract import extract_text

        def extract(batch):
            import pyarrow as pa

            html = batch["html"]
            if isinstance(html, pa.ChunkedArray):
                html = html.combine_chunks()
            return pa.table({"url": batch["url"], "text": extract_text(html)})

        pages_slim = pages.select_columns(["url", "html"]).map_batches(
            extract, batch_format="pyarrow"
        )
    import os
    import sys
    import time

    timing = os.environ.get("RAYDEDUP_TIMING")
    t0 = time.time()
    sigs = build_signatures(pages_slim, cfg, concurrency=concurrency)
    # Coalesce the (read-block-sized) signature outputs into big blocks
    # before the wide band/verify shuffles: a near-free identity map
    # whose bundling happens opportunistically behind the expensive
    # signature stage. Then materialize once — signatures feed two
    # consumers (banding and the verify attach).
    sigs = sigs.map_batches(
        lambda b: b, batch_size=cfg.coalesce_rows, batch_format="pyarrow"
    )
    sigs = sigs.materialize()
    t1 = time.time()
    cands = candidate_pairs(sigs, cfg, n_buckets=n_buckets, salt_hot=salt_hot).materialize()
    t2 = time.time()
    verified = verify_pairs(cands, sigs, cfg, num_partitions=num_join_partitions).materialize()
    t3 = time.time()
    if timing:
        print(f"[run_dedup] sig {t1-t0:.2f} cand {t2-t1:.2f} ver {t3-t2:.2f}", file=sys.stderr)
    if timings is not None:
        timings["sig_sec"] = round(t1 - t0, 3)
        timings["cand_sec"] = round(t2 - t1, 3)
        timings["verify_sec"] = round(t3 - t2, 3)
        for name, d in (("sig", sigs), ("cand", cands), ("verified", verified)):
            try:
                timings[f"{name}_bytes"] = int(d.size_bytes())
            except Exception:
                pass
    t3b = time.time()
    dup_pairs = verified.filter(expr="is_dup")
    # assign over the materialized signatures (same url universe as the
    # corpus) so the raw input isn't re-read a second time; pass the
    # materialized verify output so the edge gather streams blocks
    # instead of paying the filter dataset's execution round
    assignments = cluster_assignments(dup_pairs, sigs, verified_full=verified)
    if timings is not None:
        timings["stats_sec"] = round(t3b - t3, 3)
        timings["assign_prep_sec"] = round(time.time() - t3b, 3)
    substr = None
    if with_substring_confirm:
        flagged = verified.filter(expr="substring_candidate")
        substr = confirm_substrings(flagged, pages_slim, num_partitions=num_join_partitions)
    return DedupResult(sigs, cands, verified, dup_pairs, assignments, substr)
