"""Benchmark decontamination: flag corpus docs overlapping a test set.

The standard training-data hygiene step (GPT-3 appendix C / Gopher
section A.3 shape): a document is *contaminated* if it shares any word
k-gram (default k=8) with the benchmark/evaluation set. Built on the
same murmur3 word/shingle kernels as the dedup pipeline
(``pipeline/extract.py``), so the gram definition is identical across
detectors (reference hash semantics: ``hash/murmurhash.rs:189-231``).

Scale design — benchmarks are tiny next to a training corpus, so the
corpus side must never shuffle:

1. the benchmark's DISTINCT gram-hash set is tree-reduced inside Ray
   Data's aggregate (``block_reduce`` — sorted-array unions; the driver
   receives ONE sorted u64 array, ~8 B/gram);
2. the set is broadcast once (``ray.put``) and every corpus batch runs
   one vectorized searchsorted membership probe against it — a pure
   map-side anti-join, zero shuffle, streaming end to end.

A 10M-gram benchmark is an ~80 MB broadcast — well inside worker heaps;
for benchmark sets beyond broadcast scale the Bloom + bucketed-confirm
shape of ``ops.exact.flag_new_docs`` applies unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from raydedup.pipeline.extract import shingle_hashes, tokenize_word_hashes

U64 = np.uint64


def _doc_gram_hashes(text: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """text column → (flat gram hashes, doc offsets). Documents shorter
    than k words have ZERO grams (the dedup pipeline's short-doc
    sentinel shingle is masked out — it is not a k-gram)."""
    word_h1, off = tokenize_word_hashes(text)
    sh, sh_off = shingle_hashes(word_h1, off, k=k)
    w = np.diff(off)
    short = w < k
    if short.any():
        n_sh = np.diff(sh_off)
        keep_doc = ~short
        n_sh = np.where(keep_doc, n_sh, 0)
        doc_of = np.repeat(np.arange(len(w)), np.diff(sh_off))
        sh = sh[keep_doc[doc_of]]
        sh_off = np.zeros(len(w) + 1, np.int64)
        np.cumsum(n_sh, out=sh_off[1:])
    return sh, sh_off


def benchmark_gram_hashes(bench_ds, text_column: str = "text", k: int = 8) -> np.ndarray:
    """Distinct word-k-gram hashes of the benchmark set, tree-reduced:
    per-block sorted-unique partials merge associatively inside
    ``Dataset.aggregate`` — the driver folds nothing."""
    from raydedup.sketches.aggregates import block_reduce

    def partial(batch: pa.Table) -> bytes:
        sh, _ = _doc_gram_hashes(batch[text_column], k)
        return np.unique(sh).tobytes()

    def merge(a: bytes, b: bytes) -> bytes:
        ua = np.frombuffer(a, U64)
        ub = np.frombuffer(b, U64)
        return np.unique(np.concatenate([ua, ub])).tobytes()

    row = bench_ds.select_columns([text_column]).aggregate(
        block_reduce(partial, merge, name="grams")
    )
    blob = row.get("grams") if row else None
    return np.frombuffer(blob, U64) if blob else np.empty(0, U64)


def flag_contaminated(
    corpus_ds,
    bench_grams_ref,
    id_column: str,
    text_column: str = "text",
    k: int = 8,
):
    """(id, contaminated, n_contaminated_grams) per corpus row.

    ``bench_grams_ref`` is a ``ray.put`` ObjectRef of the SORTED
    benchmark gram-hash array (or the array itself for in-process use).
    ``n_contaminated_grams`` counts the doc's DISTINCT grams present in
    the benchmark. Map-side only: the corpus streams, nothing shuffles.
    """
    from raydedup.pipeline.extract import segmented_unique

    def probe(batch: pa.Table, ref) -> pa.Table:
        grams = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        sh, sh_off = _doc_gram_hashes(batch[text_column], k)
        # distinct grams per doc (sorted within segments: probes ascend)
        u, uo = segmented_unique(sh, sh_off)
        if len(grams) and len(u):
            pos = np.minimum(np.searchsorted(grams, u), len(grams) - 1)
            hit = grams[pos] == u
        else:
            hit = np.zeros(len(u), bool)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(uo))
        n_hit = np.bincount(doc_of[hit], minlength=len(batch))
        return pa.table(
            {
                id_column: batch[id_column],
                "contaminated": pa.array(n_hit > 0),
                "n_contaminated_grams": pa.array(n_hit.astype(np.int64)),
            }
        )

    return corpus_ds.select_columns([id_column, text_column]).map_batches(
        probe, fn_args=(bench_grams_ref,), batch_format="pyarrow"
    )


def decontaminate(
    corpus_ds, bench_ds, id_column: str, text_column: str = "text", k: int = 8
):
    """Convenience composition: reduce the benchmark gram set, broadcast
    it, flag the corpus. Returns the flags Dataset."""
    grams = benchmark_gram_hashes(bench_ds, text_column=text_column, k=k)
    ref = ray.put(grams)
    return flag_contaminated(
        corpus_ds, ref, id_column, text_column=text_column, k=k
    )
