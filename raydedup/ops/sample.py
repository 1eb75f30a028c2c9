"""Deterministic stratified sampling: k docs per stratum by hash priority.

The training-data shape ("take 10k docs per language for eval"): each
row gets a uniform priority = murmur3-128(id) (seed 9001 — the same
hash discipline as every sketch, ``hash/murmurhash.rs`` scheme), and
the sample is the k smallest priorities per stratum. Equivalent in
distribution to per-stratum reservoir sampling, but deterministic,
reproducible across runs/cluster sizes, and MERGEABLE: min-k is
associative, so each block combines map-side and the final exchange
carries at most k rows per (stratum, block), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _topk_rows(strata: np.ndarray, h: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest (h, id) rows per stratum — one
    lexsort + run-boundary cumcount, no per-group loop."""
    _, codes = np.unique(strata, return_inverse=True)
    order = np.lexsort((ids, h, codes))
    c = codes[order]
    first = np.ones(len(c), dtype=bool)
    first[1:] = c[1:] != c[:-1]
    starts = np.flatnonzero(first)
    grp = np.cumsum(first) - 1
    pos = np.arange(len(c)) - starts[grp]
    return order[pos < k]


def stratified_sample(
    ds,
    id_column: str,
    strata_column: str,
    k: int,
    text_priority_column: str | None = None,
):
    """k-per-stratum deterministic sample → (stratum, id, rank).

    Priority is murmur3-128 of the id (numeric ids hash by their
    64-bit LE bytes; pass ``text_priority_column`` to key the priority
    off a text column instead, e.g. a url). Rank is the 1-based
    position by (priority, id) within the stratum.
    """
    from raydedup.sketches.aggregates import _column_hashes

    pcol = text_priority_column or id_column

    def block_topk(batch: pa.Table) -> pa.Table:
        h, _ = _column_hashes(batch[pcol])
        strata = batch[strata_column].to_numpy(zero_copy_only=False)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        keep = _topk_rows(strata, h, ids, k)
        return pa.table(
            {
                strata_column: pa.array(strata[keep]),
                id_column: pa.array(ids[keep]),
                "_priority": pa.array(h[keep], pa.uint64()),
            }
        )

    def final_topk(g: pa.Table) -> pa.Table:
        h = g["_priority"].to_numpy(zero_copy_only=False)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        strata = g[strata_column].to_numpy(zero_copy_only=False)
        keep = _topk_rows(strata, h, ids, k)
        order = keep[np.lexsort((ids[keep], h[keep]))]
        return pa.table(
            {
                strata_column: pa.array(strata[order]),
                id_column: pa.array(ids[order]),
                "sample_rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    cols = list({id_column, strata_column, pcol})
    partials = ds.select_columns(cols).map_batches(block_topk, batch_format="pyarrow")
    # groups are tiny by construction (≤ k rows per stratum per block)
    return partials.groupby(strata_column).map_groups(final_topk, batch_format="pyarrow")


def mix_sources(ds, id_column: str, source_column: str, rates: dict, default_rate: float = 0.0):
    """Dataset mixing — the training-data "recipe" step (per-source
    sampling rates, RedPajama/Dolma style): keep a row of source s
    with probability ``rates.get(s, default_rate)``, deterministically
    — kept iff murmur3-128(id) < rate·2^64. Map-only (ZERO shuffle at
    any corpus size), reproducible across runs and cluster sizes, and
    nested: lowering a source's rate yields a strict subset of the
    higher-rate sample (same priority, lower threshold), so recipes
    can be re-weighted without resampling churn.
    """
    from raydedup.sketches.aggregates import _column_hashes

    TWO64 = 1 << 64

    def mix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h, _ = _column_hashes(batch[id_column])
        src = batch[source_column].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        rate = np.array([float(rates.get(s, default_rate)) for s in uniq])
        thr = np.array(
            [min(int(r * TWO64), TWO64 - 1) for r in rate], dtype=np.uint64
        )
        keep = (h < thr[inv]) | (rate >= 1.0)[inv]
        return batch.filter(pa.array(keep))

    return ds.map_batches(mix, batch_format="pyarrow")
