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


def weighted_sample(ds, id_column: str, weight_column: str, k: int):
    """Weighted sampling without replacement, A-ES (Efraimidis &
    Spirakis 2006): each row draws u = (murmur3(id)+0.5)/2^64 and the
    sample is the k rows with the largest key u^(1/w) — selected here
    by the order-equivalent ln(u)/w, one log + one divide per row.
    Inclusion probability is proportional to weight w (rows with
    w <= 0 are excluded), and the draw is deterministic: reproducible
    across runs, blockings, and cluster sizes, with the same
    nested-sample property as the engine's other priority samplers.

    Scale shape: key computation is map-side; each block keeps only
    its k best (partial top-k), so the final sort+limit sees
    blocks·k rows, never the corpus. Output: (id, weight) sorted by
    id."""
    TWO64 = float(1 << 64)

    def block_topk(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        w = batch[weight_column].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = w > 0
        batch = batch.filter(pa.array(pos))
        w = w[pos]
        if batch.num_rows == 0:
            # typed empty from the INPUT schema: the weight column keeps
            # its original type (a hard-coded int64 truncated fractional
            # weights in the output — round-3 advice)
            return pa.table(
                {
                    id_column: batch[id_column],
                    weight_column: batch[weight_column],
                    "_key": pa.array([], pa.float64()),
                }
            )
        h, _ = _column_hashes(batch[id_column])
        key = np.log((h.astype(np.float64) + 0.5) / TWO64) / w
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        keep = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                id_column: batch[id_column].take(pa.array(keep)),
                weight_column: batch[weight_column].take(pa.array(keep)),
                "_key": pa.array(key[keep], pa.float64()),
            }
        )

    sel = (
        ds.select_columns([id_column, weight_column])
        .map_batches(block_topk, batch_format="pyarrow")
        .sort(["_key", id_column], descending=[True, False])
        .limit(k)
    )
    return sel.drop_columns(["_key"]).sort(id_column)


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


def shuffle_ranks(ds, id_column: str, n_buckets: int | None = None):
    """Deterministic global training-order shuffle: each row's dense
    0-based position under (murmur3 priority, id) order — the "shuffle
    the corpus before packing" step, reproducible across runs and
    cluster sizes (no RNG state).

    Scale shape: priorities are uniform u64, so the top lg(B) bits are
    an order-preserving, balanced bucketing by CONSTRUCTION — unlike
    ``ops/packing.py`` (whose sort key, the id, is skewed and needs a
    split-sampling pass). One tree-reduced bincount aggregate gives
    bucket offsets (the driver exclusive-scans B numbers); the only
    shuffle is the in-bucket groupby over (id, priority, bucket) rows.
    """
    from raydedup.ops._bucketed import resolve_buckets
    from raydedup.sketches.aggregates import _column_hashes, block_reduce

    if n_buckets is None:
        # order-preserving top-bit bucketing needs a power of two
        n_buckets = 1 << (resolve_buckets(ds, None) - 1).bit_length()
    lgb = int(n_buckets).bit_length() - 1
    if (1 << lgb) != n_buckets:
        raise ValueError("n_buckets must be a power of two")
    shift = np.uint64(64 - lgb)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h, _ = _column_hashes(batch[id_column])
        return pa.table(
            {
                id_column: batch[id_column],
                "_priority": pa.array(h, pa.uint64()),
                "_sbucket": pa.array((h >> shift).astype(np.int64)),
            }
        )

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def bucket_counts(blk: pa.Table) -> np.ndarray:
        b = blk["_sbucket"].combine_chunks().to_numpy(zero_copy_only=False)
        return np.bincount(b, minlength=n_buckets).astype(np.int64)

    sums = tagged.aggregate(block_reduce(bucket_counts, lambda a, b: a + b, name="counts"))[
        "counts"
    ]
    if sums is None:
        sums = np.zeros(n_buckets, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    def rank_bucket(g: pa.Table) -> pa.Table:
        bkt = int(g["_sbucket"][0].as_py())
        h = g["_priority"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        ranks = np.empty(len(h), np.int64)
        ranks[order] = offsets[bkt] + np.arange(len(h), dtype=np.int64)
        return pa.table({id_column: g[id_column], "shuffle_rank": pa.array(ranks)})

    return tagged.groupby("_sbucket").map_groups(rank_bucket, batch_format="pyarrow")
