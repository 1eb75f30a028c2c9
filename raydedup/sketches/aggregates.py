"""Ray Data aggregation layer for the mergeable-sketch core.

Two harnesses (the reference's distributed pattern, SURVEY.md §3.2:
build per shard → serialize → merge → finalize):

- **whole-dataset reduce**: ``*_of(ds, column)`` helpers run one
  ``map_batches`` pass emitting one serialized-sketch row per block,
  then fold the partials on the driver (block count is small — the
  data was reduced inside the blocks). Sketch images are the exact
  bytes a checkpoint would hold.
- **grouped aggregation**: ``AggregateFnV2`` subclasses usable in
  ``ds.groupby(key).aggregate(ThetaDistinct("col"), ...)`` — partial
  per block per group, combine = sketch merge, finalize = estimate.

All merges are associative + commutative (asserted in the kernel
tests), so Ray may combine partials in any order — the property the
reference documents as the point of its sketch algebra
(``hll/mod.rs:62-63``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFnV2

from raydedup.sketches.bloom import BloomFilter
from raydedup.sketches.countmin import CountMinSketch
from raydedup.sketches.frequencies import FrequentItemsSketch
from raydedup.sketches.hashing import DEFAULT_SEED, hash_strings, hash_u64_column
from raydedup.sketches.hll import HllSketch, hll_union
from raydedup.sketches.tdigest import TDigest, tdigest_merge
from raydedup.sketches.theta import ThetaSketch, theta_union

U64 = np.uint64


def _column_hashes(col, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """murmur3-128 of any column: strings hash raw bytes, ints hash 8 LE
    bytes, floats canonicalize then hash (hash_value policies)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return hash_strings(col, seed=seed)
    if pa.types.is_floating(t):
        from raydedup.sketches.hashing import canonicalize_floats

        bits = canonicalize_floats(col.to_numpy(zero_copy_only=False))
        return hash_u64_column(bits.view(np.int64), seed=seed)
    return hash_u64_column(col.cast(pa.int64()).to_numpy(zero_copy_only=False), seed=seed)


# ---------------------------------------------------------------------------
# whole-dataset reduces
# ---------------------------------------------------------------------------


def block_reduce(partial, merge, name: str = "acc"):
    """Global tree-reduce of an arbitrary per-block partial: an
    ``AggregateFnV2`` for ``Dataset.aggregate`` whose partials combine
    inside Ray Data's aggregate operator (off-driver) — the driver
    receives ONE accumulator instead of folding O(blocks) images in a
    sequential loop. ``partial(block: pa.Table) -> acc``;
    ``merge(a, b) -> acc``."""

    import pandas as pd

    class _Agg(AggregateFnV2):
        def __init__(self):
            super().__init__(name, zero_factory=lambda: None, on=None, ignore_nulls=True)

        def aggregate_block(self, block):
            if len(block) == 0:
                return None
            if isinstance(block, pd.DataFrame):  # aggregate may hand pandas blocks
                block = pa.Table.from_pandas(block, preserve_index=False)
            return partial(block)

        def combine(self, a, b):
            if a is None:
                return b
            if b is None:
                return a
            return merge(a, b)

        def finalize(self, acc):
            return acc

    return _Agg()


def _reduce_sketches(ds, column, partial, merge):
    row = ds.select_columns([column]).aggregate(
        block_reduce(lambda block: partial(block[column]), merge, name="sketch")
    )
    return row.get("sketch") if row else None


def theta_distinct(ds, column: str, lg_k: int = 12, seed: int = DEFAULT_SEED) -> ThetaSketch:
    def partial(col):
        h1, _ = _column_hashes(col, seed)
        return ThetaSketch.from_hashes(h1 >> U64(1), lg_k=lg_k, seed=seed).to_bytes()

    blob = _reduce_sketches(ds, column, partial, lambda a, b: theta_union(
        [ThetaSketch.from_bytes(a), ThetaSketch.from_bytes(b)]
    ).to_bytes())
    return ThetaSketch.from_bytes(blob) if blob else ThetaSketch.new_empty(lg_k, seed)


def hll_distinct(ds, column: str, lg_k: int = 12, seed: int = DEFAULT_SEED) -> HllSketch:
    from raydedup.sketches.hll import coupons_from_hashes

    def partial(col):
        slot, value = coupons_from_hashes(*_column_hashes(col, seed))
        return HllSketch(lg_k).update_coupons(slot, value).to_bytes()

    blob = _reduce_sketches(ds, column, partial, lambda a, b: hll_union(
        [HllSketch.from_bytes(a), HllSketch.from_bytes(b)]
    ).to_bytes())
    return HllSketch.from_bytes(blob) if blob else HllSketch(lg_k)


def tdigest_of(ds, column: str, k: int = 200) -> TDigest:
    def partial(col):
        return TDigest.from_values(col.to_numpy(zero_copy_only=False), k=k).to_bytes()

    blob = _reduce_sketches(ds, column, partial, lambda a, b: tdigest_merge(
        [TDigest.from_bytes(a), TDigest.from_bytes(b)]
    ).to_bytes())
    return TDigest.from_bytes(blob) if blob else TDigest(k)


def countmin_of(ds, column: str, num_hashes: int = 5, num_buckets: int = 2048, seed: int = DEFAULT_SEED) -> CountMinSketch:
    def partial(col):
        sk = CountMinSketch(num_hashes, num_buckets, seed)
        # Arrow-side cast; CountMinSketch.update hashes the column
        # vectorized (no per-row to_pylist materialization)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return sk.update(col.cast(pa.large_string())).to_bytes()

    blob = _reduce_sketches(
        ds,
        column,
        partial,
        lambda a, b: CountMinSketch.from_bytes(a, seed).merge(CountMinSketch.from_bytes(b, seed)).to_bytes(),
    )
    return CountMinSketch.from_bytes(blob, seed) if blob else CountMinSketch(num_hashes, num_buckets, seed)


def frequent_items_of(ds, column: str, max_map_size: int = 256) -> FrequentItemsSketch:
    def partial(col):
        sk = FrequentItemsSketch(max_map_size)
        return sk.update_batch(col.to_numpy(zero_copy_only=False)).to_bytes()

    blob = _reduce_sketches(
        ds,
        column,
        partial,
        lambda a, b: FrequentItemsSketch.from_bytes(a).merge(FrequentItemsSketch.from_bytes(b)).to_bytes(),
    )
    return FrequentItemsSketch.from_bytes(blob) if blob else FrequentItemsSketch(max_map_size)


def cpc_distinct(ds, column: str, lg_k: int = 11, seed: int = DEFAULT_SEED):
    """Distinct count via CPC bit-matrix partials + OR-merge."""
    from raydedup.sketches.cpc import CpcSketch, cpc_union

    def partial(col):
        h1, h2 = _column_hashes(col, seed)
        return CpcSketch(lg_k).update_hashes(h1, h2).to_bytes()

    blob = _reduce_sketches(ds, column, partial, lambda a, b: cpc_union(
        [CpcSketch.from_bytes(a), CpcSketch.from_bytes(b)]
    ).to_bytes())
    return CpcSketch.from_bytes(blob) if blob else CpcSketch(lg_k)


def bloom_of(ds, column: str, n: int, fpp: float = 0.01, seed: int = DEFAULT_SEED) -> BloomFilter:
    proto = BloomFilter.with_accuracy(n, fpp, seed)

    def partial(col):
        h1, _ = _column_hashes(col, seed)
        bf = BloomFilter(proto.num_bits, proto.num_hashes, seed)
        return bf.insert(h1).to_bytes()

    blob = _reduce_sketches(
        ds,
        column,
        partial,
        lambda a, b: BloomFilter.from_bytes(a, seed).union(BloomFilter.from_bytes(b, seed)).to_bytes(),
    )
    return BloomFilter.from_bytes(blob, seed) if blob else proto


# ---------------------------------------------------------------------------
# deterministic (blocking-independent) whole-dataset digests
# ---------------------------------------------------------------------------
#
# The *_of reduces above fold per-BLOCK partials, so the resulting
# digest depends on how Ray split the input into blocks — fine for
# accuracy (the sketches are mergeable), but the estimate bits differ
# between runs at different parallelism. The *_det variants below are
# bit-deterministic functions of the column MULTISET: rows are hash-
# partitioned by VALUE into ``n_buckets`` deterministic buckets, each
# bucket's digest is built from its sorted values in one map_groups
# task, and the driver merges the <= n_buckets partials in ascending
# bucket order. That makes the result reproducible across runs, block
# splits and cluster sizes — the property the value-hash oracle gate
# needs — at the cost that one bucket must fit a task (size n_buckets
# to ~corpus_rows / task_budget at scale). ``*_column_*`` twins run
# the identical kernels over an in-process column for sidecar oracles
# and tests.


def _value_buckets(col, n_buckets: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic bucket id per row from the murmur of the VALUE
    (equal values always co-bucket; blocking-independent)."""
    h1, _ = _column_hashes(col, seed)
    return (h1 % U64(n_buckets)).astype(np.int64)


def _merge_bucket_blobs(rows: list[tuple[int, bytes]], merge) -> bytes | None:
    """Fold (bucket, blob) partials in ascending bucket order — the
    fixed merge order that makes the final digest deterministic."""
    acc = None
    for _, blob in sorted(rows, key=lambda r: r[0]):
        acc = blob if acc is None else merge(acc, blob)
    return acc


def sketch_by_buckets(ds, column: str, n_buckets: int, build_sorted, merge) -> bytes | None:
    """Ray path: value-hash bucket → per-bucket digest over SORTED
    values (`build_sorted(np.ndarray) -> bytes`) → ordered driver fold.
    Result is a pure function of the column multiset."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                column: batch[column],
                "bucket": pa.array(_value_buckets(batch[column], n_buckets)),
            }
        )

    def per_group(group: pa.Table) -> pa.Table:
        v = np.sort(group[column].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array([group["bucket"][0].as_py()], pa.int64()),
                "blob": pa.array([build_sorted(v)], pa.large_binary()),
            }
        )

    rows = (
        ds.select_columns([column])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_group, batch_format="pyarrow")
        .take_all()
    )
    return _merge_bucket_blobs([(r["bucket"], r["blob"]) for r in rows], merge)


def sketch_column_by_buckets(col, n_buckets: int, build_sorted, merge) -> bytes | None:
    """In-process twin of ``sketch_by_buckets`` (sidecar oracles /
    tests): identical bucketing, per-bucket sort, and merge order."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buckets = _value_buckets(col, n_buckets)
    v = col.to_numpy(zero_copy_only=False)
    rows = []
    for b in np.unique(buckets):
        rows.append((int(b), build_sorted(np.sort(v[buckets == b]))))
    return _merge_bucket_blobs(rows, merge)


def _tdigest_kernels(k: int):
    build = lambda v: TDigest.from_values(v, k=k).to_bytes()
    merge = lambda a, b: tdigest_merge([TDigest.from_bytes(a), TDigest.from_bytes(b)]).to_bytes()
    return build, merge


def tdigest_of_det(ds, column: str, k: int = 200, n_buckets: int = 64) -> TDigest:
    """Blocking-independent t-digest of a column (see section note)."""
    build, merge = _tdigest_kernels(k)
    blob = sketch_by_buckets(ds, column, n_buckets, build, merge)
    return TDigest.from_bytes(blob) if blob else TDigest(k)


def tdigest_column_det(col, k: int = 200, n_buckets: int = 64) -> TDigest:
    """In-process twin of ``tdigest_of_det`` over a pyarrow column."""
    build, merge = _tdigest_kernels(k)
    blob = sketch_column_by_buckets(col, n_buckets, build, merge)
    return TDigest.from_bytes(blob) if blob else TDigest(k)


def grouped_tdigest_det(ds, key: str, column: str, k: int = 200, n_buckets: int = 64):
    """Per-GROUP blocking-independent t-digest: rows bucket on
    (key, value-hash), each (key, bucket) group builds one digest over
    its sorted values, then each key folds its bucket digests in
    ascending bucket order — every group's digest is a pure function
    of that group's value multiset, never of blocking. Returns a
    Dataset of (key, blob). Exchanges carry (key, value) rows once and
    (key, bucket, digest) rows once (≤ n_buckets digests per group)."""
    build, merge = _tdigest_kernels(k)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: batch[key],
                column: batch[column],
                "bucket": pa.array(_value_buckets(batch[column], n_buckets)),
            }
        )

    def per_group(g: pa.Table) -> pa.Table:
        v = np.sort(g[column].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                key: g[key].take(pa.array([0])),
                "bucket": g["bucket"].take(pa.array([0])),
                "blob": pa.array([build(v)], pa.large_binary()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        blobs = g["blob"].to_pylist()
        acc = _merge_bucket_blobs(list(zip(buckets.tolist(), blobs)), merge)
        return pa.table(
            {key: g[key].take(pa.array([0])), "blob": pa.array([acc], pa.large_binary())}
        )

    return (
        ds.select_columns([key, column])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby([key, "bucket"])
        .map_groups(per_group, batch_format="pyarrow")
        .groupby(key)
        .map_groups(fold, batch_format="pyarrow")
    )


def grouped_tdigest_column_det(keys: np.ndarray, col, k: int = 200, n_buckets: int = 64) -> dict:
    """In-process twin of ``grouped_tdigest_det``: same value-hash
    bucketing, per-bucket sort, and ascending-bucket fold per key."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = {}
    for kv in sorted(set(keys.tolist())):
        mask = keys == kv
        blob = sketch_column_by_buckets(col.filter(pa.array(mask)), n_buckets, *_tdigest_kernels(k))
        out[kv] = TDigest.from_bytes(blob) if blob else TDigest(k)
    return out


# ---------------------------------------------------------------------------
# grouped aggregations (ds.groupby(key).aggregate(...))
# ---------------------------------------------------------------------------


class ThetaDistinct(AggregateFnV2):
    """Per-group approximate distinct count (exact below 2^lg_k)."""

    def __init__(self, on: str, lg_k: int = 12, seed: int = DEFAULT_SEED, alias_name: str | None = None):
        self._lg_k = lg_k
        self._seed = seed
        super().__init__(
            alias_name or f"theta_distinct({on})",
            zero_factory=lambda: None,
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        col = block.column(self.get_target_column())
        h1, _ = _column_hashes(col, self._seed)
        return ThetaSketch.from_hashes(h1 >> U64(1), lg_k=self._lg_k, seed=self._seed).to_bytes()

    def combine(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        return theta_union([ThetaSketch.from_bytes(a), ThetaSketch.from_bytes(b)]).to_bytes()

    def finalize(self, acc):
        if acc is None:
            return 0
        return int(round(ThetaSketch.from_bytes(acc).estimate()))


class HllDistinct(AggregateFnV2):
    """Per-group approximate distinct count via HLL.

    Partials start in the sparse coupon phase (the reference's
    in-memory LIST/SET modes, ``hll/list.rs:59-71`` /
    ``hash_set.rs:60-89``): a group seen in one block ships ~4 bytes
    per distinct coupon through the shuffle instead of 2^lg_k register
    bytes, so a groupby with millions of tiny groups stays cheap.
    Sketches densify automatically past the reference's SET→HLL
    promotion point (3k/32 coupons) during update or union."""

    def __init__(self, on: str, lg_k: int = 12, seed: int = DEFAULT_SEED, alias_name: str | None = None):
        self._lg_k = lg_k
        self._seed = seed
        super().__init__(
            alias_name or f"hll_distinct({on})",
            zero_factory=lambda: None,
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        from raydedup.sketches.hll import coupons_from_hashes

        col = block.column(self.get_target_column())
        slot, value = coupons_from_hashes(*_column_hashes(col, self._seed))
        return HllSketch.sparse(self._lg_k).update_coupons(slot, value).to_bytes()

    def combine(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        return hll_union([HllSketch.from_bytes(a), HllSketch.from_bytes(b)]).to_bytes()

    def finalize(self, acc):
        if acc is None:
            return 0
        return int(round(HllSketch.from_bytes(acc).estimate()))


class TDigestQuantile(AggregateFnV2):
    """Per-group quantile via mergeable t-digest."""

    def __init__(self, on: str, q: float = 0.5, k: int = 200, alias_name: str | None = None):
        self._q = q
        self._k = k
        super().__init__(
            alias_name or f"tdigest_p{int(q * 100)}({on})",
            zero_factory=lambda: None,
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> bytes:
        col = block.column(self.get_target_column())
        return TDigest.from_values(col.to_numpy(zero_copy_only=False), k=self._k).to_bytes()

    def combine(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        return tdigest_merge([TDigest.from_bytes(a), TDigest.from_bytes(b)]).to_bytes()

    def finalize(self, acc):
        if acc is None:
            return float("nan")
        return TDigest.from_bytes(acc).quantile(self._q)
