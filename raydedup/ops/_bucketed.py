"""Shared plumbing for coarse-bucketed ``map_groups`` kernels.

Every windowed / sessionized / pair-dedup operator in this package uses
the same scale shape: hash a key column into ``n_buckets`` coarse
buckets, shuffle once on the bucket id, and run ONE vectorized kernel
per bucket (never a group per key). Results are bucket-count-invariant
— keys never split across buckets — so the bucket count is purely a
memory/parallelism knob. This module centralizes:

- ``adaptive_buckets`` / ``resolve_buckets``: derive the bucket count
  from the input's byte size (the ``ops/substring.py::_auto_buckets``
  precedent) so a 100x corpus picks 100x buckets without hand-tuning,
  with the historical default (64) as the floor.
- ``hash_bucket_appender``: the standard murmur3 bucket-column stage.
- ``factorize`` / ``column_np`` / ``ts_us`` / ``key_order``: zero-copy
  Arrow group-kernel plumbing replacing the pandas conversions that
  ``map_groups(..., batch_format="pandas")`` forced (measured ~9%
  stage tax on the candidate stage, round 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_FLOOR = 64
_TARGET_GROUP_BYTES = 256 << 20


def adaptive_buckets(
    ds,
    *,
    blowup: float = 1.0,
    target_group_bytes: int = _TARGET_GROUP_BYTES,
    floor: int = DEFAULT_FLOOR,
    cap: int = 1 << 20,
) -> int:
    """Bucket count sized so one bucket's share of the exchange
    (~``blowup`` bytes emitted per input byte) fits a worker's heap.

    Uses ONLY the plan's inferred metadata (the no-execution branch of
    ``Dataset.size_bytes()``): parquet-backed lineage answers from file
    metadata in ~ms; transformed lineage where Ray cannot infer a size
    returns None and the floor is used — matching the pre-round-5
    fixed default. Never calls ``ds.size_bytes()`` itself, which
    EXECUTES un-inferable plans (measured: ~1 s mid-pipeline at sf0.1,
    i.e. a full extra materialization at scale).
    """
    try:
        sz = ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        sz = None
    if not sz or sz <= 0:
        return floor
    return int(np.clip(int(sz * blowup) // target_group_bytes + 1, floor, cap))


def resolve_buckets(ds, n_buckets: int | None, **kwargs) -> int:
    """``None`` → byte-adaptive; an explicit int passes through."""
    if n_buckets is None:
        return adaptive_buckets(ds, **kwargs)
    return int(n_buckets)


def hash_bucket_appender(col_name: str, n_buckets: int, out_name: str):
    """map_batches fn appending ``hash(col) % n_buckets`` as int64."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch[col_name])
        return batch.append_column(
            out_name, pa.array((h1 % np.uint64(n_buckets)).astype(np.int64))
        )

    return add_bucket


def column_np(col) -> np.ndarray:
    """Arrow column → numpy (zero-copy where the type allows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def factorize(col) -> np.ndarray:
    """int64 grouping codes for an Arrow column (first-seen order, the
    ``pd.factorize(..., sort=False)`` analog, via dictionary encode)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)


def ts_us(col) -> np.ndarray:
    """Timestamp column → int64 microseconds regardless of source unit
    (the ns-vs-us hazard fixed in round 4 stays normalized here)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)


def key_order(g: pa.Table, key: str, order_cols: list[str]):
    """lexsort a group table by (key, *order_cols).

    Returns ``(order, codes_sorted, new)`` where ``order`` indexes the
    sorted view, ``codes_sorted`` are per-key grouping codes in that
    order, and ``new[i]`` marks each key's first sorted row.
    """
    codes = factorize(g[key])
    arrays = [column_np(g[c]) for c in order_cols]
    order = np.lexsort(tuple(reversed(arrays)) + (codes,))
    c = codes[order]
    new = np.ones(len(c), dtype=bool)
    if len(c) > 1:
        new[1:] = c[1:] != c[:-1]
    return order, c, new
