"""SemDeDup-style semantic dedup: deterministic distributed spherical
k-means over an embedding column + within-cluster cosine dedup.

Published method (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): embed,
cluster the embeddings with k-means, and inside each cluster drop all
but one point of every group of pairwise-high-cosine points, keeping
the member FARTHEST from the cluster centroid. The reference repo has
no semantic operator; this is an engine addition in the same family as
the MinHash-LSH near-dup pipeline (SURVEY.md §2.10).

Scale + determinism design:

- **Lloyd iterations are Dataset aggregates.** Each iteration
  broadcasts the (k, dim) centroid matrix in the task closure (tiny),
  every block computes per-cluster FIXED-POINT ``int64`` partial sums
  (unit-normalized coords quantized once per row at ``2^20``), and the
  partials tree-combine inside Ray Data's aggregate operator
  (``aggregates.block_reduce``) — the driver receives ONE (sums,
  counts) image per iteration. Integer addition is associative and
  commutative, so the fitted centroids are a pure function of the
  point MULTISET — bit-identical across any blocking — which is what
  lets the single-process sidecar oracle check the distributed run
  value-exact, the same trick as ``aggregates.tdigest_of_det``.
  Quantization error only perturbs centroids (every point still
  counts exactly once); assignments use full-precision coords.
- **Seeding is a mergeable min-k**: the k rows with the smallest
  ``fmix64(id)`` become the initial centroids (blocking-independent
  for the same reason; ties on the mix break by id).
- **The within-cluster pass is ONE ``groupby(cluster).map_groups``**
  whose kernel orders rows by (sim-to-centroid asc, id asc) and marks
  row j a duplicate when ANY earlier row i<j has cosine >= tau — the
  paper's upper-triangular-max rule, which keeps the lowest-centroid-
  similarity member of each duplicate set. The matmul is chunked over
  columns (O(m·c) memory for O(m²) work). Partitioning assumption
  (documented per the brief): one cluster fits one task — k must grow
  with n (the paper uses k=50k at LAION scale) to bound m≈n/k, and the
  n_iters passes stream the Dataset, never materializing it.

Int64 headroom: |quantized coord| <= 2^20, so a cluster overflows only
past 2^43 rows — far beyond any single cluster the k-scaling rule
allows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.ops.ann import _emb_matrix, _normalize
from raydedup.sketches.hashing import fmix64

_SCALE = np.int64(1) << np.int64(20)


# ---------------------------------------------------------------------------
# shared kernels (used identically by the distributed path and the
# single-process sidecar twin, so the oracle comparison is value-exact)
# ---------------------------------------------------------------------------


def _id_mix(ids: np.ndarray) -> np.ndarray:
    return fmix64(ids.astype(np.int64).view(np.uint64))


def _quantize(xn: np.ndarray) -> np.ndarray:
    return np.rint(xn * np.float64(_SCALE)).astype(np.int64)


def _assign(xn: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Spherical assignment: argmax cosine; ties -> lowest cluster."""
    return np.argmax(xn @ centroids.T, axis=1).astype(np.int64)


def _partial_sums(xn: np.ndarray, assign: np.ndarray, k: int):
    sums = np.zeros((k, xn.shape[1]), dtype=np.int64)
    np.add.at(sums, assign, _quantize(xn))
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return sums, counts


def _update_centroids(sums: np.ndarray, counts: np.ndarray, prev: np.ndarray) -> np.ndarray:
    c = prev.copy()
    live = counts > 0
    c[live] = sums[live].astype(np.float64) / (
        np.float64(_SCALE) * counts[live, None].astype(np.float64)
    )
    return _normalize(c)


def _seed_topk(ids: np.ndarray, xn: np.ndarray, k: int):
    """k rows with the smallest (fmix64(id), id) — a mergeable min-k."""
    mix = _id_mix(ids)
    order = np.lexsort((ids, mix))[: min(k, len(ids))]
    return mix[order], ids[order], xn[order]


def _merge_seeds(a, b, k: int):
    mix = np.concatenate([a[0], b[0]])
    ids = np.concatenate([a[1], b[1]])
    xs = np.concatenate([a[2], b[2]], axis=0)
    order = np.lexsort((ids, mix))[: min(k, len(ids))]
    return mix[order], ids[order], xs[order]


def cluster_keep_flags(
    xn: np.ndarray, ids: np.ndarray, centroid: np.ndarray, tau: float, col_chunk: int = 4096
):
    """(keep, sim_centroid) for one cluster, SemDeDup keep-rule.

    Rows ordered by (sim-to-centroid asc, id asc); row j is a dup when
    max_{i<j} cos(i, j) >= tau, so each duplicate set keeps exactly its
    first row in that order — the member farthest from the centroid.
    """
    sims = xn @ centroid
    order = np.lexsort((ids, sims))
    xs = xn[order]
    m = len(ids)
    dup_sorted = np.zeros(m, dtype=bool)
    row_idx = np.arange(m)
    for start in range(0, m, col_chunk):
        stop = min(start + col_chunk, m)
        scores = xs @ xs[start:stop].T  # (m, c)
        earlier = row_idx[:, None] < np.arange(start, stop)[None, :]
        dup_sorted[start:stop] = ((scores >= tau) & earlier).any(axis=0)
    dup = np.zeros(m, dtype=bool)
    dup[order] = dup_sorted
    return ~dup, sims


# ---------------------------------------------------------------------------
# distributed path
# ---------------------------------------------------------------------------


def kmeans_fit(
    ds,
    k: int = 8,
    n_iters: int = 10,
    id_column: str = "vec_id",
    column: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed spherical k-means; returns unit (k, dim)
    float64 centroids, a pure function of the row multiset (any blocking)."""
    from raydedup.sketches.aggregates import block_reduce

    # n_iters+1 aggregate passes re-read this projection; pinning the
    # two needed columns in the object store (spillable) beats
    # re-decoding parquet every Lloyd iteration.
    slim = ds.select_columns([id_column, column]).materialize()

    def seed_partial(block: pa.Table):
        ids = block[id_column].to_numpy(zero_copy_only=False)
        return _seed_topk(ids, _normalize(_emb_matrix(block, column)), k)

    seeds = slim.aggregate(block_reduce(seed_partial, lambda a, b: _merge_seeds(a, b, k)))["acc"]
    if seeds is None:
        raise ValueError("kmeans_fit: empty dataset")
    centroids = _normalize(seeds[2])
    k_eff = len(centroids)  # n < k leaves fewer seeds than requested

    for _ in range(n_iters):
        c = centroids  # rebind so each closure pins its iteration's matrix

        def sum_partial(block: pa.Table, c=c):
            xn = _normalize(_emb_matrix(block, column))
            return _partial_sums(xn, _assign(xn, c), k_eff)

        acc = slim.aggregate(
            block_reduce(sum_partial, lambda a, b: (a[0] + b[0], a[1] + b[1]))
        )["acc"]
        centroids = _update_centroids(acc[0], acc[1], centroids)
    return centroids


def assign_clusters(
    ds, centroids: np.ndarray, id_column: str = "vec_id", column: str = "embedding"
):
    """Append a ``cluster`` column (argmax-cosine against ``centroids``)."""

    def tag(batch: pa.Table) -> pa.Table:
        xn = _normalize(_emb_matrix(batch, column))
        return batch.append_column("cluster", pa.array(_assign(xn, centroids), pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def semantic_dedup(
    ds,
    k: int = 8,
    tau: float = 0.45,
    n_iters: int = 10,
    id_column: str = "vec_id",
    column: str = "embedding",
):
    """SemDeDup over an embeddings Dataset.

    Returns a Dataset (id, cluster, sim_centroid, keep): ``keep`` is
    False for every point the paper's within-cluster rule drops.
    """
    centroids = kmeans_fit(ds, k=k, n_iters=n_iters, id_column=id_column, column=column)
    tagged = assign_clusters(
        ds.select_columns([id_column, column]), centroids, id_column, column
    )

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        xn = _normalize(_emb_matrix(g, column))
        cl = int(g["cluster"][0].as_py())
        keep, sims = cluster_keep_flags(xn, ids, centroids[cl], tau)
        return pa.table(
            {
                id_column: g[id_column],
                "cluster": pa.array(np.full(len(g), cl, dtype=np.int64)),
                "sim_centroid": pa.array(sims),
                "keep": pa.array(keep),
            }
        )

    return tagged.groupby("cluster").map_groups(dedup_cluster, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# single-process sidecar twin (oracle ground truth; no Ray)
# ---------------------------------------------------------------------------


def semantic_dedup_local(
    ids: np.ndarray, emb: np.ndarray, k: int = 8, tau: float = 0.45, n_iters: int = 10
) -> pd.DataFrame:
    """Same kernels, one process — bit-identical to the distributed run."""
    xn = _normalize(emb)
    centroids = _normalize(_seed_topk(ids, xn, k)[2])
    k_eff = len(centroids)
    for _ in range(n_iters):
        sums, counts = _partial_sums(xn, _assign(xn, centroids), k_eff)
        centroids = _update_centroids(sums, counts, centroids)
    assign = _assign(xn, centroids)
    out = []
    for cl in np.unique(assign):
        sel = assign == cl
        keep, sims = cluster_keep_flags(xn[sel], ids[sel], centroids[cl], tau)
        out.append(
            pd.DataFrame(
                {"vec_id": ids[sel], "cluster": int(cl), "sim_centroid": sims, "keep": keep}
            )
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
