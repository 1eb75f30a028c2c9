"""Candidate re-ranking: batched model inference over ANN results.

The retrieve-then-rerank shape: a cheap first stage (``ops/ann.py``
top-k cosine) nominates candidates, a heavier "cross-encoder" rescores
each (query, doc) pair, and the final order is by the new score. The
plumbing is the real deliverable — this container has no model
runtimes, so the model is a deterministic stand-in (a seeded bilinear
form ``score = qᵀ W d``), clearly marked, with the Ray-side shape
exactly what a real ONNX/torch scorer needs:

- **model load once per actor**: ``CrossScorerStage.__init__`` builds
  W (the expensive step for a real model) and pins the query matrix;
  ``__call__`` only does batched math;
- **doc vectors attach by hash join**: candidates (query_id, vec_id)
  join the embeddings table on vec_id — embeddings ride as fixed-size
  binary (Arrow joins reject list payloads), so the big side shuffles
  once and the scorer reads flat buffers;
- **scores are batched**: one einsum per batch, never per pair.

The scoring kernel (``score_pairs``) is a pure function shared by the
distributed stage and the in-process oracle twin, so the sidecar check
compares plumbing, not arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def cross_scorer_weights(dim: int, seed: int = 9001) -> np.ndarray:
    """The fake model: a seeded dense bilinear form (stands in for
    real cross-encoder weights; deterministic, no model file)."""
    rng = np.random.RandomState(seed)
    return (rng.standard_normal((dim, dim)) / np.sqrt(dim)).astype(np.float64)


def score_pairs(q: np.ndarray, d: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Batched ``score[i] = q[i]ᵀ W d[i]`` in f64 — ONE einsum."""
    return np.einsum(
        "ij,jk,ik->i", q.astype(np.float64), w, d.astype(np.float64), optimize=True
    )


class CrossScorerStage:
    """Actor-pool scorer: model + query matrix built once per actor."""

    def __init__(self, queries_ref, dim: int, seed: int = 9001):
        import ray

        self.q = (
            ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        )
        self.w = cross_scorer_weights(dim, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch["embpk"].combine_chunks()
        width = arr.type.byte_width
        dim = width // 4
        d = np.frombuffer(
            arr.buffers()[1], dtype=np.float32, count=len(arr) * dim, offset=arr.offset * width
        ).reshape(len(arr), dim)
        qidx = batch["query_id"].to_numpy(zero_copy_only=False)
        s = score_pairs(self.q[qidx], d, self.w)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "rerank_score": pa.array(np.round(s, 6)),
            }
        )


def rerank_candidates(
    cands,
    emb_ds,
    queries: np.ndarray,
    seed: int = 9001,
    id_column: str = "vec_id",
    column: str = "embedding",
    num_join_partitions: int = 4,
):
    """cands (query_id, vec_id) → (query_id, vec_id, rerank_score,
    rerank) with ``rerank`` the 1-based order by (score desc, vec_id)
    per query. queries[i] must be the vector for query_id == i."""
    import ray

    from raydedup.ops.ann import _emb_matrix

    q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
    dim = q.shape[1]
    qref = ray.put(q)

    def pack_emb(batch: pa.Table) -> pa.Table:
        m = np.ascontiguousarray(_emb_matrix(batch, column), dtype=np.float32)
        packed = pa.Array.from_buffers(
            pa.binary(m.shape[1] * 4), len(batch), [None, pa.py_buffer(m.tobytes())]
        )
        return pa.table({id_column: batch[id_column], "embpk": packed})

    joined = (
        emb_ds.select_columns([id_column, column])
        .map_batches(pack_emb, batch_format="pyarrow")
        .join(
            cands,
            join_type="inner",
            num_partitions=num_join_partitions,
            on=(id_column,),
        )
    )
    scored = joined.map_batches(
        CrossScorerStage,
        fn_constructor_args=(qref, dim, seed),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def rank_group(g: pa.Table) -> pa.Table:
        sc = g["rerank_score"].to_numpy(zero_copy_only=False)
        vid = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -sc))
        out = g.take(pa.array(order))
        return out.append_column(
            "rerank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return scored.groupby("query_id").map_groups(rank_group, batch_format="pyarrow")
