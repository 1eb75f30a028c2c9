"""Iterative graph analytics on Ray Data: integer-arithmetic PageRank.

The iteration is defined ENTIRELY in int64 arithmetic so the result is
bit-deterministic under any blocking / shuffle / merge order (float
PageRank sums are merge-order-dependent and can never be value-oracled):

    r_0(v)   = r0                                   (micro-units)
    contrib  = r_t(u) // outdeg(u)  per edge u→v    (integer division)
    r_{t+1}(v) = base + (damp_num * Σ contrib) // damp_den

With r0 = 1_000_000, damp 85/100, base = 150_000 this is the classic
d=0.85 PageRank up to integer truncation (≤1 micro-unit per term).
Dangling mass (outdeg 0) is dropped, as in the "no redistribution"
variant — the SQL oracle mirrors the same rule.

Scale design (100 TB lens):
- One iteration = TWO bucketed exchanges of narrow int64 rows
  ((bucket, k, v, w) — never payloads): contribution routing on
  hash(src) and inflow aggregation on hash(dst). Ray's hash join is
  avoided deliberately (schema-less empty-partition crash class —
  see ops/collocations.py); the union + groupby(bucket) cogroup is
  the repo's documented join shape.
- Map-side pre-aggregation: each bucket kernel emits per-dst partial
  SUMS (int64 pandas groupby), so the second exchange carries at most
  one row per (bucket, dst), not one per edge.
- Ranks are materialized per iteration: the plan stays shallow, and
  each iteration is a natural checkpoint boundary for resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

U64 = np.uint64


def _bucket_of(vals: np.ndarray, n_buckets: int) -> np.ndarray:
    from raydedup.sketches.hashing import hash_u64_column

    h1, _ = hash_u64_column(pa.chunked_array([pa.array(vals, pa.int64())]))
    return (h1 % U64(n_buckets)).astype(np.int64)


def pagerank_int(
    nodes,
    edges,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    r0: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    n_buckets: int = 64,
):
    """``nodes`` (one row per node id) + ``edges`` (src, dst; a
    multigraph — parallel edges contribute twice) → Dataset of
    (node_col, rank_u) int64 micro-unit ranks after ``iterations``
    rounds. base = (damp_den−damp_num)·r0 // damp_den."""
    base = (damp_den - damp_num) * r0 // damp_den

    # --- one-time: outdeg per node, edges tagged by src bucket -------
    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(src, n_buckets)),
                "k": pa.array(src),
                "v": pa.array(dst),
                "w": pa.array(np.zeros(len(src), np.int64)),
                "side": pa.array(np.ones(len(src), np.int64)),
            }
        )

    def outdeg_partial(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(src, sort=False)
        return pa.table(
            {
                node_col: pa.array(uniq, pa.int64()),
                "_d": pa.array(np.bincount(codes, minlength=len(uniq)).astype(np.int64)),
            }
        )

    edges_tagged = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()
    deg = (
        edges.map_batches(outdeg_partial, batch_format="pyarrow")
        .groupby(node_col)
        .aggregate(Sum("_d", alias_name="_d"))
    )

    # attach outdeg to the node list (missing → 0) via the same cogroup
    def node_rows(batch: pa.Table) -> pa.Table:
        n = batch[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(n, n_buckets)),
                "k": pa.array(n),
                "v": pa.array(np.zeros(len(n), np.int64)),
                "w": pa.array(np.zeros(len(n), np.int64)),
                "side": pa.array(np.zeros(len(n), np.int64)),
            }
        )

    def deg_rows(batch: pa.Table) -> pa.Table:
        n = batch[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["_d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(n, n_buckets)),
                "k": pa.array(n),
                "v": pa.array(np.zeros(len(n), np.int64)),
                "w": pa.array(d),
                "side": pa.array(np.ones(len(n), np.int64)),
            }
        )

    def init_ranks(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        nodes_k = k[side == 0]
        dk, dw = k[side == 1], w[side == 1]
        order = np.argsort(dk, kind="stable")
        dk, dw = dk[order], dw[order]
        if len(dk) == 0:
            outdeg = np.zeros(len(nodes_k), np.int64)
        else:
            pos = np.minimum(np.searchsorted(dk, nodes_k), len(dk) - 1)
            have = dk[pos] == nodes_k
            outdeg = np.where(have, dw[pos], 0)
        return pa.table(
            {
                node_col: pa.array(nodes_k, pa.int64()),
                "r": pa.array(np.full(len(nodes_k), r0, np.int64)),
                "outdeg": pa.array(outdeg.astype(np.int64)),
            }
        )

    ranks = (
        nodes.map_batches(node_rows, batch_format="pyarrow")
        .union(deg.map_batches(deg_rows, batch_format="pyarrow"))
        .groupby("_gb")
        .map_groups(init_ranks, batch_format="pyarrow")
        .materialize()
    )

    # --- iteration kernels -------------------------------------------
    def rank_rows(batch: pa.Table) -> pa.Table:
        n = batch[node_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(n, n_buckets)),
                "k": pa.array(n),
                "v": pa.array(batch["r"].to_numpy(zero_copy_only=False)),
                "w": pa.array(batch["outdeg"].to_numpy(zero_copy_only=False)),
                "side": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    def contrib_kernel(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        is_rank = side == 0
        rn, rv, rw = k[is_rank], v[is_rank], w[is_rank]
        es, ed = k[~is_rank], v[~is_rank]
        if len(es) == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        if len(rn) == 0:
            # edges bucket on hash(src), ranks on hash(node): a bucket
            # holding edges but no rank rows means every src is unknown
            raise ValueError("pagerank_int: edge src not present in nodes")
        order = np.argsort(rn, kind="stable")
        rn, rv, rw = rn[order], rv[order], rw[order]
        pos = np.minimum(np.searchsorted(rn, es), len(rn) - 1)
        if (rn[pos] != es).any():
            raise ValueError("pagerank_int: edge src not present in nodes")
        contrib = rv[pos] // np.maximum(rw[pos], 1)
        codes, uniq = pd.factorize(ed, sort=False)
        sums = (
            pd.DataFrame({"c": codes, "s": contrib}).groupby("c", sort=False)["s"].sum()
        )
        return pa.table(
            {
                "k": pa.array(uniq[sums.index.to_numpy()], pa.int64()),
                "s": pa.array(sums.to_numpy().astype(np.int64)),
            }
        )

    def inflow_rows(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(k, n_buckets)),
                "k": pa.array(k),
                "v": pa.array(batch["s"].to_numpy(zero_copy_only=False)),
                "w": pa.array(np.zeros(len(k), np.int64)),
                "side": pa.array(np.ones(len(k), np.int64)),
            }
        )

    def update_kernel(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        is_node = side == 0
        nk, nw = k[is_node], w[is_node]
        ik, iv = k[~is_node], v[~is_node]
        inflow = np.zeros(len(nk), np.int64)
        if len(ik):
            order = np.argsort(nk, kind="stable")
            nk_s = nk[order]
            pos = np.minimum(np.searchsorted(nk_s, ik), len(nk_s) - 1)
            if (nk_s[pos] != ik).any():
                raise ValueError("pagerank_int: edge dst not present in nodes")
            acc = np.zeros(len(nk), np.int64)
            np.add.at(acc, order[pos], iv)
            inflow = acc
        r_new = base + (damp_num * inflow) // damp_den
        return pa.table(
            {
                node_col: pa.array(nk, pa.int64()),
                "r": pa.array(r_new.astype(np.int64)),
                "outdeg": pa.array(nw, pa.int64()),
            }
        )

    for _ in range(iterations):
        contribs = (
            ranks.map_batches(rank_rows, batch_format="pyarrow")
            .union(edges_tagged)
            .groupby("_gb")
            .map_groups(contrib_kernel, batch_format="pyarrow")
        )
        # repartition BEFORE materializing: union sums block counts and
        # groupby preserves them, so without a coalesce the ranks block
        # count doubles per iteration (b_{k+1} ≈ 2 b_k + edges_blocks)
        # and per-iteration task-launch overhead grows exponentially
        # (measured 0.9→2→3→7→16→52 s over 5 rounds at sf0.001).
        ranks = (
            ranks.map_batches(rank_rows, batch_format="pyarrow")
            .union(contribs.map_batches(inflow_rows, batch_format="pyarrow"))
            .groupby("_gb")
            .map_groups(update_kernel, batch_format="pyarrow")
            .repartition(n_buckets)
            .materialize()
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch[node_col], "rank_u": batch["r"]})

    return ranks.map_batches(finish, batch_format="pyarrow")
