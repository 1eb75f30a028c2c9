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
    seed_col: str | None = None,
):
    """``nodes`` (one row per node id) + ``edges`` (src, dst; a
    multigraph — parallel edges contribute twice) → Dataset of
    (node_col, rank_u) int64 micro-unit ranks after ``iterations``
    rounds. base = (damp_den−damp_num)·r0 // damp_den.

    ``seed_col`` (optional 0/1 int column on ``nodes``) makes this
    PERSONALIZED PageRank: initial mass and the teleport term apply
    only to seed nodes (``r0·seed`` / ``base·seed``). The uniform case
    is literally all-seeds, so the recurrence is unchanged."""
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
                "w2": pa.array(np.zeros(len(src), np.int64)),
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
        if seed_col is None:
            sd = np.ones(len(n), np.int64)
        else:
            sd = batch[seed_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(n, n_buckets)),
                "k": pa.array(n),
                "v": pa.array(np.zeros(len(n), np.int64)),
                "w": pa.array(np.zeros(len(n), np.int64)),
                "w2": pa.array(sd),
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
                "w2": pa.array(np.zeros(len(n), np.int64)),
                "side": pa.array(np.ones(len(n), np.int64)),
            }
        )

    def init_ranks(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        w2 = g["w2"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        nodes_k = k[side == 0]
        sd = w2[side == 0]
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
                "r": pa.array(r0 * sd),
                "outdeg": pa.array(outdeg.astype(np.int64)),
                "sd": pa.array(sd),
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
                "w2": pa.array(batch["sd"].to_numpy(zero_copy_only=False)),
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
                "w2": pa.array(np.zeros(len(k), np.int64)),
                "side": pa.array(np.ones(len(k), np.int64)),
            }
        )

    def update_kernel(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        w2 = g["w2"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        is_node = side == 0
        nk, nw, nsd = k[is_node], w[is_node], w2[is_node]
        ik, iv = k[~is_node], v[~is_node]
        inflow = np.zeros(len(nk), np.int64)
        if len(ik):
            if len(nk) == 0:
                # a bucket with inflow rows but zero node rows would
                # index nk_s[-1] on an empty array below (round-3
                # advice) — surface the intended diagnostic instead
                raise ValueError("pagerank_int: edge dst not present in nodes")
            order = np.argsort(nk, kind="stable")
            nk_s = nk[order]
            pos = np.minimum(np.searchsorted(nk_s, ik), len(nk_s) - 1)
            if (nk_s[pos] != ik).any():
                raise ValueError("pagerank_int: edge dst not present in nodes")
            acc = np.zeros(len(nk), np.int64)
            np.add.at(acc, order[pos], iv)
            inflow = acc
        r_new = base * nsd + (damp_num * inflow) // damp_den
        return pa.table(
            {
                node_col: pa.array(nk, pa.int64()),
                "r": pa.array(r_new.astype(np.int64)),
                "outdeg": pa.array(nw, pa.int64()),
                "sd": pa.array(nsd, pa.int64()),
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


def count_closed_triangles(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 64,
) -> int:
    """Count directed closed 3-walks (a→b, b→c, c→a; multigraph
    multiplicities multiply, self-loops and rotations count as SQL's
    triple self-join counts them). Node ids must fit 31 bits — the
    closing-edge match packs (x, y) into one exact int64 key.

    Scale design (100 TB lens): the standard two-round distributed
    plan. Round 1 cogroups edges-by-dst with edges-by-src (one bucketed
    exchange of (bucket, k, v) int64 rows) and emits length-2 paths via
    a per-key vectorized cross product; round 2 cogroups the paths with
    the edge set on the packed closing-edge key, BOTH sides map-side
    pre-aggregated to (key, count), so the exchange carries distinct
    keys, not walks. Hot vertices make round 1 quadratic in degree —
    the standard remedy (splitting high-degree vertices / ordering by
    degree) composes on top; documented, not implemented."""
    P32 = np.int64(1) << np.int64(32)

    def in_rows(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(dst, n_buckets)),
                "k": pa.array(dst),
                "v": pa.array(src),
                "side": pa.array(np.zeros(len(src), np.int64)),
            }
        )

    def out_rows(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(src, n_buckets)),
                "k": pa.array(src),
                "v": pa.array(dst),
                "side": pa.array(np.ones(len(src), np.int64)),
            }
        )

    def paths_kernel(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        ins, outs = side == 0, side == 1
        k0, v0 = k[ins], v[ins]  # b ← a rows keyed by b
        k1, v1 = k[outs], v[outs]  # b → c rows keyed by b
        empty = pa.table({"pk": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        if len(k0) == 0 or len(k1) == 0:
            return empty
        o0 = np.argsort(k0, kind="stable")
        o1 = np.argsort(k1, kind="stable")
        k0, v0, k1, v1 = k0[o0], v0[o0], k1[o1], v1[o1]
        ku = np.intersect1d(k0, k1)
        if len(ku) == 0:
            return empty
        s0 = np.searchsorted(k0, ku)
        c0 = np.searchsorted(k0, ku, side="right") - s0
        s1 = np.searchsorted(k1, ku)
        c1 = np.searchsorted(k1, ku, side="right") - s1
        ppk = c0 * c1  # paths per shared key: per-key cross product
        cum = np.cumsum(ppk)
        total = int(cum[-1])
        t = np.arange(total, dtype=np.int64)
        key_id = np.searchsorted(cum, t, side="right")
        within = t - (cum - ppk)[key_id]
        a = v0[s0[key_id] + within // c1[key_id]]
        c = v1[s1[key_id] + within % c1[key_id]]
        pk = c * P32 + a  # closing edge needed: c → a
        # map-side pre-aggregate: ship (key, count), not walks
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {"pk": pa.array(pku, pa.int64()), "cnt": pa.array(cnt.astype(np.int64))}
        )

    def path_close_rows(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(pk, n_buckets)),
                "k": pa.array(pk),
                "v": pa.array(batch["cnt"].to_numpy(zero_copy_only=False)),
                "side": pa.array(np.zeros(len(pk), np.int64)),
            }
        )

    def edge_close_rows(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = src * P32 + dst
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(pku, n_buckets)),
                "k": pa.array(pku),
                "v": pa.array(cnt.astype(np.int64)),
                "side": pa.array(np.ones(len(pku), np.int64)),
            }
        )

    def close_kernel(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        pk, pc = k[side == 0], v[side == 0]
        ek, ec = k[side == 1], v[side == 1]
        if len(pk) == 0 or len(ek) == 0:
            return pa.table({"partial": pa.array([0], pa.int64())})
        o = np.argsort(ek, kind="stable")
        ek, ec = ek[o], ec[o]
        # edge keys are distinct within a block partial but may repeat
        # across blocks: segment-sum the counts per distinct key
        new = np.ones(len(ek), bool)
        new[1:] = ek[1:] != ek[:-1]
        seg = np.cumsum(new) - 1
        eku = ek[new]
        ecs = np.bincount(seg, weights=ec).astype(np.int64)
        pos = np.minimum(np.searchsorted(eku, pk), len(eku) - 1)
        hit = eku[pos] == pk
        total = int((pc[hit] * ecs[pos[hit]]).sum())
        return pa.table({"partial": pa.array([total], pa.int64())})

    paths = (
        edges.map_batches(in_rows, batch_format="pyarrow")
        .union(edges.map_batches(out_rows, batch_format="pyarrow"))
        .groupby("_gb")
        .map_groups(paths_kernel, batch_format="pyarrow")
    )
    partials = (
        paths.map_batches(path_close_rows, batch_format="pyarrow")
        .union(edges.map_batches(edge_close_rows, batch_format="pyarrow"))
        .groupby("_gb")
        .map_groups(close_kernel, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum

    res = partials.aggregate(Sum("partial", alias_name="triangles"))
    return int(res["triangles"])


def co_citation_counts(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    n_buckets: int = 64,
):
    """Pairs of distinct sources citing >= ``min_common`` common
    destinations (structural similarity via shared out-neighbors).
    Node ids must fit 31 bits — pairs travel as one packed int64 key.

    Scale design (100 TB lens): stage 1 groups edges by dst (bucketed
    int64 rows), uniques (dst, src) so multigraph edges count once,
    and emits per-dst source pairs map-side pre-aggregated to
    (pair-key, count); stage 2 is a pairs-only bucketed sum + filter.
    A hub destination with d citers emits d²/2 pairs — same hot-spot
    class as triangle round 1 (cap or split hubs when that bites)."""
    P32 = np.int64(1) << np.int64(32)

    def by_dst(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(dst, n_buckets)),
                "k": pa.array(dst),
                "v": pa.array(src),
            }
        )

    def pair_kernel(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        kv = np.unique(k * P32 + v)  # distinct (dst, src)
        k, v = kv // P32, kv % P32
        new = np.ones(len(k), bool)
        new[1:] = k[1:] != k[:-1]
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.zeros(len(run_len), np.int64)
        np.cumsum(run_len[:-1], out=run_start[1:])
        out = []
        for s in np.unique(run_len[run_len >= 2]):
            starts = run_start[run_len == s]
            members = starts[:, None] + np.arange(s)[None, :]
            ia, ib = np.triu_indices(int(s), k=1)
            a = v[members[:, ia].reshape(-1)]  # v ascending per run → a < b
            b = v[members[:, ib].reshape(-1)]
            out.append(a * P32 + b)
        if not out:
            return pa.table(
                {"pk": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        pku, cnt = np.unique(np.concatenate(out), return_counts=True)
        return pa.table(
            {"pk": pa.array(pku, pa.int64()), "cnt": pa.array(cnt.astype(np.int64))}
        )

    def pair_bucket(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(pk, n_buckets)),
                "pk": batch["pk"],
                "cnt": batch["cnt"],
            }
        )

    def final_kernel(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        o = np.argsort(pk, kind="stable")
        pk, cnt = pk[o], cnt[o]
        new = np.ones(len(pk), bool)
        new[1:] = pk[1:] != pk[:-1]
        seg = np.cumsum(new) - 1
        pku = pk[new]
        tot = np.bincount(seg, weights=cnt).astype(np.int64)
        keep = tot >= min_common
        pku, tot = pku[keep], tot[keep]
        return pa.table(
            {
                "doc_a": pa.array(pku // P32, pa.int64()),
                "doc_b": pa.array(pku % P32, pa.int64()),
                "n_common": pa.array(tot),
            }
        )

    return (
        edges.map_batches(by_dst, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(pair_kernel, batch_format="pyarrow")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(final_kernel, batch_format="pyarrow")
    )
