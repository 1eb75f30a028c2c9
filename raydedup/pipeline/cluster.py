"""Connected-components clustering of verified duplicate pairs.

Union-find with path halving + union-by-root-min runs on the driver
over the *edge list only* (verified dup pairs — orders of magnitude
smaller than the corpus; SURVEY.md §7.6: the driver-memory edge list is
the 80% path). Cluster ids are deterministic: every member maps to the
lexicographically smallest url in its component, so re-runs and
re-partitions produce identical assignments.

Assignment is then joined back over the corpus as a broadcast map
(``ray.put`` once, read once per actor) — docs not in any cluster keep
their own url as cluster id, so the output covers every input row.

Scale fallback (documented, auto-selected by ``max_driver_edges``):
iterative min-label propagation over the edge Dataset — each round is
``groupby(node).aggregate(min(label))`` + relabel, converging in
O(diameter) rounds; dedup components are shallow (stars/chains), so
a handful of rounds suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

U64 = np.uint64


class UnionFind:
    """Array-based union-find over dense int ids (path halving)."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def connected_components(edges_a: np.ndarray, edges_b: np.ndarray) -> dict:
    """Edge lists of urls → {url: min-url-of-component} for clustered docs.

    Node indexing is vectorized (np.unique + searchsorted); the union
    loop itself is O(E α(N)) over dense int ids. Because nodes are
    sorted, id order == lexicographic url order, so the min-id root is
    the min url — deterministic cluster labels.
    """
    nodes, roots = connected_components_arrays(edges_a, edges_b)
    return dict(zip(nodes.tolist(), nodes[roots].tolist()))


def connected_components_arrays(edges_a: np.ndarray, edges_b: np.ndarray):
    """Fully vectorized variant: returns (sorted nodes, root index per
    node), root = min node index of the component — identical labels
    to min-root union-find (``UnionFind``), computed by iterated
    scatter-min edge relaxation + pointer jumping instead of a
    per-edge Python loop (measured 0.67 s → ~0.05 s at 75k edges).
    Labels start as own index, only ever decrease, and the loop exits
    only when every edge agrees, so the fixpoint label of each node is
    exactly its component's minimum index. O((E+N)·log diameter); dup
    components are stars plus bounded neighbor chains, so a handful of
    rounds.

    Node factorization goes through the 128-bit url hash (lexsort of
    u64 pairs + run boundaries) instead of ``np.unique`` /
    ``searchsorted`` over Python strings — the string comparisons were
    0.55 s of the 0.67 at 75k edges; only the ~unique urls pay ONE
    string argsort, which the min-url-label semantics (and the SQL
    oracle's ``min(label)``) genuinely require. 128-bit equality is
    the same exactness class as ``ops/exact.py``."""
    from raydedup.sketches.hashing import hash_strings, hash_u64_column

    cat = np.concatenate([edges_a, edges_b])
    if len(cat) == 0:
        return np.empty(0, dtype=edges_a.dtype), np.empty(0, np.int64)
    if np.issubdtype(cat.dtype, np.integer):
        # int node ids (tiered's driver path): hash the 8-byte LE image —
        # vectorized, and O(1) per value where the string path's
        # ``bytes(int)`` fallback would build a v-byte zero buffer
        h1, h2 = hash_u64_column(cat)
    else:
        h1, h2 = hash_strings(list(cat))
    nodes, lab, _ = _cc_from_hashes(cat, h1, h2, len(edges_a))
    return nodes, lab


def _cc_from_hashes(cat: np.ndarray, h1: np.ndarray, h2: np.ndarray, n_a: int):
    """Core of ``connected_components_arrays`` over PRECOMPUTED 128-bit
    endpoint hashes (so the hashing can run distributed, off the
    driver's serial critical path). ``cat`` is the concatenated edge
    endpoints (edge i = (cat[i], cat[n_a+i])); returns (sorted nodes,
    root index per node, node h1) — the extra h1 return lets the
    broadcast-assignment payload skip re-hashing the node urls."""
    import pyarrow.compute as pc

    order = np.lexsort((h2, h1))
    so1, so2 = h1[order], h2[order]
    new = np.ones(len(order), bool)
    new[1:] = (so1[1:] != so1[:-1]) | (so2[1:] != so2[:-1])
    grp = np.cumsum(new) - 1
    codes_hash = np.empty(len(cat), np.int64)
    codes_hash[order] = grp
    uniq = cat[order[new]]
    uniq_h1 = so1[new]
    # lexicographic order of the unique urls via Arrow's C++ sort:
    # UTF-8 byte order == code-point order == Python str order (and
    # DuckDB's default VARCHAR collation), ~3x faster than
    # np.argsort over object strings; uniq has no duplicates so
    # stability is moot. Int node ids (tiered's driver path) sort
    # directly.
    if uniq.dtype == object:
        perm = pc.sort_indices(pa.array(uniq, type=pa.string())).to_numpy().astype(np.int64)
    else:
        perm = np.argsort(uniq, kind="stable")
    nodes = uniq[perm]
    node_h1 = uniq_h1[perm]
    remap = np.empty(len(uniq), np.int64)
    remap[perm] = np.arange(len(uniq))
    codes = remap[codes_hash]
    ia, ib = codes[:n_a], codes[n_a:]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = lab.copy()
        m = np.minimum(lab[ia], lab[ib])
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        lab = np.minimum(lab, lab[lab])  # pointer jump through chains
        if np.array_equal(lab, before):
            break
    return nodes, lab, node_h1


@ray.remote
def _gather_dup_edges(*blocks):
    """Filter a chunk of verify-output blocks to is_dup edges and hash
    both endpoints — the parallelizable half of the driver-side
    assignment prep. Returns (url_a, url_b, h1a, h2a, h1b, h2b); the
    driver then only concatenates and runs the int CC kernel, never
    hashing strings itself."""
    from raydedup.sketches.hashing import hash_strings

    a_parts, b_parts = [], []
    ha1, ha2, hb1, hb2 = [], [], [], []
    for blk in blocks:
        if len(blk) == 0 or "is_dup" not in (
            blk.column_names if isinstance(blk, pa.Table) else blk.columns
        ):
            continue  # empty schema-less block (zero-candidate corpus)
        if isinstance(blk, pa.Table):
            sel = blk.select(["url_a", "url_b"]).filter(blk["is_dup"])
            if len(sel) == 0:
                continue
            ua, ub = sel["url_a"], sel["url_b"]
            a_parts.append(ua.to_numpy(zero_copy_only=False))
            b_parts.append(ub.to_numpy(zero_copy_only=False))
        else:  # pandas block (the verify kernel's native output)
            m = blk["is_dup"].to_numpy()
            ua_np = blk["url_a"].to_numpy()[m]
            ub_np = blk["url_b"].to_numpy()[m]
            if len(ua_np) == 0:
                continue
            a_parts.append(ua_np)
            b_parts.append(ub_np)
            ua = pa.array(ua_np, type=pa.string())
            ub = pa.array(ub_np, type=pa.string())
        x1, x2 = hash_strings(ua)
        y1, y2 = hash_strings(ub)
        ha1.append(x1)
        ha2.append(x2)
        hb1.append(y1)
        hb2.append(y2)
    if not a_parts:
        e = np.empty(0, dtype=object)
        u = np.empty(0, np.uint64)
        return e, e, u, u, u, u
    return (
        np.concatenate(a_parts),
        np.concatenate(b_parts),
        np.concatenate(ha1),
        np.concatenate(ha2),
        np.concatenate(hb1),
        np.concatenate(hb2),
    )


def label_propagation_components(edges, max_rounds: int = 50, n_buckets: int = 64):
    """Distributed connected components: iterative min-label propagation.

    The scale fallback when the edge list exceeds driver memory —
    nothing here materializes O(nodes) or O(edges) state on the driver.
    Per round: (1) bucketed cogroup attaches current labels to both
    endpoints of every edge, (2) a per-edge min is broadcast back to
    both endpoints as messages, (3) ``groupby(url).min`` folds messages
    into new labels. Convergence is detected with an order-insensitive
    checksum of the label table (sum of fmix(url_hash ^ label_hash)).
    O(component diameter) rounds — dup components are stars around a
    base doc plus bounded neighbor chains from hot-band capping.

    ``edges``: Dataset (url_a, url_b). Returns a Dataset
    (url, cluster_id) covering clustered nodes, cluster_id = min url
    of the component.
    """
    import pandas as pd

    from ray.data.aggregate import Min, Sum

    from raydedup.sketches.hashing import fmix64, hash_strings

    def bucket_of(col_np):
        h, _ = hash_strings(list(col_np))
        return (h % U64(n_buckets)).astype(np.int64)

    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch["url_a"].to_numpy(zero_copy_only=False)
        b = batch["url_b"].to_numpy(zero_copy_only=False)
        urls = np.concatenate([a, b])
        labels = np.tile(np.minimum(a, b), 2)
        return pa.table({"url": pa.array(urls), "label": pa.array(labels)})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    def checksum(lab) -> int:
        def part(batch: pa.Table) -> pa.Table:
            hu, _ = hash_strings(batch["url"])
            hl, _ = hash_strings(batch["label"])
            s = int(fmix64(hu ^ hl).sum(dtype=U64))
            return pa.table({"s": pa.array([s], pa.uint64())})

        total = 0
        for b in lab.map_batches(part, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            for v in b["s"].to_pylist():
                total = (total + v) % (1 << 64)
        return total

    prev = checksum(labels)

    def edge_requests(batch: pa.Table) -> pa.Table:
        a = batch["url_a"].to_numpy(zero_copy_only=False)
        b = batch["url_b"].to_numpy(zero_copy_only=False)
        ha, _ = hash_strings(batch["url_a"])
        hb, _ = hash_strings(batch["url_b"])
        eid = fmix64(ha ^ fmix64(hb))
        urls = np.concatenate([a, b])
        return pa.table(
            {
                "bucket": pa.array(np.concatenate([(ha % U64(n_buckets)), (hb % U64(n_buckets))]).astype(np.int64)),
                "url": pa.array(urls),
                "edge_id": pa.array(np.tile(eid, 2), pa.uint64()),
                "other": pa.array(np.concatenate([b, a])),
                "label": pa.array(np.full(2 * len(a), "", dtype=object), pa.string()),
                "is_label": pa.array(np.zeros(2 * len(a), dtype=bool)),
            }
        )

    requests = edges.map_batches(edge_requests, batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        def tag_labels(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.table(
                {
                    "bucket": pa.array(bucket_of(batch["url"].to_numpy(zero_copy_only=False))),
                    "url": batch["url"],
                    "edge_id": pa.array(np.zeros(n, U64), pa.uint64()),
                    "other": batch["url"],
                    "label": batch["label"],
                    "is_label": pa.array(np.ones(n, dtype=bool)),
                }
            )

        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")

        def attach_and_message(df: pd.DataFrame) -> pd.DataFrame:
            lab = df[df["is_label"].to_numpy()]
            req = df[~df["is_label"].to_numpy()]
            if len(req) == 0 or len(lab) == 0:
                return pd.DataFrame({"url": pd.Series([], dtype=object), "label": pd.Series([], dtype=object)})
            merged = req[["url", "other"]].merge(lab[["url", "label"]], on="url", how="inner")
            # message: endpoint label -> the OTHER endpoint (and itself)
            return pd.DataFrame(
                {
                    "url": np.concatenate([merged["other"].to_numpy(), merged["url"].to_numpy()]),
                    "label": np.tile(merged["label"].to_numpy(), 2),
                }
            )

        msgs = requests.union(tagged).groupby("bucket").map_groups(
            attach_and_message, batch_format="pandas"
        )
        labels = (
            msgs.groupby("url").aggregate(Min("label", alias_name="label")).materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda b: pa.table({"url": b["url"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )


def cluster_assignments(
    verified_pairs, corpus, max_driver_edges: int = 50_000_000, verified_full=None
):
    """verified dup pairs + corpus → (url, cluster_id) Dataset over all docs.

    ``verified_pairs`` must already be filtered to is_dup rows. Returns
    a Dataset with one row per corpus doc.

    When ``verified_full`` (the MATERIALIZED unfiltered verify output)
    is given, the edge gather fans its raw blocks out to remote chunk
    tasks that filter ``is_dup`` AND murmur-hash both endpoints in
    parallel, so the driver's serial critical path is reduced to
    concatenation + the int connected-components kernel (the string
    hash was the dominant serial term: ~1.5 s of the 7 s assign-prep
    at 960k docs). The earlier driver-serial raw-block gather itself
    measured 0.08-0.17 s at 240k docs vs 2.2-3.0 s for
    ``iter_batches`` — the remote fan-out keeps that advantage and
    parallelizes the filter+hash too. Results are drained in bounded
    chunks so the ``max_driver_edges`` budget still caps driver
    memory; the distributed spill path keeps using ``verified_pairs``
    so nothing edge-sized must fit on the driver there.
    """
    import os as _os
    import sys as _sys
    import time as _time

    _timing = _os.environ.get("RAYDEDUP_TIMING")
    _t0 = _time.time()
    a_parts, b_parts = [], []
    ha1_p, ha2_p, hb1_p, hb2_p = [], [], [], []
    n_edges = 0
    spill_to_distributed = False
    if verified_full is not None:
        import ray

        refs = verified_full.get_internal_block_refs()
        chunk = 32
        futs = [
            _gather_dup_edges.remote(*refs[i : i + chunk])
            for i in range(0, len(refs), chunk)
        ]
        for fut in futs:
            ea_i, eb_i, x1, x2, y1, y2 = ray.get(fut)
            if len(ea_i) == 0:
                continue
            a_parts.append(ea_i)
            b_parts.append(eb_i)
            ha1_p.append(x1)
            ha2_p.append(x2)
            hb1_p.append(y1)
            hb2_p.append(y2)
            n_edges += len(ea_i)
            if n_edges > max_driver_edges:
                spill_to_distributed = True
                break
    else:
        for b in verified_pairs.select_columns(["url_a", "url_b"]).iter_batches(
            batch_format="pyarrow"
        ):
            a_parts.append(b["url_a"].to_numpy(zero_copy_only=False))
            b_parts.append(b["url_b"].to_numpy(zero_copy_only=False))
            n_edges += len(b)
            if n_edges > max_driver_edges:
                spill_to_distributed = True
                break
    if spill_to_distributed:
        # edge list exceeds the driver budget → distributed min-label
        # propagation, then a distributed cogroup join of labels back
        # over the corpus: if the edges overflowed the driver, the
        # clustered-node label table plausibly does too, so nothing
        # here may materialize it (no to_pandas / broadcast map)
        labels = label_propagation_components(
            verified_pairs.select_columns(["url_a", "url_b"])
        )
        return _assign_distributed(corpus, labels)
    ea = np.concatenate(a_parts) if a_parts else np.empty(0, dtype=object)
    eb = np.concatenate(b_parts) if b_parts else np.empty(0, dtype=object)
    _t1 = _time.time()
    if len(ea) == 0:
        nodes = np.empty(0, dtype=object)
        root_of = np.empty(0, np.int64)
        node_h1 = np.empty(0, np.uint64)
    elif ha1_p:
        # cat order is [all ea parts..., all eb parts...], so the
        # remote-computed hashes concatenate in the same order
        cat = np.concatenate([ea, eb])
        h1 = np.concatenate(ha1_p + hb1_p)
        h2 = np.concatenate(ha2_p + hb2_p)
        nodes, root_of, node_h1 = _cc_from_hashes(cat, h1, h2, len(ea))
    else:
        from raydedup.sketches.hashing import hash_strings

        cat = np.concatenate([ea, eb])
        h1, h2 = hash_strings(list(cat))
        nodes, root_of, node_h1 = _cc_from_hashes(cat, h1, h2, len(ea))
    _t2 = _time.time()
    if len(nodes):
        order = np.argsort(node_h1)
        payload = (node_h1[order], root_of[order].astype(np.int64), nodes.astype(np.str_))
    else:
        payload = (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.str_))
    out = _assign_over(corpus, payload)
    if _timing:
        print(
            f"[cluster] gather {_t1-_t0:.2f} cc {_t2-_t1:.2f} "
            f"payload+assign {_time.time()-_t2:.2f} edges {len(ea)}",
            file=_sys.stderr,
        )
    return out


def _assign_distributed(corpus, labels, n_buckets: int = 64):
    """Left-join cluster labels over the corpus as a bucketed cogroup
    (the engine's standard union+groupby shape) — both sides stay
    distributed; unmatched docs keep their own url as cluster id."""
    from raydedup.sketches.hashing import hash_strings

    def tag_corpus(batch: pa.Table) -> pa.Table:
        h, _ = hash_strings(batch["url"])
        n = len(batch)
        return pa.table(
            {
                "bucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "url": batch["url"],
                "cluster_id": pa.nulls(n, pa.string()),
                "is_label": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        h, _ = hash_strings(batch["url"])
        n = len(batch)
        return pa.table(
            {
                "bucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "url": batch["url"],
                "cluster_id": batch["cluster_id"],
                "is_label": pa.array(np.ones(n, dtype=bool)),
            }
        )

    tagged_c = corpus.select_columns(["url"]).map_batches(tag_corpus, batch_format="pyarrow")
    tagged_l = labels.map_batches(tag_labels, batch_format="pyarrow")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        is_lab = df["is_label"].to_numpy()
        cor = df[~is_lab]
        lab = df[is_lab]
        merged = cor[["url"]].merge(lab[["url", "cluster_id"]], on="url", how="left")
        miss = merged["cluster_id"].isna()
        merged.loc[miss, "cluster_id"] = merged.loc[miss, "url"]
        return merged[["url", "cluster_id"]]

    return tagged_c.union(tagged_l).groupby("bucket").map_groups(
        assign, batch_format="pandas"
    )


def _assign_over(corpus, payload):
    """Broadcast (sorted url-hashes, root index, labels) and map the
    corpus to (url, cluster_id); unmatched urls keep themselves."""
    ref = ray.put(payload)

    def assign(batch: pa.Table) -> pa.Table:
        hashes, root_idx, labels = ray.get(ref)  # numpy: zero-copy reads
        urls_arr = batch["url"]
        if isinstance(urls_arr, pa.ChunkedArray):
            urls_arr = urls_arr.combine_chunks()
        urls = urls_arr.to_numpy(zero_copy_only=False)
        out = urls.copy()
        if len(hashes):
            from raydedup.sketches.hashing import hash_strings

            h, _ = hash_strings(urls_arr)
            pos = np.minimum(np.searchsorted(hashes, h), len(hashes) - 1)
            hit = hashes[pos] == h
            out[hit] = labels[root_idx[pos[hit]]]
        return pa.table({"url": batch["url"], "cluster_id": pa.array(out, pa.string())})

    return corpus.select_columns(["url"]).map_batches(assign, batch_format="pyarrow")
