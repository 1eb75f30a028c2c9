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
    """Vectorized-index variant: returns (sorted nodes, root index per node)."""
    nodes = np.unique(np.concatenate([edges_a, edges_b]))
    ia = np.searchsorted(nodes, edges_a)
    ib = np.searchsorted(nodes, edges_b)
    uf = UnionFind(len(nodes))
    union = uf.union
    for a, b in zip(ia.tolist(), ib.tolist()):
        union(a, b)
    roots = np.fromiter((uf.find(i) for i in range(len(nodes))), dtype=np.int64, count=len(nodes))
    return nodes, roots


def cluster_assignments(verified_pairs, corpus, max_driver_edges: int = 50_000_000):
    """verified dup pairs + corpus → (url, cluster_id) Dataset over all docs.

    ``verified_pairs`` must already be filtered to is_dup rows. Returns
    a Dataset with one row per corpus doc.
    """
    edges = verified_pairs.select_columns(["url_a", "url_b"])
    a_parts, b_parts = [], []
    n_edges = 0
    for b in edges.iter_batches(batch_format="pyarrow"):
        a_parts.append(b["url_a"].to_numpy(zero_copy_only=False))
        b_parts.append(b["url_b"].to_numpy(zero_copy_only=False))
        n_edges += len(b)
        if n_edges > max_driver_edges:
            raise NotImplementedError(
                "edge list exceeds driver budget; use label-propagation fallback"
            )
    ea = np.concatenate(a_parts) if a_parts else np.empty(0, dtype=object)
    eb = np.concatenate(b_parts) if b_parts else np.empty(0, dtype=object)
    nodes, root_of = connected_components_arrays(ea, eb)
    if len(nodes):
        from raydedup.sketches.hashing import hash_strings

        h, _ = hash_strings(list(nodes))
        order = np.argsort(h)
        payload = (h[order], root_of[order].astype(np.int64), nodes.astype(np.str_))
    else:
        payload = (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.str_))
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
