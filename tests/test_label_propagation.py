"""Distributed label propagation == driver union-find; fallback path."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.pipeline.cluster import (
    cluster_assignments,
    connected_components,
    label_propagation_components,
)


def _graph():
    rng = np.random.default_rng(5)
    edges = []
    for s in range(12):  # stars
        hub = f"hub{s:03d}"
        for m in range(int(rng.integers(2, 6))):
            edges.append((hub, f"leaf{s:03d}_{m}"))
    for c in range(4):  # chains (worst-case diameter)
        for i in range(10):
            edges.append((f"chain{c}_{i:02d}", f"chain{c}_{i+1:02d}"))
    ea = np.array([e[0] for e in edges], dtype=object)
    eb = np.array([e[1] for e in edges], dtype=object)
    return ea, eb


def test_label_propagation_matches_union_find(ray_session):
    ea, eb = _graph()
    truth = connected_components(ea, eb)
    ds = rd.from_arrow(pa.table({"url_a": ea.tolist(), "url_b": eb.tolist()}))
    out = label_propagation_components(ds, n_buckets=8).to_pandas()
    got = dict(zip(out.url, out.cluster_id))
    assert got == truth


def test_cluster_assignments_distributed_fallback(ray_session):
    ea, eb = _graph()
    truth = connected_components(ea, eb)
    pairs = rd.from_arrow(pa.table({"url_a": ea.tolist(), "url_b": eb.tolist()}))
    corpus_urls = sorted(set(ea) | set(eb) | {"lonely_doc"})
    corpus = rd.from_arrow(pa.table({"url": corpus_urls}))
    # force the distributed path with a tiny driver budget
    asg = cluster_assignments(pairs, corpus, max_driver_edges=10).to_pandas()
    got = dict(zip(asg.url, asg.cluster_id))
    for u, c in truth.items():
        assert got[u] == c
    assert got["lonely_doc"] == "lonely_doc"


def test_fallback_assignments_match_driver_path(ray_session):
    """Over-budget (distributed cogroup assignment) output is identical
    to the driver union-find + broadcast path."""
    import pandas as pd

    ea, eb = _graph()
    pairs = rd.from_arrow(pa.table({"url_a": ea.tolist(), "url_b": eb.tolist()}))
    corpus_urls = sorted(set(ea) | set(eb) | {"lonely_doc"})
    corpus = rd.from_arrow(pa.table({"url": corpus_urls}))
    drv = cluster_assignments(pairs, corpus).to_pandas().sort_values("url").reset_index(drop=True)
    dist = (
        cluster_assignments(pairs, corpus, max_driver_edges=10)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist)