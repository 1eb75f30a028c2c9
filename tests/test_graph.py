"""pagerank_int vs a literal per-node Python reference loop."""

import numpy as np
import pandas as pd
import pytest


def _ref_pagerank(nodes, edges, iterations, r0=1_000_000, dn=85, dd=100):
    """Dict-based literal transcription of the integer recurrence."""
    base = (dd - dn) * r0 // dd
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // outdeg[s]
        r = {v: base + (dn * inflow[v]) // dd for v in nodes}
    return r


def _run(nodes, edges, iterations, **kw):
    import ray.data as rd

    from raydedup.ops.graph import pagerank_int

    nds = rd.from_pandas(pd.DataFrame({"node": list(nodes)}))
    eds = rd.from_pandas(
        pd.DataFrame({"src": [s for s, _ in edges], "dst": [d for _, d in edges]})
    )
    out = pagerank_int(nds, eds, iterations=iterations, n_buckets=8, **kw)
    return dict(
        zip(
            out.to_pandas()["node"].to_numpy(),
            out.to_pandas()["rank_u"].to_numpy(),
        )
    )


def test_pagerank_matches_reference_loop(ray_session):
    # deliberately lumpy graph: a hub, dangling nodes, parallel edges
    rng = np.random.default_rng(7)
    nodes = list(range(60))
    edges = [(int(s), int(d)) for s, d in rng.integers(0, 60, size=(300, 2))]
    edges += [(5, 9)] * 4  # parallel edges count multiply
    edges += [(int(v), 0) for v in range(30)]  # hub
    # nodes 55..59 get no out-edges from this trim: dangling
    edges = [(s, d) for s, d in edges if s < 55]
    got = _run(nodes, edges, iterations=4)
    want = _ref_pagerank(nodes, edges, iterations=4)
    assert got == want


def test_pagerank_fixed_point_on_permutation(ray_session):
    # a bijective graph (outdeg == indeg == 1) stays at r0 exactly
    nodes = list(range(40))
    edges = [(i, (i * 7 + 3) % 40) for i in nodes]
    got = _run(nodes, edges, iterations=3)
    assert set(got.values()) == {1_000_000}


def test_pagerank_rejects_unknown_src(ray_session):
    with pytest.raises(Exception):
        _run([0, 1], [(0, 1), (7, 0)], iterations=1)


def test_co_citation_matches_brute_force(ray_session):
    import ray.data as rd

    from raydedup.ops.graph import co_citation_counts

    rng = np.random.default_rng(29)
    n = 20
    e = rng.integers(0, n, size=(120, 2)).astype(np.int64)
    e = np.vstack([e, e[:15]])  # duplicates must count once per dst
    want = {}
    by_dst = {}
    for s, d in e:
        by_dst.setdefault(int(d), set()).add(int(s))
    for d, srcs in by_dst.items():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                want[(ss[i], ss[j])] = want.get((ss[i], ss[j]), 0) + 1
    want = {k: v for k, v in want.items() if v >= 2}
    eds = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})).repartition(4)
    got_df = co_citation_counts(eds, min_common=2, n_buckets=8).to_pandas()
    got = {
        (int(r.doc_a), int(r.doc_b)): int(r.n_common) for r in got_df.itertuples()
    }
    assert got == want


def test_triangle_count_matches_brute_force(ray_session):
    import ray.data as rd

    from raydedup.ops.graph import count_closed_triangles

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 25
        # multigraph with duplicate edges and self-loops
        e = rng.integers(0, n, size=(140, 2)).astype(np.int64)
        e = np.vstack([e, e[:10]])  # force duplicates
        # brute force: closed 3-walks with multiplicity
        adj = np.zeros((n, n), np.int64)
        np.add.at(adj, (e[:, 0], e[:, 1]), 1)
        want = int(np.trace(adj @ adj @ adj))
        eds = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})).repartition(4)
        got = count_closed_triangles(eds, n_buckets=8)
        assert got == want, (trial, got, want)
