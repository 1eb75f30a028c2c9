"""SemDeDup: deterministic distributed k-means + within-cluster dedup.

Gates: (1) the distributed output is bit-identical to the
single-process twin across block splits (the blocking-independence
the sidecar oracle relies on); (2) planted near-duplicate embeddings
are dropped and exactly one member of each dup set survives; (3) the
keep-rule keeps the member farthest from the centroid (the paper's
choice)."""

import numpy as np
import pandas as pd
import pytest

from raydedup.ops.semdedup import (
    _assign,
    _normalize,
    cluster_keep_flags,
    semantic_dedup_local,
)


def _corpus(n=120, dim=16, n_dup_sets=6, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    dup_sets = []
    rows = [base]
    next_id = n
    for s in range(n_dup_sets):
        src = s * 17 % n
        copies = 2 + s % 3
        ids = []
        for c in range(copies):
            noisy = base[src] + rng.normal(scale=1e-3, size=dim).astype(np.float32)
            rows.append(noisy[None, :])
            ids.append(next_id)
            next_id += 1
        dup_sets.append([src] + ids)
    emb = np.concatenate(rows, axis=0).astype(np.float32)
    ids = np.arange(len(emb), dtype=np.int64)
    return ids, emb, dup_sets


def test_local_twin_drops_exactly_one_survivor_per_dup_set():
    ids, emb, dup_sets = _corpus()
    out = semantic_dedup_local(ids, emb, k=4, tau=0.98, n_iters=8)
    kept = set(out.vec_id[out.keep].tolist())
    for group in dup_sets:
        survivors = [i for i in group if i in kept]
        assert len(survivors) == 1, f"dup set {group}: survivors {survivors}"
    # non-duplicate singletons all survive
    planted = {i for g in dup_sets for i in g}
    singles = [i for i in ids.tolist() if i not in planted]
    assert all(i in kept for i in singles)


def test_keep_rule_prefers_farthest_from_centroid():
    centroid = _normalize(np.ones((1, 8)))[0]
    close_v = np.ones(8)
    close_v[0] += 0.05
    far_v = np.ones(8)
    far_v[0] += 0.6  # same dup set, lower sim to centroid
    xn = _normalize(np.stack([close_v, far_v]))
    keep, sims = cluster_keep_flags(xn, np.array([0, 1]), centroid, tau=0.9)
    assert sims[0] > sims[1]
    assert keep.tolist() == [False, True]


def test_distributed_matches_local_twin_across_blockings(ray_session):
    import ray.data as rd

    from raydedup.ops.semdedup import semantic_dedup

    ids, emb, _ = _corpus(n=90, dim=12, seed=11)
    expected = semantic_dedup_local(ids, emb, k=5, tau=0.95, n_iters=6)
    rows = [{"vec_id": int(i), "embedding": emb[j].tolist()} for j, i in enumerate(ids)]
    for n_blocks in (1, 3, 7):
        ds = rd.from_items(rows, override_num_blocks=n_blocks)
        got = (
            semantic_dedup(ds, k=5, tau=0.95, n_iters=6)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"cluster": np.int64}),
            expected.astype({"cluster": np.int64}),
            check_exact=True,  # bit-identical, not approximately equal
        )


def test_kmeans_fit_blocking_invariant(ray_session):
    import ray.data as rd

    from raydedup.ops.semdedup import kmeans_fit

    ids, emb, _ = _corpus(n=60, dim=8, seed=3)
    rows = [{"vec_id": int(i), "embedding": emb[j].tolist()} for j, i in enumerate(ids)]
    cents = [
        kmeans_fit(rd.from_items(rows, override_num_blocks=nb), k=4, n_iters=5)
        for nb in (1, 4)
    ]
    assert np.array_equal(cents[0], cents[1])
    # every centroid is unit-norm and every point has a valid cluster
    assert np.allclose(np.linalg.norm(cents[0], axis=1), 1.0)
    a = _assign(_normalize(emb), cents[0])
    assert a.min() >= 0 and a.max() < 4
