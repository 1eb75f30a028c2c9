"""Tiered dedup (exact → near → semantic): planted-tier corpus.

One doc per removal mechanism, orthogonal one-hot embeddings for every
doc that must NOT be a semantic dup — so each tier's classification is
forced by construction, including the precedence rule (a doc caught by
an earlier tier never reaches a later one)."""

import numpy as np
import pytest


def _corpus():
    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(59)) + " zz"  # jaccard >> 0.8 vs base
    texts = {
        0: base,
        1: base,  # exact dup of 0
        2: near,  # near dup of 0
        3: "completely different text about rivers and mountains " * 3,
        4: "another unrelated document on astronomy and telescopes " * 3,
        5: "a third standalone text concerning cooking recipes today " * 3,
    }
    dim = 8
    emb = {i: np.eye(dim, dtype=np.float32)[j] for j, i in enumerate(texts)}
    # 4 is a semantic dup of 3: same direction, tiny noise
    emb[4] = (emb[3] + np.float32(0.01) * np.eye(dim, dtype=np.float32)[7]).astype(np.float32)
    return texts, emb


def test_tiered_dedup_assigns_planted_tiers(ray_session):
    import ray.data as rd

    from raydedup.pipeline.tiered import tiered_dedup

    texts, emb = _corpus()
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()], override_num_blocks=3
    )
    embs = rd.from_items(
        [{"vec_id": i, "embedding": v.tolist()} for i, v in emb.items()], override_num_blocks=2
    )
    out = (
        tiered_dedup(docs, embs, tau_semantic=0.45, n_buckets=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "tier"] == "kept" and out.loc[0, "keeper_id"] == 0
    assert out.loc[1, "tier"] == "exact" and out.loc[1, "keeper_id"] == 0
    assert out.loc[2, "tier"] == "near" and out.loc[2, "keeper_id"] == 0
    assert out.loc[3, "tier"] == "kept" and out.loc[3, "keeper_id"] == 3
    assert out.loc[4, "tier"] == "semantic" and out.loc[4, "keeper_id"] == 3
    assert out.loc[5, "tier"] == "kept"


def _components_min(nodes, edges):
    lab = {i: i for i in nodes}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lab[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in nodes}


def _tiered_local(texts, emb, tau, jthresh=0.8):
    """Independent brute-force reference (plain dict/set logic, no
    shared kernels) for randomized parity with the Ray pipeline."""
    ids = sorted(texts)
    first_by_text, keeper1 = {}, {}
    for i in ids:
        keeper1[i] = first_by_text.setdefault(texts[i], i)
    s1 = [i for i in ids if keeper1[i] == i]

    def shingles(t):
        w = [x for x in t.lower().split() if x]
        if not w:
            return set()
        return {" ".join(w[i : i + 5]) for i in range(max(len(w) - 4, 1))}

    sh = {i: shingles(texts[i]) for i in s1}
    e2 = []
    for x in range(len(s1)):
        for y in range(x + 1, len(s1)):
            a, b = s1[x], s1[y]
            if sh[a] and sh[b]:
                inter = len(sh[a] & sh[b])
                if inter / (len(sh[a]) + len(sh[b]) - inter) >= jthresh:
                    e2.append((a, b))
    keeper2 = _components_min(s1, e2)
    s2 = [i for i in s1 if keeper2[i] == i]

    def cos(a, b):
        va = emb[a].astype(np.float64)
        vb = emb[b].astype(np.float64)
        return float((va / np.linalg.norm(va)) @ (vb / np.linalg.norm(vb)))

    e3 = [
        (s2[x], s2[y])
        for x in range(len(s2))
        for y in range(x + 1, len(s2))
        if cos(s2[x], s2[y]) >= tau
    ]
    keeper3 = _components_min(s2, e3)

    out = {}
    for i in ids:
        if keeper1[i] != i:
            out[i] = ("exact", keeper1[i])
        elif keeper2[i] != i:
            out[i] = ("near", keeper2[i])
        elif keeper3[i] != i:
            out[i] = ("semantic", keeper3[i])
        else:
            out[i] = ("kept", i)
    return out


@pytest.mark.parametrize("seed", [1, 17, 202])
def test_tiered_dedup_matches_bruteforce_reference(ray_session, seed):
    import ray.data as rd

    from raydedup.pipeline.tiered import tiered_dedup

    rng = np.random.default_rng(seed)
    vocab = [f"tok{v}" for v in range(40)]
    texts, emb = {}, {}
    n = 28
    for i in range(n):
        words = rng.choice(vocab, size=int(rng.integers(15, 40))).tolist()
        texts[i] = " ".join(words)
        emb[i] = rng.normal(size=6).astype(np.float32)
    # planted: exact copies, near mutations, semantic twins
    for j, src in enumerate(rng.choice(n, size=6, replace=False).tolist()):
        i = n + j
        if j % 3 == 0:
            texts[i], emb[i] = texts[src], rng.normal(size=6).astype(np.float32)
        elif j % 3 == 1:
            texts[i] = texts[src] + " extraword"
            emb[i] = rng.normal(size=6).astype(np.float32)
        else:
            texts[i] = " ".join(rng.choice(vocab, size=20).tolist())
            emb[i] = (emb[src] + np.float32(0.01) * rng.normal(size=6).astype(np.float32)).astype(
                np.float32
            )
    expected = _tiered_local(texts, emb, tau=0.45)
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()], override_num_blocks=4
    )
    embs = rd.from_items(
        [{"vec_id": i, "embedding": v.tolist()} for i, v in emb.items()], override_num_blocks=3
    )
    got = (
        tiered_dedup(docs, embs, tau_semantic=0.45, n_buckets=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(expected)
    for i, (tier, keeper) in expected.items():
        assert got.loc[i, "tier"] == tier, f"doc {i} (seed {seed})"
        assert got.loc[i, "keeper_id"] == keeper, f"doc {i} (seed {seed})"


def test_tiered_dedup_precedence_exact_wins(ray_session):
    """A doc that is simultaneously an exact, near AND semantic dup of
    doc 0 must be labeled by the FIRST tier (exact)."""
    import ray.data as rd

    from raydedup.pipeline.tiered import tiered_dedup

    texts, emb = _corpus()
    texts[6] = texts[0]  # exact dup of 0
    emb[6] = emb[0].copy()  # and cosine 1.0 with 0
    docs = rd.from_items([{"doc_id": i, "text": t} for i, t in texts.items()])
    embs = rd.from_items([{"vec_id": i, "embedding": v.tolist()} for i, v in emb.items()])
    out = (
        tiered_dedup(docs, embs, tau_semantic=0.45, n_buckets=8)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[6, "tier"] == "exact" and out.loc[6, "keeper_id"] == 0
    assert out.loc[0, "tier"] == "kept"


def test_tiered_dedup_distributed_tier3_matches_driver_path(ray_session):
    """Forcing ``max_driver_edges`` below the edge count must route
    tier 3 through distributed label propagation and produce IDENTICAL
    assignments to the in-driver union-find path."""
    import ray.data as rd

    from raydedup.pipeline.tiered import tiered_dedup

    texts, emb = _corpus()
    # widen the semantic cluster so tier 3 has several edges
    emb[5] = (emb[3] + np.float32(0.02) * emb[5]).astype(np.float32)

    def run(max_edges):
        docs = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in texts.items()], override_num_blocks=3
        )
        embs = rd.from_items(
            [{"vec_id": i, "embedding": v.tolist()} for i, v in emb.items()],
            override_num_blocks=2,
        )
        return (
            tiered_dedup(
                docs, embs, tau_semantic=0.45, n_buckets=8, max_driver_edges=max_edges
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )

    driver = run(50_000_000)
    distributed = run(1)  # > 1 semantic edge planted → distributed path
    assert (driver["tier"] == distributed["tier"]).all()
    assert (driver["keeper_id"] == distributed["keeper_id"]).all()
    assert (driver.loc[[4, 5], "tier"] == "semantic").all()
