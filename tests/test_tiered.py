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
