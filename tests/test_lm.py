"""Bigram stupid-backoff LM scoring (ops/lm.py) vs a brute-force twin.

The twin counts words/bigrams with dicts and scores docs with Python
floats in document order — the same arithmetic the vectorized kernel
must reproduce exactly (same divisions, same np.log inputs), for
arbitrary train/score corpora and arbitrary block splits."""

import math

import numpy as np
import pyarrow as pa
import pytest

from raydedup.ops.lm import lm_score, score_batch, train_bigram_lm


def _twin(train: list[str], score: list[str], alpha=0.4):
    uni, bi = {}, {}
    total = 0
    for s in train:
        ws = s.lower().split()
        total += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = []
    for s in score:
        ws = s.lower().split()
        lps = []
        for a, b in zip(ws, ws[1:]):
            cb = bi.get((a, b), 0)
            if cb > 0:
                p = cb / uni[a]
            elif uni.get(b, 0) > 0:
                p = alpha * uni[b] / total
            else:
                p = alpha * alpha / total
            lps.append(math.log(p))
        sc = round(sum(lps) / len(lps), 6) if lps else 0.0
        out.append((len(ws), max(len(ws) - 1, 0), sc))
    return out


def _run(train: list[str], score: list[str], n_blocks: int):
    import ray.data as rd

    def tbl(texts, base):
        return pa.table(
            {
                "doc_id": pa.array(list(range(base, base + len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    score_ds = rd.from_arrow(tbl(score, 0)).repartition(n_blocks)
    train_ds = rd.from_arrow(tbl(train, 1000)).repartition(max(n_blocks - 1, 1))
    df = lm_score(score_ds, train_ds, "doc_id").to_pandas().sort_values("doc_id")
    return [
        (int(r.n_words), int(r.n_bigrams), float(r.lm_score)) for r in df.itertuples()
    ]


def test_lm_score_matches_twin_all_branches(ray_session):
    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    score = [
        "the cat sat on the mat",          # all bigrams seen
        "the cat ate the mat",             # unseen bigrams, seen words
        "quantum flux capacitors hum",     # unknown words -> alpha^2/T
        "solo",                            # 1 word -> score 0.0
        "",                                # empty -> 0 words
        "THE CAT Sat ON the MAT",          # case folding
    ]
    expected = _twin(train, score)
    for n_blocks in (1, 3):
        got = _run(train, score, n_blocks)
        for g, e in zip(got, expected):
            assert g[0] == e[0] and g[1] == e[1]
            assert g[2] == pytest.approx(e[2], abs=2e-6)


def test_lm_score_random_corpus_split_invariant(ray_session):
    rng = np.random.default_rng(3)
    vocab = ["red", "blue", "green", "run", "jump", "stop", "go", "the", "a"]
    mk = lambda: " ".join(rng.choice(vocab, size=rng.integers(2, 30)))
    train = [mk() for _ in range(25)]
    score = [mk() for _ in range(30)]
    expected = _twin(train, score)
    r1 = _run(train, score, 1)
    r7 = _run(train, score, 7)
    assert r1 == r7
    for g, e in zip(r1, expected):
        assert g[0] == e[0] and g[1] == e[1]
        assert g[2] == pytest.approx(e[2], abs=2e-6)


def test_score_batch_kernel_direct():
    # kernel-level check without Ray: train == score corpus means every
    # bigram is seen and p = c(w1 w2)/c(w1)
    texts = ["x y x y", "y x"]
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(texts, pa.string())}
    )
    # hand-build the model via the partial + python reduce
    import pandas as pd

    from raydedup.ops.lm import _count_partial

    part = _count_partial(tbl, "text").to_pandas()
    g = part.groupby(["is_bigram", "h"], as_index=False)["count"].sum()
    uni = g[g.is_bigram == 0].sort_values("h")
    bi = g[g.is_bigram == 1].sort_values("h")
    model = (
        uni["h"].to_numpy(np.int64),
        uni["count"].to_numpy(np.int64),
        bi["h"].to_numpy(np.int64),
        bi["count"].to_numpy(np.int64),
        int(uni["count"].sum()),
    )
    out = score_batch(tbl, model, "doc_id").to_pandas()
    # doc 1: bigrams (x,y),(y,x),(x,y): c(xy)=2,c(x)=3; c(yx)=2,c(y)=3
    exp1 = round((math.log(2 / 3) * 3) / 3, 6)
    assert out.lm_score[0] == pytest.approx(exp1, abs=1e-9)
    assert out.n_words.tolist() == [4, 2] and out.n_bigrams.tolist() == [3, 1]


def test_lm_score_empty_model(ray_session):
    # zero trained words: every bigram scores ln(alpha^2) finitely
    got = _run([""], ["a b c"], 1)
    assert got == [(3, 2, round(math.log(0.16), 6))]
