"""Property-based invariants (hypothesis) for the ExactSubstr
operators and the bigram LM scorer: for ARBITRARY corpora over a tiny
alphabet (maximizing genuine window collisions), arbitrary window
lengths and block splits, the distributed results equal the
brute-force twins exactly (small example budgets — each example
drives real Ray datasets)."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

_WORDS = ["ab", "ba", "aab", "abb", "aa"]


def _corpus_strategy():
    doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20).map(" ".join)
    return st.lists(doc, min_size=1, max_size=12)


def _ds_of(texts, n_blocks):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(min(n_blocks, max(len(texts), 1)))


@settings(max_examples=8, deadline=None)
@given(
    texts=_corpus_strategy(),
    L=st.integers(min_value=2, max_value=12),
    n_blocks=st.integers(min_value=1, max_value=4),
)
def test_substring_ops_property(ray_session, texts, L, n_blocks):
    from raydedup.ops.substring import duplicated_span_stats, remove_duplicated_spans

    cnt = Counter()
    for s in texts:
        b = s.encode()
        for p in range(len(b) - L + 1):
            cnt[b[p : p + L]] += 1
    exp_cut, exp_dup = {}, {}
    for i, s in enumerate(texts):
        b = s.encode()
        cov = np.zeros(len(b), dtype=bool)
        for p in range(len(b) - L + 1):
            if cnt[b[p : p + L]] > 1:
                cov[p : p + L] = True
        exp_dup[i] = int(cov.sum())
        exp_cut[i] = bytes(np.frombuffer(b, np.uint8)[~cov]).decode()

    ds = _ds_of(texts, n_blocks)
    stats = duplicated_span_stats(ds, "doc_id", min_len=L, n_buckets=4, id_buckets=4).to_pandas()
    assert {int(r.doc_id): int(r.dup_chars) for r in stats.itertuples()} == exp_dup
    assert {int(r.doc_id): int(r.n_chars) for r in stats.itertuples()} == {
        i: len(s.encode()) for i, s in enumerate(texts)
    }
    cut = remove_duplicated_spans(ds, "doc_id", min_len=L, n_buckets=4, id_buckets=4).to_pandas()
    assert {int(r.doc_id): r.clean_text for r in cut.itertuples()} == exp_cut
    assert {int(r.doc_id): int(r.dup_chars) for r in cut.itertuples()} == exp_dup


@settings(max_examples=8, deadline=None)
@given(
    train=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    score=st.lists(
        st.lists(st.sampled_from(_WORDS + ["zq"]), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n_blocks=st.integers(min_value=1, max_value=3),
)
def test_lm_score_property(ray_session, train, score, n_blocks):
    from raydedup.ops.lm import lm_score

    uni, bi = {}, {}
    total = 0
    for s in train:
        ws = s.lower().split()
        total += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    if total == 0:
        return  # degenerate model (no trained words); engine divides by T
    exp = []
    for s in score:
        ws = s.lower().split()
        lps = []
        for a, b in zip(ws, ws[1:]):
            cb = bi.get((a, b), 0)
            if cb > 0:
                p = cb / uni[a]
            elif uni.get(b, 0) > 0:
                p = 0.4 * uni[b] / total
            else:
                p = 0.16 / total
            lps.append(math.log(p))
        exp.append(
            (len(ws), max(len(ws) - 1, 0), round(sum(lps) / len(lps), 6) if lps else 0.0)
        )

    sd = _ds_of(score, n_blocks)
    td = _ds_of(train, n_blocks)
    out = lm_score(sd, td, "doc_id").to_pandas().sort_values("doc_id")
    got = [(int(r.n_words), int(r.n_bigrams), float(r.lm_score)) for r in out.itertuples()]
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1]
        assert abs(g[2] - e[2]) <= 2e-6
