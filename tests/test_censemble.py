"""containment_search (size-partitioned LSH, ops/censemble.py) vs a
brute-force exact-containment reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _shingle_set(text: str, k=5):
    words = text.lower().split()
    if not words:
        return set()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _ref_pairs(queries, corpus, tau, k=5):
    out = {}
    for qid, qtext in queries:
        qs = _shingle_set(qtext, k)
        for did, dtext in corpus:
            ds = _shingle_set(dtext, k)
            c = len(qs & ds) / len(qs)
            if c >= tau:
                out[(qid, did)] = c
    return out


def _corpus(n=120, seed=31):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(40, 160))))
        for _ in range(n)
    ]
    # queries: word-aligned excerpts of every 10th doc (containment ~1
    # vs the source), plus one unrelated query
    queries = []
    for i in range(0, n, 10):
        ws = texts[i].split()
        queries.append((1000 + i, " ".join(ws[5:35])))
    queries.append((9999, " ".join(rng.choice(words, size=30))))
    return texts, queries


@pytest.mark.usefixtures("ray_session")
def test_containment_search_matches_bruteforce():
    import ray.data as rd

    from raydedup.ops.censemble import containment_search

    texts, queries = _corpus()
    want = _ref_pairs(queries, list(enumerate(texts)), tau=0.5)
    # every excerpt must hit its source in the reference
    assert len(want) >= len(queries) - 1
    corpus = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in queries], pa.int64()),
            "text": pa.array([t for _, t in queries]),
        }
    )
    got_df = containment_search(corpus, qt, tau=0.5, n_buckets=7).to_pandas()
    got = {
        (int(r.qid), int(r.doc_id)): float(r.containment)
        for r in got_df.itertuples()
    }
    assert set(got) == set(want)
    for key, c in want.items():
        assert got[key] == pytest.approx(c, abs=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_containment_search_blocking_invariant():
    import ray.data as rd

    from raydedup.ops.censemble import containment_search

    texts, queries = _corpus(n=60, seed=37)
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in queries], pa.int64()),
            "text": pa.array([t for _, t in queries]),
        }
    )
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    outs = []
    for nb in (1, 6):
        got = containment_search(
            rd.from_pandas(df).repartition(nb), qt, tau=0.5, n_buckets=5
        ).to_pandas()
        outs.append(
            got.sort_values(["qid", "doc_id"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.usefixtures("ray_session")
def test_containment_asymmetry_is_the_point():
    """A 30-word excerpt inside a 150-word doc: containment ~1 but
    Jaccard well under the 0.8 flagship threshold — the pair the
    Jaccard-tuned pipeline is DESIGNED to miss and this op must find."""
    import ray.data as rd

    from raydedup.ops.censemble import containment_search

    rng = np.random.default_rng(41)
    words = [f"t{i}" for i in range(400)]
    host = " ".join(rng.choice(words, size=150))
    excerpt = " ".join(host.split()[20:50])
    qs = _shingle_set(excerpt)
    ds = _shingle_set(host)
    jacc = len(qs & ds) / len(qs | ds)
    assert jacc < 0.4  # asymmetric by construction
    corpus = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": [host]}))
    qt = pa.table({"qid": pa.array([7], pa.int64()), "text": pa.array([excerpt])})
    got = containment_search(corpus, qt, tau=0.9).to_pandas()
    assert len(got) == 1 and got.containment.iloc[0] == pytest.approx(1.0)


def test_containment_search_validates_inputs():
    from raydedup.ops.censemble import containment_search

    qt = pa.table({"qid": pa.array([1], pa.int64()), "text": pa.array(["a b"])})
    with pytest.raises(ValueError, match="tau"):
        containment_search(None, qt, tau=0.0)
    with pytest.raises(ValueError, match="max_queries"):
        containment_search(None, qt, tau=0.5, max_queries=0)


def test_pick_rows_is_recall_first():
    from raydedup.ops.censemble import _pick_rows

    # high floor -> steeper curves allowed ((1-0.9^4)^32 ~ 1e-15 meets
    # the tolerance, (1-0.9^8)^16 ~ 1e-4 does not); low floor -> r
    # collapses to 1
    assert _pick_rows(0.9, 128, 1e-4) == 4
    assert _pick_rows(0.05, 128, 1e-4) == 1
    # monotone non-increasing in the floor
    rs = [_pick_rows(j, 128, 1e-4) for j in (0.9, 0.6, 0.3, 0.1)]
    assert rs == sorted(rs, reverse=True)