"""phrase_match vs a literal per-doc Python scan."""

import numpy as np
import pandas as pd


def _ref(texts, phrase):
    pw = phrase.lower().split()
    k = len(pw)
    out = {}
    for i, t in enumerate(texts):
        w = [x for x in t.lower().split() if x]
        pos = [j + 1 for j in range(len(w) - k + 1) if w[j : j + k] == pw]
        if pos:
            out[i] = (len(pos), pos[0])
    return out


def test_phrase_match_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.phrase import phrase_match

    rng = np.random.default_rng(31)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(vocab[int(j)] for j in rng.integers(0, 4, int(rng.integers(0, 25))))
        for _ in range(80)
    ]
    texts += ["aa bb aa bb aa bb", "", "aa", "bb aa bb"]  # overlaps + edge cases
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for phrase in ("aa bb", "bb aa bb", "cc"):
        got = (
            phrase_match(rd.from_pandas(df).repartition(5), phrase)
            .to_pandas()
            .set_index("doc_id")
        )
        want = _ref(texts, phrase)
        assert set(got.index) == set(want), phrase
        for d, (n, p) in want.items():
            assert got.loc[d, "n_matches"] == n, (phrase, d)
            assert got.loc[d, "first_pos"] == p, (phrase, d)
