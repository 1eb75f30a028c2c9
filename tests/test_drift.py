"""js_divergence_matrix vs a literal dict-based JS computation."""

import math

import numpy as np
import pandas as pd


def _js(pc_, qc_):
    np_, nq = sum(pc_.values()), sum(qc_.values())
    words = set(pc_) | set(qc_)
    s = 0.0
    for w in words:
        p = pc_.get(w, 0) / np_
        q = qc_.get(w, 0) / nq
        m = p + q
        if p > 0:
            s += 0.5 * p * math.log(2 * p / m)
        if q > 0:
            s += 0.5 * q * math.log(2 * q / m)
    return s


def test_js_matrix_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.drift import js_divergence_matrix

    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for src, bias in (("a", 1.0), ("b", 2.0), ("c", 0.5)):
        w = np.exp(-bias * np.arange(12) / 4.0)
        w /= w.sum()
        for _ in range(40):
            words = rng.choice(vocab, size=20, p=w)
            rows.append({"src": src, "text": " ".join(words)})
    df = pd.DataFrame(rows)
    got = (
        js_divergence_matrix(rd.from_pandas(df).repartition(4), slice_col="src")
        .to_pandas()
        .set_index(["slice_a", "slice_b"])
    )
    counts = {}
    for src, grp in df.groupby("src"):
        c = {}
        for t in grp.text:
            for w in t.split():
                c[w] = c.get(w, 0) + 1
        counts[src] = c
    for a, b in (("a", "b"), ("a", "c"), ("b", "c")):
        want = round(_js(counts[a], counts[b]), 6)
        assert abs(got.loc[(a, b), "js"] - want) < 2e-6, (a, b)
    # identical distributions diverge less than different ones
    assert got.js.min() >= 0
