"""Exact weighted Jaccard + ICWS weighted MinHash (sketches/icws.py,
ops/wjaccard.py) vs literal references."""

import numpy as np
import pandas as pd
import pytest


def _wj_exact(text_a: str, text_b: str) -> float:
    from collections import Counter

    ca, cb = Counter(text_a.split()), Counter(text_b.split())
    keys = set(ca) | set(cb)
    num = sum(min(ca[k], cb[k]) for k in keys)
    den = sum(max(ca[k], cb[k]) for k in keys)
    return num / den if den else 0.0


def _corpus(n=60, seed=3):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(10, 60)))) for _ in range(n)]
    return texts


def test_weighted_jaccard_pairs_matches_counter_reference(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.wjaccard import weighted_jaccard_pairs

    texts = _corpus()
    n = len(texts)
    rng = np.random.default_rng(11)
    ia = rng.integers(0, n, 30)
    ib = (ia + 1 + rng.integers(0, n - 1, 30)) % n
    pairs = pa.table(
        {"doc_a": pa.array(ia, pa.int64()), "doc_b": pa.array(ib, pa.int64())}
    )
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n), "text": texts}))
    got = weighted_jaccard_pairs(docs, pairs, n_buckets=5).to_pandas()
    got = got.set_index(["doc_a", "doc_b"])["w_jaccard"]
    # duplicate (a, b) rows in the pair list collapse per unique pair
    for p in range(30):
        want = _wj_exact(texts[ia[p]], texts[ib[p]])
        assert got.loc[(ia[p], ib[p])] == pytest.approx(want, abs=1e-12)


def test_weighted_jaccard_blocking_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.wjaccard import weighted_jaccard_pairs

    texts = _corpus(seed=5)
    pairs = pa.table(
        {
            "doc_a": pa.array(np.arange(0, 20, 2), pa.int64()),
            "doc_b": pa.array(np.arange(1, 21, 2), pa.int64()),
        }
    )
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    outs = []
    for nb in (1, 7):
        ds = rd.from_pandas(df).repartition(nb)
        out = weighted_jaccard_pairs(ds, pairs, n_buckets=3).to_pandas()
        outs.append(out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_weighted_jaccard_one_sided_pair_is_zero(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.ops.wjaccard import weighted_jaccard_pairs

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", ""]})
    pairs = pa.table({"doc_a": pa.array([0], pa.int64()), "doc_b": pa.array([1], pa.int64())})
    out = weighted_jaccard_pairs(rd.from_pandas(df), pairs).to_pandas()
    assert len(out) == 1 and out.w_jaccard.iloc[0] == 0.0


def test_weighted_jaccard_rejects_oversized_pair_list():
    import pyarrow as pa

    from raydedup.ops.wjaccard import weighted_jaccard_pairs

    pairs = pa.table(
        {"doc_a": pa.array(np.zeros(11, np.int64)), "doc_b": pa.array(np.ones(11, np.int64))}
    )
    with pytest.raises(ValueError, match="max_pairs"):
        weighted_jaccard_pairs(None, pairs, max_pairs=10)


def test_icws_collision_rate_matches_weighted_jaccard():
    """The defining ICWS property: slot collision probability equals
    weighted Jaccard. Checked at 4 sigma over P=2048 slots on three
    weight profiles."""
    from collections import Counter

    from raydedup.sketches.hashing import hash_strings
    import pyarrow as pa

    from raydedup.sketches.icws import icws_estimate, icws_signatures

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(80)]
    for trial in range(3):
        ta = " ".join(rng.choice(vocab, size=120))
        # overlapping doc: half copied, half fresh
        tb = " ".join(ta.split()[:60] + list(rng.choice(vocab, size=60)))
        ca, cb = Counter(ta.split()), Counter(tb.split())
        keys = sorted(set(ca) | set(cb))
        exact = sum(min(ca[k], cb[k]) for k in keys) / sum(
            max(ca[k], cb[k]) for k in keys
        )
        rows_tok, rows_w, rows_d = [], [], []
        for d, cd in enumerate((ca, cb)):
            ks = sorted(cd)
            h, _ = hash_strings(pa.array(ks))
            rows_tok.append(h)
            rows_w.append(np.array([cd[k] for k in ks], float))
            rows_d.append(np.full(len(ks), d, np.int64))
        P = 2048
        sig = icws_signatures(
            np.concatenate(rows_tok),
            np.concatenate(rows_w),
            np.concatenate(rows_d),
            2,
            num_hashes=P,
        )
        est = float(icws_estimate(sig[0], sig[1]))
        sigma = (exact * (1 - exact) / P) ** 0.5
        assert abs(est - exact) < 4 * sigma + 1e-9, (trial, exact, est)


def test_icws_identical_and_disjoint_sets():
    from raydedup.sketches.icws import icws_estimate, icws_signatures

    rng = np.random.default_rng(23)
    tok = rng.integers(1, 2**63, 50).astype(np.uint64)
    w = rng.integers(1, 9, 50).astype(float)
    sig = icws_signatures(
        np.concatenate([tok, tok]),
        np.concatenate([w, w]),
        np.repeat([0, 1], 50),
        2,
        num_hashes=64,
    )
    assert icws_estimate(sig[0], sig[1]) == 1.0
    tok2 = rng.integers(1, 2**63, 50).astype(np.uint64)
    sig2 = icws_signatures(
        np.concatenate([tok, tok2]),
        np.concatenate([w, w]),
        np.repeat([0, 1], 50),
        2,
        num_hashes=64,
    )
    assert icws_estimate(sig2[0], sig2[1]) < 0.05


def test_icws_scale_invariance_of_weights():
    """J_w is invariant under uniform weight scaling; ICWS samples are
    consistent, so the ESTIMATE stays high for scaled copies of the
    same set (Ioffe's consistency property — exact equality is not
    guaranteed since t quantizes, but agreement must dominate)."""
    from raydedup.sketches.icws import icws_estimate, icws_signatures

    rng = np.random.default_rng(29)
    tok = rng.integers(1, 2**63, 40).astype(np.uint64)
    w = rng.integers(1, 9, 40).astype(float)
    sig = icws_signatures(
        np.concatenate([tok, tok]),
        np.concatenate([w, w * 3.0]),
        np.repeat([0, 1], 40),
        2,
        num_hashes=512,
    )
    # exact J_w(A, 3A) = sum w / sum 3w = 1/3
    est = float(icws_estimate(sig[0], sig[1]))
    assert abs(est - 1 / 3) < 4 * ((1 / 3) * (2 / 3) / 512) ** 0.5


def test_icws_input_validation():
    from raydedup.sketches.icws import icws_signatures

    with pytest.raises(ValueError, match="non-decreasing"):
        icws_signatures(
            np.array([1, 2], np.uint64),
            np.array([1.0, 1.0]),
            np.array([1, 0]),
            2,
        )
    with pytest.raises(ValueError, match="positive"):
        icws_signatures(
            np.array([1], np.uint64), np.array([0.0]), np.array([0]), 1
        )
