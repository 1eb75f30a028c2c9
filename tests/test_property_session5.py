"""Property-based invariants for the session-5 kernels: ICWS weighted
MinHash, the weighted-Jaccard tf fold, the SNM window-pair algebra,
and the banding planner — each against a literal reference on
arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 2**62), st.integers(1, 9)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.randoms(use_true_random=False),
)
def test_icws_signature_is_order_and_duplication_invariant(items, rnd):
    """Signatures depend only on the (token -> weight) MAP: permuting
    row order never changes any slot."""
    from raydedup.sketches.icws import icws_signatures

    tok = np.array([t for t, _ in items], np.uint64)
    w = np.array([float(x) for _, x in items])
    perm = list(range(len(items)))
    rnd.shuffle(perm)
    perm = np.array(perm, np.int64)
    a = icws_signatures(tok, w, np.zeros(len(tok), np.int64), 1, num_hashes=16)
    b = icws_signatures(
        tok[perm], w[perm], np.zeros(len(tok), np.int64), 1, num_hashes=16
    )
    assert (a == b).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=12), min_size=1, max_size=20))
def test_token_tf_rows_matches_counter(texts):
    from collections import Counter

    import pyarrow as pa

    from raydedup.ops.wjaccard import token_tf_rows
    from raydedup.sketches.hashing import hash_strings

    batch = pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)), "text": pa.array(texts)}
    )
    out = token_tf_rows(batch, "doc_id")
    got = {}
    for d, t, f in zip(
        out["doc_id"].to_pylist(), out["tok"].to_pylist(), out["tf"].to_pylist()
    ):
        got[(d, t)] = f
    want = {}
    for d, text in enumerate(texts):
        c = Counter(text.split())
        if not c:
            continue
        toks = sorted(c)
        h, _ = hash_strings(pa.array(toks))
        for tk, hh in zip(toks, h):
            want[(d, int(np.int64(hh.astype(np.uint64).view(np.int64))))] = c[tk]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    st.integers(2, 6),
    st.lists(st.integers(0, 50), min_size=2, max_size=40),
)
def test_snm_window_pair_emission_covers_each_pair_once(window, ranks_raw):
    """The anchor/probe key algebra: every unordered pair at rank
    distance 1..w-1 appears exactly once (at the higher rank), and no
    other pair appears. Checked on arbitrary DISTINCT rank sets by
    replaying the emission + grouping logic in plain Python."""
    ranks = sorted(set(ranks_raw))
    w = window
    emitted = {}
    for r in ranks:
        emitted.setdefault(r, []).append(("anchor", r))
        for d in range(1, w):
            emitted.setdefault(r + d, []).append(("probe", r))
    pairs = set()
    for g, rows in emitted.items():
        anchors = [r for role, r in rows if role == "anchor"]
        if not anchors:
            continue
        (a,) = anchors
        for role, r in rows:
            if role == "probe":
                pairs.add((min(a, r), max(a, r)))
    want = {
        (ranks[i], ranks[j])
        for i in range(len(ranks))
        for j in range(i + 1, len(ranks))
        if ranks[j] - ranks[i] < w
    }
    assert pairs == want


@settings(max_examples=40, deadline=None)
@given(st.floats(0.05, 0.95), st.sampled_from([32, 64, 128, 256]))
def test_planner_areas_are_valid_probabilistic_masses(threshold, perms):
    """FP/FN areas are bounded by their integration intervals and the
    chosen split always uses every permutation slot."""
    from raydedup.pipeline.plan import error_areas, optimal_bands

    b, r, fp, fn = optimal_bands(perms, threshold)
    assert b * r == perms
    assert 0.0 <= fp <= threshold + 1e-9
    assert 0.0 <= fn <= (1 - threshold) + 1e-9
    fp2, fn2 = error_areas(b, r, threshold)
    assert fp2 == fp and fn2 == fn
