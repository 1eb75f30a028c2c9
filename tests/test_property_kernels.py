"""Property-based invariants for the session-7 vectorized kernels:
skyline dominance, segment-reset cummax, batched Levenshtein, phrase
windows, mode tie-breaks — each against a literal reference on
arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=60
    )
)
def test_skyline_mask_dominance_property(pts):
    from raydedup.ops.skyline import skyline_mask

    x = np.array([p[0] for p in pts], np.int64)
    y = np.array([p[1] for p in pts], np.int64)
    keep = skyline_mask(x, y)
    for i in range(len(pts)):
        dominated = bool(
            ((x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))).any()
        )
        assert keep[i] == (not dominated), (i, pts)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=80),
    st.lists(st.integers(1, 4), min_size=1, max_size=80),
)
def test_segment_cummax_matches_loop(vals, seg_sizes):
    from raydedup.ops.intervals import _segment_cummax

    n = len(vals)
    v = np.array(vals, np.int64)
    # build a non-decreasing seg_id of total length n
    seg = np.repeat(
        np.arange(len(seg_sizes)), np.array(seg_sizes, np.int64)
    )[:n]
    if len(seg) < n:
        seg = np.concatenate([seg, np.full(n - len(seg), seg[-1] if len(seg) else 0)])
    got = _segment_cummax(v, seg.astype(np.int64))
    cur = None
    prev_seg = None
    for i in range(n):
        if seg[i] != prev_seg:
            cur = v[i]
            prev_seg = seg[i]
        else:
            cur = max(cur, v[i])
        assert got[i] == cur, i


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("abc", max_size=8), st.text("abc", max_size=8)),
        min_size=1,
        max_size=25,
    )
)
def test_batched_levenshtein_property(pairs):
    from raydedup.ops.linkage import batched_levenshtein

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[len(b)]

    A = np.zeros((len(pairs), 8), np.uint8)
    B = np.zeros((len(pairs), 8), np.uint8)
    la = np.zeros(len(pairs), np.int32)
    lb = np.zeros(len(pairs), np.int32)
    for i, (a, b) in enumerate(pairs):
        ab, bb = a.encode(), b.encode()
        A[i, : len(ab)] = np.frombuffer(ab, np.uint8)
        B[i, : len(bb)] = np.frombuffer(bb, np.uint8)
        la[i], lb[i] = len(ab), len(bb)
    got = batched_levenshtein(A, la, B, lb)
    for i, (a, b) in enumerate(pairs):
        assert got[i] == lev(a.encode(), b.encode()), (a, b)
