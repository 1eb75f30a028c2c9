"""Property-based invariants (hypothesis) for the distributed layout
operators: packing equals its window-cumsum twin and range join equals
brute force, for ARBITRARY inputs and block splits (small example
budgets — each example drives real Ray datasets)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=50),
    n_blocks=st.integers(min_value=1, max_value=4),
    seq_len=st.integers(min_value=3, max_value=64),
)
def test_pack_concat_chunks_property(ray_session, toks, n_blocks, seq_len):
    from raydedup.ops.packing import pack_concat_chunks

    df = pd.DataFrame(
        {
            "doc_id": [f"d{i:04d}" for i in range(len(toks))],
            "text": [" ".join(["w"] * w) for w in toks],
        }
    )
    shuffled = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    ds = rd.from_pandas(list(np.array_split(shuffled, min(n_blocks, len(df)))))
    out = (
        pack_concat_chunks(ds, seq_len=seq_len, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    nt = np.array(toks, dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(nt)[:-1]])
    assert (out["n_tokens"].to_numpy() == nt).all()
    assert (out["pack_id"].to_numpy() == start // seq_len).all()
    assert (out["pack_pos"].to_numpy() == start % seq_len).all()


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=60),
    bounds=st.lists(
        st.tuples(st.integers(-25, 25), st.integers(0, 15)), min_size=1, max_size=6
    ),
)
def test_range_join_property(ray_session, vals, bounds):
    from raydedup.ops.rangejoin import range_join_broadcast

    left = pd.DataFrame(
        {"row_id": np.arange(len(vals), dtype=np.int64), "v": np.array(vals, np.int64)}
    )
    ranges = pa.table(
        {
            "range_id": pa.array(np.arange(len(bounds), dtype=np.int64)),
            "lo": pa.array([lo for lo, _ in bounds], pa.int64()),
            "hi": pa.array([lo + w for lo, w in bounds], pa.int64()),
        }
    )
    out = range_join_broadcast(rd.from_pandas(left), ranges, "v").to_pandas()
    exp = []
    for i, v in enumerate(vals):
        for rid, (lo, w) in enumerate(bounds):
            if lo <= v <= lo + w:
                exp.append((i, rid))
    if len(out) == 0:
        assert exp == []
        return
    out = out.sort_values(["row_id", "range_id"]).reset_index(drop=True)
    assert list(zip(out["row_id"], out["range_id"])) == exp


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # key
            st.integers(min_value=0, max_value=30),   # order
            st.integers(min_value=-999, max_value=999),  # value in cents
        ),
        min_size=1,
        max_size=60,
    ),
    n_blocks=st.integers(min_value=1, max_value=4),
    window=st.sampled_from([None, 1, 2, 4]),
)
def test_cumulative_rolling_property(ray_session, rows, n_blocks, window):
    """cumulative_per_key equals the pandas window twin for arbitrary
    keys/orders/values, any blocking, any frame."""
    from raydedup.ops.windows import cumulative_per_key

    df = pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "t": [r[1] for r in rows],
            "uid": np.arange(len(rows), dtype=np.int64),
            "v": [r[2] / 100.0 for r in rows],
        }
    )
    ds = rd.from_pandas(list(np.array_split(df, min(n_blocks, len(df)))))
    out = (
        cumulative_per_key(ds, "k", ["t", "uid"], "v", out_col="run",
                           n_buckets=4, window=window)
        .to_pandas()
        .sort_values(["k", "t", "uid"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "t", "uid"]).reset_index(drop=True)
    cents = np.rint(exp["v"].to_numpy() * 100).astype(np.int64)
    g = pd.Series(cents).groupby(exp["k"].to_numpy())
    if window is None:
        want = g.cumsum().to_numpy() / 100.0
    else:
        want = (
            g.rolling(window, min_periods=1).sum().reset_index(level=0, drop=True)
        ).sort_index().to_numpy() / 100.0
    assert (out["run"].to_numpy() == want).all()


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.sampled_from(["a", "b", "c"]),        # category
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=1,
        max_size=50,
    ),
    n_blocks=st.integers(min_value=1, max_value=4),
)
def test_pivot_sum_property(ray_session, rows, n_blocks):
    """pivot_sum equals the pandas pivot_table twin for arbitrary
    inputs and blockings; absent categories are exact zeros."""
    from raydedup.ops.pivot import pivot_sum

    df = pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "c": [r[1] for r in rows],
            "v": [r[2] / 100.0 for r in rows],
        }
    )
    ds = rd.from_pandas(list(np.array_split(df, min(n_blocks, len(df)))))
    cats = ["a", "b", "c", "never"]
    out = pivot_sum(ds, "k", "c", "v", cats).sort("k").to_pandas()
    cents = np.rint(df["v"].to_numpy() * 100).astype(np.int64)
    for cat in cats:
        want = (
            pd.Series(np.where(df["c"] == cat, cents, 0))
            .groupby(df["k"].to_numpy())
            .sum()
            .sort_index()
        )
        assert (out[cat].to_numpy() == want.to_numpy() / 100.0).all(), cat


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),          # user
            st.integers(min_value=0, max_value=40),         # ts (seconds)
            st.sampled_from(["view", "click", "purchase", "error", "other"]),
        ),
        min_size=1,
        max_size=80,
    ),
    n_blocks=st.integers(min_value=1, max_value=4),
)
def test_funnel_stages_property(ray_session, events, n_blocks):
    """funnel_stages equals a literal per-user reference (first
    completion of each step strictly after the previous step's
    completion) for arbitrary event streams and blockings."""
    from raydedup.ops.funnel import funnel_stages

    steps = ["view", "click", "purchase"]
    df = pd.DataFrame(
        {
            "u": [e[0] for e in events],
            "ts": pd.to_datetime([e[1] for e in events], unit="s"),
            "t": [e[2] for e in events],
        }
    )
    want = {}
    rel = df[df["t"].isin(steps)]
    for u, g in rel.groupby("u"):
        stage, t_prev = 0, pd.Timestamp.min
        for s in steps:
            cand = g[(g["t"] == s) & (g["ts"] > t_prev)]
            if len(cand) == 0:
                break
            t_prev = cand["ts"].min()
            stage += 1
        want[u] = stage

    ds = rd.from_pandas(list(np.array_split(df, min(n_blocks, len(df)))))
    out = funnel_stages(ds, "u", "ts", "t", steps, n_buckets=4).to_pandas()
    # no relevant events at all -> legitimately empty (schema-less) output
    got = dict(zip(out["u"], out["stage"])) if "u" in out.columns else {}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30), st.integers(0, 5)),
        min_size=0,
        max_size=120,
    ),
    n_buckets=st.sampled_from([1, 3, 16]),
)
def test_dedup_pairs_property(ray_session, pairs, n_buckets):
    """dedup_pairs (Arrow first-occurrence kernel, engine-hashed
    bucket key): output = exactly the distinct (id_a, id_b) set, one
    row each, extra columns riding along from SOME occurrence of the
    pair — invariant to the bucket count."""
    from raydedup.ops.pairs import dedup_pairs

    tbl = pa.table(
        {
            "id_a": pa.array([p[0] for p in pairs], pa.int64()),
            "id_b": pa.array([p[1] for p in pairs], pa.int64()),
            "meta": pa.array([p[2] for p in pairs], pa.int64()),
        }
    )
    out = dedup_pairs(rd.from_arrow(tbl), n_buckets=n_buckets).to_pandas()
    want = {(a, b) for a, b, _ in pairs}
    if len(out) == 0:
        # an empty input can yield a schemaless empty frame
        assert not want
        return
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == want
    assert len(out) == len(want)  # each pair exactly once
    # the rider column comes from a real occurrence of that pair
    by_pair = {}
    for a, b, m in pairs:
        by_pair.setdefault((a, b), set()).add(m)
    for a, b, m in zip(out["id_a"], out["id_b"], out["meta"]):
        assert m in by_pair[(a, b)]
