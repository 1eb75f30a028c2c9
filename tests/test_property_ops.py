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
