"""Broadcast range join (ops/rangejoin.py): overlapping intervals,
inclusive boundaries, multi-match replication and no-match drops all
equal a pandas brute-force cross-join twin."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _brute(left: pd.DataFrame, ranges: pd.DataFrame, value_col: str) -> pd.DataFrame:
    rows = []
    for _, lr in left.iterrows():
        for _, rr in ranges.iterrows():
            if rr["lo"] <= lr[value_col] <= rr["hi"]:
                rows.append({**lr.to_dict(), "range_id": rr["range_id"]})
    return pd.DataFrame(rows, columns=[*left.columns, "range_id"])


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_range_join_matches_brute_force(ray_session, n_blocks):
    from raydedup.ops.rangejoin import range_join_broadcast

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "row_id": np.arange(300, dtype=np.int64),
            "v": rng.randint(0, 100, 300).astype(np.int64),
        }
    )
    # overlapping ranges, one boundary-degenerate (lo == hi), one
    # outside the value domain (matches nothing)
    ranges = pd.DataFrame(
        {
            "range_id": np.arange(6, dtype=np.int64),
            "lo": np.array([0, 10, 25, 50, 77, 200], np.int64),
            "hi": np.array([30, 60, 25, 99, 77, 300], np.int64),
        }
    )
    ds = rd.from_pandas(list(np.array_split(left, n_blocks)))
    out = (
        range_join_broadcast(ds, pa.Table.from_pandas(ranges), "v")
        .to_pandas()
        .sort_values(["row_id", "range_id"])
        .reset_index(drop=True)
    )
    exp = _brute(left, ranges, "v").sort_values(["row_id", "range_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["row_id", "v", "range_id"]], exp)
    # boundary inclusivity: values exactly at lo/hi of range 0 joined
    assert ((out["range_id"] == 0) & (out["v"] == 30)).any() == (left["v"] == 30).any()
    # the empty range matched nothing
    assert not (out["range_id"] == 5).any()


def test_range_join_timestamps(ray_session):
    from raydedup.ops.rangejoin import range_join_broadcast

    ts = pd.to_datetime(["2020-01-01", "2020-02-15", "2020-03-31", "2021-01-01"])
    left = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "ts": ts})
    ranges = pa.table(
        {
            "range_id": pa.array([0, 1], pa.int64()),
            "lo": pa.array(pd.to_datetime(["2020-01-01", "2020-02-01"]), pa.timestamp("us")),
            "hi": pa.array(pd.to_datetime(["2020-02-29", "2020-12-31"]), pa.timestamp("us")),
        }
    )
    out = (
        range_join_broadcast(rd.from_pandas(left), ranges, "ts")
        .to_pandas()
        .sort_values(["doc_id", "range_id"])
        .reset_index(drop=True)
    )
    assert list(zip(out["doc_id"], out["range_id"])) == [(0, 0), (1, 0), (1, 1), (2, 1)]
