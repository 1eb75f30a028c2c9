"""Byte-adaptive bucket counts (ops/_bucketed) — round-5 verdict item:
fixed n_buckets=64 defaults put corpus/64 in one task's memory at
100x scale; bucket counts must grow with input bytes, with the
historical defaults as floors, and the probe must NEVER execute the
plan (Dataset.size_bytes() materializes transformed lineage)."""

from types import SimpleNamespace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydedup.ops._bucketed import adaptive_buckets, resolve_buckets


def _fake_ds(size_bytes):
    """Object exposing exactly the no-execution metadata probe."""
    meta = SimpleNamespace(size_bytes=size_bytes)
    dag = SimpleNamespace(infer_metadata=lambda: meta)
    return SimpleNamespace(_logical_plan=SimpleNamespace(dag=dag))


def test_small_input_keeps_historical_floor():
    assert adaptive_buckets(_fake_ds(10 << 20)) == 64
    assert adaptive_buckets(_fake_ds(None)) == 64
    assert adaptive_buckets(_fake_ds(10 << 20), floor=256) == 256


def test_large_input_picks_more_buckets():
    # 1 TiB at blowup 4 over 256 MiB target groups -> ~16k buckets
    n = adaptive_buckets(_fake_ds(1 << 40), blowup=4.0)
    assert n == (4 << 40) // (256 << 20) + 1
    # monotone in corpus size and capped
    assert adaptive_buckets(_fake_ds(1 << 45)) > adaptive_buckets(_fake_ds(1 << 40))
    assert adaptive_buckets(_fake_ds(1 << 62)) == 1 << 20


def test_explicit_count_passes_through():
    assert resolve_buckets(_fake_ds(1 << 40), 7) == 7
    assert resolve_buckets(_fake_ds(1 << 40), None, blowup=4.0) > 64


@pytest.mark.usefixtures("ray_session")
def test_parquet_read_uses_file_metadata(tmp_path):
    import ray.data as rd

    path = tmp_path / "t.parquet"
    pq.write_table(
        pa.table({"x": pa.array(np.arange(1000), pa.int64())}), path
    )
    ds = rd.read_parquet(str(path))
    assert adaptive_buckets(ds) == 64  # tiny file -> floor
    # transformed lineage: Ray cannot infer a size without executing;
    # the helper must fall back to the floor instead of materializing
    assert adaptive_buckets(ds.map_batches(lambda b: b)) == 64


def test_bucket_count_invariance_contract():
    """The ops wired to resolve_buckets must give bucket-count-
    invariant results; spot-check the session kernel at two counts."""
    import duckdb

    import ray.data as rd
    from raydedup.ops.windows import session_windows

    rng = np.random.default_rng(7)
    n = 400
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 25, n)),
            "ts": pa.array(
                rng.integers(0, 3_600_000_000, n).astype("datetime64[us]")
            ),
        }
    )
    outs = []
    for nb in (4, 64):
        ds = rd.from_arrow(tbl)
        out = (
            session_windows(ds, "user_id", "ts", gap_s=120, n_buckets=nb)
            .to_pandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])
    oracle = duckdb.sql(
        """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 120 SECOND OR
                      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS new_s
          FROM tbl)
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM (SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
              FROM flagged)
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
        """
    ).df()
    got = outs[0]
    assert len(got) == len(oracle)
    assert (got["user_id"].to_numpy() == oracle["user_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == oracle["n_events"].to_numpy()).all()
