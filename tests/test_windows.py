"""Windowed event operators vs DuckDB oracles at sf0.001."""

import duckdb
import pytest

import ray.data as rd

from raydedup.ops.windows import session_windows, tumbling_window_aggregate

SF = "/root/testdata/sf0.001"


def test_tumbling_matches_duckdb(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    out = (
        tumbling_window_aggregate(ds, "user_id", "ts", "value", width_s=300)
        .sort(["user_id", "window_start"])
        .to_pandas()
    )
    oracle = duckdb.sql(
        f"""SELECT user_id,
                   make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
                   count(*) AS n_events, sum(value) AS total_value
            FROM '{SF}/events.parquet' GROUP BY 1,2 ORDER BY user_id, window_start"""
    ).df()
    assert len(out) == len(oracle)
    assert (out.n_events.to_numpy() == oracle.n_events.to_numpy()).all()
    assert abs(out.total_value.to_numpy() - oracle.total_value.to_numpy()).max() < 1e-6


def test_sessions_match_duckdb(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    out = session_windows(ds, "user_id", "ts", gap_s=600).sort(
        ["user_id", "session_start"]
    ).to_pandas()
    oracle = duckdb.sql(
        f"""WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY ts) > 600000000
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS ns
              FROM '{SF}/events.parquet'),
            sess AS (
              SELECT user_id, ts, sum(ns) OVER (
                PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) sid
              FROM marked)
            SELECT user_id, min(ts) session_start, max(ts) session_end, count(*) n_events
            FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"""
    ).df()
    assert len(out) == len(oracle)
    assert (out.n_events.to_numpy() == oracle.n_events.to_numpy()).all()
    assert (out.session_start.to_numpy() == oracle.session_start.to_numpy()).all()