"""Exact histogram-bisection order statistics (ops/selection.py).

Every answer must equal np.sort(column)[ceil(q*n) - 1] exactly — the
DuckDB quantile_disc definition — for adversarial shapes: duplicates,
negatives, all-equal columns, tiny n, and a materialize cap small
enough to force multiple bisection rounds."""

import math

import numpy as np
import pyarrow as pa
import pytest

from raydedup.ops.selection import exact_quantile


def _expected(v: np.ndarray, q: float) -> float:
    k = min(max(int(math.ceil(q * len(v))), 1), len(v))
    return float(np.sort(v)[k - 1])


def _ds(v: np.ndarray, n_blocks: int):
    import ray.data as rd

    return rd.from_arrow(pa.table({"x": pa.array(v, pa.float64())})).repartition(n_blocks)


def test_exact_quantile_random_with_duplicates(ray_session):
    rng = np.random.default_rng(5)
    v = np.round(rng.normal(0, 100, size=20000), 1)  # heavy duplicates
    v[:500] = -1234.5  # a hot value
    ds = _ds(v, 6)
    for q in (0.01, 0.25, 0.5, 0.9, 1.0):
        got = exact_quantile(ds, "x", q, bins=64, max_materialize=300)
        assert got == _expected(v, q), q


def test_exact_quantile_all_equal_and_tiny(ray_session):
    ds = _ds(np.full(5000, 7.25), 3)
    assert exact_quantile(ds, "x", 0.5, bins=32, max_materialize=10) == 7.25
    tiny = _ds(np.array([3.0, 1.0, 2.0]), 2)
    assert exact_quantile(tiny, "x", 0.5) == 2.0
    assert exact_quantile(tiny, "x", 0.0) == 1.0
    assert exact_quantile(tiny, "x", 1.0) == 3.0


def test_exact_quantile_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
    for q in (0.25, 0.5, 0.95):
        got = exact_quantile(ds, "l_extendedprice", q, bins=128, max_materialize=200)
        exp = duckdb.sql(
            f"select quantile_disc(l_extendedprice, {q}) from '{SF}/lineitem.parquet'"
        ).fetchone()[0]
        assert got == float(exp), q
