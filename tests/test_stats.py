"""Grouped moment statistics: blocking invariance + oracle + edges."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from raydedup.ops.stats import grouped_moments

SF = "/root/testdata/sf0.001"


def _run(df, blocks, **kw):
    n = len(df)
    parts = [d for _, d in df.groupby(np.arange(n) % blocks)]
    ds = rd.from_pandas(parts)
    out = grouped_moments(ds, "g", "x", "y", **kw).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


def test_blocking_invariance_bit_exact(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 5000),
            "x": rng.integers(1, 51, 5000).astype(float),
            "y": np.round(rng.uniform(900.0, 105000.0, 5000), 2),
        }
    )
    outs = [_run(df, b, decimals_x=0, decimals_y=2) for b in (1, 3, 7)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_matches_duckdb_lineitem(ray_session):
    ds = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    out = (
        grouped_moments(ds, "l_returnflag", "l_quantity", "l_extendedprice", 0, 2)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    oracle = duckdb.sql(
        f"""WITH c AS (
              SELECT l_returnflag,
                     CAST(round(l_quantity, 0) AS BIGINT) AS qc,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
              FROM '{SF}/lineitem.parquet'
            ), m AS (
              SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(qc) AS DOUBLE) AS sx,
                     CAST(sum(pc) AS DOUBLE) AS sy,
                     CAST(sum(CAST(qc AS HUGEINT) * qc) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(pc AS HUGEINT) * pc) AS DOUBLE) AS syy,
                     CAST(sum(CAST(qc AS HUGEINT) * pc) AS DOUBLE) AS sxy
              FROM c GROUP BY l_returnflag
            )
            SELECT l_returnflag, n_rows,
                   round(sx / n_rows / 1.0, 6) AS mean_x,
                   round(sy / n_rows / 100.0, 6) AS mean_y,
                   round((sxx - sx * sx / n_rows) / (n_rows - 1) / 1.0, 6) AS var_x,
                   round((syy - sy * sy / n_rows) / (n_rows - 1) / 10000.0, 6)
                     AS var_y,
                   round((n_rows * sxy - sx * sy)
                         / (sqrt(n_rows * sxx - sx * sx)
                            * sqrt(n_rows * syy - sy * sy)), 6) AS corr
            FROM m ORDER BY l_returnflag"""
    ).df()
    assert (out.n_rows.to_numpy() == oracle.n_rows.to_numpy()).all()
    for eng, orc in (
        ("mean_l_quantity", "mean_x"),
        ("mean_l_extendedprice", "mean_y"),
        ("var_l_quantity", "var_x"),
        ("var_l_extendedprice", "var_y"),
        ("corr", "corr"),
    ):
        assert np.allclose(out[eng].to_numpy(), oracle[orc].to_numpy(), atol=0), (
            eng,
            out[eng].tolist(),
            oracle[orc].tolist(),
        )
    # cross-check against DuckDB's own statistical aggregates (tolerance)
    ref = duckdb.sql(
        f"""SELECT l_returnflag, var_samp(l_extendedprice) AS v,
                   corr(l_quantity, l_extendedprice) AS c
            FROM '{SF}/lineitem.parquet'
            GROUP BY l_returnflag ORDER BY l_returnflag"""
    ).df()
    assert np.allclose(out.var_l_extendedprice.to_numpy(), ref.v.to_numpy(), rtol=1e-6)
    assert np.allclose(out["corr"].to_numpy(), ref.c.to_numpy(), atol=1e-6)


def test_edges_singleton_and_constant(ray_session):
    df = pd.DataFrame(
        {
            "g": ["solo", "const", "const", "const"],
            "x": [3.0, 5.0, 5.0, 5.0],
            "y": [1.5, 2.0, 3.0, 4.0],
        }
    )
    out = _run(df, 2, decimals_x=0, decimals_y=2).set_index("g")
    assert out.loc["solo", "n_rows"] == 1
    assert np.isnan(out.loc["solo", "var_x"])
    assert np.isnan(out.loc["solo", "corr"])
    # constant x: variance 0, corr undefined (den == 0) -> NULL
    assert out.loc["const", "var_x"] == 0.0
    assert np.isnan(out.loc["const", "corr"])
    assert out.loc["const", "mean_y"] == 3.0


def test_large_values_int128_path(ray_session):
    # products big enough that int64 sums of squared cents would overflow
    n = 4000
    rng = np.random.default_rng(11)
    y = np.round(rng.uniform(2.0e7, 3.0e7, n), 2)  # cents ~3e9, squares ~9e18
    df = pd.DataFrame({"g": ["a"] * n, "x": np.ones(n), "y": y})
    out = _run(df, 5, decimals_x=0, decimals_y=2)
    cents = [int(v) for v in np.rint(y * 100)]
    s, s2 = sum(cents), sum(c * c for c in cents)
    fn = float(n)
    varc = (float(s2) - float(s) * float(s) / fn) / float(n - 1)
    assert out.loc[0, "var_y"] == round(varc / 10000.0, 6)
    assert out.loc[0, "mean_y"] == round(float(s) / fn / 100.0, 6)


def test_negative_values_exact(ray_session):
    """_hilo's arithmetic-shift decomposition is exact for SIGNED
    int64 — negative x, negative y, and negative cross-products must
    match DuckDB's HUGEINT-exact moments (round-3 advice: lock the
    signed contract with a test)."""
    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 4000),
            "x": rng.integers(-50, 51, 4000).astype(float),
            "y": np.round(rng.uniform(-1000.0, 1000.0, 4000), 2),
        }
    )
    out = _run(df, 5, decimals_x=0, decimals_y=2)
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.sql(
        """WITH c AS (
              SELECT g, CAST(round(x, 0) AS BIGINT) AS qc,
                     CAST(round(y * 100, 0) AS BIGINT) AS pc FROM t
            ), m AS (
              SELECT g, count(*) AS n_rows,
                     CAST(sum(qc) AS DOUBLE) AS sx,
                     CAST(sum(pc) AS DOUBLE) AS sy,
                     CAST(sum(CAST(qc AS HUGEINT) * qc) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(pc AS HUGEINT) * pc) AS DOUBLE) AS syy,
                     CAST(sum(CAST(qc AS HUGEINT) * pc) AS DOUBLE) AS sxy
              FROM c GROUP BY g
            )
            SELECT g, n_rows,
                   round(sx / n_rows / 1.0, 6) AS mean_x,
                   round(sy / n_rows / 100.0, 6) AS mean_y
            FROM m ORDER BY g"""
    ).df()
    got = out[["g", "n_rows", "mean_x", "mean_y"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": "int64"}), oracle.astype({"n_rows": "int64"})
    )
    # blocking invariance holds with signed values too
    pd.testing.assert_frame_equal(_run(df, 1), _run(df, 7))
