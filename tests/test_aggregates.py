"""Ray Data sketch-aggregation layer (shared Ray session)."""

import numpy as np
import pytest

import ray.data as rd

from raydedup.sketches.aggregates import (
    TDigestQuantile,
    ThetaDistinct,
    bloom_of,
    countmin_of,
    frequent_items_of,
    hll_distinct,
    tdigest_of,
    theta_distinct,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(ray_session):
    return rd.read_parquet(f"{SF}/lineitem.parquet")


def test_theta_distinct_exact_mode(ray_session, lineitem):
    import duckdb

    exact = duckdb.sql(
        f"select count(distinct l_orderkey) from '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    sk = theta_distinct(lineitem, "l_orderkey", lg_k=16)
    assert sk.estimate() == exact


def test_hll_distinct_tolerance(ray_session, lineitem):
    import duckdb

    exact = duckdb.sql(
        f"select count(distinct l_orderkey) from '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    sk = hll_distinct(lineitem, "l_orderkey", lg_k=12)
    assert abs(sk.estimate() - exact) / exact < 0.05


def test_tdigest_of_median(ray_session, lineitem):
    import duckdb

    true_med = duckdb.sql(f"select median(l_quantity) from '{SF}/lineitem.parquet'").fetchone()[0]
    td = tdigest_of(lineitem, "l_quantity")
    assert abs(td.quantile(0.5) - true_med) < 2.0
    assert abs(td.rank(true_med) - 0.5) < 0.05


def test_countmin_of(ray_session, lineitem):
    import duckdb

    sk = countmin_of(lineitem, "l_returnflag", 4, 64)
    true = dict(
        duckdb.sql(
            f"select l_returnflag, count(*) from '{SF}/lineitem.parquet' group by 1"
        ).fetchall()
    )
    for k, v in true.items():
        assert sk.estimate([k])[0] >= v
        assert sk.estimate([k])[0] <= v + sk.relative_error() * sk.total_weight


def test_frequent_items_of(ray_session, lineitem):
    sk = frequent_items_of(lineitem, "l_returnflag", 64)
    items = {r[0] for r in sk.frequent_items(threshold=0)}
    assert items == {"A", "N", "R"}
    assert sk.maximum_error() == 0  # exact below load factor


def test_bloom_of(ray_session, lineitem):
    import duckdb

    bf = bloom_of(lineitem, "l_orderkey", n=5000, fpp=0.01)
    keys = duckdb.sql(
        f"select distinct l_orderkey from '{SF}/lineitem.parquet'"
    ).df()["l_orderkey"].to_numpy()
    from raydedup.sketches.hashing import hash_u64_column

    h1, _ = hash_u64_column(keys)
    assert bf.contains(h1).all()  # no false negatives


def test_grouped_sketch_aggregation(ray_session, lineitem):
    import duckdb

    out = (
        lineitem.groupby("l_returnflag")
        .aggregate(
            ThetaDistinct("l_orderkey", lg_k=16, alias_name="n_orders"),
            TDigestQuantile("l_quantity", 0.5, alias_name="med_qty"),
        )
        .to_pandas()
        .set_index("l_returnflag")
    )
    truth = duckdb.sql(
        f"""select l_returnflag, count(distinct l_orderkey) n, median(l_quantity) m
            from '{SF}/lineitem.parquet' group by 1"""
    ).df().set_index("l_returnflag")
    for flag in truth.index:
        assert out.loc[flag, "n_orders"] == truth.loc[flag, "n"]
        assert abs(out.loc[flag, "med_qty"] - truth.loc[flag, "m"]) < 3.0

def test_grouped_hll_distinct_sparse_partials(ray_session, lineitem):
    """HllDistinct partials start sparse (coupon phase) so tiny groups
    shuffle coupons, not full register arrays; estimates stay within
    HLL tolerance of exact."""
    import duckdb

    from raydedup.sketches.aggregates import HllDistinct

    out = (
        lineitem.groupby("l_linestatus")
        .aggregate(HllDistinct("l_orderkey", lg_k=12, alias_name="n_orders"))
        .to_pandas()
        .set_index("l_linestatus")
    )
    truth = duckdb.sql(
        f"""select l_linestatus, count(distinct l_orderkey) n
            from '{SF}/lineitem.parquet' group by 1"""
    ).df().set_index("l_linestatus")
    for flag in truth.index:
        n = truth.loc[flag, "n"]
        assert abs(out.loc[flag, "n_orders"] - n) <= max(3, 0.05 * n)


def test_kll_of_and_signature_distance_digest(ray_session, lineitem):
    import duckdb

    from raydedup.sketches.kll import kll_of

    sk = kll_of(lineitem, "l_quantity")
    true_med = duckdb.sql(f"select median(l_quantity) from '{SF}/lineitem.parquet'").fetchone()[0]
    assert abs(sk.quantile(0.5) - true_med) < 2.0
    assert sk.n == lineitem.count()


def test_deterministic_digests_blocking_independent(ray_session):
    """*_det digests are bit-identical across block splits and equal
    their in-process column twins (the sidecar-oracle contract)."""
    import pyarrow.parquet as pq

    from raydedup.sketches.aggregates import tdigest_column_det, tdigest_of_det
    from raydedup.sketches.kll import kll_column_det, kll_of_det

    col = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_quantity"])["l_quantity"]
    twin_td = tdigest_column_det(col, n_buckets=16)
    twin_kll = kll_column_det(col, n_buckets=16)
    for blocks in (1, 3, 7):
        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity"]).repartition(blocks)
        td = tdigest_of_det(ds, "l_quantity", n_buckets=16)
        kll = kll_of_det(ds, "l_quantity", n_buckets=16)
        assert td.to_bytes() == twin_td.to_bytes()
        assert kll.to_bytes() == twin_kll.to_bytes()
    # and the digest is still a digest: median within tolerance
    import duckdb

    true_med = duckdb.sql(f"select median(l_quantity) from '{SF}/lineitem.parquet'").fetchone()[0]
    assert abs(twin_td.quantile(0.5) - true_med) < 2.0
    assert abs(twin_kll.quantile(0.5) - true_med) < 2.0


def test_cpc_merged_estimate_blocking_independent(ray_session):
    """cpc_union([sk]) forces the ICON (merged) estimate, which is a
    pure function of the OR-merged bit matrix — identical across block
    splits (the distinct_custkeys_cpc oracle contract)."""
    import pyarrow.parquet as pq

    from raydedup.sketches.aggregates import _column_hashes, cpc_distinct
    from raydedup.sketches.cpc import CpcSketch, cpc_union

    col = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"])["o_custkey"]
    h1, h2 = _column_hashes(col)
    twin = cpc_union([CpcSketch(11).update_hashes(h1, h2)]).estimate()
    for blocks in (1, 4):
        ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"]).repartition(blocks)
        est = cpc_union([cpc_distinct(ds, "o_custkey", lg_k=11)]).estimate()
        assert est == twin


def test_grouped_tdigest_det_blocking_independent(ray_session):
    """grouped_tdigest_det is bit-identical across block splits and
    equals its in-process twin per group; quantiles track exact."""
    import duckdb
    import pyarrow.parquet as pq

    from raydedup.sketches.aggregates import (
        grouped_tdigest_column_det,
        grouped_tdigest_det,
    )
    from raydedup.sketches.tdigest import TDigest

    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    twins = grouped_tdigest_column_det(
        tbl["event_type"].to_numpy(zero_copy_only=False), tbl["value"], n_buckets=8
    )
    for blocks in (1, 3, 7):
        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"]).repartition(
            blocks
        )
        rows = grouped_tdigest_det(ds, "event_type", "value", n_buckets=8).take_all()
        assert len(rows) == len(twins)
        for r in rows:
            assert r["blob"] == twins[r["event_type"]].to_bytes(), (blocks, r["event_type"])
    exact = dict(
        duckdb.sql(
            f"select event_type, median(value) from '{SF}/events.parquet' group by 1"
        ).fetchall()
    )
    for t, td in twins.items():
        assert td.quantile(0.5) == pytest.approx(exact[t], abs=0.5)
        assert TDigest.from_bytes(td.to_bytes()).total_weight == td.total_weight
