"""skyline2d / grouped_zscore vs literal brute-force references."""

import numpy as np
import pandas as pd


def _brute_skyline(x, y):
    n = len(x)
    keep = np.ones(n, bool)
    for i in range(n):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        if dom.any():
            keep[i] = False
    return keep


def test_skyline_mask_matches_brute_force():
    from raydedup.ops.skyline import skyline_mask

    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(1, 120))
        # small int domain forces heavy x-ties; occasional duplicates
        x = rng.integers(0, 8, n)
        y = rng.integers(0, 8, n).astype(np.float64)
        got = skyline_mask(x, y)
        assert (got == _brute_skyline(x, y)).all(), (trial, x, y)


def test_skyline2d_distributed_equals_local(ray_session):
    import ray.data as rd

    from raydedup.ops.skyline import skyline2d, skyline_mask

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(500),
            "x": rng.integers(0, 50, 500),
            "y": np.round(rng.uniform(0, 100, 500), 2),
        }
    )
    ds = rd.from_pandas(df).repartition(7)  # force multi-block local pass
    got = (
        skyline2d(ds, "x", "y").to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        df[skyline_mask(df.x.to_numpy(), df.y.to_numpy())]
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_grouped_median_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.stats import grouped_median

    rng = np.random.default_rng(67)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 9, 301).astype(np.int64),
            "v": np.round(rng.uniform(0, 100, 301), 2),
        }
    )
    got = (
        grouped_median(rd.from_pandas(df).repartition(5), "g", "v", n_buckets=4)
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, grp in df.groupby("g"):
        cents = np.sort(np.rint(grp.v.to_numpy() * 100).astype(np.int64))
        n = len(cents)
        want = round((cents[(n - 1) // 2] + cents[n // 2]) / 2.0 / 100.0, 6)
        assert got.loc[g, "median"] == want, g
        assert got.loc[g, "n_rows"] == n


def test_grouped_mad_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.stats import grouped_mad

    rng = np.random.default_rng(71)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 7, 240).astype(np.int64),
            "v": np.round(rng.uniform(0, 50, 240), 2),
        }
    )
    got = (
        grouped_mad(rd.from_pandas(df).repartition(4), "g", "v", n_buckets=4)
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, grp in df.groupby("g"):
        cents = np.sort(np.rint(grp.v.to_numpy() * 100).astype(np.int64))
        n = len(cents)
        m2 = cents[(n - 1) // 2] + cents[n // 2]
        dev = np.sort(np.abs(2 * cents - m2))
        d2 = dev[(n - 1) // 2] + dev[n // 2]
        assert got.loc[g, "median"] == round(m2 / 2.0 / 100.0, 6), g
        assert got.loc[g, "mad"] == round(d2 / 2.0 / 2.0 / 100.0, 6), g


def test_grouped_ols_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.stats import grouped_ols

    rng = np.random.default_rng(59)
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q"], 300),
            "x": rng.integers(1, 50, 300).astype(np.float64),
        }
    )
    df["y"] = np.round(3.5 * df.x + 10 + rng.normal(0, 5, 300), 2)
    got = (
        grouped_ols(rd.from_pandas(df).repartition(5), "g", "x", "y")
        .to_pandas()
        .set_index("g")
    )
    for g in "pq":
        sub = df[df.g == g]
        cx = np.rint(sub.x.to_numpy()).astype(np.int64)
        cy = np.rint(sub.y.to_numpy() * 100).astype(np.int64)
        n = float(len(cx))
        sx, sy = float(cx.sum()), float(cy.sum())
        sxx, sxy = float((cx * cx).sum()), float((cx * cy).sum())
        bc = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert got.loc[g, "slope"] == round(bc * (1.0 / 100.0), 6)
        assert got.loc[g, "intercept"] == round(((sy - bc * sx) / n) / 100.0, 6)
        # sanity: recovers the planted line roughly
        assert abs(got.loc[g, "slope"] - 3.5) < 0.3


def test_grouped_mode_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.stats import grouped_mode

    rng = np.random.default_rng(53)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 15, 500).astype(np.int64),
            "v": rng.choice(["zz", "aa", "mm", "bb"], 500),
        }
    )
    got = (
        grouped_mode(rd.from_pandas(df).repartition(6), "g", "v", n_buckets=4)
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, grp in df.groupby("g"):
        c = grp.v.value_counts()
        top = c.max()
        want_v = sorted(c[c == top].index)[0]  # tie → lexicographically smallest
        assert got.loc[g, "mode_value"] == want_v, g
        assert got.loc[g, "n_rows"] == top, g


def test_grouped_zscore_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.zscore import grouped_zscore

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": np.arange(400),
            "g": rng.choice(["a", "b", "c"], 400),
            "v": np.round(rng.uniform(1, 1000, 400), 2),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    got = (
        grouped_zscore(ds, "g", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # literal per-group loop over exact cents
    z = np.empty(len(df))
    cents = np.rint(df.v.to_numpy() * 100).astype(np.int64)
    for g in "abc":
        m = (df.g == g).to_numpy()
        c = cents[m]
        n = len(c)
        s, ss = int(c.sum()), int((c.astype(object) ** 2).sum())
        mean = float(s) / float(n)
        std = np.sqrt((float(ss) - float(s) * float(s) / float(n)) / float(n - 1))
        z[m] = np.round((c.astype(np.float64) - mean) / std, 6)
    assert (got["z"].to_numpy() == z).all()


def test_grouped_zscore_cogroup_path_matches_broadcast(ray_session):
    """broadcast_cap=0 forces the bucketed full-row fallback; its z
    values must equal the broadcast path's bit-for-bit (same float
    expression over the same exact integer sums)."""
    import ray.data as rd

    from raydedup.ops.zscore import grouped_zscore

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": np.arange(300),
            "g": rng.choice(["a", "b", "c", "d", "e"], 300),
            "v": np.round(rng.uniform(-500, 1000, 300), 2),
        }
    )
    # a singleton group (NULL z) and a constant group (zero variance)
    df.loc[0, "g"] = "solo"
    df.loc[1:4, "g"] = "const"
    df.loc[1:4, "v"] = 7.77

    def run(cap):
        ds = rd.from_pandas(df).repartition(5)
        return (
            grouped_zscore(ds, "g", "v", broadcast_cap=cap)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    bc = run(2_000_000)
    cg = run(0)
    assert list(cg.columns) == list(bc.columns)
    a, b = bc["z"].to_numpy(), cg["z"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    assert (both_nan | (a == b)).all()
    assert np.isnan(bc.loc[bc.g == "solo", "z"]).all()
    assert np.isnan(bc.loc[bc.g == "const", "z"]).all()
