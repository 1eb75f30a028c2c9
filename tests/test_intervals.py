"""coalesce_intervals vs a literal per-key merge loop."""

import numpy as np
import pandas as pd


def _ref(df):
    out = []
    for k, grp in df.groupby("k"):
        ivs = sorted(zip(grp.s, grp.e))
        cur_s, cur_e, n = None, None, 0
        for s, e in ivs:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        if cur_s is not None:
            out.append((k, cur_s, cur_e, n))
    return sorted(out)


def test_coalesce_intervals_matches_literal(ray_session):
    import ray.data as rd

    from raydedup.ops.intervals import coalesce_intervals

    rng = np.random.default_rng(41)
    n = 600
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n).astype(np.int64),
            "s": rng.integers(0, 500, n).astype(np.int64),
        }
    )
    df["e"] = df.s + rng.integers(1, 40, n)
    # inject exact duplicates and touching intervals
    df = pd.concat([df, df.head(20), pd.DataFrame({"k": [0, 0], "s": [1000, 1010], "e": [1010, 1020]})])
    ds = rd.from_pandas(df.reset_index(drop=True)).repartition(5)
    got = (
        coalesce_intervals(ds, key="k", start="s", end="e", n_buckets=4)
        .to_pandas()
        .sort_values(["k", "s"])
        .reset_index(drop=True)
    )
    got_t = sorted(zip(got.k, got.s, got.e, got.n_events))
    assert [tuple(map(int, t)) for t in got_t] == _ref(df)
