import numpy as np
import pytest


def test_best_in_cluster_picks_longest_then_min_url(ray_session):
    import ray.data as rd

    from raydedup.ops.select import best_in_cluster

    rng = np.random.default_rng(7)
    # 3 clusters with distinct sizes + 2 singletons; token counts vary
    rows = [
        # cluster c0: doc u2 has the most tokens
        ("u0", "c0", "alpha beta"),
        ("u1", "c0", "alpha beta gamma"),
        ("u2", "c0", "alpha beta gamma delta epsilon"),
        # cluster c1: u3 and u4 tie on tokens -> min url (u3) wins
        ("u3", "c1", "one two three"),
        ("u4", "c1", "uno dos tres"),
        # singletons keep themselves, including an empty doc (0 tokens)
        ("u5", "c5", ""),
        ("u6", "c6", "solo"),
    ]
    # shuffle + uneven blocks so the bucket kernel sees mixed layouts
    order = rng.permutation(len(rows))
    assigns = rd.from_items(
        [{"url": rows[i][0], "cluster_id": rows[i][1]} for i in order],
        override_num_blocks=3,
    )
    pages = rd.from_items(
        [{"url": rows[i][0], "text": rows[i][2]} for i in order],
        override_num_blocks=2,
    )
    out = (
        best_in_cluster(assigns, pages, n_buckets=4)
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    assert out.loc["c0", "keeper_url"] == "u2"
    assert out.loc["c0", "keeper_tokens"] == 5
    assert out.loc["c0", "n_members"] == 3
    assert out.loc["c1", "keeper_url"] == "u3"
    assert out.loc["c1", "n_members"] == 2
    assert out.loc["c5", "keeper_url"] == "u5"
    assert out.loc["c5", "keeper_tokens"] == 0
    assert out.loc["c6", "keeper_url"] == "u6"
    assert len(out) == 4


@pytest.mark.parametrize("seed", [3, 51])
def test_best_in_cluster_matches_bruteforce(ray_session, seed):
    import ray.data as rd

    from raydedup.ops.select import best_in_cluster

    rng = np.random.default_rng(seed)
    n, k = 120, 25
    urls = [f"https://x.local/{i:04d}" for i in range(n)]
    clusters = [f"c{int(rng.integers(k)):03d}" for _ in range(n)]
    texts = [" ".join(["w"] * int(rng.integers(0, 30))) for _ in range(n)]

    expected = {}
    for u, c, t in zip(urls, clusters, texts):
        nt = len([w for w in t.split() if w])
        cur = expected.get(c)
        if cur is None or (-nt, u) < (-cur[1], cur[0]):
            expected[c] = (u, nt, 1 if cur is None else cur[2] + 1)
        else:
            expected[c] = (cur[0], cur[1], cur[2] + 1)

    assigns = rd.from_items(
        [{"url": u, "cluster_id": c} for u, c in zip(urls, clusters)],
        override_num_blocks=5,
    )
    pages = rd.from_items(
        [{"url": u, "text": t} for u, t in zip(urls, texts)],
        override_num_blocks=4,
    )
    got = (
        best_in_cluster(assigns, pages, n_buckets=8)
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    assert len(got) == len(expected)
    for c, (u, nt, size) in expected.items():
        assert got.loc[c, "keeper_url"] == u, c
        assert got.loc[c, "keeper_tokens"] == nt, c
        assert got.loc[c, "n_members"] == size, c
