"""host_content_overlap vs a literal dict-based reference."""

from collections import defaultdict

import numpy as np
import pandas as pd


def _ref(hosts, texts, min_shared):
    by_text = defaultdict(set)
    for h, t in zip(hosts, texts):
        by_text[t].add(h)
    pairs = defaultdict(int)
    for hs in by_text.values():
        hs = sorted(hs)
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                pairs[(hs[i], hs[j])] += 1
    return {(a, b, n) for (a, b), n in pairs.items() if n >= min_shared}


def _corpus(seed=5, n=300):
    rng = np.random.default_rng(seed)
    texts = [f"doc body {i} {rng.integers(1e6)}" for i in range(n)]
    hosts = [f"h{int(rng.integers(6))}" for _ in range(n)]
    # mirrors: every third doc also served from m0/m1
    for i in range(0, n, 3):
        texts.append(texts[i])
        hosts.append(f"m{i % 2}")
    return hosts, texts


def _got(ds):
    df = ds.to_pandas()
    return set(zip(df.host_a, df.host_b, df.n_shared.astype(int)))


def test_host_overlap_matches_reference(ray_session):
    import ray.data as rd

    from raydedup.ops.mirror import host_content_overlap

    hosts, texts = _corpus()
    want = _ref(hosts, texts, 2)
    assert want, "fixture must produce mirrored pairs"
    ds = rd.from_pandas(pd.DataFrame({"host": hosts, "text": texts}))
    got = _got(host_content_overlap(ds, "host", "text", min_shared=2, n_buckets=7))
    assert got == want


def test_host_overlap_blocking_invariant(ray_session):
    import ray.data as rd

    from raydedup.ops.mirror import host_content_overlap

    hosts, texts = _corpus(seed=9)
    df = pd.DataFrame({"host": hosts, "text": texts})
    outs = [
        _got(
            host_content_overlap(
                rd.from_pandas(df).repartition(nb), "host", "text",
                min_shared=2, n_buckets=5,
            )
        )
        for nb in (1, 6)
    ]
    assert outs[0] == outs[1] == _ref(hosts, texts, 2)


def test_host_overlap_counts_distinct_texts_once(ray_session):
    """The same text served twice by the same host pair counts once."""
    import ray.data as rd

    from raydedup.ops.mirror import host_content_overlap

    df = pd.DataFrame(
        {
            "host": ["a", "a", "b", "b", "a", "b"],
            "text": ["t1", "t1", "t1", "t1", "t2", "t2"],
        }
    )
    got = _got(host_content_overlap(rd.from_pandas(df), "host", "text", min_shared=2))
    assert got == {("a", "b", 2)}


def test_host_overlap_caps_universal_boilerplate(ray_session):
    """A text on more hosts than max_hosts_per_fp contributes only the
    capped prefix of hosts — bounding the quadratic blowup."""
    import ray.data as rd

    from raydedup.ops.mirror import host_content_overlap

    hosts = [f"h{i:02d}" for i in range(10)]
    df = pd.DataFrame({"host": hosts * 2, "text": ["same"] * 10 + ["same2"] * 10})
    got = _got(
        host_content_overlap(
            rd.from_pandas(df), "host", "text", min_shared=2, max_hosts_per_fp=4
        )
    )
    # only the first 4 hosts (ascending) of each run pair up
    want_hosts = hosts[:4]
    want = {
        (want_hosts[i], want_hosts[j], 2)
        for i in range(4)
        for j in range(i + 1, 4)
    }
    assert got == want
