"""snm_pairs (sorted-neighborhood dedup) vs a literal sequential
reference: full sort + window scan + python DP Levenshtein."""

import numpy as np
import pandas as pd
import pytest


def _lev(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[len(b)]


def _ref_pairs(ids, keys, window, max_dist, key_len):
    """Sequential SNM: global (key, id) sort, compare rank distances
    1..window-1, byte-level Levenshtein on the first key_len bytes."""
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for p in range(len(order)):
        for q in range(p + 1, min(p + window, len(order))):
            a, b = order[p], order[q]
            d = _lev(keys[a].encode()[:key_len], keys[b].encode()[:key_len])
            if d <= max_dist:
                out.add((min(ids[a], ids[b]), max(ids[a], ids[b]), d))
    return out


def _corpus(n=160, seed=11):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "kappa", "sigma", "omega", "zeta"]
    keys = [
        " ".join(rng.choice(words, 6))
        for _ in range(n)
    ]
    # plant tail-edited near-dups: same 20-char prefix, one substitution
    for i in range(0, n, 7):
        k = keys[i]
        if len(k) > 22:
            keys.append(k[:21] + ("x" if k[21] != "x" else "y") + k[22:])
    ids = list(range(len(keys)))
    return ids, keys


def _got_set(ds):
    df = ds.to_pandas()
    return set(zip(df.doc_a.astype(int), df.doc_b.astype(int), df.dist.astype(int)))


def test_snm_pairs_matches_sequential_reference(ray_session):
    import ray.data as rd

    from raydedup.ops.snm import snm_pairs

    ids, keys = _corpus()
    want = _ref_pairs(ids, keys, window=5, max_dist=3, key_len=32)
    assert want, "fixture must produce pairs"
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "key": keys}))
    got = snm_pairs(
        ds, "doc_id", "key", window=5, max_dist=3, key_len=32,
        n_range_buckets=4, n_buckets=8,
    )
    assert _got_set(got) == want


def test_snm_pairs_blocking_invariant(ray_session):
    import ray.data as rd

    from raydedup.ops.snm import snm_pairs

    ids, keys = _corpus(seed=13)
    df = pd.DataFrame({"doc_id": ids, "key": keys})
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_pandas(df).repartition(nblocks)
        outs.append(
            _got_set(
                snm_pairs(
                    ds, "doc_id", "key", window=4, max_dist=4, key_len=24,
                    n_range_buckets=3, n_buckets=5,
                )
            )
        )
    assert outs[0] == outs[1]
    assert outs[0] == _ref_pairs(ids, keys, window=4, max_dist=4, key_len=24)


def test_snm_window_semantics_excludes_distant_ranks(ray_session):
    """Two keys at edit distance 1 that sort FAR apart (first char
    differs) must NOT pair — the defining SNM miss — while an
    identical-prefix tail edit inside the window must pair."""
    import ray.data as rd

    from raydedup.ops.snm import snm_pairs

    keys = (
        ["a far key"] +                       # rank 0
        [f"m filler {i:03d}" for i in range(20)] +
        ["z far key"] +                       # distance 1 from rank 0, rank 22
        ["m filler 000x"]                     # tail edit of the first filler
    )
    ids = list(range(len(keys)))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "key": keys}))
    got = _got_set(
        snm_pairs(ds, "doc_id", "key", window=3, max_dist=2, key_len=24,
                  n_range_buckets=2, n_buckets=4)
    )
    assert (0, 21, 1) not in got            # far apart in sort order
    assert any(a == 1 and b == 22 for a, b, _ in got)  # adjacent tail edit


def test_snm_rejects_degenerate_window():
    from raydedup.ops.snm import snm_pairs

    with pytest.raises(ValueError):
        snm_pairs(None, "id", "key", window=1)


def test_normalize_sort_key_matches_sql_semantics():
    import pyarrow as pa

    from raydedup.ops.snm import normalize_sort_key

    col = pa.array(["  A\t\tB  c ", "x" * 60, "MiXeD   Case"])
    out = normalize_sort_key(col, key_len=8).to_pylist()
    assert out == ["a b c", "x" * 8, "mixed ca"]
