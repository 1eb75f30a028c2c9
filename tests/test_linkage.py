"""batched_levenshtein / linkage_pairs vs literal references."""

import numpy as np
import pandas as pd


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


def _pad(strs, width):
    out = np.zeros((len(strs), width), np.uint8)
    ln = np.zeros(len(strs), np.int32)
    for i, s in enumerate(strs):
        bs = s.encode()[:width]
        out[i, : len(bs)] = np.frombuffer(bs, np.uint8)
        ln[i] = len(bs)
    return out, ln


def test_batched_levenshtein_matches_literal():
    from raydedup.ops.linkage import batched_levenshtein

    rng = np.random.default_rng(43)
    alpha = "abcde"
    strs_a = ["".join(rng.choice(list(alpha), int(rng.integers(0, 10)))) for _ in range(200)]
    strs_b = ["".join(rng.choice(list(alpha), int(rng.integers(0, 10)))) for _ in range(200)]
    A, la = _pad(strs_a, 12)
    B, lb = _pad(strs_b, 12)
    got = batched_levenshtein(A, la, B, lb)
    want = [_lev(a.encode(), b.encode()) for a, b in zip(strs_a, strs_b)]
    assert got.tolist() == want


def test_linkage_pairs_matches_brute_force(ray_session):
    import ray.data as rd

    from raydedup.ops.linkage import linkage_pairs

    rng = np.random.default_rng(47)
    names = ["".join(rng.choice(list("abc"), 6)) for _ in range(120)]
    df = pd.DataFrame(
        {
            "id": np.arange(120),
            "name": names,
            "blk": rng.choice(["x", "y", "z"], 120),
        }
    )
    want = set()
    for i in range(120):
        for j in range(i + 1, 120):
            if df.blk[i] == df.blk[j] and _lev(names[i].encode(), names[j].encode()) <= 2:
                want.add((i, j, _lev(names[i].encode(), names[j].encode())))
    got_df = linkage_pairs(
        rd.from_pandas(df).repartition(4),
        block_col="blk",
        name_col="name",
        id_col="id",
        max_dist=2,
        n_buckets=4,
    ).to_pandas()
    got = {(int(r.id_a), int(r.id_b), int(r.dist)) for r in got_df.itertuples()}
    assert got == want
