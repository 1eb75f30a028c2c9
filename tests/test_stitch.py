"""Shard-overlap stitching: cross-product pair semantics + blocking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _naive(df, k):
    out = []
    for _, a in df.iterrows():
        for _, b in df.iterrows():
            if a.doc_id != b.doc_id and len(a.text) >= k and len(b.text) >= k:
                if a.text[-k:] == b.text[:k]:
                    out.append((a.doc_id, b.doc_id))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
def test_stitch_pairs_cross_product_and_blocking():
    import ray.data as rd

    from raydedup.ops.stitch import stitch_pairs

    k = 8
    ov = "OVERLAPX"  # shared 8-char window
    df = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4, 5, 6, 7], dtype="int64"),
            "text": [
                "aaaaaa" + ov,          # tail matches ov
                "bbbbbbbb" + ov,        # tail matches ov (2 tails)
                ov + "cccccc",          # head matches ov
                ov + "dddddddd",        # head matches ov
                ov + "ee" + ov,         # head AND tail match ov (3 heads, 3 tails)
                "zzzzzzzzzz",           # no match
                "short",                # < k chars, excluded
            ],
        }
    )
    expect = _naive(df, k)
    assert len(expect) >= 3 * 3 - 1  # cross product minus self-pair of doc 5
    for blocks in (1, 3, 7):
        ds = rd.from_pandas([p for _, p in df.groupby(np.arange(len(df)) % blocks)])
        got = (
            stitch_pairs(ds, "doc_id", k=k, n_buckets=4)
            .sort(["id_a", "id_b"])
            .to_pandas()
        )
        assert list(map(tuple, got.to_numpy())) == expect


def test_stitch_key_rows_tail_extraction():
    """The reverse-slice-reverse tail equals a direct python tail."""
    from raydedup.sketches.hashing import hash_strings

    import pyarrow.compute as pc

    texts = pa.array(["abcdefghij", "0123456789xyz", "ab"])
    k = 5
    tail = pc.utf8_reverse(pc.utf8_slice_codeunits(pc.utf8_reverse(texts), 0, k))
    assert tail.to_pylist() == ["fghij", "89xyz", "ba"[::-1]]
    h_direct, _ = hash_strings(pa.array([t[-k:] for t in texts.to_pylist() if len(t) >= k]))
    h_kernel, _ = hash_strings(pa.array([t for t, s in zip(tail.to_pylist(), texts.to_pylist()) if len(s) >= k]))
    assert (h_direct == h_kernel).all()
