"""Sequence packing (ops/packing.py): distributed concat-then-chunk
assignment equals the single-process window-cumsum twin, across block
splits, with empty docs and docs longer than seq_len."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _expected(df: pd.DataFrame, seq_len: int) -> pd.DataFrame:
    d = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    toks = d["text"].str.split().str.len().fillna(0).astype(np.int64)
    toks[d["text"].str.strip() == ""] = 0
    start = np.concatenate([[0], np.cumsum(toks.to_numpy())[:-1]])
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"],
            "n_tokens": toks.to_numpy(),
            "pack_id": start // seq_len,
            "pack_pos": start % seq_len,
        }
    )


@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_pack_concat_chunks_matches_cumsum_twin(ray_session, n_blocks):
    from raydedup.ops.packing import pack_concat_chunks

    rng = np.random.RandomState(7)
    n = 400
    texts = []
    for i in range(n):
        w = int(rng.randint(0, 60))
        texts.append(" ".join(f"w{j}" for j in range(w)))
    texts[5] = ""  # empty doc
    texts[6] = "   "  # whitespace-only doc
    texts[7] = " ".join(f"x{j}" for j in range(5000))  # spans many packs
    df = pd.DataFrame({"doc_id": [f"d{i:05d}" for i in range(n)], "text": texts})
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = rd.from_pandas(list(np.array_split(shuffled, n_blocks)))

    out = (
        pack_concat_chunks(ds, seq_len=512, n_buckets=8)
        .to_pandas()
        .sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
    )
    exp = _expected(df, 512)
    pd.testing.assert_frame_equal(
        out[["doc_id", "n_tokens", "pack_id", "pack_pos"]].astype(
            {"n_tokens": np.int64, "pack_id": np.int64, "pack_pos": np.int64}
        ),
        exp.astype({"n_tokens": np.int64, "pack_id": np.int64, "pack_pos": np.int64}),
    )
    # packs are dense 0..max and every pack except the last holds
    # exactly seq_len starting-token capacity worth of tokens
    total = exp["n_tokens"].sum()
    assert out["pack_id"].max() == (total - 1) // 512


def test_pack_single_bucket_and_tiny_corpus(ray_session):
    from raydedup.ops.packing import pack_concat_chunks

    df = pd.DataFrame({"doc_id": ["a", "b", "c"], "text": ["one two", "three", "four five six"]})
    ds = rd.from_pandas(df)
    out = pack_concat_chunks(ds, seq_len=4, n_buckets=16).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["pack_id"].tolist() == [0, 0, 0]  # starts at 0, 2, 3
    assert out["pack_pos"].tolist() == [0, 2, 3]
