"""Broadcast vs cogroup verification produce identical outputs."""

import pandas as pd
import pytest

import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.pipeline.lsh import candidate_pairs
from raydedup.pipeline.run import build_signatures
from raydedup.pipeline.verify import verify_pairs
from raydedup.synth import generate_pages


def test_strategies_identical(ray_session):
    pages, _ = generate_pages(1200, seed=42)
    cfg = DedupConfig()
    sigs = build_signatures(rd.from_arrow(pages.select(["url", "text"])), cfg).materialize()
    cands = candidate_pairs(sigs, cfg, n_buckets=16).materialize()
    outs = {}
    for strategy in ("broadcast", "cogroup"):
        outs[strategy] = (
            verify_pairs(cands, sigs, cfg, strategy=strategy)
            .to_pandas()
            .sort_values(["url_a", "url_b"])
            .reset_index(drop=True)
        )
    assert len(outs["broadcast"]) > 100
    pd.testing.assert_frame_equal(outs["broadcast"], outs["cogroup"])

def test_confirm_substrings_cogroup_parity(ray_session):
    """The distributed (Bloom + two-shuffle cogroup) substring confirm
    returns exactly what the broadcast path returns, including pairs
    whose text is missing from the corpus (substring=False)."""
    import pyarrow as pa

    from raydedup.pipeline.verify import confirm_substrings

    base = "the quick brown fox jumps over the lazy dog " * 30
    pages = pa.table(
        {
            "url": [f"u{i}" for i in range(6)],
            "text": [
                base,
                base[100:400],
                base[50:300],
                "completely different content here " * 20,
                "another separate doc " * 25,
                "another separate doc " * 5,
            ],
        }
    )
    pairs = pa.table(
        {
            "url_a": ["u1", "u2", "u3", "u5", "u3"],
            "url_b": ["u0", "u0", "u0", "u4", "missing"],
        }
    )
    outs = {}
    for strategy in ("broadcast", "cogroup"):
        outs[strategy] = (
            confirm_substrings(
                rd.from_arrow(pairs), rd.from_arrow(pages), strategy=strategy
            )
            .to_pandas()
            .sort_values(["url_a", "url_b"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["broadcast"], outs["cogroup"])
    m = outs["broadcast"].set_index(["url_a", "url_b"])["substring"]
    assert m[("u1", "u0")] and m[("u2", "u0")] and m[("u5", "u4")]
    assert not m[("u3", "u0")] and not m[("u3", "missing")]


@pytest.mark.parametrize("n_shards", ["1", "2", "8"])
def test_broadcast_shard_count_invariant(ray_session, monkeypatch, n_shards):
    """The sharded broadcast assembly (uh & (S-1) shard split + per-
    (shard_a, shard_b) kernel grouping) returns identical metrics for
    any shard count, including the unsharded S=1 path."""
    monkeypatch.setenv("RAYDEDUP_BCAST_SHARDS", n_shards)
    pages, _ = generate_pages(800, seed=7)
    cfg = DedupConfig()
    sigs = build_signatures(rd.from_arrow(pages.select(["url", "text"])), cfg).materialize()
    cands = candidate_pairs(sigs, cfg, n_buckets=16).materialize()
    out = (
        verify_pairs(cands, sigs, cfg, strategy="broadcast")
        .to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    monkeypatch.delenv("RAYDEDUP_BCAST_SHARDS")
    ref = (
        verify_pairs(cands, sigs, cfg, strategy="cogroup")
        .to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    assert len(out) > 50
    pd.testing.assert_frame_equal(out, ref)
