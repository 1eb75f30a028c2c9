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