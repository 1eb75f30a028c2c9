"""Degenerate inputs: no dups, empty texts, tiny corpora."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.pipeline.run import run_dedup


def test_no_duplicates_identity_assignment(ray_session):
    # all-distinct docs: every cluster_id == own url, no dup pairs
    urls = [f"u{i:03d}" for i in range(40)]
    texts = [" ".join(f"w{i}_{j}" for j in range(60)) for i in range(40)]
    pages = rd.from_arrow(pa.table({"url": urls, "text": texts}))
    res = run_dedup(pages, DedupConfig(), n_buckets=8)
    asg = res.assignments.to_pandas()
    assert len(asg) == 40
    assert (asg.url == asg.cluster_id).all()
    assert res.dup_pairs.count() == 0


def test_empty_and_whitespace_texts(ray_session):
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["a", "b", "c", "d"],
                "text": ["", "   ", "real content words here now five", "real content words here now five"],
            }
        )
    )
    res = run_dedup(pages, DedupConfig(), n_buckets=4)
    asg = res.assignments.to_pandas().set_index("url")
    assert len(asg) == 4
    # the two empty-ish docs must NOT merge with anything
    assert asg.loc["a", "cluster_id"] == "a"
    assert asg.loc["b", "cluster_id"] == "b"
    # the identical docs must merge
    assert asg.loc["c", "cluster_id"] == asg.loc["d", "cluster_id"] == "c"


def test_two_doc_corpus(ray_session):
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["x", "y"],
                "text": ["one two three four five six seven"] * 2,
            }
        )
    )
    res = run_dedup(pages, DedupConfig(), n_buckets=2)
    asg = res.assignments.to_pandas()
    assert set(asg.cluster_id) == {"x"}


def test_single_short_doc(ray_session):
    pages = rd.from_arrow(pa.table({"url": ["solo"], "text": ["hi"]}))
    res = run_dedup(pages, DedupConfig(), n_buckets=2)
    asg = res.assignments.to_pandas()
    assert asg.cluster_id.tolist() == ["solo"]