"""Checkpoint/resume: kill-and-resume parity, config-change fail-fast."""

import shutil

import pytest

import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.pipeline.checkpoint import CheckpointManager, ConfigMismatch, run_dedup_checkpointed
from raydedup.synth import generate_pages


@pytest.fixture(scope="module")
def corpus():
    pages, _ = generate_pages(600, seed=11)
    return pages


def test_resume_produces_identical_output(ray_session, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    cfg = DedupConfig()
    pages = rd.from_arrow(corpus)

    ck, asg1 = run_dedup_checkpointed(pages, cfg, root, n_buckets=16, input_lineage=["synth:600@seed11"])
    df1 = asg1.to_pandas().sort_values("url").reset_index(drop=True)

    # simulate a crash after stage 2: wipe later stages, resume
    shutil.rmtree(f"{root}/verified")
    shutil.rmtree(f"{root}/assignments")
    ck2, asg2 = run_dedup_checkpointed(pages, cfg, root, n_buckets=16)
    df2 = asg2.to_pandas().sort_values("url").reset_index(drop=True)
    assert df1.equals(df2)

    # manifests carry lineage + metrics + per-partition rows
    m = ck2.manifest("signatures")
    assert m["config_hash"] == cfg.config_hash()
    assert m["rows"] == 600
    assert m["lineage"] == ["synth:600@seed11"]
    assert all("rows" in p for p in m["partitions"])
    assert "wall_s" in m["metrics"]
    assert ck2.manifest("verified")["lineage"] == [f"checkpoint:candidates@{cfg.config_hash()}"]


def test_changed_config_fails_fast(ray_session, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt2"))
    pages = rd.from_arrow(corpus)
    run_dedup_checkpointed(pages, DedupConfig(), root, n_buckets=16)
    with pytest.raises(ConfigMismatch):
        run_dedup_checkpointed(pages, DedupConfig(threshold=0.9), root, n_buckets=16)


def test_atomic_write_no_partial_stage(ray_session, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt3"))
    cfg = DedupConfig()
    ck = CheckpointManager(root, cfg.config_hash())
    assert not ck.has_stage("signatures")
    # a leftover tmp dir (simulated crash mid-write) is not a valid stage
    import os

    os.makedirs(f"{root}/signatures.tmp")
    assert not ck.has_stage("signatures")

def test_job_cli_end_to_end(ray_session, corpus, tmp_path_factory):
    """The ``ray job submit`` entrypoint (pipeline/job.py) runs end to
    end: parquet in → assignments/ + dup_pairs/ out, resumable via the
    checkpoint dir, and it does NOT tear down a Ray session it does
    not own."""
    import pyarrow.parquet as pq

    import ray

    from raydedup.pipeline.job import main

    root = tmp_path_factory.mktemp("jobcli")
    inp = str(root / "pages.parquet")
    pq.write_table(corpus.select(["url", "text"]), inp)
    out1, out2 = str(root / "out1"), str(root / "out2")
    ck = str(root / "ckpt")

    assert main(["--input", inp, "--output", out1, "--checkpoint", ck]) == 0
    assert ray.is_initialized()  # session belonged to the test fixture
    a1 = rd.read_parquet(f"{out1}/assignments")
    assert a1.count() == corpus.num_rows
    assert sorted(a1.schema().names) == ["cluster_id", "url"]
    assert rd.read_parquet(f"{out1}/dup_pairs").count() > 0

    # resume from the same checkpoint: identical assignments, new output dir
    assert main(["--input", inp, "--output", out2, "--checkpoint", ck]) == 0
    df1 = a1.to_pandas().sort_values("url").reset_index(drop=True)
    df2 = (
        rd.read_parquet(f"{out2}/assignments")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert df1.equals(df2)


def test_job_cli_sig_mode_and_planned_bands(ray_session, corpus, tmp_path_factory):
    """--sig-mode oph and --plan-bands drive the whole job with the
    OPH kernel and planner-chosen bands; assignments still cover every
    input doc and the config hash reflects the non-default knobs."""
    import json

    import pyarrow.parquet as pq

    from raydedup.config import DedupConfig
    from raydedup.pipeline.job import main

    root = tmp_path_factory.mktemp("jobcli_oph")
    inp = str(root / "pages.parquet")
    pq.write_table(corpus.select(["url", "text"]), inp)
    out = str(root / "out")

    assert (
        main(
            [
                "--input", inp, "--output", out,
                "--sig-mode", "oph", "--threshold", "0.9", "--plan-bands",
            ]
        )
        == 0
    )
    a = rd.read_parquet(f"{out}/assignments")
    assert a.count() == corpus.num_rows
    planned = DedupConfig.plan(threshold=0.9, sig_mode="oph")
    assert planned.config_hash() != DedupConfig().config_hash()
