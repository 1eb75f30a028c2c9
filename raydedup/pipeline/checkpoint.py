"""Stage-boundary checkpoints: partitioned parquet + manifest + metrics.

Every pipeline stage can snapshot its output as a directory of parquet
part files plus a ``manifest.json`` recording:

- the **config hash** of every recall-affecting knob — a resume with a
  changed config fails fast, the engine-level analog of the
  reference's seed-hash enforcement at merge time
  (``theta/sketch.rs:699-703``);
- **per-partition lineage**: input files, per-output-file row counts;
- **metrics**: stage wall time, row counts, stage-specific counters.

Writes are atomic: data lands in ``<stage>.tmp/`` and is renamed to
``<stage>/`` only after the manifest is in place, so a killed run
never leaves a half-written stage that a resume would trust
(ray_guide.md: "write to a temp dir, rename, plus a manifest").
"""

from __future__ import annotations

import json
import os
import shutil
import time


class ConfigMismatch(RuntimeError):
    pass


class CheckpointManager:
    def __init__(self, root: str, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def has_stage(self, stage: str) -> bool:
        """True if the stage is complete AND was written with this config."""
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            manifest = json.load(f)
        if manifest.get("config_hash") != self.config_hash:
            raise ConfigMismatch(
                f"checkpoint stage '{stage}' was written with config "
                f"{manifest.get('config_hash')}, current is {self.config_hash}; "
                "delete the checkpoint dir or restore the config"
            )
        return True

    def write_stage(self, stage: str, ds, metrics: dict | None = None, lineage: list | None = None):
        """Materialize ``ds`` into the stage dir atomically; returns the
        re-read Dataset (so downstream consumes the checkpoint, making
        the stage's compute garbage-collectable)."""
        tmp = self._dir(stage) + ".tmp"
        final = self._dir(stage)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        t0 = time.time()
        ds.write_parquet(tmp)
        files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        import pyarrow.parquet as pq

        per_file = [{"file": f, "rows": pq.read_metadata(os.path.join(tmp, f)).num_rows} for f in files]
        manifest = {
            "stage": stage,
            "config_hash": self.config_hash,
            "rows": sum(p["rows"] for p in per_file),
            "partitions": per_file,
            "lineage": lineage or [],
            "metrics": dict(metrics or {}, wall_s=round(time.time() - t0, 3)),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp, final)
        return self.read_stage(stage)

    def read_stage(self, stage: str):
        import ray.data as rd

        d = self._dir(stage)
        with open(self._manifest_path(stage)) as f:
            manifest = json.load(f)
        files = [os.path.join(d, p["file"]) for p in manifest["partitions"]]
        return rd.read_parquet(files)

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)


def run_dedup_checkpointed(
    pages,
    cfg,
    ckpt_root: str,
    input_lineage: list | None = None,
    **run_kwargs,
):
    """Checkpointed variant of ``run.run_dedup``: each stage boundary is
    snapshotted; a rerun resumes from the last complete stage.

    Stages: signatures → candidates → verified → assignments.
    """
    from raydedup.pipeline.cluster import cluster_assignments
    from raydedup.pipeline.lsh import candidate_pairs
    from raydedup.pipeline.run import build_signatures
    from raydedup.pipeline.verify import verify_pairs

    ck = CheckpointManager(ckpt_root, cfg.config_hash())
    lineage = input_lineage or []

    if ck.has_stage("signatures"):
        sigs = ck.read_stage("signatures")
    else:
        sigs = build_signatures(
            pages.select_columns(["url", "text"]), cfg,
            concurrency=run_kwargs.get("concurrency", (1, 8)),
        )
        sigs = ck.write_stage("signatures", sigs, lineage=lineage)

    if ck.has_stage("candidates"):
        cands = ck.read_stage("candidates")
    else:
        cands = candidate_pairs(sigs, cfg, n_buckets=run_kwargs.get("n_buckets", 256))
        cands = ck.write_stage(
            "candidates", cands, lineage=[f"checkpoint:signatures@{cfg.config_hash()}"]
        )

    if ck.has_stage("verified"):
        verified = ck.read_stage("verified")
    else:
        verified = verify_pairs(
            cands.materialize(), sigs, cfg,
            num_partitions=run_kwargs.get("num_join_partitions", 8),
        )
        verified = ck.write_stage(
            "verified", verified, lineage=[f"checkpoint:candidates@{cfg.config_hash()}"]
        )

    if ck.has_stage("assignments"):
        assignments = ck.read_stage("assignments")
    else:
        dup_pairs = verified.filter(expr="is_dup")
        assignments = cluster_assignments(dup_pairs, pages)
        n_dups = dup_pairs.count()
        assignments = ck.write_stage(
            "assignments", assignments,
            metrics={"n_dup_pairs": n_dups},
            lineage=[f"checkpoint:verified@{cfg.config_hash()}"],
        )

    return ck, assignments
