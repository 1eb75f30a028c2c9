"""Run configuration for the dedup pipeline.

One frozen config per run; its hash is stamped into every checkpoint
manifest and sketch header region so that a resume with a changed
config fails fast — the engine-level analog of the reference's
seed-hash enforcement at merge time (``theta/sketch.rs:699-703``,
``theta/intersection.rs:81-87``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # hashing
    seed: int = 9001  # DataSketches default update seed (hash/mod.rs:61)
    # shingling (BASELINE.json north_star: 5-gram shingles)
    shingle_k: int = 5  # words per shingle
    # MinHash (north_star: 128 permutations)
    num_perms: int = 128
    # signature kernel: "perm" = 128 independent permutations (the
    # north-star config, default); "oph" = one-permutation hashing with
    # densified bins (Li/Owen/Zhang 2012 + Shrivastava/Li 2014) — one
    # hash per shingle instead of 128 permutation passes, the ALU-cheap
    # scale mode. Candidates from either mode feed the SAME
    # exact-Jaccard verify, so precision is unchanged; OPH slot
    # agreement has higher variance on short docs (recall gated on the
    # golden fixtures in tests).
    sig_mode: str = "perm"
    # LSH banding: num_perms = bands * rows; threshold ~ (1/b)^(1/r)
    bands: int = 32
    rows: int = 4
    # near-dup decision threshold on exact shingle-set Jaccard
    threshold: float = 0.8
    # hot-band handling: groups larger than this are salted/capped.
    # Runs <= cap emit all pairs; larger runs emit sorted-neighbor
    # CHAINS (sig_fp order puts near-identical docs adjacent), which
    # keeps within-run connectivity for clustering while cutting the
    # O(run^2) candidate volume of boilerplate-trap mega-runs — real
    # dup clusters are far below the cap, so pair recall is unchanged
    # (golden-recall + skew-fixture gates).
    max_band_group: int = 64
    # theta sketches used for per-doc set summaries in the verify path
    theta_lg_k: int = 12
    # batch sizing for the signature map: None = Ray's natural
    # block-sized batches, which keeps read->map pipelining tight (a
    # fixed size makes map tasks wait on several read blocks; measured
    # 82s vs 12s at 8 CPUs with 16k batches on the 240k bench).
    # Downstream shuffles want BIG blocks instead — run_dedup coalesces
    # signature output separately (coalesce_rows).
    batch_size: int | None = None
    # signature blocks are re-bundled to this many rows before the wide
    # band/verify shuffles. 4096 rows ~ 16 MB of signature payload —
    # big enough that shuffle task count stays bounded, small enough
    # that the coalesce pass and the downstream band-explode / verify
    # attach keep cluster-wide parallelism. Round-3 sweep (same window,
    # best-of-2 per point): 60k docs/32 CPUs e2e 15.8s @16384 / 9.0s
    # @8192 / 5.7s @4096 / 6.5s @2048; 240k/32 CPUs 42.8s / 31.7s /
    # 25.7s; 240k/8 CPUs 59.6s @16384 / 28.7s @4096 — 4096 wins at
    # every scale and CPU count measured (the 16384 default chosen in
    # round 2 produced as few as 4 blocks at 60k, strangling the
    # explode/attach stages).
    coalesce_rows: int = 4096

    def __post_init__(self):
        if self.bands * self.rows != self.num_perms:
            raise ValueError(
                f"bands*rows must equal num_perms: {self.bands}*{self.rows} != {self.num_perms}"
            )
        if self.sig_mode not in ("perm", "oph"):
            raise ValueError(f"sig_mode must be 'perm' or 'oph' (got {self.sig_mode!r})")

    @classmethod
    def plan(cls, threshold: float = 0.8, num_perms: int = 128, **kw) -> "DedupConfig":
        """Config with (bands, rows) chosen by the S-curve planner
        (``pipeline/plan.py::optimal_bands``) for ``threshold`` —
        recall-leaning weights, since candidates feed an exact verify
        here so a false positive costs compute but a false negative is
        unrecoverable. The hand-picked default (32x4 at 0.8) is MORE
        recall-leaning still (collision prob ~1.0 at s=0.8); use this
        when tuning to a different threshold.

        The planner also picks ``sig_mode`` (round-5, verdict item 3):
        **oph** unless the caller pins one. One-permutation hashing
        beat the 128-permutation kernel on BOTH throughput and scaling
        at every measured corpus size (240k: 37.8k vs 31.2k docs/s;
        960k: 55.6k vs 45.2k docs/s, 8->32 efficiency 0.717 vs 0.662 —
        BASELINE.md round-4 records) with golden dup-pair recall gated
        at 1.0, because candidates from either mode feed the SAME
        exact-Jaccard verify. ``DedupConfig()`` itself keeps
        ``sig_mode="perm"`` — the north-star compatibility default."""
        from raydedup.pipeline.plan import optimal_bands

        bands, rows, _, _ = optimal_bands(num_perms, threshold)
        kw.setdefault("sig_mode", "oph")
        return cls(
            num_perms=num_perms, bands=bands, rows=rows, threshold=threshold, **kw
        )

    def config_hash(self) -> str:
        """Stable fingerprint of every recall-affecting knob."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]
