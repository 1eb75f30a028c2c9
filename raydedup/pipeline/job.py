"""``ray job submit`` entrypoint for the dedup pipeline.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m raydedup.pipeline.job \
            --input s3://bucket/pages/ --output s3://bucket/dedup/ \
            --checkpoint s3://bucket/ckpt/ --salt-hot

In this sandbox the same command runs against the local session
(``RAY_ADDRESS=local`` is preset). The job owns its Ray session only
when none exists (``ray job submit`` provides one).

Outputs (partitioned parquet, resumable layout):
    <output>/assignments/   (url, cluster_id) covering every input doc
    <output>/dup_pairs/     verified duplicate pairs with metrics
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="raydedup: near-duplicate detection job")
    p.add_argument("--input", required=True, help="parquet dir/file(s) of pages (url, text|html, ...)")
    p.add_argument("--output", required=True, help="output dir for assignments/ and dup_pairs/")
    p.add_argument("--checkpoint", default=None, help="stage-checkpoint dir (enables resume)")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument(
        "--sig-mode", choices=("auto", "perm", "oph"), default="auto",
        help="signature kernel: 'auto' lets the planner choose (oph under "
             "--plan-bands — faster AND better-scaling at every measured "
             "size, same exact verify; perm otherwise, the north-star "
             "compatibility config); or pin 128-permutation MinHash "
             "('perm') / one-permutation hashing ('oph') explicitly",
    )
    p.add_argument(
        "--plan-bands", action="store_true",
        help="pick (bands, rows) from the S-curve planner for --threshold "
             "instead of the 32x4 default",
    )
    p.add_argument("--salt-hot", action="store_true", help="Misra-Gries hot-band salting pre-pass")
    p.add_argument("--n-buckets", type=int, default=256)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DedupConfig

    mode_kw = {} if args.sig_mode == "auto" else {"sig_mode": args.sig_mode}
    if args.plan_bands:
        cfg = DedupConfig.plan(threshold=args.threshold, **mode_kw)
    else:
        cfg = DedupConfig(threshold=args.threshold, **mode_kw)
    t0 = time.time()
    pages = rd.read_parquet(args.input)

    if args.checkpoint:
        from raydedup.pipeline.checkpoint import run_dedup_checkpointed

        ck, assignments = run_dedup_checkpointed(
            pages, cfg, args.checkpoint,
            input_lineage=[args.input],
            n_buckets=args.n_buckets,
        )
        dup_pairs = ck.read_stage("verified").filter(expr="is_dup")
    else:
        from raydedup.pipeline.run import run_dedup

        res = run_dedup(pages, cfg, n_buckets=args.n_buckets, salt_hot=args.salt_hot)
        assignments = res.assignments
        dup_pairs = res.dup_pairs

    assignments.write_parquet(os.path.join(args.output, "assignments"))
    dup_pairs.write_parquet(os.path.join(args.output, "dup_pairs"))
    n = rd.read_parquet(os.path.join(args.output, "assignments")).count()
    summary = {
        "docs": n,
        "wall_s": round(time.time() - t0, 2),
        "config_hash": cfg.config_hash(),
        "output": args.output,
    }
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
