"""Memory-headroom stress at sf1.0 (600k synthetic pages) — round-4
verdict item 6: run the flagship dedup plus the two heaviest
multi-exchange ops (gram_novelty, cdc_dedup_stats) inside the 128 GiB
sandbox and RECORD peak object-store usage, per-stage peak heap from
``ds.stats()``, and any spill — turning the 100-TB memory argument
from an extrapolation into a measurement.

Usage:
    python tools/memstress.py [--docs N] [--out BENCH/memstress_r5.json]

Owns its Ray session (driver protocol: library code never inits).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem_summary() -> dict:
    """Object-store headroom + spill evidence.

    The grpc-backed memory_summary API is unavailable in this
    container, so spill is read from the raylet/object-manager logs of
    the CURRENT session (authoritative: every spill batch logs a
    "Spilled X MiB" line) and store pressure from the scheduler's
    available-resources view sampled right after the run."""
    import glob as _glob

    import ray

    avail = ray.available_resources().get("object_store_memory", 0.0)
    total = ray.cluster_resources().get("object_store_memory", 0.0)
    spill_lines = []
    for logf in _glob.glob("/tmp/ray/session_latest/logs/raylet*.out"):
        try:
            with open(logf, errors="replace") as f:
                for line in f:
                    if "Spilled" in line or "spill" in line.lower():
                        spill_lines.append(line.strip()[:200])
        except OSError:
            pass
    spilled_mib = 0
    for line in spill_lines:
        m = re.search(r"Spilled (\d+) MiB", line)
        if m:
            spilled_mib = max(spilled_mib, int(m.group(1)))
    return {
        "object_store_total_bytes": int(total),
        "object_store_available_bytes": int(avail),
        "spilled_mib": spilled_mib,
        "spill_log_lines": spill_lines[-5:],
    }


def _stats_mem_lines(stats: str) -> list[str]:
    """Operator headers + peak-heap + output-bytes lines out of
    ``Dataset.stats()`` — the per-stage memory evidence."""
    keep = []
    for line in stats.splitlines():
        t = line.strip()
        if (
            t.startswith("Operator ")
            or t.startswith("Suboperator")
            or "Peak heap memory" in t
            or t.startswith("* Output size bytes")
        ):
            keep.append(t)
    return keep


def main() -> int:
    docs = 600_000
    out_path = "BENCH/memstress_r5.json"
    args = sys.argv[1:]
    if "--docs" in args:
        docs = int(args[args.index("--docs") + 1])
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from bench import _canary, ensure_corpus
    from raydedup.config import DedupConfig
    from raydedup.pipeline.run import run_dedup

    os.environ.setdefault("RAYDEDUP_BENCH_DOCS", str(docs))
    corpus_dir = ensure_corpus(docs / 600_000.0)
    import glob

    files = sorted(glob.glob(f"{corpus_dir}/pages_*.parquet"))
    record: dict = {
        "docs": docs,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        "object_store_bytes": int(ray.cluster_resources().get("object_store_memory", 0)),
        "canary_pre": _canary(),
        "runs": {},
    }

    def one(name, fn):
        t0 = time.time()
        ds = fn()
        # materialize INTO THE OBJECT STORE (outputs here are small —
        # assignments / per-doc stats — the wide intermediates stream
        # through regardless); stats() only reports after execution
        m = ds.materialize()
        n = m.count()
        wall = round(time.time() - t0, 2)
        stats = m.stats()
        record["runs"][name] = {
            "rows": n,
            "wall_sec": wall,
            "mem_lines": _stats_mem_lines(stats)[:60],
            "cluster_mem": _mem_summary(),
        }
        print(f"{name}: {n} rows in {wall}s", flush=True)

    def flagship():
        pages = rd.read_parquet(files)
        timings: dict = {}
        res = run_dedup(pages, DedupConfig.plan(0.8), timings=timings)
        record["runs"]["dedup_e2e_stage_timings"] = timings
        return res.assignments

    def novelty():
        from raydedup.ops.novelty import gram_novelty
        from raydedup.sketches.aggregates import _column_hashes

        import pyarrow as pa

        pages = rd.read_parquet(files, columns=["url", "text"])

        def add_id(b: pa.Table) -> pa.Table:
            h, _ = _column_hashes(b["url"])
            import numpy as np

            return b.append_column("doc_id", pa.array(h.view(np.int64)))

        return gram_novelty(
            pages.map_batches(add_id, batch_format="pyarrow"), "doc_id"
        )

    def cdc():
        from raydedup.ops.cdc import cdc_dedup_stats

        import numpy as np
        import pyarrow as pa

        pages = rd.read_parquet(files, columns=["url", "text"])

        def add_cols(b: pa.Table) -> pa.Table:
            from raydedup.sketches.aggregates import _column_hashes

            h, _ = _column_hashes(b["url"])
            src = (h % np.uint64(8)).astype(np.int64)
            b = b.append_column("doc_id", pa.array(h.view(np.int64)))
            import pyarrow.compute as pc

            return b.append_column(
                "source", pc.binary_join_element_wise(pa.array(["s"] * len(b)), pa.array(src.astype(str)), "")
            )

        return cdc_dedup_stats(
            pages.map_batches(add_cols, batch_format="pyarrow"), "doc_id"
        )

    one("dedup_e2e", flagship)
    one("gram_novelty", novelty)
    one("cdc_dedup", cdc)
    record["canary_post"] = _canary()
    ray.shutdown()

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
