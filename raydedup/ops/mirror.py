"""Mirror detection: hosts sharing identical content.

The webtext tier-0 structural-dup signal: two hosts serving many
byte-identical documents are mirrors (or scrapes) of each other, and
a crawl pipeline wants that host-pair matrix BEFORE any per-doc
near-dup work — dropping a mirrored host is cheaper than deduping its
documents one by one.

Plan (100 TB lens) — content never shuffles, only fingerprints:

1. **fingerprint map** (map-only): 128-bit murmur3 of the text (the
   ``ops/exact.py`` content-identity precedent; 2^-128 collisions are
   below any corpus scale), rows (fp_hi, fp_lo, host) hash-bucketed
   by fingerprint.
2. **per-bucket kernel**: ONE lexsort -> distinct (fp, host) -> for
   each fingerprint run, all host pairs (run-length-grouped
   triu_indices, the ``ops/linkage.py`` trick) -> per-bucket
   pre-aggregated (host_a, host_b, n) partial counts.
3. **pair rollup** (ONE tiny groupby): sum partials, keep pairs with
   ``n >= min_shared``.

The exchange after step 2 is bounded by distinct host PAIRS per
bucket, not documents. A fingerprint served by d hosts emits d^2/2
pairs — the degenerate case is a text mirrored on thousands of hosts
(a blank page, a 404 template); ``max_hosts_per_fp`` caps those runs
(such universal boilerplate is not evidence of mirroring, the same
rationale as the LSH mega-band cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.hashing import hash_strings

U64 = np.uint64


def host_content_overlap(
    ds,
    host_col: str,
    text_col: str,
    min_shared: int = 2,
    n_buckets: int = 64,
    max_hosts_per_fp: int = 256,
):
    """ds (host, text) -> Dataset (host_a, host_b, n_shared): host
    pairs sharing >= ``min_shared`` distinct texts; host_a < host_b.

    ``max_hosts_per_fp`` caps each fingerprint run at its first
    ``max_hosts_per_fp`` hosts in ASCENDING host order before pair
    emission — universal boilerplate (a blank page served by thousands
    of hosts) is not mirroring evidence. The cap is therefore
    systematic, not random: hosts sorting late lexicographically are
    the ones dropped from capped runs, and ``n_shared`` undercounts
    pairs involving them. Capped kernels emit a ``warnings.warn`` with
    the affected run count so a capped result is distinguishable from
    an exact one (round-4 advisor); pass ``max_hosts_per_fp`` large
    enough for your corpus when exact counts matter."""

    def rows(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        h1, h2 = hash_strings(t)
        return pa.table(
            {
                "_b": pa.array((h1 % U64(n_buckets)).astype(np.int64)),
                "f1": pa.array(h1.view(np.int64)),
                "f2": pa.array(h2.view(np.int64)),
                "host": batch[host_col],
            }
        )

    empty = pa.table(
        {
            "host_a": pa.array([], pa.string()),
            "host_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        f1 = g["f1"].to_numpy(zero_copy_only=False)
        f2 = g["f2"].to_numpy(zero_copy_only=False)
        hosts = g["host"].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((hosts, f2, f1))
        f1, f2, hosts = f1[order], f2[order], hosts[order]
        # distinct (fp, host)
        keep = np.ones(len(f1), bool)
        keep[1:] = (f1[1:] != f1[:-1]) | (f2[1:] != f2[:-1]) | (hosts[1:] != hosts[:-1])
        f1, f2, hosts = f1[keep], f2[keep], hosts[keep]
        new = np.ones(len(f1), bool)
        new[1:] = (f1[1:] != f1[:-1]) | (f2[1:] != f2[:-1])
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.zeros(len(run_len), np.int64)
        np.cumsum(run_len[:-1], out=run_start[1:])
        ia_all, ib_all = [], []
        capped = np.minimum(run_len, max_hosts_per_fp)
        n_capped_runs = int((run_len > max_hosts_per_fp).sum())
        if n_capped_runs:
            import warnings

            warnings.warn(
                f"host_content_overlap: {n_capped_runs} fingerprint run(s) "
                f"exceeded max_hosts_per_fp={max_hosts_per_fp}; n_shared "
                "undercounts pairs involving their later-sorted hosts",
                RuntimeWarning,
                stacklevel=2,
            )
        for s in np.unique(capped[capped >= 2]):
            starts = run_start[capped == s]
            members = starts[:, None] + np.arange(s)[None, :]
            ia, ib = np.triu_indices(int(s), k=1)
            ia_all.append(members[:, ia].reshape(-1))
            ib_all.append(members[:, ib].reshape(-1))
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        # hosts are ascending within each run, so (ia, ib) is already
        # (host_a < host_b); pre-aggregate pair counts in-bucket
        pair = np.char.add(np.char.add(hosts[ia], "\x00"), hosts[ib])
        uniq, inv, cnt = np.unique(pair, return_inverse=True, return_counts=True)
        first = np.full(len(uniq), -1, np.int64)
        first[inv[::-1]] = np.arange(len(inv))[::-1]
        return pa.table(
            {
                "host_a": pa.array(hosts[ia[first]]),
                "host_b": pa.array(hosts[ib[first]]),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    partials = (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(kernel, batch_format="pyarrow")
    )
    out = (
        partials.groupby(["host_a", "host_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
        .filter(expr=f"n_shared >= {int(min_shared)}")
    )
    return out
