"""Exact set-similarity join via prefix filtering (PPJoin-style).

The LSH path (lsh.py) is probabilistic: recall is 1-(1-t^r)^b. This
module is the EXACT candidate generator for the same verify stage —
complete by construction, no tuning knob:

Prefix-filter lemma: order every doc's shingle set by one global total
order. If J(a,b) >= tau then overlap o >= ceil(tau*max(|a|,|b|)) (since
J <= o/|a| and J <= o/|b|), and two sorted sets with overlap >= alpha
must share a token within their first (len - alpha + 1) elements. So
emitting only each doc's PREFIX of length p = m - ceil(tau*m) + 1
yields a candidate superset of all true pairs; verify_pairs then
computes exact Jaccard and keeps J >= tau. All float ceilings lean
lenient (longer prefixes, looser length filter) so rounding can only
ADD candidates, never lose one.

The global order is the shingle u64 hash itself — the stored sets are
already hash-sorted, so the prefix is a zero-cost array slice and NO
corpus-frequency pass or rank join is needed. (Frequency order would
shrink candidate counts on boilerplate-heavy corpora — the standard
refinement — at the cost of a full extra exchange; hash order is the
zero-pass scale default.)

Scale design (100 TB lens):
- The prefix exchange carries (bucket, token u64, uh u64, m i64) — no
  strings, no payloads; coarse token-hash buckets bound task count.
- Pair emission is the repo's run-detection kernel shape: one lexsort
  per bucket, all-pairs per equal-token run with the size filter
  min_m >= tau*max_m applied vectorized, distinct via the pair-bucket
  second (pairs-only, small) shuffle.
- A token shared by many prefixes makes a quadratic run — the known
  PPJoin hot spot; unlike LSH bands it cannot be salted away without
  losing exactness. Frequency ordering is the remedy when that bites.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig
from raydedup.sketches.hashing import fmix64, hash_strings

U64 = np.uint64


def emit_prefix_rows(batch: pa.Table, tau: float, n_buckets: int) -> pa.Table:
    """signatures batch → (bucket, token, uh, m) prefix-token rows."""
    nonempty = batch.filter(pc.greater(batch["n_shingles"], 0))
    n = len(nonempty)
    if n == 0:
        return pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "token": pa.array([], pa.uint64()),
                "uh": pa.array([], pa.uint64()),
                "m": pa.array([], pa.int64()),
            }
        )
    sh = nonempty["shingles"].combine_chunks()
    offs = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = sh.values.to_numpy(zero_copy_only=False).astype(U64, copy=False)
    m = (offs[1:] - offs[:-1]).astype(np.int64)
    # lenient ceil: an ulp of slack can only LENGTHEN the prefix
    p = m - np.ceil(tau * m - 1e-9).astype(np.int64) + 1
    p = np.clip(p, 1, m)
    cum = np.cumsum(p)
    total = int(cum[-1])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum - p, p)
    idx = np.repeat(offs[:-1].astype(np.int64), p) + within
    token = values[idx]
    uh, _ = hash_strings(nonempty["url"])
    return pa.table(
        {
            "bucket": pa.array((fmix64(token) % U64(n_buckets)).astype(np.int64)),
            "token": pa.array(token, pa.uint64()),
            "uh": pa.array(np.repeat(uh, p), pa.uint64()),
            "m": pa.array(np.repeat(m, p)),
        }
    )


def emit_pairs_prefix_bucket(df: pd.DataFrame, tau: float) -> pd.DataFrame:
    """One bucket of prefix rows → candidate (ha, hb) pairs: all-pairs
    per equal-token run, size-filtered (min_m >= tau*max_m, lenient)."""
    token = df["token"].to_numpy().astype(U64)
    uh = df["uh"].to_numpy().astype(U64)
    m = df["m"].to_numpy().astype(np.int64)
    order = np.lexsort((uh, token))
    token, uh, m = token[order], uh[order], m[order]

    new_run = np.ones(len(df), dtype=bool)
    new_run[1:] = token[1:] != token[:-1]
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    run_start = np.zeros(len(run_len), dtype=np.int64)
    np.cumsum(run_len[:-1], out=run_start[1:])

    out_a, out_b, out_ma, out_mb = [], [], [], []
    eligible = run_len >= 2
    for s in np.unique(run_len[eligible]):
        starts = run_start[eligible & (run_len == s)]
        members = starts[:, None] + np.arange(s)[None, :]
        ia, ib = np.triu_indices(int(s), k=1)
        out_a.append(uh[members[:, ia].reshape(-1)])
        out_b.append(uh[members[:, ib].reshape(-1)])
        out_ma.append(m[members[:, ia].reshape(-1)])
        out_mb.append(m[members[:, ib].reshape(-1)])

    if not out_a:
        return pd.DataFrame(
            {"ha": pd.Series([], dtype=np.uint64), "hb": pd.Series([], dtype=np.uint64)}
        )
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    ma = np.concatenate(out_ma).astype(np.float64)
    mb = np.concatenate(out_mb).astype(np.float64)
    keep = (a != b) & (np.minimum(ma, mb) >= tau * np.maximum(ma, mb) - 1e-9)
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    return pd.DataFrame({"ha": lo, "hb": hi}).drop_duplicates()


def emit_containment_rows(batch: pa.Table, tau: float, n_buckets: int) -> pa.Table:
    """signatures batch → (bucket, token, uh, side) rows: side 0 =
    PREFIX tokens (the probe — prefix length uses tau·m because the
    min-containment overlap bound is ceil(tau·|smaller|)), side 1 =
    ALL tokens (the index). Any pair with min-side containment >= tau
    shares a token between the smaller doc's prefix and the other
    doc's full set, so probe×index candidates are complete."""
    pre = emit_prefix_rows(batch, tau, n_buckets)
    nonempty = batch.filter(pc.greater(batch["n_shingles"], 0))
    if len(nonempty) == 0:
        full = pre.select(["bucket", "token", "uh"])
    else:
        sh = nonempty["shingles"].combine_chunks()
        offs = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = sh.values.to_numpy(zero_copy_only=False).astype(U64, copy=False)
        m = (offs[1:] - offs[:-1]).astype(np.int64)
        tok = values[
            np.repeat(offs[:-1], m)
            + (np.arange(int(m.sum()), dtype=np.int64) - np.repeat(np.cumsum(m) - m, m))
        ]
        uh, _ = hash_strings(nonempty["url"])
        full = pa.table(
            {
                "bucket": pa.array((fmix64(tok) % U64(n_buckets)).astype(np.int64)),
                "token": pa.array(tok, pa.uint64()),
                "uh": pa.array(np.repeat(uh, m), pa.uint64()),
            }
        )
    pre_t = pa.table(
        {
            "bucket": pre["bucket"],
            "token": pre["token"],
            "uh": pre["uh"],
            "side": pa.array(np.zeros(len(pre), np.int64)),
        }
    )
    full_t = full.append_column("side", pa.array(np.ones(len(full), np.int64)))
    return pa.concat_tables([pre_t, full_t])


def emit_containment_pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One bucket → candidate (ha, hb): probe-side × index-side per
    equal-token run (a hot token's index postings make this the
    d_probe × d_index SSJoin hot spot — documented)."""
    token = df["token"].to_numpy().astype(U64)
    uh = df["uh"].to_numpy().astype(U64)
    side = df["side"].to_numpy()
    order = np.lexsort((uh, side, token))  # probes (side 0) first per run
    token, uh, side = token[order], uh[order], side[order]
    new_run = np.ones(len(df), dtype=bool)
    new_run[1:] = token[1:] != token[:-1]
    run_id = np.cumsum(new_run) - 1
    # per-run probe x index cross product, vectorized over runs via
    # the cumsum/searchsorted indexing pattern
    n_runs = int(run_id[-1]) + 1 if len(run_id) else 0
    if n_runs == 0:
        return pd.DataFrame(
            {"ha": pd.Series([], dtype=np.uint64), "hb": pd.Series([], dtype=np.uint64)}
        )
    is_probe = side == 0
    c0 = np.bincount(run_id[is_probe], minlength=n_runs)
    c1 = np.bincount(run_id[~is_probe], minlength=n_runs)
    run_start = np.zeros(n_runs, np.int64)
    counts_all = np.bincount(run_id, minlength=n_runs)
    np.cumsum(counts_all[:-1], out=run_start[1:])
    ppk = c0 * c1
    keep_run = ppk > 0
    if not keep_run.any():
        return pd.DataFrame(
            {"ha": pd.Series([], dtype=np.uint64), "hb": pd.Series([], dtype=np.uint64)}
        )
    ppk_k = ppk[keep_run]
    cum = np.cumsum(ppk_k)
    t = np.arange(int(cum[-1]), dtype=np.int64)
    rk = np.searchsorted(cum, t, side="right")
    within = t - (cum - ppk_k)[rk]
    # within each run the lexsort puts probes (side 0) first
    starts = run_start[keep_run]
    a = uh[starts[rk] + within // c1[keep_run][rk]]
    b = uh[starts[rk] + c0[keep_run][rk] + within % c1[keep_run][rk]]
    ne = a != b
    lo = np.minimum(a[ne], b[ne])
    hi = np.maximum(a[ne], b[ne])
    return pd.DataFrame({"ha": lo, "hb": hi}).drop_duplicates()


def containment_candidates(signatures, tau: float, n_buckets: int = 64):
    """Exact candidate superset for min-side containment >= ``tau``
    (substring-style pairs LSH at a Jaccard threshold cannot see:
    a small doc inside a big one has low Jaccard but high
    containment). Same (ha, hb) schema as the other generators."""
    rows = signatures.map_batches(
        lambda b: emit_containment_rows(b, tau, n_buckets), batch_format="pyarrow"
    )
    pairs = rows.groupby("bucket").map_groups(
        emit_containment_pairs_bucket, batch_format="pandas"
    )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("pbucket", pa.array([], pa.int64()))
        ha = batch["ha"].to_numpy(zero_copy_only=False).astype(U64)
        hb = batch["hb"].to_numpy(zero_copy_only=False).astype(U64)
        pb = (fmix64(ha ^ fmix64(hb)) % U64(n_buckets)).astype(np.int64)
        return batch.append_column("pbucket", pa.array(pb))

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(
            lambda df: df.drop_duplicates(["ha", "hb"])[["ha", "hb"]],
            batch_format="pandas",
        )
    )


def prefix_candidates(signatures, cfg: DedupConfig, n_buckets: int = 64):
    """signatures Dataset → Dataset of distinct exact-superset candidate
    (ha, hb) pairs — same schema candidate_pairs emits, so verify_pairs
    consumes either interchangeably."""
    tau = cfg.threshold

    rows = signatures.map_batches(
        lambda b: emit_prefix_rows(b, tau, n_buckets), batch_format="pyarrow"
    )
    pairs = rows.groupby("bucket").map_groups(
        lambda df: emit_pairs_prefix_bucket(df, tau), batch_format="pandas"
    )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("pbucket", pa.array([], pa.int64()))
        ha = batch["ha"].to_numpy(zero_copy_only=False).astype(U64)
        hb = batch["hb"].to_numpy(zero_copy_only=False).astype(U64)
        pb = (fmix64(ha ^ fmix64(hb)) % U64(n_buckets)).astype(np.int64)
        return batch.append_column("pbucket", pa.array(pb))

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(
            lambda df: df.drop_duplicates(["ha", "hb"])[["ha", "hb"]],
            batch_format="pandas",
        )
    )
