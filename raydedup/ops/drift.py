"""Corpus drift: pairwise Jensen-Shannon divergence between the word
distributions of corpus slices (sources, crawls, time windows).

JS(P,Q) = 0.5·Σ p·ln(2p/(p+q)) + 0.5·Σ q·ln(2q/(p+q)) in nats, terms
with p=0 (resp. q=0) contributing 0 (resp. nothing) on that side —
symmetric, bounded by ln 2, and defined even when supports differ,
which is why it is the standard drift metric between crawl snapshots.

Scale design (100 TB lens):
- One exchange of (word-hash, slice, count) combiner rows — the
  vocabulary, not the corpus. Per-word-bucket kernels scatter each
  word's counts into a dense (words × slices) block, compute every
  pair's per-word terms vectorized (the pair loop is |slices|²/2
  iterations over ARRAYS, not words), and emit one partial sum per
  pair; a final Sum folds buckets.
- Slice totals are a |slices|-sized broadcast (ray.put), never a
  join. The slice list itself must be small (it is a grouping of the
  corpus, e.g. 5 sources or 52 weekly crawls) — documented driver-side
  bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.sketches.hashing import fmix64

U64 = np.uint64


def js_divergence_matrix(ds, slice_col: str, text_col: str = "text", n_buckets: int = 32):
    """Dataset → pa.Table (slice_a, slice_b, js) for every unordered
    slice pair (lexicographic a < b), js in nats rounded to 6."""
    import ray
    from ray.data.aggregate import Sum

    from raydedup.pipeline.extract import tokenize_word_hashes

    slices = sorted(ds.select_columns([slice_col]).unique(slice_col))
    s_index = {s: i for i, s in enumerate(slices)}
    n_s = len(slices)
    if n_s >= 1024:
        # pair keys pack as i*1024 + j: more slices would silently
        # collide keys and sum unrelated JS partials (round-3 advice)
        raise ValueError(
            f"js_divergence_matrix supports < 1024 slices, got {n_s}"
        )

    def counts_partial(batch: pa.Table) -> pa.Table:
        sl = batch[slice_col].to_numpy(zero_copy_only=False)
        wh, offs = tokenize_word_hashes(batch[text_col])
        n_docs = len(offs) - 1
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        si = np.array([s_index[x] for x in sl], dtype=np.int64)[doc_of]
        order = np.lexsort((si, wh))
        w_s, s_s = wh[order], si[order]
        new = np.ones(len(w_s), bool)
        new[1:] = (w_s[1:] != w_s[:-1]) | (s_s[1:] != s_s[:-1])
        run = np.cumsum(new) - 1
        c = np.bincount(run).astype(np.int64)
        wu, su = w_s[new], s_s[new]
        return pa.table(
            {
                "_gb": pa.array((fmix64(wu) % U64(n_buckets)).astype(np.int64)),
                "w": pa.array(wu, pa.uint64()),
                "s": pa.array(su),
                "c": pa.array(c),
            }
        )

    counts = ds.select_columns([slice_col, text_col]).map_batches(
        counts_partial, batch_format="pyarrow"
    )

    # slice totals: a |slices|-sized aggregate, broadcast not joined
    totals_rows = (
        counts.groupby("s").aggregate(Sum("c", alias_name="n")).take_all()
    )
    N = np.zeros(n_s, np.float64)
    for r in totals_rows:
        N[int(r["s"])] = float(r["n"])
    n_ref = ray.put(N)

    def bucket_kernel(g: pa.Table) -> pa.Table:
        import ray as _ray

        Nv = _ray.get(n_ref)
        w = g["w"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        # counts for one (w, s) may arrive from several blocks: segment-sum
        order = np.lexsort((s, w))
        w, s, c = w[order], s[order], c[order]
        new = np.ones(len(w), bool)
        new[1:] = (w[1:] != w[:-1]) | (s[1:] != s[:-1])
        seg = np.cumsum(new) - 1
        cs = np.bincount(seg, weights=c)
        wk, sk = w[new], s[new]
        new_w = np.ones(len(wk), bool)
        new_w[1:] = wk[1:] != wk[:-1]
        wid = np.cumsum(new_w) - 1
        W = int(wid[-1]) + 1 if len(wid) else 0
        C = np.zeros((W, len(Nv)), np.float64)
        C[wid, sk] = cs
        P = C / Nv[None, :]
        ia, ib, vals = [], [], []
        for i in range(len(Nv)):
            for j in range(i + 1, len(Nv)):
                p, q = P[:, i], P[:, j]
                m = p + q
                with np.errstate(divide="ignore", invalid="ignore"):
                    tp = np.where(p > 0, 0.5 * p * np.log(2.0 * p / m), 0.0)
                    tq = np.where(q > 0, 0.5 * q * np.log(2.0 * q / m), 0.0)
                ia.append(i)
                ib.append(j)
                vals.append(float(tp.sum() + tq.sum()))
        return pa.table(
            {
                "i": pa.array(ia, pa.int64()),
                "j": pa.array(ib, pa.int64()),
                "v": pa.array(vals, pa.float64()),
            }
        )

    partials = counts.groupby("_gb").map_groups(bucket_kernel, batch_format="pyarrow")

    def pack(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False)
        j = batch["j"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"pair": pa.array(i * np.int64(1024) + j), "v": batch["v"]}
        )

    rows = (
        partials.map_batches(pack, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("v", alias_name="js"))
        .take_all()
    )
    names = np.array(slices)
    out_a, out_b, out_v = [], [], []
    for r in sorted(rows, key=lambda r: int(r["pair"])):
        pr = int(r["pair"])
        out_a.append(str(names[pr // 1024]))
        out_b.append(str(names[pr % 1024]))
        out_v.append(round(float(r["js"]), 6))
    return pa.table(
        {
            "slice_a": pa.array(out_a),
            "slice_b": pa.array(out_b),
            "js": pa.array(out_v, pa.float64()),
        }
    )
