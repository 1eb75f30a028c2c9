"""Containment search: find corpus docs containing a query's content.

The asymmetric near-dup question Jaccard-tuned LSH misses: an excerpt
Q inside a much larger doc X has high containment C = |Q∩X| / |Q| but
low Jaccard |Q∩X| / |Q∪X|, so the flagship's bands never fire. The
size-partition idea follows LSH Ensemble (Zhu et al., VLDB 2016,
"LSH Ensemble: Internet-Scale Domain Search"): partition the corpus by
distinct-shingle count, and within partition p (sizes <= u_p) convert
the containment threshold to the Jaccard lower bound every qualifying
pair must satisfy there,

    J_p = tau |Q| / (|Q| + u_p - tau |Q|)      (since |X| <= u_p and
                                               |Q cap X| >= tau |Q|)

then probe each partition with MinHash banding tuned to J_p — low
thresholds get few rows per band (down to r=1), high thresholds the
usual steep curves. The (bands, rows) per partition comes from the
same divisor ladder as ``pipeline/plan.py``, chosen as the LARGEST r
whose miss probability (1 - J_p^r)^(128/r) stays under ``miss_tol``
(recall-first: candidates feed an exact verify). When even r=1 cannot
meet ``miss_tol`` (a tiny query against a huge partition — the
regime where sketch containment search degrades by nature), the stage
falls back to r=1 and the guarantee weakens to (1-(1-J_p)^128);
recall on realistic fixtures is gated at 1.0 in tests.

Plan (100 TB lens):
1. **query prep** (driver, report-shaped — ``max_queries`` guarded):
   shingle sets, sizes, signatures, per-partition (r_p, band keys).
2. **corpus map** (map-only): distinct-shingle count -> partition,
   signature -> band keys at that partition's r_p. Fixed-width rows.
3. **ONE bucketed exchange** on band key; per-bucket kernel matches
   query vs corpus rows in (partition, key) runs -> candidate DOC set.
4. **exact verify** (map-only): candidate docs re-shingle and probe
   the broadcast sorted (gram, qid) table; per-(qid, doc) match counts
   pre-aggregate in-block, ONE tiny groupby sums them; containment =
   matches / |Q|, filter >= tau. Verifying candidate DOCS against all
   queries (not just candidate pairs) costs nothing extra and only
   improves recall.

Shingle identity is the pipeline's k-gram murmur (hash paid once);
the SQL-oracle parity of that recipe is established by the
ngram_dup_pairs / tiered oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.pipeline.extract import segmented_unique, text_to_shingle_sets
from raydedup.pipeline.minhash import band_keys, minhash_signatures
from raydedup.sketches.hashing import fmix64

U64 = np.uint64
_R_LADDER = (128, 64, 32, 16, 8, 4, 2, 1)  # descending: prefer steep curves
_MAX_PART = 48  # 2^48 distinct shingles per doc is beyond any document


def _jaccard_floor(q_size: int, u_p: float, tau: float) -> float:
    return tau * q_size / (q_size + u_p - tau * q_size)


def _pick_rows(j_floor: float, num_perms: int, miss_tol: float) -> int:
    """Largest ladder r with banding miss prob <= miss_tol at
    ``j_floor``; falls back to 1 (weakest guarantee) when none meet."""
    for r in _R_LADDER:
        if num_perms % r:
            continue
        b = num_perms // r
        if (1.0 - j_floor**r) ** b <= miss_tol:
            return r
    return 1


def _tagged_keys(sig: np.ndarray, part_of: np.ndarray, r_of_p: np.ndarray, seed: int):
    """Per-row band keys at each row's partition r, tagged with the
    band index and partition (so only same-partition same-band keys
    join). Returns flat (row_idx, part, key) arrays."""
    rows_all, parts_all, keys_all = [], [], []
    for p in np.unique(part_of):
        r = int(r_of_p[p])
        b = sig.shape[1] // r
        sel = np.flatnonzero(part_of == p)
        bk = band_keys(sig[sel], b, r, seed=seed)
        band_ix = np.tile(np.arange(b, dtype=U64), len(sel))
        key = fmix64(
            bk.reshape(-1)
            ^ fmix64(band_ix * U64(0x9E3779B97F4A7C15) + U64(p) + U64(1))
        )
        rows_all.append(np.repeat(sel, b))
        parts_all.append(np.full(len(sel) * b, p, np.int16))
        keys_all.append(key)
    if not rows_all:
        e = np.empty(0, np.int64)
        return e, np.empty(0, np.int16), np.empty(0, U64)
    return (
        np.concatenate(rows_all),
        np.concatenate(parts_all),
        np.concatenate(keys_all),
    )


def containment_search(
    corpus,
    queries: pa.Table,
    tau: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "text",
    k: int = 5,
    num_perms: int = 128,
    seed: int = 9001,
    n_buckets: int = 32,
    miss_tol: float = 1e-4,
    max_queries: int = 100_000,
    max_candidate_docs: int = 5_000_000,
):
    """corpus (id, text) x queries (qid, text) -> Dataset
    (qid, doc_id, containment) for C(query -> doc) >= tau."""
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    if queries.num_rows > max_queries:
        raise ValueError(
            f"containment_search: {queries.num_rows} queries exceed "
            f"max_queries={max_queries}"
        )
    qids = queries[qid_col].to_numpy(zero_copy_only=False).astype(np.int64)
    qtext = queries[qtext_col]
    if isinstance(qtext, pa.ChunkedArray):
        qtext = qtext.combine_chunks()
    sh, offs, _ = text_to_shingle_sets(qtext, k=k, seed=seed)
    q_grams, q_offs = segmented_unique(sh, offs)
    q_sizes = np.diff(q_offs)
    if (q_sizes == 0).any():
        raise ValueError("containment_search: a query has no shingles")
    q_sigs = minhash_signatures(sh, offs, num_perms=num_perms, seed=seed)

    # one conservative r per partition: sized for the SMALLEST query
    # (J_p grows with |Q|, so the smallest query binds)
    q_min = int(q_sizes.min())
    r_of_p = np.array(
        [
            _pick_rows(
                _jaccard_floor(q_min, float(2 ** (p + 1) - 1), tau),
                num_perms,
                miss_tol,
            )
            for p in range(_MAX_PART)
        ],
        np.int64,
    )

    # every query probes every partition at that partition's r; band
    # keys are computed ONCE per distinct r and re-tagged per partition
    n_q = len(qids)
    bk_by_r = {
        int(r): band_keys(q_sigs, num_perms // int(r), int(r), seed=seed)
        for r in np.unique(r_of_p)
    }
    q_rows, q_parts, q_keys = [], [], []
    for p in range(_MAX_PART):
        r = int(r_of_p[p])
        b = num_perms // r
        bk = bk_by_r[r]
        band_ix = np.tile(np.arange(b, dtype=U64), n_q)
        key = fmix64(
            bk.reshape(-1)
            ^ fmix64(band_ix * U64(0x9E3779B97F4A7C15) + U64(p) + U64(1))
        )
        q_rows.append(np.repeat(np.arange(n_q, dtype=np.int64), b))
        q_parts.append(np.full(n_q * b, p, np.int16))
        q_keys.append(key)
    q_rows = np.concatenate(q_rows)
    q_parts = np.concatenate(q_parts)
    q_keys = np.concatenate(q_keys)
    q_side_tbl = pa.table(
        {
            "_b": pa.array((q_keys % U64(n_buckets)).astype(np.int64)),
            "part": pa.array(q_parts.astype(np.int64)),
            "key": pa.array(q_keys.view(np.int64)),
            "side": pa.array(np.zeros(len(q_keys), np.int8)),
            "id": pa.array(qids[q_rows]),
        }
    )

    def corpus_rows(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        shc, offc, _ = text_to_shingle_sets(text, k=k, seed=seed)
        ug, uo = segmented_unique(shc, offc)
        m = np.diff(uo)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nz = np.flatnonzero(m > 0)
        if len(nz) == 0:
            return q_side_tbl.slice(0, 0)
        # drop zero-shingle docs BEFORE the signature kernel (empty
        # segments have no minimum); the flat shingle array is
        # unchanged since empty docs contribute nothing to it
        offs_nz = np.zeros(len(nz) + 1, np.int64)
        np.cumsum(np.diff(offc)[nz], out=offs_nz[1:])
        sig = minhash_signatures(shc, offs_nz, num_perms=num_perms, seed=seed)
        part = np.floor(np.log2(m[nz])).astype(np.int64)
        ri, pi, ki = _tagged_keys(sig, part, r_of_p, seed)
        return pa.table(
            {
                "_b": pa.array((ki % U64(n_buckets)).astype(np.int64)),
                "part": pa.array(pi.astype(np.int64)),
                "key": pa.array(ki.view(np.int64)),
                "side": pa.array(np.ones(len(ki), np.int8)),
                "id": pa.array(ids[nz][ri]),
            }
        )

    import ray.data as rd

    exchange = corpus.map_batches(corpus_rows, batch_format="pyarrow").union(
        rd.from_arrow(q_side_tbl)
    )

    def match_kernel(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side, ids = key[order], side[order], ids[order]
        new = np.ones(len(key), bool)
        new[1:] = key[1:] != key[:-1]
        run_id = np.cumsum(new) - 1
        # docs in runs that contain at least one query row (side 0
        # sorts first in each run)
        starts = np.flatnonzero(new)
        has_q = side[starts] == 0
        cand = ids[(side == 1) & has_q[run_id]]
        return pa.table({"doc_id": pa.array(np.unique(cand))})

    cand_ds = (
        exchange.groupby("_b")
        .map_groups(match_kernel, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .select_columns(["doc_id"])
        .materialize()  # object store, not driver heap
    )
    # gate BEFORE the driver-side collect: the cap exists to bound the
    # driver, so the count check must run on the distributed dataset
    # (round-4 advisor: checking after to_pandas() defeats the cap)
    n_cand = cand_ds.count()
    if n_cand > max_candidate_docs:
        raise ValueError(
            f"containment_search: {n_cand} candidate docs exceed "
            f"max_candidate_docs={max_candidate_docs}; raise the cap or "
            f"verify via the bucketed pair path"
        )
    cand_docs = cand_ds.to_pandas()  # bounded: <= max_candidate_docs rows
    cand_set = pa.array(cand_docs["doc_id"].to_numpy().astype(np.int64))

    # broadcast the sorted (gram -> qid) table + per-query sizes
    g_order = np.argsort(q_grams, kind="stable")
    QG = q_grams[g_order]
    QID_of_gram = qids[
        np.repeat(np.arange(len(qids), dtype=np.int64), q_sizes)[g_order]
    ]
    size_of_qid = dict(zip(qids.tolist(), q_sizes.tolist()))

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_in(batch[id_col], value_set=cand_set))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        shc, offc, _ = text_to_shingle_sets(text, k=k, seed=seed)
        ug, uo = segmented_unique(shc, offc)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(uo))
        lo = np.searchsorted(QG, ug, side="left")
        hi = np.searchsorted(QG, ug, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        gi = np.repeat(np.arange(len(ug), dtype=np.int64), cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        mq = QID_of_gram[np.repeat(lo, cnt) + within]
        md = ids[doc_of[gi]]
        order = np.lexsort((mq, md))
        mq, md = mq[order], md[order]
        new = np.ones(len(mq), bool)
        new[1:] = (mq[1:] != mq[:-1]) | (md[1:] != md[:-1])
        run_id = np.cumsum(new) - 1
        n = np.bincount(run_id).astype(np.int64)
        firsts = np.flatnonzero(new)
        return pa.table(
            {
                "qid": pa.array(mq[firsts]),
                "doc_id": pa.array(md[firsts]),
                "n": pa.array(n),
            }
        )

    from ray.data.aggregate import Sum

    counts = (
        corpus.map_batches(verify, batch_format="pyarrow")
        .groupby(["qid", "doc_id"])
        .aggregate(Sum("n", alias_name="n_common"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        q = batch["qid"].to_numpy(zero_copy_only=False)
        n = batch["n_common"].to_numpy(zero_copy_only=False)
        sizes = np.array([size_of_qid[int(x)] for x in q], np.float64)
        c = n / sizes
        keep = c >= tau
        return pa.table(
            {
                "qid": pa.array(q[keep]),
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
                ),
                "containment": pa.array(c[keep], pa.float64()),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")
