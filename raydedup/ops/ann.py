"""Similarity search over an embedding column (list<float>).

Two paths (SURVEY.md engine additions / task brief):

- **Brute-force top-k cosine** — the exactness baseline: the query
  matrix is broadcast once (``ray.put``), every batch computes one
  NumPy matmul against it and emits its local top-k per query
  (k × n_queries rows per block — bounded), and the driver folds the
  per-block winners. One streaming pass, no shuffle.
- **IVF (inverted-file) index** — the scale path: k-means centroids
  trained on a sample (driver NumPy), every vector assigned to its
  nearest centroid in one ``map_batches`` pass; a query probes only
  the ``nprobe`` nearest centroid partitions — the standard
  recall/throughput trade.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

U64 = np.uint64


def _emb_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(len(batch), dim)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0])
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    # float64 so scores agree with exact (DuckDB-side) cosine to ~1e-12
    m = np.asarray(m, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteForceScorer:
    """Per-batch matmul against the broadcast (normalized) query matrix."""

    def __init__(self, qref, id_column: str, column: str, k: int):
        self.q = ray.get(qref)  # (n_queries, dim) float32, L2-normalized
        self.id_column = id_column
        self.column = column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, self.column))
        scores = emb @ self.q.T  # (n, n_queries)
        n, nq = scores.shape
        k = min(self.k, n)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, n_queries)
        out_q = np.repeat(np.arange(nq, dtype=np.int64), k)
        out_v = ids[top.T.reshape(-1)]
        out_s = scores[top.T.reshape(-1), np.repeat(np.arange(nq), k)]
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_v),
                "score": pa.array(out_s.astype(np.float64)),
            }
        )


def topk_cosine(ds, queries: np.ndarray, k: int = 10, id_column: str = "vec_id", column: str = "embedding"):
    """Exact top-k cosine neighbours of each query row.

    Returns a pyarrow Table (query_id, vec_id, score) with exactly k
    rows per query, scores descending, ties broken by vec_id.
    """
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
    qref = ray.put(q)
    parts = ds.map_batches(
        _BruteForceScorer,
        fn_constructor_args=(qref, id_column, column, k),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    import pandas as pd

    local = parts.to_pandas()  # bounded: k * n_queries * n_blocks rows
    out = []
    for qid, g in local.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        out.append(g)
    res = pd.concat(out).reset_index(drop=True) if out else local
    return pa.Table.from_pandas(res, preserve_index=False)


def cosine_all_pairs_blockwise(
    ds,
    tau: float,
    id_column: str = "vec_id",
    column: str = "embedding",
    n_chunks: int = 8,
):
    """EXACT all-pairs cosine >= tau, fully distributed — the scale
    path for *low* thresholds.

    At tau this low (e.g. 0.45 ≈ 63°, where a random plane agrees with
    p≈0.65) SRP-LSH either misses borderline pairs or buckets so
    coarsely the candidate volume exceeds brute force — exact all-pairs
    is inherently Θ(n²) dot products, so the scale question is
    distributing them, not avoiding them. Classic block-nested-loop
    expressed in Ray Data: vectors hash into ``n_chunks`` chunks, each
    row is replicated to the ``n_chunks`` unordered chunk-pairs it
    participates in (data movement n·B rows through ONE groupby
    shuffle), and each chunk-pair group computes one vectorized
    (n/B)×(n/B) matmul. Per-task memory is O((n/B)·d); compute spreads
    over B(B+1)/2 independent tasks; the driver materializes nothing.
    Use ``cosine_dup_pairs`` (SRP-LSH) for high-tau near-dup instead.
    """
    from raydedup.sketches.hashing import fmix64

    B = n_chunks

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        n = len(batch)
        if n == 0:
            return pa.table(
                {"pkey": pa.array([], pa.int64()), id_column: batch[id_column], column: batch[column]}
            )
        c = (fmix64(ids.astype(np.int64).view(U64)) % U64(B)).astype(np.int64)
        other = np.arange(B, dtype=np.int64)
        cc = np.repeat(c, B)  # row's own chunk, ×B
        oo = np.tile(other, n)  # partner chunk
        lo = np.minimum(cc, oo)
        hi = np.maximum(cc, oo)
        pkey = lo * B + hi
        idx = np.repeat(np.arange(n, dtype=np.int64), B)
        t = batch.take(pa.array(idx))
        return pa.table({"pkey": pa.array(pkey), id_column: t[id_column], column: t[column]})

    def group_pairs(g: pa.Table) -> pa.Table:
        idtype = g[id_column].type
        ids = g[id_column].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(g, column))
        pkey = int(g["pkey"][0].as_py())
        lo, hi = pkey // B, pkey % B
        c = (fmix64(ids.astype(np.int64).view(U64)) % U64(B)).astype(np.int64)
        empty = pa.table(
            {
                "id_a": pa.array([], idtype),
                "id_b": pa.array([], idtype),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if lo == hi:
            # within-chunk pairs: appear in exactly one group (c, c)
            scores = emb @ emb.T
            ia, ib = np.nonzero(np.triu(scores >= tau, k=1))
            cos = scores[ia, ib].astype(np.float64)
        else:
            a_side = c == lo
            ea, eb = emb[a_side], emb[~a_side]
            if not len(ea) or not len(eb):
                return empty
            scores = ea @ eb.T
            ra, rb = np.nonzero(scores >= tau)
            ia = np.nonzero(a_side)[0][ra]
            ib = np.nonzero(~a_side)[0][rb]
            cos = scores[ra, rb].astype(np.float64)
        if not len(ia):
            return empty
        a, b = ids[ia], ids[ib]
        return pa.table(
            {
                "id_a": pa.array(np.minimum(a, b), idtype),
                "id_b": pa.array(np.maximum(a, b), idtype),
                "cosine": pa.array(cos),
            }
        )

    return (
        ds.select_columns([id_column, column])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(group_pairs, batch_format="pyarrow")
    )


def cosine_dup_pairs_bruteforce(
    ds, tau: float, id_column: str = "vec_id", column: str = "embedding", max_rows: int = 200_000
):
    """Exact all-pairs cosine >= tau via broadcast matrix + per-block
    matmul — the pytest exactness baseline ONLY (driver-materializes
    the corpus; hard-bounded). Production paths:
    ``cosine_all_pairs_blockwise`` (exact, distributed) or
    ``cosine_dup_pairs`` (SRP-LSH, high tau)."""
    full = ds.select_columns([id_column, column]).to_pandas()
    if len(full) > max_rows:
        raise ValueError(
            f"bruteforce path driver-materializes the corpus; {len(full)} rows > "
            f"bound {max_rows}. Use cosine_all_pairs_blockwise (exact, distributed) "
            "or cosine_dup_pairs (SRP-LSH)."
        )
    ids_all = full[id_column].to_numpy()
    m = _normalize(np.stack(full[column].to_numpy()))
    ref = ray.put((ids_all, m))

    def block(batch: pa.Table) -> pa.Table:
        ids_a, mat = ray.get(ref)
        emb = _normalize(_emb_matrix(batch, column))
        ids_b = batch[id_column].to_numpy(zero_copy_only=False)
        scores = emb @ mat.T
        bi, ai = np.nonzero(scores >= tau)
        a = ids_a[ai]
        b = ids_b[bi]
        keep = b < a  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "id_a": pa.array(b[keep]),
                "id_b": pa.array(a[keep]),
                "cosine": pa.array(scores[bi[keep], ai[keep]].astype(np.float64)),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow")


def cosine_dup_pairs(ds, tau: float = 0.9, id_column: str = "vec_id", column: str = "embedding",
                     n_planes: int = 64, bands: int = 8, n_buckets: int = 64, seed: int = 42):
    """All pairs with cosine similarity >= tau — embedding near-dup.

    Scale path: signed-random-projection (SRP) LSH. Each vector gets an
    ``n_planes``-bit sign fingerprint against a broadcast Gaussian
    plane matrix; the fingerprint splits into ``bands`` chunks used as
    groupby keys (P[chunk match] = (1 - theta/pi)^(planes/bands));
    candidate pairs are then verified by exact cosine. Recall at
    tau=0.9 (theta ~= 25.8°, 8-bit chunks, 8 bands) is
    ~1-(1-0.30)^8 ≈ 0.94 per pair; raise ``bands``/lower ``n_planes``
    per band for higher recall. Verification is exact, so precision
    is 1.

    Shuffle shape (the 100TB lens): band rows carry ONLY (chunk key,
    id) — embeddings are re-attached to the surviving candidate pairs
    by a bucketed cogroup on id (the token pattern of
    ``pipeline/lsh.py``/``verify.py``), never replicated ×bands
    through the wide band shuffle.
    """
    from raydedup.ops.pairs import dedup_pairs
    from raydedup.sketches.hashing import fmix64

    rng = np.random.default_rng(seed)
    dim = len(ds.take(1)[0][column])
    planes = rng.standard_normal((dim, n_planes))
    pref = ray.put(np.ascontiguousarray(planes))

    width = n_planes // bands
    U = np.uint64

    def fingerprint(batch: pa.Table) -> pa.Table:
        P = ray.get(pref)
        emb = _normalize(_emb_matrix(batch, column))
        bits = (emb @ P) > 0  # (n, n_planes)
        # pack each band's bits into one uint64 chunk key
        weights = U(1) << np.arange(width, dtype=U)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        n = len(batch)
        chunks = np.zeros((n, bands), dtype=U)
        for b in range(bands):
            chunks[:, b] = (bits[:, b * width : (b + 1) * width] * weights).sum(axis=1, dtype=U)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        flat = chunks.reshape(-1)
        bucket = (fmix64(flat ^ fmix64(band_ids.astype(U))) % U(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "band": pa.array(band_ids.astype(np.int32)),
                "chunk": pa.array(flat, pa.uint64()),
                "id": pa.array(np.repeat(ids, bands)),
            }
        )

    def emit(g: pa.Table) -> pa.Table:
        idtype = g["id"].type
        empty = pa.table({"id_a": pa.array([], idtype), "id_b": pa.array([], idtype)})
        if len(g) == 0:
            return empty
        band = g["band"].to_numpy(zero_copy_only=False)
        chunk = g["chunk"].to_numpy(zero_copy_only=False).astype(U)
        ids = g["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, chunk, band))
        band, chunk, ids = band[order], chunk[order], ids[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (chunk[1:] != chunk[:-1])
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_start = np.zeros(len(run_len), dtype=np.int64)
        np.cumsum(run_len[:-1], out=run_start[1:])
        out_a, out_b = [], []
        for s in np.unique(run_len[run_len >= 2]):
            starts = run_start[run_len == s]
            members = starts[:, None] + np.arange(s)[None, :]
            ia, ib = np.triu_indices(int(s), k=1)
            out_a.append(ids[members[:, ia].reshape(-1)])
            out_b.append(ids[members[:, ib].reshape(-1)])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        tbl = pa.table(
            {"id_a": pa.array(lo[keep], idtype), "id_b": pa.array(hi[keep], idtype)}
        )
        if len(tbl) == 0:
            return tbl
        gg = tbl.append_column("_i", pa.array(np.arange(len(tbl), dtype=np.int64)))
        first = gg.group_by(["id_a", "id_b"], use_threads=False).aggregate([("_i", "min")])
        sel = np.sort(first["_i_min"].combine_chunks().to_numpy(zero_copy_only=False))
        return tbl.take(pa.array(sel))

    rows = ds.map_batches(fingerprint, batch_format="pyarrow")
    cand = dedup_pairs(
        rows.groupby("bucket").map_groups(emit, batch_format="pyarrow"),
        n_buckets=n_buckets,
    )
    return _verify_cosine_pairs(cand, ds, tau, id_column, column, n_buckets)


def _verify_cosine_pairs(pairs, ds, tau: float, id_column: str, column: str, n_buckets: int):
    """Attach embeddings to candidate id pairs via bucketed cogroup on
    id and keep pairs with exact cosine >= tau. Both sides distributed;
    embedding bytes travel once per (pair-side), not once per band."""
    from raydedup.sketches.hashing import fmix64

    U = np.uint64

    def to_requests(batch: pa.Table) -> pa.Table:
        m = len(batch)
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        pair_id = fmix64(a.astype(U) ^ fmix64(b.astype(U)))
        ids = np.concatenate([a, b])
        return pa.table(
            {
                "bucket": pa.array((fmix64(ids.astype(U)) % U(n_buckets)).astype(np.int64)),
                "id": pa.array(ids),
                "pair_id": pa.array(np.tile(pair_id, 2), pa.uint64()),
                "side": pa.array(np.repeat(np.array([0, 1], np.uint8), m)),
                "pay": pa.array([None] * (2 * m), pa.large_binary()),
            }
        )

    def tag_payloads(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = _normalize(_emb_matrix(batch, column))  # float64 rows
        row_bytes = emb.shape[1] * 8
        pay = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [
                None,
                pa.py_buffer((np.arange(n + 1, dtype=np.int64) * row_bytes).tobytes()),
                pa.py_buffer(np.ascontiguousarray(emb).tobytes()),
            ],
        )
        return pa.table(
            {
                "bucket": pa.array((fmix64(ids.astype(U)) % U(n_buckets)).astype(np.int64)),
                "id": pa.array(ids),
                "pair_id": pa.array(np.zeros(n, U), pa.uint64()),
                "side": pa.array(np.full(n, 255, np.uint8)),
                "pay": pay,
            }
        )

    requests = pairs.map_batches(to_requests, batch_format="pyarrow")
    payloads = ds.map_batches(tag_payloads, batch_format="pyarrow")

    def attach(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        pay_idx = np.flatnonzero(side == 255)
        req_idx = np.flatnonzero(side != 255)
        empty = pa.table(
            {
                "pbucket": pa.array([], pa.int64()),
                "pair_id": pa.array([], pa.uint64()),
                "side": pa.array([], pa.uint8()),
                "id": pa.array([], g["id"].type),
                "pay": pa.array([], pa.large_binary()),
            }
        )
        if len(req_idx) == 0 or len(pay_idx) == 0:
            return empty
        # sorted-lookup semi-join: payload ids are unique (one
        # embedding per id), so searchsorted resolves each request row
        pk = ids[pay_idx]
        porder = np.argsort(pk, kind="stable")
        pk_s = pk[porder]
        rk = ids[req_idx]
        pos = np.searchsorted(pk_s, rk)
        posc = np.minimum(pos, len(pk_s) - 1)
        ok = (pos < len(pk_s)) & (pk_s[posc] == rk)
        sel_req = req_idx[ok]
        sel_pay = pay_idx[porder[posc[ok]]]
        pair_id = g["pair_id"].to_numpy(zero_copy_only=False)[sel_req].astype(U)
        return pa.table(
            {
                "pbucket": pa.array((pair_id % U(n_buckets)).astype(np.int64)),
                "pair_id": pa.array(pair_id, pa.uint64()),
                "side": g["side"].combine_chunks().take(pa.array(sel_req)),
                "id": g["id"].combine_chunks().take(pa.array(sel_req)),
                "pay": g["pay"].combine_chunks().take(pa.array(sel_pay)),
            }
        )

    attached = requests.union(payloads).groupby("bucket").map_groups(
        attach, batch_format="pyarrow"
    )

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def _pay_matrix(pay_arr: pa.Array, rows: np.ndarray) -> np.ndarray:
        """Taken payload slices -> (n, d) float64, zero-copy from the
        take result's contiguous values buffer."""
        taken = pay_arr.take(pa.array(rows))
        offs = np.frombuffer(taken.buffers()[1], np.int64)
        data = np.frombuffer(taken.buffers()[2], np.uint8)[offs[0] : offs[-1]]
        return data.view(np.float64).reshape(len(rows), -1)

    def finalize(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        pid = g["pair_id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, pid))
        pid_s, side_s = pid[order], side[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = pid_s[1:] != pid_s[:-1]
        run_id = np.cumsum(new) - 1
        cnt = np.bincount(run_id)
        both = cnt[run_id] == 2  # both sides resolved
        a_sel = order[both & (side_s == 0)]
        b_sel = order[both & (side_s == 1)]
        if len(a_sel) == 0:
            return empty
        pay = g["pay"].combine_chunks()
        ea = _pay_matrix(pay, a_sel)
        eb = _pay_matrix(pay, b_sel)
        cos = (ea * eb).sum(axis=1)
        keep = cos >= tau
        ids = g["id"].to_numpy(zero_copy_only=False)
        ia = ids[a_sel][keep]
        ib = ids[b_sel][keep]
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ia, ib)),
                "id_b": pa.array(np.maximum(ia, ib)),
                "cosine": pa.array(cos[keep]),
            }
        )

    return attached.groupby("pbucket").map_groups(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class _IVFAssign:
    def __init__(self, cref, id_column: str, column: str):
        self.cent = ray.get(cref)
        self.id_column = id_column
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, self.column))
        assign = np.argmax(emb @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cluster", pa.array(assign))


class IVFIndex:
    """Inverted-file ANN: train on a sample, assign in one pass, probe
    nprobe partitions per query. ``build`` returns the dataset with an
    ``ivf_cluster`` column — write it partitioned by that column for
    locality at scale."""

    def __init__(self, n_clusters: int = 16, id_column: str = "vec_id", column: str = "embedding", seed: int = 42):
        self.n_clusters = n_clusters
        self.id_column = id_column
        self.column = column
        self.seed = seed
        self.centroids = None

    def train(self, sample: np.ndarray) -> "IVFIndex":
        """Fit centroids on a caller-provided (n, d) sample — the
        deterministic path (a blocking-independent sample gives
        blocking-independent centroids, which oracle twins need)."""
        self.centroids = _kmeans(sample, self.n_clusters, seed=self.seed)
        return self

    def assign(self, ds):
        """Attach ``ivf_cluster`` using the already-trained centroids
        (broadcast once, actor pool reads zero-copy)."""
        cref = ray.put(self.centroids)
        return ds.map_batches(
            _IVFAssign,
            fn_constructor_args=(cref, self.id_column, self.column),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )

    def build(self, ds, sample_size: int = 2048):
        # uniform seeded sample across ALL blocks (ds.limit would take
        # the first blocks only — biased when the input is ordered)
        n = ds.count()
        frac = min(1.0, (sample_size * 1.25) / max(n, 1))
        sample = ds.random_sample(frac, seed=self.seed).limit(sample_size).to_pandas()
        if len(sample) == 0:
            sample = ds.limit(sample_size).to_pandas()
        self.train(np.stack(sample[self.column].to_numpy()))
        return self.assign(ds)

    def _probe_clusters(self, queries: np.ndarray, nprobe: int):
        """→ (normalized query matrix, sorted union of probed cluster
        ids across all queries)."""
        q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
        return q, sorted({int(c) for row in probe for c in row})

    def search(self, assigned_ds, queries: np.ndarray, k: int = 10, nprobe: int = 4):
        """Probe the nprobe nearest clusters per query, brute-force
        within. Row-level pruning (a filter over the full scan) — fine
        at bench scale; at scale use ``write_partitioned`` +
        ``search_partitioned`` so probes prune at the FILE level."""
        q, clusters = self._probe_clusters(queries, nprobe)
        sub = assigned_ds.filter(expr=f"ivf_cluster in {clusters}")
        full = topk_cosine(sub, q, k=k, id_column=self.id_column, column=self.column)
        import pandas as pd

        df = full.to_pandas()
        return pa.Table.from_pandas(df, preserve_index=False)

    def write_partitioned(self, assigned_ds, path: str) -> str:
        """Persist the assigned dataset as hive-partitioned parquet
        (one ``ivf_cluster=<c>`` directory per cluster). This is the
        scale-path index layout: a probe then reads ONLY its nprobe
        directories — file-level pruning — instead of filtering a full
        scan row by row (round-3 verdict item 4)."""
        assigned_ds.write_parquet(path, partition_cols=["ivf_cluster"])
        return path

    def probe_paths(self, path: str, queries: np.ndarray, nprobe: int = 4):
        """The exact partition directories a search would read —
        exposed so tests (and lineage metrics) can assert the probed
        read touches only nprobe-per-query directories."""
        import os

        _, clusters = self._probe_clusters(queries, nprobe)
        dirs = [os.path.join(path, f"ivf_cluster={c}") for c in clusters]
        return [d for d in dirs if os.path.isdir(d)]  # empty clusters write no dir

    def search_partitioned(
        self, path: str, queries: np.ndarray, k: int = 10, nprobe: int = 4
    ):
        """Probe against a ``write_partitioned`` index: read only the
        probed cluster directories, brute-force within."""
        import ray.data as rd

        import glob
        import os

        q, _ = self._probe_clusters(queries, nprobe)
        # expand to the parquet files (read_parquet on a path LIST opens
        # entries as files, not directories)
        dirs = [
            f
            for d in self.probe_paths(path, queries, nprobe)
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]
        if not dirs:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_column: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        sub = rd.read_parquet(dirs)
        full = topk_cosine(sub, q, k=k, id_column=self.id_column, column=self.column)
        import pandas as pd

        df = full.to_pandas()
        return pa.Table.from_pandas(df, preserve_index=False)