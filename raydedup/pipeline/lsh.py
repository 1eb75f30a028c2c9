"""LSH band-row generation and candidate-pair emission with skew control.

The candidate generator is the pipeline's one unavoidable all-to-all
shuffle. Rather than ``groupby(band, band_hash)`` — millions of size-1
groups with per-group Python overhead — band rows are shuffled on a
*coarse bucket* of the band key (``n_buckets`` groups, sized to the
cluster's task count) and each bucket is processed as one vectorized
NumPy kernel: sort, detect equal-key runs, emit pairs per run with
all-pairs/chain semantics. Per-row Python never runs.

Skew control (SURVEY.md §7.6 hot-band trap — boilerplate shared by
millions of pages lands on ONE band key):

1. **In-group capping**: a run of size g <= ``max_band_group`` emits
   all g(g-1)/2 pairs; a larger run emits a *sorted-neighbor chain*
   (g-1 pairs after sorting by signature fingerprint), which keeps
   identical/near-identical signatures adjacent — exact dups inside a
   boilerplate band still pair — while bounding output linearly. True
   near-dup pairs lose nothing measurable: at J >= 0.8 with 32 bands of
   4 rows a pair collides in ~13 bands, so it still meets in a non-hot
   band w.h.p.
2. **Bucket salting** (scale path): the coarse bucket key is
   ``murmur(band, band_hash) % n_buckets``, so hot *keys* still land in
   one bucket but hot *buckets* only bound one task's input; raising
   ``n_buckets`` spreads load. An optional Misra-Gries hot-key pre-pass
   (``raydedup.sketches.frequencies``) can additionally sub-salt runs
   hotter than the cap by ``sig_fp % n_salts`` — see
   ``run.py::dedup_pipeline``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig
from raydedup.pipeline.extract import segmented_unique, text_to_shingle_sets
from raydedup.pipeline.minhash import band_keys, minhash_signatures
from raydedup.sketches.hashing import fmix64, murmur3_128_fixed
from raydedup.sketches.theta import MAX_THETA

U64 = np.uint64


def _col(batch: pa.Table, name: str) -> np.ndarray:
    c = batch[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


class SignatureStage:
    """Actor-pool stage: pages batch → per-doc signature record.

    Holds the permutation salts/config (built once per actor in
    ``__init__``) and emits one row per doc:
    ``url, n_shingles, shingles (list<u64> sorted unique, KMV-trimmed),
    theta (u64), sig (fixed_size_list<u32, num_perms>),
    band_hash (fixed_size_list<u64, bands>), sig_fp (u64)``.

    ``sig`` ships FOLDED to the low 32 bits of each MinHash slot
    (SURVEY.md §1.4): band keys and ``sig_fp`` are computed from the
    full u64 slots BEFORE the fold, so candidate generation is
    bit-identical, and the only downstream consumer — per-pair slot
    agreement in ``verify._metrics_from_buffers`` — gains a spurious
    per-slot collision probability of 2^-32, immaterial against the
    128-slot estimator's own resolution of 1/128. The fold halves the
    signature bytes through the pipeline's TWO dominant bandwidth
    streams (the materialized signature table and the verify payload
    broadcast/cogroup), the round-3 scaling bottleneck.

    The shingle set doubles as a theta sketch of the doc's shingle
    universe: below ``shingle_cap`` it is exact (theta = MAX_THETA),
    above it keeps the cap smallest hashes with theta = (cap+1)-th
    smallest — the reference's rebuild rule
    (``theta/hash_table.rs:249-277``) applied per document.
    """

    def __init__(self, cfg: DedupConfig | None = None, shingle_cap: int = 4096, text_column: str = "text"):
        from raydedup.pipeline.minhash import MinHashWorkspace

        self.cfg = cfg or DedupConfig()
        self.cap = shingle_cap
        self.text_column = text_column
        # permutation buffers page-fault once per actor, reused per batch;
        # a mini batch through __call__ warms every allocation pool while
        # actors are still spawning in parallel
        self.workspace = MinHashWorkspace(self.cfg.num_perms, self.cfg.seed)
        self.workspace.buf.fill(0)
        self.workspace.tmp.fill(0)
        warm = pa.table({"url": pa.array(["w"]), self.text_column: pa.array(["warm up text one two three four five"])})
        self(warm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        text = batch[self.text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sh, off, _ = text_to_shingle_sets(text, k=cfg.shingle_k, seed=cfg.seed)
        if cfg.sig_mode == "oph":
            from raydedup.pipeline.minhash import oph_signatures

            sig = oph_signatures(sh, off, num_perms=cfg.num_perms, seed=cfg.seed)
        else:
            sig = minhash_signatures(
                sh, off, num_perms=cfg.num_perms, seed=cfg.seed, workspace=self.workspace
            )
        bands = band_keys(sig, cfg.bands, cfg.rows, seed=cfg.seed)

        uvals, uoff = segmented_unique(sh, off)
        counts = np.diff(uoff)
        theta = np.full(len(counts), U64(MAX_THETA))
        over = counts > self.cap
        if over.any():
            # KMV-trim oversized docs. segmented_unique returns each
            # segment SORTED ascending, so the cap smallest hashes are
            # the segment prefix and theta is the (cap+1)-th element —
            # pure slicing, vectorized across the whole batch (no
            # per-doc loop: one mask + one cumsum).
            theta[over] = uvals[uoff[:-1][over] + self.cap]
            pos = np.arange(len(uvals), dtype=np.int64) - np.repeat(
                uoff[:-1], counts
            )
            uvals = uvals[pos < self.cap]
            counts = np.minimum(counts, self.cap)
            uoff = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=uoff[1:])

        pad = ((cfg.num_perms * 8 + 15) // 16) * 2
        mat = np.zeros((sig.shape[0], pad), dtype=U64)
        mat[:, : cfg.num_perms] = sig
        sig_fp, _ = murmur3_128_fixed(mat, cfg.num_perms * 8, seed=cfg.seed)

        return pa.table(
            {
                "url": batch["url"],
                "n_shingles": pa.array(counts, pa.int64()),
                "shingles": pa.LargeListArray.from_arrays(
                    pa.array(uoff, pa.int64()), pa.array(uvals, pa.uint64())
                ),
                "theta": pa.array(theta, pa.uint64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.astype(np.uint32).reshape(-1), pa.uint32()),
                    cfg.num_perms,
                ),
                "band_hash": pa.FixedSizeListArray.from_arrays(
                    pa.array(bands.reshape(-1), pa.uint64()), cfg.bands
                ),
                "sig_fp": pa.array(sig_fp, pa.uint64()),
            }
        )


_STAGE_CACHE: dict = {}


def signature_batch_fn(batch: pa.Table, cfg: DedupConfig, shingle_cap: int = 4096, text_column: str = "text") -> pa.Table:
    """Task-form signature stage with a process-global stage cache.

    Ray reuses worker processes across tasks, so the workspace
    amortizes exactly as it would in an actor — without the actor
    pool's spawn/ramp latency (measured ~3x faster end-to-end on a
    warm cluster). The cache key includes the config hash so multiple
    configs can coexist in one worker.
    """
    key = (cfg.config_hash(), shingle_cap, text_column)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = _STAGE_CACHE[key] = SignatureStage(cfg, shingle_cap, text_column)
    return stage(batch)


def explode_bands(batch: pa.Table, bands: int, n_buckets: int, hot_keys=None, n_salts: int = 64) -> pa.Table:
    """signatures batch → band rows (bucket, key, fp, uh) — 28 B/row.

    Docs with zero shingles are excluded (their sentinel signatures
    would all collide with each other). ``key`` is ONE u64 run key,
    fmix(band_hash ^ fmix(band)) — equal (band, band_hash) ⟺ equal key
    up to 2^-64 fmix collisions — replacing the round-3 (band i32,
    band_hash u64) pair; ``fp`` is the signature fingerprint folded to
    u32 (it only orders the sorted-neighbor chain, where a 2^-32
    collision merely swaps two chain neighbors). Together the band-row
    shuffle — the pipeline's widest exchange — drops from 36 to 28
    bytes/row. ``bucket`` is the coarse shuffle key: key mod n_buckets.

    ``hot_keys`` (sorted uint64 array of the same key-hashes, from the
    Misra-Gries pre-pass) triggers *salting*: a hot key's rows are
    spread over ``n_salts`` buckets by ``fp % n_salts`` instead of
    landing on one task. Rows with equal signatures keep equal salts
    (the salted key stays their shared run key), so the in-bucket
    neighbor-chain still pairs identical docs; a mega-key bounds any
    single task at ~1/n_salts of its rows.
    """
    from raydedup.sketches.hashing import hash_strings

    nonempty = batch.filter(pc.greater(batch["n_shingles"], 0))
    n = len(nonempty)
    bh = np.asarray(
        nonempty["band_hash"].combine_chunks().flatten().to_numpy(zero_copy_only=False), dtype=U64
    ).reshape(n, bands)
    # docs travel as 64-bit url-hash tokens, not strings: urls are
    # re-attached from signature payloads at verify
    uh, _ = hash_strings(nonempty["url"])
    band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
    flat_bh = bh.reshape(-1)
    sig_fp = np.repeat(_col(nonempty, "sig_fp"), bands)
    key_hash = fmix64(flat_bh ^ fmix64(band_ids.astype(U64)))
    if hot_keys is not None and len(hot_keys):
        pos = np.minimum(np.searchsorted(hot_keys, key_hash), len(hot_keys) - 1)
        is_hot = hot_keys[pos] == key_hash
        salt = sig_fp % U64(n_salts)
        key_hash = np.where(is_hot, fmix64(key_hash ^ fmix64(salt + U64(1))), key_hash)
    bucket = (key_hash % U64(n_buckets)).astype(np.int32)
    return pa.table(
        {
            "bucket": pa.array(bucket),
            "key": pa.array(key_hash, pa.uint64()),
            "fp": pa.array(sig_fp.astype(np.uint32), pa.uint32()),
            "uh": pa.array(np.repeat(uh, bands), pa.uint64()),
        }
    )


def _emit_pairs_core(
    key: np.ndarray, fp: np.ndarray, uh: np.ndarray, max_band_group: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pair emission for one bucket of band rows.

    Sorts by (key, fp, uh), finds equal-key runs, and emits all-pairs
    for runs <= cap, sorted-neighbor chains for larger runs. Loops
    only over distinct run *sizes* (all runs of one size emit in a
    single vectorized shot). Returns deduped (ha, hb) uint64 url-hash
    tokens with ha < hb.
    """
    order = np.lexsort((uh, fp, key))
    key, uh = key[order], uh[order]

    new_run = np.ones(len(key), dtype=bool)
    new_run[1:] = key[1:] != key[:-1]
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    run_start = np.zeros(len(run_len), dtype=np.int64)
    np.cumsum(run_len[:-1], out=run_start[1:])

    out_a, out_b = [], []
    small = (run_len >= 2) & (run_len <= max_band_group)
    for s in np.unique(run_len[small]):
        starts = run_start[small & (run_len == s)]
        # (m, s) member index matrix for every run of size s
        members = starts[:, None] + np.arange(s)[None, :]
        ia, ib = np.triu_indices(int(s), k=1)
        out_a.append(uh[members[:, ia].reshape(-1)])
        out_b.append(uh[members[:, ib].reshape(-1)])
    big = run_len > max_band_group
    for start, length in zip(run_start[big], run_len[big]):
        seg = uh[start : start + length]  # sorted by sig_fp: chain pairs
        out_a.append(seg[:-1])
        out_b.append(seg[1:])

    if not out_a:
        e = np.empty(0, dtype=U64)
        return e, e
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    dorder = np.lexsort((hi, lo))
    lo, hi = lo[dorder], hi[dorder]
    uniq = np.ones(len(lo), dtype=bool)
    uniq[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    return lo[uniq], hi[uniq]


def emit_pairs_bucket(df: pd.DataFrame, max_band_group: int) -> pd.DataFrame:
    """pandas wrapper of :func:`_emit_pairs_core` (the single-process
    twin in pipeline/reference.py consumes this shape)."""
    a, b = _emit_pairs_core(
        df["key"].to_numpy().astype(U64),
        df["fp"].to_numpy(),
        df["uh"].to_numpy().astype(U64),
        max_band_group,
    )
    return pd.DataFrame({"ha": a, "hb": b})


def emit_pairs_bucket_arrow(g: pa.Table, max_band_group: int) -> pa.Table:
    """Arrow wrapper of :func:`_emit_pairs_core` — the pipeline path:
    zero-copy column access on the widest exchange, no pandas
    conversion of the ~28 B/row band stream."""
    a, b = _emit_pairs_core(
        g["key"].to_numpy(zero_copy_only=False).astype(U64, copy=False),
        g["fp"].to_numpy(zero_copy_only=False),
        g["uh"].to_numpy(zero_copy_only=False).astype(U64, copy=False),
        max_band_group,
    )
    return pa.table({"ha": pa.array(a, pa.uint64()), "hb": pa.array(b, pa.uint64())})


def detect_hot_band_keys(
    signatures,
    cfg: DedupConfig,
    sample_every: int = 16,
    hot_multiple: int = 4,
    map_size: int = 65536,
) -> np.ndarray:
    """Misra-Gries pre-pass over sampled band keys → sorted key-hashes
    hotter than ``hot_multiple * max_band_group`` (scaled by the sample
    rate). The sketch is the reference's frequent-items algebra
    (``frequencies/sketch.rs``) used as the engine's hot-key telemetry
    (SURVEY.md §2.7 mapping): one bounded-size mergeable partial per
    block, tree-merged by ``Dataset.aggregate`` (the driver sees ONE
    sketch image regardless of block count).
    """
    from raydedup.sketches.aggregates import block_reduce
    from raydedup.sketches.frequencies import FrequentItemsSketch

    def partial(batch: pa.Table) -> bytes | None:
        nonempty = batch.filter(pc.greater(batch["n_shingles"], 0))
        n = len(nonempty)
        if n == 0:
            return None
        bh = np.asarray(
            nonempty["band_hash"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
            dtype=U64,
        ).reshape(n, cfg.bands)
        band_ids = np.tile(np.arange(cfg.bands, dtype=np.int64), n)
        keys = fmix64(bh.reshape(-1) ^ fmix64(band_ids.astype(U64)))[::sample_every]
        return FrequentItemsSketch(map_size).update_batch(keys).to_bytes()

    def merge(a: bytes, b: bytes) -> bytes:
        return FrequentItemsSketch.from_bytes(a).merge(FrequentItemsSketch.from_bytes(b)).to_bytes()

    row = signatures.select_columns(["n_shingles", "band_hash"]).aggregate(
        block_reduce(partial, merge, name="sketch")
    )
    blob = row.get("sketch") if row else None
    acc = FrequentItemsSketch.from_bytes(blob) if blob else FrequentItemsSketch(map_size)
    threshold = max(1, hot_multiple * cfg.max_band_group // sample_every)
    hot = [int(item) for item, est, lb, ub in acc.frequent_items(threshold=threshold)]
    return np.sort(np.array(hot, dtype=U64))


def candidate_pairs(signatures, cfg: DedupConfig, n_buckets: int = 256, salt_hot: bool = True):
    """signatures Dataset → Dataset of distinct candidate pairs.

    Two shuffles: band rows on the coarse bucket (the big one, rows are
    ~60 bytes), then pair-dedup on a pair bucket (small — pairs only).
    ``salt_hot`` adds the Misra-Gries hot-key pre-pass + salting
    (``detect_hot_band_keys`` / ``explode_bands``) — one extra cheap
    pass over band hashes; recommended ON at web scale.
    """
    hot_ref = None
    if salt_hot:
        import ray

        hot = detect_hot_band_keys(signatures, cfg)
        hot_ref = ray.put(hot)

    def explode(b: pa.Table) -> pa.Table:
        import ray

        hk = ray.get(hot_ref) if hot_ref is not None else None
        return explode_bands(b, cfg.bands, n_buckets, hot_keys=hk)

    band_rows = signatures.map_batches(explode, batch_format="pyarrow")
    pairs = band_rows.groupby("bucket").map_groups(
        lambda g: emit_pairs_bucket_arrow(g, cfg.max_band_group),
        batch_format="pyarrow",
    )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("pbucket", pa.array([], pa.int64()))
        ha = batch["ha"].to_numpy(zero_copy_only=False).astype(U64)
        hb = batch["hb"].to_numpy(zero_copy_only=False).astype(U64)
        pb = (fmix64(ha ^ fmix64(hb)) % U64(n_buckets)).astype(np.int64)
        return batch.append_column("pbucket", pa.array(pb))

    def dedup_pairs(g: pa.Table) -> pa.Table:
        ha = g["ha"].to_numpy(zero_copy_only=False)
        hb = g["hb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hb, ha))
        ha, hb = ha[order], hb[order]
        uniq = np.ones(len(ha), dtype=bool)
        uniq[1:] = (ha[1:] != ha[:-1]) | (hb[1:] != hb[:-1])
        return pa.table(
            {"ha": pa.array(ha[uniq], pa.uint64()), "hb": pa.array(hb[uniq], pa.uint64())}
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )
