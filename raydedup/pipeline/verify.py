"""Candidate-pair verification: exact/KMV Jaccard, containment, substring.

Candidate pairs arrive as 64-bit url-hash tokens ``(ha, hb)`` (the
band-row and pair shuffles never carry strings — lsh.py); verification
attaches each doc's packed payload (url string, theta, shingle set,
signature) by token and emits per-pair metrics with real urls:

- ``jaccard_sig_est``: MinHash signature agreement (mean of equal
  slots) — stderr ~ sqrt(J(1-J)/128).
- ``exact_jaccard``: set Jaccard of the per-doc shingle-hash sets.
  Sets are KMV-trimmed theta sketches (SignatureStage): below the cap
  this is *exact*; above it it is the theta-intersection estimate —
  both entries arrays are screened below ``min(theta_a, theta_b)``
  first, exactly like ``theta/intersection.rs:64-196``, and theta
  cancels in the ratio.
- ``containment``: |A∩B| / min(|A|,|B|) — catches substring-style
  duplication Jaccard misses.
- ``is_dup``: exact_jaccard >= cfg.threshold (the golden-pair rule).
- ``substring_candidate``: containment >= 0.9 but not a Jaccard dup —
  routed to ``confirm_substrings`` for a byte-level check.

Attach strategies (``strategy='auto'`` picks by candidate-set size):

- **broadcast** — candidate payloads fit the driver budget: semi-filter
  the signatures table, collect, ``ray.put`` once, verify pairs in one
  ``map_batches`` pass.
- **cogroup** (the 100TB path, auto above the limit) — fully
  distributed: bucketed union-cogroup on url-hash attaches payloads to
  pair requests, then a regroup on pair id brings both sides together;
  two sort-shuffles over candidate-sized data, nothing driver-side.
- **join** — two hash-partitioned ``Dataset.join``s; kept for parity
  but measured ~4x slower locally (aggregator actor fleet) and its
  non-key payloads must be packed binary.

All strategies produce identical outputs (tested). Output pairs are
normalized so ``url_a < url_b`` lexicographically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raydedup.config import DedupConfig
from raydedup.sketches.hashing import fmix64, hash_strings
from raydedup.sketches.theta import MAX_THETA

U64 = np.uint64


def _url_hashes(col) -> np.ndarray:
    h1, _ = hash_strings(col)
    return h1


def _pair_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ha = batch["ha"].to_numpy(zero_copy_only=False).astype(U64)
    hb = batch["hb"].to_numpy(zero_copy_only=False).astype(U64)
    return ha, hb


def _semi_filter_fn(batch: pa.Table, ref) -> pa.Table:
    """Keep signature rows whose url-hash is in the broadcast sorted
    set (zero-copy numpy ``ray.get`` per task)."""
    keep = ray.get(ref)
    if len(keep) == 0 or len(batch) == 0:
        return batch.slice(0, 0)
    h = _url_hashes(batch["url"])
    idx = np.minimum(np.searchsorted(keep, h), len(keep) - 1)
    return batch.filter(pa.array(keep[idx] == h))


def _pack_payload(batch: pa.Table) -> pa.Table:
    """(url, theta, shingles, sig) → (uh, url, vpay binary).

    vpay layout (all u64-word aligned):
    ``[theta u64][n_sh u64][shingles ⌈n_sh/2⌉*u64][sig ⌈P/2⌉*u64]`` —
    BOTH variable payloads ride as u32 slots packed two-per-word (odd
    counts pad one zero slot), roughly halving the verify stream vs the
    round-3 all-u64 layout:

    - signature slots are the folded low-32 ``sig`` column
      (``lsh.SignatureStage``); a legacy u64 column folds here.
    - shingle entries carry the HIGH 32 bits of each u64 shingle hash.
      High bits keep the KMV order, so the pairwise min-theta screen
      still works as ``v32 < theta>>32`` — it misclassifies only
      entries in theta's own 2^32-wide bucket (expected ~cap/2^32 per
      doc, noise against KMV's ~1.5% stderr at cap 4096) — and the
      intersection join gains a spurious-match probability of
      n_a·n_b/2^32 ≈ 6e-5 per pair at typical doc sizes, noise against
      the exact-Jaccard threshold. The signature TABLE keeps full u64
      shingles (theta-sketch ops need them); only this verify payload
      folds.

    Fully vectorized: one scatter into a single buffer, wrapped as a
    zero-copy large_binary array via offsets (no per-row Python).
    """
    m = len(batch)
    sh = batch["shingles"].combine_chunks()
    sh_off = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    sh_vals = sh.values.to_numpy(zero_copy_only=False).astype(U64, copy=False)
    sig = batch["sig"].combine_chunks()
    p = sig.type.list_size
    sig32 = (
        sig.flatten().to_numpy(zero_copy_only=False).astype(np.uint32).reshape(m, p)
    )
    if p % 2:
        sig32 = np.concatenate([sig32, np.zeros((m, 1), np.uint32)], axis=1)
    pw = sig32.shape[1] // 2  # u64 words holding the packed u32 slots
    sig_vals = np.ascontiguousarray(sig32).view(U64)
    theta = batch["theta"].to_numpy(zero_copy_only=False).astype(U64, copy=False)
    base = sh_off[0]
    lens = sh_off[1:] - sh_off[:-1]
    shw = (lens + 1) // 2  # u64 words holding the packed u32 shingles
    o = np.zeros(m + 1, np.int64)
    np.cumsum(2 + shw + pw, out=o[1:])  # u64 words per doc
    out = np.zeros(o[-1], U64)  # zeros: odd-count pad slots stay 0
    heads = o[:-1]
    out[heads] = theta
    out[heads + 1] = lens.astype(U64)
    out32 = out.view(np.uint32)
    total_sh = int(lens.sum())
    if total_sh:
        cum = np.zeros(m, np.int64)
        np.cumsum(lens[:-1], out=cum[1:])
        within = np.arange(total_sh, dtype=np.int64) - np.repeat(cum, lens)
        sh32 = (sh_vals[base : base + total_sh] >> U64(32)).astype(np.uint32)
        out32[np.repeat((heads + 2) * 2, lens) + within] = sh32
    if m:
        out[(heads + 2 + shw)[:, None] + np.arange(pw, dtype=np.int64)[None, :]] = sig_vals
    vpay = pa.Array.from_buffers(
        pa.large_binary(),
        m,
        [None, pa.py_buffer((o * 8).tobytes()), pa.py_buffer(out.tobytes())],
    )
    return pa.table(
        {
            "uh": pa.array(_url_hashes(batch["url"]), pa.uint64()),
            "url": batch["url"],
            "vpay": vpay,
        }
    )


def _concat_blobs(pays) -> tuple[np.ndarray, np.ndarray]:
    """Object array of payload bytes → (u64 buffer, word offsets[m+1])."""
    m = len(pays)
    lens = np.fromiter((len(p) >> 3 for p in pays), dtype=np.int64, count=m)
    off = np.zeros(m + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    buf = np.frombuffer(b"".join(pays), dtype=U64)
    return buf, off


def _metrics_from_payloads(url_a, url_b, pay_a, pay_b, num_perms: int, threshold: float) -> pd.DataFrame:
    """Vectorized pair verification from object arrays of payload
    bytes (the cogroup/join attach shape): concatenate each side once,
    then run the buffer kernel."""
    if len(url_a) == 0:
        return _EMPTY_METRICS
    buf_a, off_a = _concat_blobs(pay_a)
    buf_b, off_b = _concat_blobs(pay_b)
    return _metrics_from_buffers(
        url_a, url_b, buf_a, off_a[:-1], buf_b, off_b[:-1], num_perms, threshold
    )


def _metrics_from_buffers(
    url_a, url_b, buf_a, ha, buf_b, hb, num_perms: int, threshold: float
) -> pd.DataFrame:
    """Vectorized pair verification (no per-pair Python).

    Each side arrives as a flat u64 payload buffer + per-pair word
    HEAD offsets (need not be contiguous or ordered — the broadcast
    path passes one shared buffer and gathers heads per pair).
    Signature agreement is one (m, P) matrix compare; shingle-set
    intersections are counted by a hashed sort-merge join on
    (pair, hash) keys — entries are unique within a side, so every
    key hit is exactly one cross-side intersection.
    """
    m = len(url_a)
    if m == 0:
        return _EMPTY_METRICS
    ta, tb = buf_a[ha], buf_b[hb]
    na, nb = buf_a[ha + 1].astype(np.int64), buf_b[hb + 1].astype(np.int64)
    # both variable payloads are u32 packed two-per-word (_pack_payload):
    # sig sits after the word-aligned shingle area; gather ⌈P/2⌉ u64
    # words per side, reinterpret as u32, compare P slots
    pw = (num_perms + 1) // 2
    cols = np.arange(pw, dtype=np.int64)[None, :]
    sa = buf_a[(ha + 2 + (na + 1) // 2)[:, None] + cols].view(np.uint32)[:, :num_perms]
    sb = buf_b[(hb + 2 + (nb + 1) // 2)[:, None] + cols].view(np.uint32)[:, :num_perms]
    agree = (sa == sb).mean(axis=1)

    t = np.minimum(ta, tb)  # pairwise min-theta screen (theta/intersection.rs:64-196)
    est_mode = t != U64(MAX_THETA)  # exact sets (full-range u64) are never screened
    any_est = bool(est_mode.any())
    t32 = (t >> U64(32)).astype(np.uint32)  # screen in the folded domain

    def entries(buf, heads, n):
        tot = int(n.sum())
        pid = np.repeat(np.arange(m, dtype=np.int64), n)
        cum = np.zeros(m, np.int64)
        np.cumsum(n[:-1], out=cum[1:])
        # shingle entries are high-32 folds at u32 positions 2*(head+2)+i;
        # segments are contiguous: one repeated shift instead of two
        buf32 = buf.view(np.uint32)
        v = buf32[np.arange(tot, dtype=np.int64) + np.repeat((heads + 2) * 2 - cum, n)]
        if not any_est:  # the common all-exact batch: no screen, no copy
            return v, pid
        keep = ~est_mode[pid] | (v < t32[pid])
        return v[keep], pid[keep]

    va, pa_id = entries(buf_a, ha, na)
    vb, pb_id = entries(buf_b, hb, nb)
    na_s = np.bincount(pa_id, minlength=m)
    nb_s = np.bincount(pb_id, minlength=m)
    # per-pair intersection counts via a hashed sort-merge join: combine
    # (pair, hash) into ONE u64 key (collision odds ~ n^2/2^64 — noise
    # far below the 128-slot signature resolution). The per-pair mix is
    # computed ONCE per pair and gathered (entries are the hot length);
    # an outer fmix would be pure waste — a bijection cannot change key
    # equality. Both key arrays are SORTED before the merge: ascending
    # probes into the sorted B side walk its leaves sequentially, where
    # random-order probes random-walk the whole array — measured ~2x
    # kernel time in bandwidth-starved windows (u64 sorts stay near
    # cache speed when gathers and binary searches fall off a cliff).
    fpid = fmix64(np.arange(1, m + 1, dtype=U64))
    ka = va ^ fpid[pa_id]
    kb = vb ^ fpid[pb_id]
    if len(kb) and len(ka):
        oa = np.argsort(ka)
        ka_s = ka[oa]
        kb.sort()
        pos = np.minimum(np.searchsorted(kb, ka_s), len(kb) - 1)
        hit = kb[pos] == ka_s
        inter = np.bincount(pa_id[oa[hit]], minlength=m)
    else:
        inter = np.zeros(m, np.int64)
    union = na_s + nb_s - inter
    ex = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    mn = np.minimum(na_s, nb_s)
    cont = np.where(mn > 0, inter / np.maximum(mn, 1), 0.0)
    is_dup = ex >= threshold
    url_a = np.asarray(url_a, dtype=object)
    url_b = np.asarray(url_b, dtype=object)
    swap = url_b < url_a  # normalize: url_a < url_b lexicographically
    lo = np.where(swap, url_b, url_a)
    hi = np.where(swap, url_a, url_b)
    return pd.DataFrame(
        {
            "url_a": lo,
            "url_b": hi,
            "jaccard_sig_est": agree,
            "exact_jaccard": ex,
            "containment": cont,
            "is_dup": is_dup,
            "substring_candidate": (cont >= 0.9) & ~is_dup,
        }
    )


_EMPTY_METRICS = pd.DataFrame(
    {
        "url_a": pd.Series([], dtype=object),
        "url_b": pd.Series([], dtype=object),
        "jaccard_sig_est": pd.Series([], dtype=float),
        "exact_jaccard": pd.Series([], dtype=float),
        "containment": pd.Series([], dtype=float),
        "is_dup": pd.Series([], dtype=bool),
        "substring_candidate": pd.Series([], dtype=bool),
    }
)


_METRICS_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("jaccard_sig_est", pa.float64()),
        ("exact_jaccard", pa.float64()),
        ("containment", pa.float64()),
        ("is_dup", pa.bool_()),
        ("substring_candidate", pa.bool_()),
    ]
)
_EMPTY_METRICS_TBL = pa.Table.from_pandas(
    _EMPTY_METRICS, schema=_METRICS_SCHEMA, preserve_index=False
)


def _arrow_blob_words(binarr: pa.Array, rows: np.ndarray):
    """``binarr.take(rows)`` -> (u64 word buffer, word offsets[m+1]),
    zero-copy from the take result's contiguous values buffer — the
    Arrow-native form of ``_concat_blobs`` (no per-blob Python)."""
    taken = binarr.take(pa.array(rows))
    odtype = np.int64 if pa.types.is_large_binary(taken.type) else np.int32
    offs = np.frombuffer(taken.buffers()[1], odtype).astype(np.int64)
    offs = offs[taken.offset : taken.offset + len(taken) + 1]
    data = np.frombuffer(taken.buffers()[2], np.uint8)[offs[0] : offs[-1]]
    return data.view(U64), (offs - offs[0]) // 8


_BCAST_CACHE: dict = {}


@ray.remote
def _assemble_payload(shard, n_shards, *blocks):
    """Concatenate + hash-sort one SHARD (``uh & (n_shards-1) ==
    shard``) of the packed payload blocks into a broadcast tuple.
    The driver launches ``n_shards`` of these in parallel over the
    same block refs, so the assembly memcpy+sort+plasma-store — the
    measured ~0.7-1.1 s serial floor of the verify stage at 240k docs
    when it ran as ONE task — parallelizes S-way while each payload
    byte is still copied exactly once. Blocks arrive worker→worker via
    the object store; the driver forwards only the ObjectRefs.

    The tuple is PURE NUMERIC numpy arrays — (sorted url-hashes, one
    flat u64 payload buffer, per-doc word heads, utf8 url bytes, url
    byte offsets) — so every worker's ``ray.get`` is a zero-copy view
    into shared plasma memory. Round 3 measured the previous
    object-array form (per-doc bytes/str objects) unpickling ~400 MB
    *per worker process*: 32 verify workers thrashed one memory
    controller reconstructing millions of Python objects each."""
    tabs = []
    for b in blocks:
        if len(b) == 0:
            continue
        if n_shards > 1:
            uh = b["uh"].to_numpy(zero_copy_only=False)
            mask = (uh & U64(n_shards - 1)) == U64(shard)
            if not mask.any():
                continue
            b = b.filter(pa.array(mask))
        tabs.append(b)
    if not tabs:
        return (
            np.empty(0, U64),
            np.empty(0, np.int64),
            np.empty(0, U64),
            np.empty(0, np.int64),
            np.empty(0, np.uint8),
            np.zeros(1, np.int64),
        )
    t = pa.concat_tables(tabs).combine_chunks()
    hs = t["uh"].to_numpy(zero_copy_only=False).astype(U64, copy=False)
    # sort ONLY the hash index; payloads stay in arrival order and
    # lookups go through `order` (sorted pos -> original row). The
    # previous form re-ordered the whole payload table with take() —
    # a serial memcpy of the full broadcast (hundreds of MB) inside
    # this one task, measured as the verify stage's serial floor.
    order = np.argsort(hs).astype(np.int64)

    def var_buffers(arr):
        off = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + len(arr) + 1]
        return np.frombuffer(arr.buffers()[2], np.uint8)[off[0] : off[-1]], off - off[0]

    data, boff = var_buffers(t["vpay"].combine_chunks().cast(pa.large_binary()))
    buf = data.view(U64)  # payloads are whole u64 words by construction
    heads = boff[:-1] >> 3
    url_data, uoff = var_buffers(t["url"].combine_chunks().cast(pa.large_string()))
    # no .copy(): Ray's task-output serialization copies these into
    # plasma anyway — copying first is a redundant full pass over the
    # (hundreds-of-MB at scale) payload buffer inside the serial task
    return (hs[order], order, buf, heads, url_data, uoff)


def _resolve_in(shard, h: np.ndarray) -> np.ndarray:
    """Sorted-hash lookup within one broadcast shard: sorted-pos hit →
    original payload row via the shard's ``order`` permutation."""
    hashes, order = shard[0], shard[1]
    if len(hashes) == 0:
        return np.full(len(h), -1, np.int64)
    pos = np.minimum(np.searchsorted(hashes, h), len(hashes) - 1)
    return np.where(hashes[pos] == h, order[pos], -1)


def _verify_shard_pair(shard_a, shard_b, ha, hb, num_perms: int, threshold: float):
    """Run the metrics kernel for pairs whose A side lives in
    ``shard_a`` and B side in ``shard_b``. Returns None when no pair
    resolves on both sides."""
    ia, ib = _resolve_in(shard_a, ha), _resolve_in(shard_b, hb)
    keep = (ia >= 0) & (ib >= 0)
    ia, ib = ia[keep], ib[keep]
    if len(ia) == 0:
        return None
    _, _, buf_a, heads_a, urls_a = shard_a
    _, _, buf_b, heads_b, urls_b = shard_b
    # payload-locality order: process the group's pairs in ascending
    # broadcast-buffer address so the big per-pair gathers stream the
    # shared payload quasi-sequentially instead of random-walking it
    # (the broadcast is ~4 KB/doc × all candidate docs; output row
    # order is irrelevant — pairs are a set)
    lo = np.minimum(heads_a[ia], heads_b[ib])
    order = np.argsort(lo, kind="stable")
    ia, ib = ia[order], ib[order]
    url_a = urls_a.take(pa.array(ia)).to_numpy(zero_copy_only=False)
    url_b = urls_b.take(pa.array(ib)).to_numpy(zero_copy_only=False)
    return _metrics_from_buffers(
        url_a, url_b, buf_a, heads_a[ia], buf_b, heads_b[ib], num_perms, threshold
    )


def _verify_broadcast_fn(batch: pa.Table, refs, num_perms: int, threshold: float) -> pd.DataFrame:
    """Verify pairs against the sharded broadcast numeric payload —
    vectorized searchsorted resolution, no per-row dict, no per-doc
    Python objects: ``ray.get`` returns zero-copy views into plasma,
    and urls are rehydrated as ONE zero-copy Arrow string array per
    shard, decoded only for the pairs actually in this batch
    (``take``).

    ``refs`` is the list of per-shard assembly ObjectRefs (shard =
    ``uh & (S-1)``, S a power of two). Each batch groups its pairs by
    (shard_a, shard_b) — ≤ S² vectorized kernel calls over whole-block
    batches — so the kernel still sees one flat buffer per side.

    Task form with a process-global ``ray.get`` cache: Ray reuses
    worker processes, so the broadcast resolves once per worker without
    paying an actor pool's spawn/ramp latency (same rationale as
    ``lsh.signature_batch_fn``)."""
    key = tuple(r.hex() if hasattr(r, "hex") else id(r) for r in refs)
    got = _BCAST_CACHE.get(key)
    if got is None:
        if len(_BCAST_CACHE) > 8:  # old broadcasts from finished runs
            _BCAST_CACHE.clear()
        got = []
        for hashes, order, buf, heads, url_data, url_off in ray.get(list(refs)):
            urls = pa.Array.from_buffers(
                pa.large_string(),
                len(heads),
                [None, pa.py_buffer(url_off), pa.py_buffer(url_data)],
            )
            got.append((hashes, order, buf, heads, urls))
        _BCAST_CACHE[key] = got
    if len(batch) == 0 or not any(len(s[0]) for s in got):
        return _EMPTY_METRICS

    ha, hb = _pair_hashes(batch)
    s = len(got)
    if s == 1:
        out = _verify_shard_pair(got[0], got[0], ha, hb, num_perms, threshold)
        return out if out is not None else _EMPTY_METRICS
    sa = (ha & U64(s - 1)).astype(np.int64)
    sb = (hb & U64(s - 1)).astype(np.int64)
    gkey = sa * s + sb
    frames = []
    for g in np.unique(gkey):
        m = gkey == g
        r = _verify_shard_pair(
            got[int(g) // s], got[int(g) % s], ha[m], hb[m], num_perms, threshold
        )
        if r is not None:
            frames.append(r)
    if not frames:
        return _EMPTY_METRICS
    return frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)


class _BlockReduce:
    """Global tree-reduce of an arbitrary per-block partial via
    ``Dataset.aggregate`` — partials combine inside Ray Data's
    aggregate operator (off-driver), the driver receives ONE
    accumulator instead of folding O(blocks) images sequentially."""

    def __new__(cls, partial, merge, name="acc"):
        from ray.data.aggregate import AggregateFnV2

        class _Agg(AggregateFnV2):
            def __init__(self):
                super().__init__(name, zero_factory=lambda: None, on=None, ignore_nulls=True)

            def aggregate_block(self, block):
                if len(block) == 0:
                    return None
                if isinstance(block, pd.DataFrame):  # aggregate may hand pandas blocks
                    block = pa.Table.from_pandas(block, preserve_index=False)
                return partial(block)

            def combine(self, a, b):
                if a is None:
                    return b
                if b is None:
                    return a
                return merge(a, b)

            def finalize(self, acc):
                return acc

        return _Agg()


def _gather_tokens(pairs) -> np.ndarray:
    """Stream the (tiny: 16 B/pair) pair blocks to the driver and
    unique their tokens — NO extra task wave. Callers gate on pair
    count (``direct_pair_cap``); past that use ``_plan_stats``."""
    cols: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_format="numpy", batch_size=None):
        cols.append(b["ha"])
        cols.append(b["hb"])
    if not cols:
        return np.empty(0, U64)
    return np.unique(np.concatenate(cols).astype(U64, copy=False))


def _bloom_geometry(expected: int, fpp: float = 0.005, max_bits: int = 1 << 33):
    """(m, k) for the candidate pre-filter. ``max_bits`` caps the
    broadcast image at 1 GiB; past that fpp degrades gracefully
    instead of memory growing."""
    from raydedup.sketches.bloom import optimal_bits, optimal_hashes

    n = max(expected, 1024)
    m = min(optimal_bits(n, fpp), max_bits)
    m = ((m + 63) // 64) * 64
    return m, optimal_hashes(n, m)


def _candidate_bloom(pairs, expected: int, fpp: float = 0.005, max_bits: int = 1 << 33):
    """Distributed Bloom pre-filter over candidate-pair tokens.

    Per-block Bloom partials (bounded O(m) state each) are OR-merged by
    a tree ``Dataset.aggregate`` — driver memory AND driver work are
    one filter image regardless of candidate/block count. False
    positives only cost a few extra payloads through the cogroup
    shuffle (dropped at attach); no false negatives, so verified
    output is unchanged.
    """
    from raydedup.sketches.bloom import BloomFilter

    m, k = _bloom_geometry(expected, fpp, max_bits)

    def partial(block: pa.Table) -> bytes:
        bf = BloomFilter(m, k)
        bf.insert(np.union1d(*_pair_hashes(block)))
        return bf.bits.tobytes()

    def merge(a: bytes, b: bytes) -> bytes:
        return (np.frombuffer(a, U64) | np.frombuffer(b, U64)).tobytes()

    row = pairs.aggregate(_BlockReduce(partial, merge, name="bloom"))
    blob = row.get("bloom") if row else None
    bits = np.frombuffer(blob, U64).copy() if blob else np.zeros(m // 64, U64)
    return BloomFilter(m, k, bits=bits)


def _plan_stats(pairs, expected: int, token_cap: int, fpp: float = 0.005):
    """ONE streamed pass over the materialized candidate pairs
    producing BOTH plan inputs: the exact unique-token set (early-
    bailed once it exceeds ``token_cap``, so driver memory stays
    bounded no matter the corpus) and the Bloom pre-filter image the
    cogroup path needs.

    Returns ``(tokens | None, BloomFilter)``: ``tokens`` is the sorted
    unique token array when it fit under the cap (broadcast can reuse
    it directly — no second pass), else None (take the cogroup path,
    Bloom already folded). Replaces round 2's two separate passes
    (theta estimate + bloom build) that regressed the e2e bench.
    """
    from raydedup.sketches.bloom import BloomFilter

    m, k = _bloom_geometry(expected, fpp)

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"tok": pa.array([], pa.large_binary()), "bits": pa.array([], pa.large_binary())}
            )
        tok = np.union1d(*_pair_hashes(batch))
        bf = BloomFilter(m, k)
        bf.insert(tok)
        return pa.table(
            {
                "tok": pa.array([tok.tobytes()], pa.large_binary()),
                "bits": pa.array([bf.bits.tobytes()], pa.large_binary()),
            }
        )

    acc_bits = np.zeros(m // 64, U64)
    tok_chunks: list[np.ndarray] | None = []
    n_tok = 0
    for b in pairs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for trow, brow in zip(b["tok"].to_pylist(), b["bits"].to_pylist()):
            acc_bits |= np.frombuffer(brow, U64)
            if tok_chunks is None:
                continue
            chunk = np.frombuffer(trow, U64)
            tok_chunks.append(chunk)
            n_tok += len(chunk)
            if n_tok > 4 * token_cap:  # compact; bail if genuinely over cap
                u = np.unique(np.concatenate(tok_chunks))
                tok_chunks, n_tok = [u], len(u)
                if len(u) > token_cap:
                    tok_chunks = None
    tokens = None
    if tok_chunks is not None:
        tokens = np.unique(np.concatenate(tok_chunks)) if tok_chunks else np.empty(0, U64)
        if len(tokens) > token_cap:
            tokens = None
    return tokens, BloomFilter(m, k, bits=acc_bits)


def _bloom_filter_fn(batch: pa.Table, ref) -> pa.Table:
    """Keep signature rows whose url-hash passes the broadcast Bloom."""
    from raydedup.sketches.bloom import BloomFilter

    if len(batch) == 0:
        return batch
    num_bits, num_hashes, seed, bits = ray.get(ref)
    bf = BloomFilter(num_bits, num_hashes, seed, bits=bits)
    return batch.filter(pa.array(bf.contains(_url_hashes(batch["url"]))))


def _verify_cogroup(pairs, packed, cfg: DedupConfig, n_buckets: int = 64):
    """Fully distributed attach: bucketed cogroup on url-hash, then
    regroup on pair id — two sort-shuffles, nothing driver-side.

    Measured alternatives (240k-doc corpus, 32 CPUs, matched windows),
    kept for the record so the shape isn't re-litigated blind:

    - THIS design: 32.1 s. Payload travels once per pair-side; the
      candidate generator's sorted-neighbor chain capping
      (``lsh.emit_pairs_bucket``, ``max_band_group``) already bounds
      per-doc degree to ~2-4, so "payload × degree" is payload × a
      small constant, not × cluster size.
    - Degree-deduped variant (payloads routed once per distinct
      (pair-bucket, doc), pair buckets keyed on min-member to
      co-locate cliques): 56.0 s — the extra pairs pass, the third
      union leg, and a second sort of the deduped payloads cost more
      than the ~2x volume saving when degree is already capped.
    - ``strategy="join"`` (two Dataset.join hash shuffles): 30.1 s —
      parity with cogroup; both are bounded by Ray's all-to-all over
      binary payload columns, not by the attach shape.

    Below ``broadcast_limit`` candidates the broadcast path wins ~10x
    over all of these (sharded plasma image, zero payload shuffle)."""
    num_perms, threshold = cfg.num_perms, cfg.threshold

    def to_requests(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "cbucket": pa.array([], pa.int64()),
                    "uh": pa.array([], pa.uint64()),
                    "pair_id": pa.array([], pa.uint64()),
                    "side": pa.array([], pa.uint8()),
                    "url": pa.array([], pa.string()),
                    "vpay": pa.array([], pa.binary()),
                }
            )
        ha, hb = _pair_hashes(batch)
        pair_id = fmix64(ha ^ fmix64(hb))
        h = np.concatenate([ha, hb])
        return pa.table(
            {
                "cbucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "uh": pa.array(h, pa.uint64()),
                "pair_id": pa.array(np.tile(pair_id, 2), pa.uint64()),
                "side": pa.array(np.repeat(np.array([0, 1], np.uint8), m)),
                "url": pa.array([None] * (2 * m), pa.string()),
                "vpay": pa.array([None] * (2 * m), pa.binary()),
            }
        )

    def tag_payloads(batch: pa.Table) -> pa.Table:
        h = batch["uh"].to_numpy(zero_copy_only=False).astype(U64)
        n = len(batch)
        return pa.table(
            {
                "cbucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "uh": batch["uh"],
                "pair_id": pa.array(np.zeros(n, U64), pa.uint64()),
                "side": pa.array(np.full(n, 255, np.uint8)),
                "url": batch["url"],
                "vpay": batch["vpay"],
            }
        )

    requests = pairs.map_batches(to_requests, batch_format="pyarrow")
    payloads = packed.map_batches(tag_payloads, batch_format="pyarrow")

    def attach(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        uh = g["uh"].to_numpy(zero_copy_only=False).astype(U64)
        pay_idx = np.flatnonzero(side == 255)
        req_idx = np.flatnonzero(side != 255)
        if len(req_idx) == 0 or len(pay_idx) == 0:
            return pa.table(
                {
                    "pbucket": pa.array([], pa.int64()),
                    "pair_id": pa.array([], pa.uint64()),
                    "side": pa.array([], pa.uint8()),
                    "url": pa.array([], pa.string()),
                    "vpay": pa.array([], g["vpay"].type),
                }
            )
        # sorted-lookup semi-join on the url hash (payload uh unique:
        # one packed payload per url) — no pandas merge
        pk = uh[pay_idx]
        porder = np.argsort(pk, kind="stable")
        pk_s = pk[porder]
        rk = uh[req_idx]
        pos = np.searchsorted(pk_s, rk)
        posc = np.minimum(pos, len(pk_s) - 1)
        ok = (pos < len(pk_s)) & (pk_s[posc] == rk)
        sel_req = req_idx[ok]
        sel_pay = pay_idx[porder[posc[ok]]]
        pair_id = g["pair_id"].to_numpy(zero_copy_only=False)[sel_req].astype(U64)
        return pa.table(
            {
                "pbucket": pa.array((pair_id % U64(n_buckets)).astype(np.int64)),
                "pair_id": pa.array(pair_id, pa.uint64()),
                "side": g["side"].combine_chunks().take(pa.array(sel_req)),
                "url": g["url"].combine_chunks().take(pa.array(sel_pay)),
                "vpay": g["vpay"].combine_chunks().take(pa.array(sel_pay)),
            }
        )

    attached = requests.union(payloads).groupby("cbucket").map_groups(
        attach, batch_format="pyarrow"
    )

    def finalize(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _EMPTY_METRICS_TBL
        pid = g["pair_id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, pid))
        pid_s, side_s = pid[order], side[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = pid_s[1:] != pid_s[:-1]
        run_id = np.cumsum(new) - 1
        cnt = np.bincount(run_id)
        both = cnt[run_id] == 2  # both sides present
        a_sel = order[both & (side_s == 0)]
        b_sel = order[both & (side_s == 1)]
        if len(a_sel) == 0:
            return _EMPTY_METRICS_TBL
        urls = g["url"].to_numpy(zero_copy_only=False)
        vpay = g["vpay"].combine_chunks()
        buf_a, off_a = _arrow_blob_words(vpay, a_sel)
        buf_b, off_b = _arrow_blob_words(vpay, b_sel)
        df = _metrics_from_buffers(
            urls[a_sel], urls[b_sel], buf_a, off_a[:-1], buf_b, off_b[:-1],
            num_perms, threshold,
        )
        return pa.Table.from_pandas(df, schema=_METRICS_SCHEMA, preserve_index=False)

    return attached.groupby("pbucket").map_groups(finalize, batch_format="pyarrow")


def verify_pairs(
    pairs,
    signatures,
    cfg: DedupConfig,
    num_partitions: int = 8,
    strategy: str = "auto",
    broadcast_limit: int = 1_000_000,
):
    """pairs (ha, hb uint64) × signatures → verified pair metrics Dataset.

    ``pairs`` should be materialized by the caller (it is consumed
    twice: once to build the pre-filter, once to verify).

    The broadcast path assembles the exact semi-filtered payload table
    in one remote task and broadcasts the ObjectRef; the cogroup/join
    paths pre-filter payloads with a *distributed Bloom* image
    (``_candidate_bloom``) so driver memory stays O(filter bits)
    regardless of candidate count — the scale-safe shape.

    ``broadcast_limit`` (unique candidate DOCS) is a NODE-memory knob,
    not a driver or per-worker one: the sharded payload image is
    ~4 KB/doc held ONCE per node in plasma (every worker maps it
    zero-copy — ``_verify_broadcast_fn`` reconstructs views, never
    copies), so the default 1M caps the per-node resident broadcast
    at ~4 GB, small against any node that can run this pipeline.
    Below it, broadcast wins big — the cogroup alternative ships each
    doc's payload once per PAIR it appears in (dup-dense corpora
    average ~10 pairs/doc), a payload×degree sort-shuffle measured
    ~16x the broadcast stage cost at the 960k-doc crossover
    (BASELINE.md size sweep). At 10^12-doc scale candidate counts
    exceed any per-node limit and cogroup engages.
    """
    import os
    import sys
    import time

    timing = os.environ.get("RAYDEDUP_TIMING")
    _t0 = time.time()
    n_pairs = pairs.count()
    # Pair rows are tiny (two u64 tokens) but downstream verify tasks
    # parallelize per BLOCK; a groupby upstream can emit very few
    # blocks (its output block count follows its input's). Repartition
    # the pairs to a task-friendly width — a few MB of shuffle that
    # buys cluster-wide verify parallelism.
    try:
        nb = pairs.num_blocks()
    except Exception:
        nb = None
    if n_pairs > 10_000 and nb is not None and nb < num_partitions:
        pairs = pairs.repartition(max(32, num_partitions * 2)).materialize()
    tokens = None  # exact token set, when the plan pass already built it
    bf = None  # Bloom pre-filter, when the plan pass already folded it
    # raw pair tokens are 16 B/pair: up to this many pairs the exact
    # token set is gathered outright (one cheap union pass, <=512 MB
    # transient) and BOTH plan outcomes derive from it for free — the
    # fused distributed stats pass only pays off past this, where its
    # per-block Bloom partials stop being overhead and start being the
    # only bounded-memory option
    direct_pair_cap = 32_000_000
    if strategy == "auto":
        # broadcast cost scales with UNIQUE candidate docs, not pairs
        # (dup clusters are dense: the 60k bench corpus has 154k pairs
        # over 28k docs). Pairs upper-bound tokens at 2/pair, so small
        # candidate sets need NO stats pass at all; mid-size sets gather
        # the exact token set directly (the Bloom, if cogroup wins, is
        # ONE vectorized driver insert from it); only at huge pair
        # counts does the fused bounded-memory stats pass engage
        # (round-2 ran two extra full passes here; VERDICT r2 item 1).
        if 2 * n_pairs <= broadcast_limit:
            strategy = "broadcast"
        elif n_pairs <= direct_pair_cap:
            tokens = _gather_tokens(pairs)
            if len(tokens) <= broadcast_limit:
                strategy = "broadcast"
            else:
                from raydedup.sketches.bloom import BloomFilter

                m, k = _bloom_geometry(len(tokens))
                bf = BloomFilter(m, k)
                bf.insert(tokens)
                tokens, strategy = None, "cogroup"
        else:
            tokens, bf = _plan_stats(pairs, expected=2 * n_pairs, token_cap=broadcast_limit)
            strategy = "broadcast" if tokens is not None else "cogroup"
    if timing:
        print(f"[verify] count {time.time()-_t0:.2f} strategy={strategy}", file=sys.stderr)

    sig_cols = signatures.select_columns(["url", "shingles", "theta", "sig"])

    if strategy == "broadcast":
        _t1 = time.time()
        cand_hashes = tokens if tokens is not None else _gather_tokens(pairs)
        ref = ray.put(cand_hashes)
        if timing:
            print(f"[verify] token set {time.time()-_t1:.2f}", file=sys.stderr)
        _t1 = time.time()
        packed = (
            sig_cols.map_batches(_semi_filter_fn, fn_args=(ref,), batch_format="pyarrow")
            .map_batches(_pack_payload, batch_format="pyarrow")
            .materialize()
        )
        # assemble + sort the broadcast payload in S parallel remote
        # tasks (hash-sharded on uh): packed blocks move worker→worker
        # through the object store and the driver only handles the
        # refs — no serial driver-side iterate/concat/argsort over the
        # payload bytes, and the single-task assembly's measured
        # ~0.7-1.1 s serial floor (240k docs) parallelizes S-way
        n_shards = max(1, int(os.environ.get("RAYDEDUP_BCAST_SHARDS", "4")))
        n_shards = 1 << (n_shards.bit_length() - 1)  # round down to power of 2
        block_refs = packed.get_internal_block_refs()
        refs = [
            _assemble_payload.remote(shard, n_shards, *block_refs)
            for shard in range(n_shards)
        ]
        if timing:
            print(f"[verify] pack+collect {time.time()-_t1:.2f}", file=sys.stderr)
            _t1 = time.time()
            ray.wait(refs, num_returns=len(refs))  # timing-only
            print(f"[verify] assemble {time.time()-_t1:.2f}", file=sys.stderr)
        return pairs.map_batches(
            _verify_broadcast_fn,
            fn_args=(refs, cfg.num_perms, cfg.threshold),
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: bigger (shard_a, shard_b) groups
        )

    # distributed paths: Bloom pre-filter instead of an exact driver set
    # (already folded by the fused plan pass unless strategy was forced)
    if bf is None:
        bf = _candidate_bloom(pairs, expected=2 * max(n_pairs, 1))
    bref = ray.put((bf.num_bits, bf.num_hashes, bf.seed, bf.bits))
    packed = sig_cols.map_batches(
        _bloom_filter_fn, fn_args=(bref,), batch_format="pyarrow"
    ).map_batches(_pack_payload, batch_format="pyarrow")

    if strategy == "cogroup":
        return _verify_cogroup(pairs, packed, cfg, n_buckets=max(16, num_partitions * 8))

    # join strategy (parity/benchmark path): urls travel through the
    # joins as per-side columns — no driver-side url map
    def rename_side(suffix: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {"uh": b["uh"], f"url_{suffix}": b["url"], f"vpay_{suffix}": b["vpay"]}
            )

        return f

    joined = pairs.join(
        packed.map_batches(rename_side("a"), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("ha",),
        right_on=("uh",),
        right_suffix="_ra",
    ).join(
        packed.map_batches(rename_side("b"), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("hb",),
        right_on=("uh",),
        right_suffix="_rb",
    )

    def _kernel(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_METRICS_TBL
        rows = np.arange(len(batch), dtype=np.int64)
        buf_a, off_a = _arrow_blob_words(batch["vpay_a"].combine_chunks(), rows)
        buf_b, off_b = _arrow_blob_words(batch["vpay_b"].combine_chunks(), rows)
        df = _metrics_from_buffers(
            batch["url_a"].to_numpy(zero_copy_only=False),
            batch["url_b"].to_numpy(zero_copy_only=False),
            buf_a, off_a[:-1], buf_b, off_b[:-1],
            cfg.num_perms, cfg.threshold,
        )
        return pa.Table.from_pandas(df, schema=_METRICS_SCHEMA, preserve_index=False)

    return joined.map_batches(_kernel, batch_format="pyarrow")


class _CheckSubstring:
    def __init__(self, tref):
        self.texts = ray.get(tref)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "url_a": pd.Series([], dtype=object),
                "url_b": pd.Series([], dtype=object),
                "substring": pd.Series([], dtype=bool),
            }
        )
        if len(batch) == 0:
            return empty
        ua = batch["url_a"].to_numpy(zero_copy_only=False)
        ub = batch["url_b"].to_numpy(zero_copy_only=False)
        tx = self.texts
        out = np.zeros(len(ua), dtype=bool)
        idx, probes, wrappers = [], [], []
        for i, (a, b) in enumerate(zip(ua, ub)):
            ta, tb = tx.get(a), tx.get(b)
            if ta is None or tb is None:
                continue
            if len(ta) <= len(tb):
                idx.append(i), probes.append(ta), wrappers.append(tb)
            else:
                idx.append(i), probes.append(tb), wrappers.append(ta)
        _probe_by_wrapper(idx, probes, wrappers, out)
        return pd.DataFrame({"url_a": ua, "url_b": ub, "substring": out})


def _probe_by_wrapper(idx, probes, wrappers, out):
    """Shared substring kernel: ``out[idx[i]] = probes[i] in wrappers[i]``,
    grouped so each distinct wrapper builds ONE suffix index
    (ops/suffixarray.py) however many probes target it."""
    from collections import defaultdict

    from raydedup.ops.suffixarray import confirm_substring_batch

    by_wrapper: dict = defaultdict(list)
    for i, probe, wrapper in zip(idx, probes, wrappers):
        by_wrapper[wrapper].append((i, probe))
    for wrapper, plist in by_wrapper.items():
        res = confirm_substring_batch(wrapper.encode(), [p.encode() for _, p in plist])
        for (i, _), r in zip(plist, res):
            out[i] = r


def _confirm_substrings_cogroup(sp, pages, n_buckets: int = 32):
    """Fully distributed substring confirm — the 100-TB shape: no text
    ever lands on the driver. A Bloom of candidate url-hashes is folded
    inside Ray Data (driver holds one filter image), pages semi-filter
    against it, then the same two-shuffle attach as ``_verify_cogroup``:
    cogroup texts to pair sides on url-hash buckets, regroup on pair id,
    and run the per-wrapper suffix check inside each pair bucket."""
    from raydedup.sketches.aggregates import block_reduce
    from raydedup.sketches.bloom import BloomFilter

    n_pairs = sp.count()
    m, k = _bloom_geometry(max(2 * n_pairs, 1024))

    def bloom_partial(block: pa.Table) -> bytes:
        bf = BloomFilter(m, k)
        bf.insert(_url_hashes(block["url_a"]))
        bf.insert(_url_hashes(block["url_b"]))
        return bf.to_bytes()

    row = sp.aggregate(
        block_reduce(
            bloom_partial,
            lambda a, b: BloomFilter.from_bytes(a).union(BloomFilter.from_bytes(b)).to_bytes(),
            name="bloom",
        )
    )
    bf = BloomFilter.from_bytes(row["bloom"]) if row and row.get("bloom") else BloomFilter(m, k)
    ref = ray.put((bf.num_bits, bf.num_hashes, bf.seed, bf.bits))

    def to_requests(batch: pa.Table) -> pa.Table:
        mm = len(batch)
        if mm == 0:
            return pa.table(
                {
                    "cbucket": pa.array([], pa.int64()),
                    "uh": pa.array([], pa.uint64()),
                    "pair_id": pa.array([], pa.uint64()),
                    "side": pa.array([], pa.uint8()),
                    "url": pa.array([], pa.string()),
                    "text": pa.array([], pa.string()),
                }
            )
        ha = _url_hashes(batch["url_a"])
        hb = _url_hashes(batch["url_b"])
        pair_id = fmix64(ha ^ fmix64(hb))
        h = np.concatenate([ha, hb])
        urls = pa.concat_arrays(
            [batch["url_a"].combine_chunks(), batch["url_b"].combine_chunks()]
        )
        return pa.table(
            {
                "cbucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "uh": pa.array(h, pa.uint64()),
                "pair_id": pa.array(np.tile(pair_id, 2), pa.uint64()),
                "side": pa.array(np.repeat(np.array([0, 1], np.uint8), mm)),
                "url": urls.cast(pa.string()),
                "text": pa.array([None] * (2 * mm), pa.string()),
            }
        )

    def tag_payloads(batch: pa.Table) -> pa.Table:
        h = _url_hashes(batch["url"])
        n = len(batch)
        return pa.table(
            {
                "cbucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "uh": pa.array(h, pa.uint64()),
                "pair_id": pa.array(np.zeros(n, U64), pa.uint64()),
                "side": pa.array(np.full(n, 255, np.uint8)),
                "url": batch["url"].combine_chunks().cast(pa.string()),
                "text": batch["text"].combine_chunks().cast(pa.string()),
            }
        )

    requests = sp.map_batches(to_requests, batch_format="pyarrow")
    payloads = (
        pages.select_columns(["url", "text"])
        .map_batches(_bloom_filter_fn, fn_args=(ref,), batch_format="pyarrow")
        .map_batches(tag_payloads, batch_format="pyarrow")
    )

    def attach(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        uh = g["uh"].to_numpy(zero_copy_only=False).astype(U64)
        pay_idx = np.flatnonzero(side == 255)
        req_idx = np.flatnonzero(side != 255)
        if len(req_idx) == 0:
            return pa.table(
                {
                    "pbucket": pa.array([], pa.int64()),
                    "pair_id": pa.array([], pa.uint64()),
                    "side": pa.array([], pa.uint8()),
                    "url": pa.array([], g["url"].type),
                    "text": pa.array([], g["text"].type),
                }
            )
        # LEFT lookup: a side with no page text still reaches finalize,
        # so the output keeps one row per flagged pair (substring=False
        # when either text is missing — broadcast-path parity); misses
        # take a null index -> null text
        match = np.full(len(req_idx), -1, np.int64)
        if len(pay_idx):
            pk = uh[pay_idx]
            porder = np.argsort(pk, kind="stable")
            pk_s = pk[porder]
            rk = uh[req_idx]
            pos = np.searchsorted(pk_s, rk)
            posc = np.minimum(pos, len(pk_s) - 1)
            ok = (pos < len(pk_s)) & (pk_s[posc] == rk)
            match[ok] = pay_idx[porder[posc[ok]]]
        pair_id = g["pair_id"].to_numpy(zero_copy_only=False)[req_idx].astype(U64)
        return pa.table(
            {
                "pbucket": pa.array((pair_id % U64(n_buckets)).astype(np.int64)),
                "pair_id": pa.array(pair_id, pa.uint64()),
                "side": g["side"].combine_chunks().take(pa.array(req_idx)),
                "url": g["url"].combine_chunks().take(pa.array(req_idx)),
                "text": g["text"].combine_chunks().take(pa.array(match, mask=match < 0)),
            }
        )

    attached = requests.union(payloads).groupby("cbucket").map_groups(
        attach, batch_format="pyarrow"
    )

    def finalize(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "url_a": pa.array([], pa.string()),
                "url_b": pa.array([], pa.string()),
                "substring": pa.array([], pa.bool_()),
            }
        )
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
        both = cnt[run_id] == 2
        a_sel = order[both & (side_s == 0)]
        b_sel = order[both & (side_s == 1)]
        if len(a_sel) == 0:
            return empty
        urls = g["url"].to_numpy(zero_copy_only=False)
        texts = g["text"].to_numpy(zero_copy_only=False)
        ua, ub = urls[a_sel], urls[b_sel]
        ta, tb = texts[a_sel], texts[b_sel]
        out = np.zeros(len(ua), dtype=bool)
        idx, probes, wrappers = [], [], []
        for i in range(len(ua)):
            # a missing side surfaces as None — the pair stays
            # substring=False
            if not isinstance(ta[i], str) or not isinstance(tb[i], str):
                continue
            if len(ta[i]) <= len(tb[i]):
                idx.append(i), probes.append(ta[i]), wrappers.append(tb[i])
            else:
                idx.append(i), probes.append(tb[i]), wrappers.append(ta[i])
        _probe_by_wrapper(idx, probes, wrappers, out)
        return pa.table(
            {
                "url_a": pa.array(ua, pa.string()),
                "url_b": pa.array(ub, pa.string()),
                "substring": pa.array(out),
            }
        )

    return attached.groupby("pbucket").map_groups(finalize, batch_format="pyarrow")


def confirm_substrings(
    substring_pairs,
    pages,
    num_partitions: int = 4,
    strategy: str = "auto",
    broadcast_limit: int = 100_000,
):
    """Exact-substring confirmation for containment-flagged pairs:
    checks that the shorter text occurs byte-for-byte inside the longer
    (suffix index per wrapper when a host has many candidates).
    Returns (url_a, url_b, substring).

    Flagged pairs are few by construction (containment >= 0.9 but below
    the Jaccard threshold), so the default path semi-filters their
    texts out of the corpus and broadcasts them once. Past
    ``broadcast_limit`` flagged pairs — or with ``strategy="cogroup"``
    — the fully distributed cogroup path engages: Bloom-filtered texts
    attach to pair sides through two bucketed shuffles and nothing
    text-sized ever touches the driver (the 10^12-doc shape).
    """
    sp = substring_pairs.select_columns(["url_a", "url_b"]).materialize()
    if strategy == "auto":
        strategy = "broadcast" if sp.count() <= broadcast_limit else "cogroup"
    if strategy == "cogroup":
        return _confirm_substrings_cogroup(sp, pages, n_buckets=max(16, num_partitions * 8))
    cand = sp.map_batches(
        lambda b: {"h": np.union1d(_url_hashes(b["url_a"]), _url_hashes(b["url_b"]))}
        if len(b)
        else {"h": np.empty(0, U64)},
        batch_format="pyarrow",
    )
    chunks = [b["h"] for b in cand.iter_batches(batch_format="numpy")]
    cand_hashes = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, U64)
    ref = ray.put(cand_hashes)
    texts = {}
    filtered = pages.select_columns(["url", "text"]).map_batches(
        _semi_filter_fn, fn_args=(ref,), batch_format="pyarrow"
    )
    for b in filtered.iter_batches(batch_format="pyarrow"):
        texts.update(
            zip(b["url"].to_numpy(zero_copy_only=False), b["text"].to_numpy(zero_copy_only=False))
        )
    tref = ray.put(texts)
    return sp.map_batches(
        _CheckSubstring, fn_constructor_args=(tref,), batch_format="pyarrow", concurrency=(1, 4)
    )