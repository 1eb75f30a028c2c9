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

    vpay layout: [theta u64][n_sh u64][shingles n_sh*u64][sig P*u64].
    """
    sh = batch["shingles"].combine_chunks()
    sh_off = sh.offsets.to_numpy(zero_copy_only=False)
    sh_vals = sh.values.to_numpy(zero_copy_only=False).astype(U64, copy=False)
    sig = batch["sig"].combine_chunks()
    p = sig.type.list_size
    sig_vals = sig.flatten().to_numpy(zero_copy_only=False).astype(U64, copy=False).reshape(len(batch), p)
    theta = batch["theta"].to_numpy(zero_copy_only=False).astype(U64, copy=False)
    blobs = []
    base = sh_off[0]
    for i in range(len(batch)):
        seg = sh_vals[sh_off[i] - base : sh_off[i + 1] - base]
        head = np.array([theta[i], len(seg)], dtype=U64)
        blobs.append(head.tobytes() + seg.tobytes() + sig_vals[i].tobytes())
    return pa.table(
        {
            "uh": pa.array(_url_hashes(batch["url"]), pa.uint64()),
            "url": batch["url"],
            "vpay": pa.array(blobs, pa.binary()),
        }
    )


def _unpack(blob: bytes, num_perms: int):
    a = np.frombuffer(blob, dtype=U64)
    theta, n_sh = a[0], int(a[1])
    return theta, a[2 : 2 + n_sh], a[2 + n_sh : 2 + n_sh + num_perms]


def _metrics_from_payloads(url_a, url_b, pay_a, pay_b, num_perms: int, threshold: float) -> pd.DataFrame:
    m = len(url_a)
    agree = np.zeros(m)
    ex = np.zeros(m)
    cont = np.zeros(m)
    for i in range(m):  # per-pair C-speed set ops on presorted arrays
        ta, a, sa = _unpack(pay_a[i], num_perms)
        tb, b, sb = _unpack(pay_b[i], num_perms)
        agree[i] = np.count_nonzero(sa == sb) / num_perms
        t = min(ta, tb)
        if t != U64(MAX_THETA):
            a = a[a < t]
            b = b[b < t]
        if len(a) == 0 or len(b) == 0:
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        ex[i] = inter / (len(a) + len(b) - inter)
        cont[i] = inter / min(len(a), len(b))
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


class _VerifyBroadcast:
    """Verify pairs against a broadcast {url_hash: (url, payload)} map."""

    def __init__(self, ref, num_perms: int, threshold: float):
        self.lookup = ray.get(ref)
        self.num_perms = num_perms
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return _EMPTY_METRICS
        ha, hb = _pair_hashes(batch)
        lk = self.lookup
        rows = [(lk.get(a), lk.get(b)) for a, b in zip(ha.tolist(), hb.tolist())]
        kept = [(ra, rb) for ra, rb in rows if ra is not None and rb is not None]
        if not kept:
            return _EMPTY_METRICS
        ua = [r[0][0] for r in kept]
        ub = [r[1][0] for r in kept]
        pay_a = [r[0][1] for r in kept]
        pay_b = [r[1][1] for r in kept]
        return _metrics_from_payloads(ua, ub, pay_a, pay_b, self.num_perms, self.threshold)


def _verify_cogroup(pairs, packed, cfg: DedupConfig, n_buckets: int = 64):
    """Fully distributed attach: bucketed cogroup on url-hash, then
    regroup on pair id — two sort-shuffles, nothing driver-side."""
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

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        is_pay = df["side"].to_numpy() == 255
        pay = df[is_pay]
        req = df[~is_pay]
        if len(req) == 0 or len(pay) == 0:
            return pd.DataFrame(
                {
                    "pbucket": pd.Series([], dtype=np.int64),
                    "pair_id": pd.Series([], dtype=np.uint64),
                    "side": pd.Series([], dtype=np.uint8),
                    "url": pd.Series([], dtype=object),
                    "vpay": pd.Series([], dtype=object),
                }
            )
        merged = req[["pair_id", "side", "uh"]].merge(
            pay[["uh", "url", "vpay"]], on="uh", how="inner"
        )
        merged["pbucket"] = (merged["pair_id"].to_numpy().astype(U64) % U64(n_buckets)).astype(np.int64)
        return merged[["pbucket", "pair_id", "side", "url", "vpay"]]

    attached = requests.union(payloads).groupby("cbucket").map_groups(
        attach, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_METRICS
        df = df.sort_values(["pair_id", "side"], kind="stable")
        pid = df["pair_id"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = pid[1:] != pid[:-1]
        run_id = np.cumsum(new) - 1
        cnt = np.bincount(run_id)
        df = df[cnt[run_id] == 2]  # both sides present
        if len(df) == 0:
            return _EMPTY_METRICS
        a = df[df["side"].to_numpy() == 0]
        b = df[df["side"].to_numpy() == 1]
        return _metrics_from_payloads(
            a["url"].to_numpy(),
            b["url"].to_numpy(),
            a["vpay"].to_numpy(),
            b["vpay"].to_numpy(),
            num_perms,
            threshold,
        )

    return attached.groupby("pbucket").map_groups(finalize, batch_format="pandas")


def verify_pairs(
    pairs,
    signatures,
    cfg: DedupConfig,
    num_partitions: int = 8,
    strategy: str = "auto",
    broadcast_limit: int = 50_000,
):
    """pairs (ha, hb uint64) × signatures → verified pair metrics Dataset.

    ``pairs`` should be materialized by the caller (it is consumed
    twice: once to build the candidate token set, once to verify).
    """
    cand = pairs.map_batches(
        lambda b: {"h": np.union1d(*_pair_hashes(b))} if len(b) else {"h": np.empty(0, U64)},
        batch_format="pyarrow",
    )
    chunks = [b["h"] for b in cand.iter_batches(batch_format="numpy")]
    cand_hashes = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, U64)
    ref = ray.put(cand_hashes)

    sig_cols = signatures.select_columns(["url", "shingles", "theta", "sig"])
    packed = sig_cols.map_batches(
        _semi_filter_fn, fn_args=(ref,), batch_format="pyarrow"
    ).map_batches(_pack_payload, batch_format="pyarrow")

    if strategy == "auto":
        strategy = "broadcast" if len(cand_hashes) <= broadcast_limit else "cogroup"

    if strategy == "cogroup":
        return _verify_cogroup(pairs, packed, cfg, n_buckets=max(16, num_partitions * 8))

    if strategy == "broadcast":
        lookup = {}
        for b in packed.iter_batches(batch_format="pyarrow"):
            hs = b["uh"].to_numpy(zero_copy_only=False)
            urls = b["url"].to_numpy(zero_copy_only=False)
            pays = b["vpay"].to_numpy(zero_copy_only=False)
            lookup.update(zip(hs.tolist(), zip(urls, pays)))
        lref = ray.put(lookup)
        return pairs.map_batches(
            _VerifyBroadcast,
            fn_constructor_args=(lref, cfg.num_perms, cfg.threshold),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )

    # join strategy (parity/benchmark path)
    joined = pairs.join(
        packed.drop_columns(["url"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("ha",),
        right_on=("uh",),
        right_suffix="_a",
    ).join(
        packed.drop_columns(["url"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("hb",),
        right_on=("uh",),
        right_suffix="_b",
    )

    # re-resolve urls for the output via a broadcast of the (small)
    # candidate url table
    urlmap = {}
    for b in packed.iter_batches(batch_format="pyarrow"):
        urlmap.update(
            zip(b["uh"].to_numpy(zero_copy_only=False).tolist(), b["url"].to_numpy(zero_copy_only=False))
        )
    uref = ray.put(urlmap)

    def _kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_METRICS
        um = ray.get(uref)
        pa_col = "vpay" if "vpay" in df.columns else "vpay_a"
        pb_col = "vpay_1" if "vpay_1" in df.columns else "vpay_b"
        ua = [um[int(h)] for h in df["ha"].to_numpy()]
        ub = [um[int(h)] for h in df["hb"].to_numpy()]
        return _metrics_from_payloads(
            ua, ub, df[pa_col].to_numpy(), df[pb_col].to_numpy(), cfg.num_perms, cfg.threshold
        )

    return joined.map_batches(_kernel, batch_format="pandas")


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
        # group probes by wrapper (the longer side): a boilerplate host
        # with many flagged candidates gets ONE suffix index instead of
        # a linear scan per probe (ops/suffixarray.py)
        from collections import defaultdict

        by_wrapper: dict = defaultdict(list)
        out = np.zeros(len(ua), dtype=bool)
        for i, (a, b) in enumerate(zip(ua, ub)):
            ta, tb = tx.get(a), tx.get(b)
            if ta is None or tb is None:
                continue
            if len(ta) <= len(tb):
                by_wrapper[b].append((i, ta))
            else:
                by_wrapper[a].append((i, tb))
        from raydedup.ops.suffixarray import confirm_substring_batch

        for wrapper, probes in by_wrapper.items():
            res = confirm_substring_batch(
                tx[wrapper].encode(), [p.encode() for _, p in probes]
            )
            for (i, _), r in zip(probes, res):
                out[i] = r
        return pd.DataFrame({"url_a": ua, "url_b": ub, "substring": out})


def confirm_substrings(substring_pairs, pages, num_partitions: int = 4):
    """Exact-substring confirmation for containment-flagged pairs.

    Flagged pairs are few by construction (containment >= 0.9 but below
    the Jaccard threshold), so their texts are semi-filtered out of the
    corpus and broadcast once; each pair checks that the shorter text
    occurs byte-for-byte inside the longer (suffix index per wrapper
    when a host has many candidates). Returns (url_a, url_b, substring).
    """
    sp = substring_pairs.select_columns(["url_a", "url_b"]).materialize()
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