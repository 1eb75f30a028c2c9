"""Candidate-pair verification: exact/KMV Jaccard, containment, substring.

Attaches both docs' shingle sets to every candidate pair and computes:

- ``jaccard_sig_est``: MinHash signature agreement (mean of equal
  slots) — the cheap estimate, stderr ~ sqrt(J(1-J)/128).
- ``exact_jaccard``: set Jaccard of the per-doc shingle-hash sets.
  Sets are KMV-trimmed theta sketches (SignatureStage): for docs below
  the cap this is *exact*; above it it is the theta-intersection
  estimate — both entries arrays are screened below
  ``min(theta_a, theta_b)`` first, exactly like
  ``theta/intersection.rs:64-196``, and theta cancels in the ratio.
- ``containment``: |A∩B| / min(|A|,|B|) — catches substring-style
  duplication that Jaccard misses (a short doc inside a long wrapper).
- ``is_dup``: exact_jaccard >= cfg.threshold (the golden-pair rule).
- ``substring_candidate``: containment >= 0.9 but not a Jaccard dup —
  routed to ``confirm_substrings`` for a byte-level check.

Attach strategies (``strategy='auto'`` picks by candidate-set size):

- **broadcast** — when the candidate-doc payload fits the driver
  budget (≤ ``broadcast_limit`` docs): semi-filter the signatures
  table to docs appearing in a pair, collect that small slice,
  ``ray.put`` it once, and verify pairs in a single ``map_batches``
  pass with zero additional shuffles.
- **cogroup** (the 100TB path, auto default above the limit) — fully
  distributed: bucketed union-cogroup on url attaches each doc's
  packed payload to its pair requests, then a regroup on pair id
  brings both sides together; two sort-shuffles over candidate-sized
  data, nothing driver-side (``_verify_cogroup``).
- **join** — two hash-partitioned ``Dataset.join``s. Kept for parity;
  measured ~4x slower than cogroup locally (Ray's hash-shuffle join
  spawns an aggregator actor fleet) and its non-key payloads must be
  packed binary (lists are rejected).

All strategies produce byte-identical outputs (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from raydedup.config import DedupConfig
from raydedup.sketches.hashing import hash_strings
from raydedup.sketches.theta import MAX_THETA

U64 = np.uint64


def _url_hashes(col) -> np.ndarray:
    h1, _ = hash_strings(col)
    return h1


class _SemiFilter:
    """Keep signature rows whose url-hash is in the broadcast sorted set.

    Used as a plain task function via ``semi_filter_fn`` — the state is
    one sorted uint64 array, a zero-copy ``ray.get`` per task.
    """

    def __init__(self, ref):
        self.keep = ray.get(ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.keep) == 0 or len(batch) == 0:
            return batch.slice(0, 0)
        h = _url_hashes(batch["url"])
        idx = np.minimum(np.searchsorted(self.keep, h), len(self.keep) - 1)
        return batch.filter(pa.array(self.keep[idx] == h))


def _semi_filter_fn(batch: pa.Table, ref) -> pa.Table:
    keep = ray.get(ref)  # zero-copy numpy view from the object store
    if len(keep) == 0 or len(batch) == 0:
        return batch.slice(0, 0)
    h = _url_hashes(batch["url"])
    idx = np.minimum(np.searchsorted(keep, h), len(keep) - 1)
    return batch.filter(pa.array(keep[idx] == h))


def _pack_payload(batch: pa.Table) -> pa.Table:
    """(url, theta, shingles, sig) → (url, vpay binary).

    Layout: [theta u64][n_sh u64][shingles n_sh * u64][sig num_perms * u64].
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
    return pa.table({"url": batch["url"], "vpay": pa.array(blobs, pa.binary())})


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
    return pd.DataFrame(
        {
            "url_a": url_a,
            "url_b": url_b,
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
    """Verify pairs against a broadcast {url: packed payload} map."""

    def __init__(self, ref, num_perms: int, threshold: float):
        self.lookup = ray.get(ref)
        self.num_perms = num_perms
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return _EMPTY_METRICS
        ua = batch["url_a"].to_numpy(zero_copy_only=False)
        ub = batch["url_b"].to_numpy(zero_copy_only=False)
        lk = self.lookup
        keep = np.array([a in lk and b in lk for a, b in zip(ua, ub)])
        if not keep.any():
            return _EMPTY_METRICS
        ua, ub = ua[keep], ub[keep]
        pay_a = [lk[u] for u in ua]
        pay_b = [lk[u] for u in ub]
        return _metrics_from_payloads(ua, ub, pay_a, pay_b, self.num_perms, self.threshold)


def _verify_cogroup(pairs, packed, cfg: DedupConfig, n_buckets: int = 64):
    """Fully distributed attach: bucketed cogroup on url, then regroup
    on pair id — two sort-shuffles over candidate-sized data, nothing
    driver-side. The 100TB path (hash-partitioned join without Ray's
    hash-shuffle join operator, which spawns an aggregator actor fleet).
    """
    num_perms, threshold = cfg.num_perms, cfg.threshold

    def to_requests(batch: pa.Table) -> pa.Table:
        m = len(batch)
        if m == 0:
            return pa.table(
                {
                    "cbucket": pa.array([], pa.int64()),
                    "url": pa.array([], pa.string()),
                    "pair_id": pa.array([], pa.uint64()),
                    "side": pa.array([], pa.uint8()),
                    "vpay": pa.array([], pa.binary()),
                }
            )
        ua = batch["url_a"]
        ub = batch["url_b"]
        ha = _url_hashes(ua)
        hb = _url_hashes(ub)
        from raydedup.sketches.hashing import fmix64

        pair_id = fmix64(ha ^ fmix64(hb))
        urls = np.concatenate([ua.to_numpy(zero_copy_only=False), ub.to_numpy(zero_copy_only=False)])
        h = np.concatenate([ha, hb])
        return pa.table(
            {
                "cbucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "url": pa.array(urls),
                "pair_id": pa.array(np.tile(pair_id, 2), pa.uint64()),
                "side": pa.array(np.repeat(np.array([0, 1], np.uint8), m)),
                "vpay": pa.array([None] * (2 * m), pa.binary()),
            }
        )

    def tag_payloads(batch: pa.Table) -> pa.Table:
        h = _url_hashes(batch["url"])
        return pa.table(
            {
                "cbucket": pa.array((h % U64(n_buckets)).astype(np.int64)),
                "url": batch["url"],
                "pair_id": pa.array(np.zeros(len(batch), U64), pa.uint64()),
                "side": pa.array(np.full(len(batch), 255, np.uint8)),
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
        merged = req[["pair_id", "side", "url"]].merge(
            pay[["url", "vpay"]], on="url", how="inner"
        )
        merged["pbucket"] = (merged["pair_id"].to_numpy() % U64(n_buckets)).astype(np.int64)
        return merged[["pbucket", "pair_id", "side", "url", "vpay"]]

    attached = requests.union(payloads).groupby("cbucket").map_groups(
        attach, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_METRICS
        df = df.sort_values(["pair_id", "side"], kind="stable")
        pid = df["pair_id"].to_numpy()
        side = df["side"].to_numpy()
        # keep only pair_ids with both sides present
        new = np.ones(len(df), dtype=bool)
        new[1:] = pid[1:] != pid[:-1]
        run_id = np.cumsum(new) - 1
        cnt = np.bincount(run_id)
        ok = cnt[run_id] == 2
        df = df[ok]
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
    """pairs (url_a, url_b) × signatures → verified pair metrics Dataset.

    ``pairs`` should be materialized by the caller (it is consumed
    twice: once to build the candidate url set, once to verify).
    """
    cand = pairs.map_batches(
        lambda b: {"h": np.union1d(_url_hashes(b["url_a"]), _url_hashes(b["url_b"]))}
        if len(b)
        else {"h": np.empty(0, U64)},
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
            urls = b["url"].to_numpy(zero_copy_only=False)
            pays = b["vpay"].to_numpy(zero_copy_only=False)
            lookup.update(zip(urls, pays))
        lref = ray.put(lookup)
        return pairs.map_batches(
            _VerifyBroadcast,
            fn_constructor_args=(lref, cfg.num_perms, cfg.threshold),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )

    joined = pairs.join(
        packed,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url_a",),
        right_on=("url",),
        right_suffix="_a",
    ).join(
        packed,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url_b",),
        right_on=("url",),
        right_suffix="_b",
    )

    def _kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_METRICS
        # suffixes attach only on collision; second join renames vpay → vpay_1
        pa_col = "vpay" if "vpay" in df.columns else "vpay_a"
        pb_col = "vpay_1" if "vpay_1" in df.columns else "vpay_b"
        return _metrics_from_payloads(
            df["url_a"].to_numpy(),
            df["url_b"].to_numpy(),
            df[pa_col].to_numpy(),
            df[pb_col].to_numpy(),
            cfg.num_perms,
            cfg.threshold,
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
    occurs byte-for-byte inside the longer (C-level
    ``str.__contains__``; per-partition suffix indexes are the
    documented upgrade when one wrapper hosts many candidates).
    Returns (url_a, url_b, substring: bool).
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
        _SemiFilter, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 4)
    )
    for b in filtered.iter_batches(batch_format="pyarrow"):
        texts.update(
            zip(b["url"].to_numpy(zero_copy_only=False), b["text"].to_numpy(zero_copy_only=False))
        )
    tref = ray.put(texts)
    return sp.map_batches(
        _CheckSubstring, fn_constructor_args=(tref,), batch_format="pyarrow", concurrency=(1, 4)
    )
