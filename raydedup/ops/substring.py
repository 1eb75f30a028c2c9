"""Cross-document exact-substring duplication (the ExactSubstr pass).

Per Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), any byte span of length >= ``min_len`` that occurs more than
once anywhere in the corpus is duplicated text. The reference engine's
suffix-array confirm (`ops/suffixarray.py`) answers this for flagged
*pairs*; this operator answers it for the WHOLE corpus: for every doc,
the number of bytes covered by at least one duplicated ``min_len``-byte
window (the union of all duplicated spans), plus the duplicated-byte
fraction — the statistic a curation pipeline thresholds on before
cutting spans.

Scale design (100 TB lens):
- Window hashing is O(bytes), not O(bytes x min_len): a double
  64-bit polynomial rolling hash over each block's concatenated Arrow
  string buffer (odd multipliers are invertible mod 2^64, so prefix
  sums of ``byte * B^-i`` turn every window hash into one subtract and
  one multiply). No per-doc Python, no window materialization.
- The one unavoidable all-to-all carries (bucket, h1, h2, id, pos)
  rows — 28 bytes per corpus byte, the same order as a distributed
  suffix-array build, and the honest cost of exact-substring dedup.
  Grams group into ``n_buckets`` coarse hash-buckets (bounded task
  count, no per-gram groups); one lexsort run-length kernel marks
  every position whose 128-bit window hash repeats.
- Only *duplicated* positions leave the bucket stage (tiny for a
  mostly-clean corpus). Interval union needs all of a doc's marked
  positions together, so they regroup by id-bucket and one
  lexsort-by-(id, pos) gap kernel computes the union size per doc:
  the first start of a doc contributes ``min_len`` bytes, every later
  start contributes ``min(min_len, pos - prev_pos)``.
- Docs with zero duplicated windows rejoin via a union + one
  groupby-sum against the per-doc byte counts (map-side derived,
  never shuffled with text attached).

Collisions: window identity is the 128-bit (h1, h2) pair; two distinct
windows colliding on both independent rolling hashes is ~2^-128 per
pair — the same identity assumption as the engine's hash128 exact
dedup (`ops/exact.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Odd 64-bit multipliers (FNV-1a prime; xxhash PRIME64_2). Odd => each
# is a unit mod 2^64, so the rolling-hash prefix trick applies.
_B1 = np.uint64(0x100000001B3)
_B2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _inv_u64(b: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd b mod 2^64 (Newton iteration)."""
    with np.errstate(over="ignore"):
        x = b
        for _ in range(6):
            x = x * (np.uint64(2) - b * x)
        return x


_B1_INV = _inv_u64(_B1)
_B2_INV = _inv_u64(_B2)

# Reserved doc id for the schema-pinning sentinel rows (see _window_rows).
_SENTINEL_ID = np.iinfo(np.int64).min


def rolling_window_hashes(buf: np.ndarray, window: int, base: np.uint64, base_inv: np.uint64) -> np.ndarray:
    """h[i] = sum_{j<window} buf[i+j] * base^(window-1-j) mod 2^64 for
    every start i in one O(len(buf)) vectorized pass."""
    n = len(buf)
    if n < window:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        t = buf.astype(np.uint64)
        inv_pow = np.empty(n, dtype=np.uint64)
        inv_pow[0] = 1
        if n > 1:
            inv_pow[1:] = base_inv
            np.cumprod(inv_pow, out=inv_pow)
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(t * inv_pow, out=prefix[1:])
        # pow_arr[i] = base^(i + window - 1)
        acc = np.uint64(1)
        for _ in range(window - 1):
            acc = acc * base
        pow_arr = np.empty(n - window + 1, dtype=np.uint64)
        pow_arr[0] = acc
        if len(pow_arr) > 1:
            pow_arr[1:] = base
            np.cumprod(pow_arr, out=pow_arr)
        return (prefix[window:] - prefix[: n - window + 1]) * pow_arr


def _window_rows(batch: pa.Table, id_column: str, text_column: str, window: int, n_buckets: int) -> pa.Table:
    """Emit one (bucket, h1, h2, id, pos) row per valid window start.

    Hashes the block's concatenated string buffer once; window starts
    that would cross a document boundary are masked out afterwards.
    """
    from raydedup.sketches.hashing import _string_array_bytes

    data, offsets = _string_array_bytes(batch[text_column])
    offsets = offsets.astype(np.int64)
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(data)
    if n >= window:
        h1 = rolling_window_hashes(data, window, _B1, _B1_INV)
        h2 = rolling_window_hashes(data, window, _B2, _B2_INV)
        start = np.arange(len(h1), dtype=np.int64)
        doc = np.searchsorted(offsets[1:], start, side="right")
        valid = start + window <= offsets[doc + 1]
        start, doc = start[valid], doc[valid]
        h1, h2 = h1[valid], h2[valid]
        out_id = ids[doc]
        pos = start - offsets[doc]
    else:
        h1 = h2 = np.empty(0, dtype=np.uint64)
        out_id = pos = np.empty(0, dtype=np.int64)
    # Sentinel pair: two identical zero-hash windows under the
    # never-a-real-id INT64_MIN. They keep every downstream stage
    # non-empty (Ray's hash join rejects schemaless zero-block inputs
    # and a groupby over an empty dataset loses the schema), mark as
    # "duplicated" by construction, and vanish in the final left join.
    h1 = np.concatenate([h1, np.zeros(2, dtype=np.uint64)])
    h2 = np.concatenate([h2, np.zeros(2, dtype=np.uint64)])
    out_id = np.concatenate([out_id, np.full(2, _SENTINEL_ID, dtype=np.int64)])
    pos = np.concatenate([pos, np.zeros(2, dtype=np.int64)])
    return pa.table(
        {
            "_bkt": pa.array((h1 % np.uint64(n_buckets)).astype(np.int64)),
            "h1": pa.array(h1, pa.uint64()),
            "h2": pa.array(h2, pa.uint64()),
            id_column: pa.array(out_id),
            "pos": pa.array(pos),
        }
    )


def _mark_bucket(g: pa.Table, id_column: str) -> pa.Table:
    """Within one gram hash-bucket, keep only positions whose 128-bit
    window hash occurs >= 2 times corpus-wide (runs after one lexsort)."""
    h1 = g["h1"].to_numpy(zero_copy_only=False)
    h2 = g["h2"].to_numpy(zero_copy_only=False)
    order = np.lexsort((h2, h1))
    sh1, sh2 = h1[order], h2[order]
    new_run = np.ones(len(order), dtype=bool)
    new_run[1:] = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])
    run_id = np.cumsum(new_run) - 1
    dup_sorted = np.bincount(run_id)[run_id] >= 2
    keep = np.empty(len(order), dtype=bool)
    keep[order] = dup_sorted
    return pa.table(
        {
            id_column: g[id_column].filter(pa.array(keep)),
            "pos": g["pos"].filter(pa.array(keep)),
        }
    )


def _union_bucket(g: pa.Table, id_column: str, window: int) -> pa.Table:
    """Union-of-intervals size per doc: all intervals share length
    ``window``, so after sorting starts the union size is
    sum(min(window, start - prev_start)) with the first start of each
    doc contributing ``window``. One lexsort, no per-doc groups."""
    ids = g[id_column].to_numpy(zero_copy_only=False)
    pos = g["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, ids))
    sid, spos = ids[order], pos[order]
    first = np.ones(len(sid), dtype=bool)
    first[1:] = sid[1:] != sid[:-1]
    prev = np.empty_like(spos)
    if len(spos) > 1:
        prev[1:] = spos[:-1]
    contrib = np.where(first, np.int64(window), np.minimum(np.int64(window), spos - prev))
    uid, inv = np.unique(sid, return_inverse=True)
    dup_chars = np.bincount(inv, weights=contrib).astype(np.int64)
    return pa.table({id_column: pa.array(uid), "dup_chars": pa.array(dup_chars)})


def _auto_buckets(ds, blowup: int = 28, target_group_bytes: int = 512 << 20) -> int:
    """Bucket count sized so one bucket's share of the pos-row exchange
    (~``blowup`` bytes per corpus byte) fits a worker: results are
    bucket-count-invariant (grams group by global hash), so this knob
    only trades shuffle-task overhead against per-group memory."""
    try:
        sz = ds.size_bytes()
    except Exception:
        sz = None
    if not sz or sz <= 0:
        return 64
    return int(np.clip(sz * blowup // target_group_bytes + 1, 8, 1 << 20))


def _marked_positions(texts, id_column: str, text_column: str, min_len: int, n_buckets: int):
    """(id, pos) of every window start whose 128-bit hash repeats
    corpus-wide — the shared front half of the stats and removal ops.
    Includes the per-block sentinel rows (id = _SENTINEL_ID)."""
    rows = texts.map_batches(
        lambda b: _window_rows(b, id_column, text_column, min_len, n_buckets),
        batch_format="pyarrow",
    )
    return rows.groupby("_bkt").map_groups(
        lambda g: _mark_bucket(g, id_column), batch_format="pyarrow"
    )


def duplicated_span_stats(
    ds,
    id_column: str,
    text_column: str = "text",
    min_len: int = 48,
    n_buckets: int | None = None,
    id_buckets: int | None = None,
):
    """Corpus-wide exact-substring duplication statistics.

    Returns a Dataset of (id, n_chars, dup_chars, dup_frac): per doc,
    its byte length, the number of bytes covered by at least one
    duplicated ``min_len``-byte window (union of spans), and the
    rounded fraction. ``id_column`` must be int64 (the engine's doc
    ids). Byte semantics: n_chars/dup_chars count UTF-8 bytes.
    """
    texts = ds.select_columns([id_column, text_column])
    if n_buckets is None:
        n_buckets = _auto_buckets(texts)
    if id_buckets is None:
        id_buckets = max(n_buckets // 2, 8)
    marked = _marked_positions(texts, id_column, text_column, min_len, n_buckets)

    def add_id_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_column].to_numpy(zero_copy_only=False)
        return b.append_column("_ibkt", pa.array((ids % id_buckets).astype(np.int64)))

    dup = (
        marked.map_batches(add_id_bucket, batch_format="pyarrow")
        .groupby("_ibkt")
        .map_groups(lambda g: _union_bucket(g, id_column, min_len), batch_format="pyarrow")
    )

    # Combine with the per-doc byte counts via union + groupby-sum
    # rather than a left-outer hash join: the join operator rejects the
    # groupby stage's empty shuffle-partition blocks on its right side
    # ("no match for FieldRef" when a join partition receives no typed
    # shard), while the aggregate path handles them.
    from ray.data.aggregate import Sum

    def byte_counts(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.binary_length(b[text_column]), pa.int64())
        return pa.table(
            {
                id_column: b[id_column],
                "n_chars": n,
                "dup_chars": pa.array(np.zeros(len(b), dtype=np.int64)),
            }
        )

    def dup_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: b[id_column],
                "n_chars": pa.array(np.zeros(len(b), dtype=np.int64)),
                "dup_chars": b["dup_chars"],
            }
        )

    base = texts.map_batches(byte_counts, batch_format="pyarrow")
    combined = base.union(dup.map_batches(dup_rows, batch_format="pyarrow"))
    summed = combined.groupby(id_column).aggregate(
        Sum("n_chars", alias_name="n_chars"),
        Sum("dup_chars", alias_name="dup_chars"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b[id_column], pa.scalar(int(_SENTINEL_ID), pa.int64()))
        b = b.filter(keep)
        frac = pc.round(
            pc.divide(
                pc.cast(b["dup_chars"], pa.float64()), pc.cast(b["n_chars"], pa.float64())
            ),
            ndigits=6,
        )
        return pa.table(
            {
                id_column: b[id_column],
                "n_chars": b["n_chars"],
                "dup_chars": b["dup_chars"],
                "dup_frac": frac,
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")


def _cut_bucket(g: pa.Table, id_column: str, window: int) -> pa.Table:
    """Cut every covered byte from the docs of one id-bucket.

    The group holds each doc's text row (kind 0) plus all of its
    duplicated window starts (kind 1, same id-bucket by construction).
    One coverage mask over the bucket's concatenated byte buffer
    (+1/-1 deltas at span edges, cumsum > 0) selects kept bytes; the
    cleaned strings rebuild zero-copy from the filtered buffer + new
    offsets. No per-doc Python.
    """
    from raydedup.sketches.hashing import _string_array_bytes

    kind = g["kind"].to_numpy(zero_copy_only=False)
    docs = g.filter(pa.array(kind == 0))
    spans = g.filter(pa.array(kind == 1))
    ids = docs[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    text_sorted = docs["text"].take(pa.array(order))
    data, offsets = _string_array_bytes(text_sorted)
    offsets = offsets.astype(np.int64)
    total = len(data)
    n_docs = len(ids)

    sid = spans[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    spos = spans["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    di = np.searchsorted(ids, sid)
    ok = (di < n_docs) & (ids[np.minimum(di, max(n_docs - 1, 0))] == sid) if n_docs else np.zeros(len(sid), bool)
    di, spos = di[ok], spos[ok]

    delta = np.zeros(total + 1, dtype=np.int32)
    starts = offsets[di] + spos
    np.add.at(delta, starts, 1)
    np.add.at(delta, starts + window, -1)
    cover = np.cumsum(delta[:-1]) > 0
    keep = ~cover

    if total:
        doc_of_byte = np.searchsorted(offsets[1:], np.arange(total), side="right")
        kept_per_doc = np.bincount(doc_of_byte, weights=keep, minlength=n_docs).astype(np.int64)
        cut_per_doc = np.bincount(doc_of_byte, weights=cover, minlength=n_docs).astype(np.int64)
        new_data = np.ascontiguousarray(data[keep])
    else:
        kept_per_doc = np.zeros(n_docs, dtype=np.int64)
        cut_per_doc = np.zeros(n_docs, dtype=np.int64)
        new_data = np.empty(0, dtype=np.uint8)
    new_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(kept_per_doc, out=new_off[1:])
    clean = pa.Array.from_buffers(
        pa.large_binary(),
        n_docs,
        [None, pa.py_buffer(new_off), pa.py_buffer(new_data)],
    ).cast(pa.string())
    return pa.table(
        {
            id_column: pa.array(ids),
            "clean_text": clean,
            "dup_chars": pa.array(cut_per_doc),
        }
    )


def remove_duplicated_spans(
    ds,
    id_column: str,
    text_column: str = "text",
    min_len: int = 48,
    n_buckets: int | None = None,
    id_buckets: int | None = None,
):
    """The ExactSubstr transform: cut from every doc all bytes covered
    by a ``min_len``-byte window whose bytes occur >= 2 times anywhere
    in the corpus (Lee et al. 2022 remove ALL occurrences of any
    duplicated span; adjacent/overlapping spans merge by construction).

    Returns (id, clean_text, dup_chars). Docs and their duplicated
    window starts co-group on ``id % id_buckets`` — one union, one
    groupby, then a pure mask-and-rebuild kernel per bucket. Size
    ``id_buckets`` so one bucket's share of corpus bytes fits a worker
    (buckets ≈ corpus_bytes / target_group_bytes). Byte semantics: on
    non-ASCII text a cut can split a UTF-8 sequence (the paper
    operates on tokens); this engine's corpus contract is ASCII text.
    """
    texts = ds.select_columns([id_column, text_column])
    if n_buckets is None:
        n_buckets = _auto_buckets(texts)
    if id_buckets is None:
        # id-bucket groups carry the bucket's full text share (~1x corpus
        # bytes), so size them like the gram buckets without the blowup
        id_buckets = max(_auto_buckets(texts, blowup=2), 8)
    marked = _marked_positions(texts, id_column, text_column, min_len, n_buckets)

    def doc_rows(b: pa.Table) -> pa.Table:
        ids = b[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(b)
        return pa.table(
            {
                id_column: b[id_column],
                "_ibkt": pa.array((ids % id_buckets).astype(np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "text": b[text_column],
                "pos": pa.array(np.full(n, -1, dtype=np.int64)),
            }
        )

    def span_rows(b: pa.Table) -> pa.Table:
        ids = b[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        real = ids != _SENTINEL_ID
        b = b.filter(pa.array(real))
        ids = ids[real]
        n = len(b)
        return pa.table(
            {
                id_column: b[id_column],
                "_ibkt": pa.array((ids % id_buckets).astype(np.int64)),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "text": pa.array([""] * n, pa.string()),
                "pos": b["pos"],
            }
        )

    combined = texts.map_batches(doc_rows, batch_format="pyarrow").union(
        marked.map_batches(span_rows, batch_format="pyarrow")
    )
    return combined.groupby("_ibkt").map_groups(
        lambda g: _cut_bucket(g, id_column, min_len), batch_format="pyarrow"
    )
