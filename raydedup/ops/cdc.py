"""Content-defined chunking (CDC) dedup statistics.

Storage-level dedup (the LBFS/FastCDC family): split every document's
UTF-8 bytes at content-defined boundaries — positions where a rolling
hash of the trailing ``window`` bytes has its low ``mask_bits`` bits
zero — and count, corpus-wide, how many chunk *instances* repeat a
chunk first seen in an earlier document. Because boundaries depend only
on local content, a shared passage yields byte-identical chunks even
when its surrounding offsets differ — catching template/boilerplate
reuse that fixed-width chunking misses. Mean chunk size ≈ 2^mask_bits
bytes (geometric); no min/max clamp, so the boundary decision at a
position is independent of every other position and the whole pass
vectorizes.

Scale design: chunk BYTES never leave their block — each block emits
one narrow row per chunk (coarse fingerprint bucket, two independent
64-bit polynomial fingerprints + length as identity, doc/offset for
first-instance order, int source id). One lexsort kernel per bucket
marks non-first instances and pre-aggregates to one row per (source,
bucket); a final Sum groupby finishes. Identity collisions are
~n²/2⁻¹²⁸ (two independent poly hashes + exact length).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.ops.substring import _B1, _B1_INV, _B2, _B2_INV

U64 = np.uint64


def _prefix_and_pow(buf: np.ndarray, base: np.uint64, base_inv: np.uint64):
    """prefix[j] = sum_{t<j} buf[t]*base^{-t};  pow[j] = base^j  (mod 2^64).

    Chunk fingerprint over [s, e): (prefix[e] - prefix[s]) * pow[e-1]
    = sum_{s<=t<e} buf[t] * base^{e-1-t} — position-independent.
    """
    n = len(buf)
    with np.errstate(over="ignore"):
        inv_pow = np.empty(n, dtype=U64)
        if n:
            inv_pow[0] = 1
            inv_pow[1:] = base_inv
            np.cumprod(inv_pow, out=inv_pow)
        prefix = np.zeros(n + 1, dtype=U64)
        np.cumsum(buf.astype(U64) * inv_pow, out=prefix[1:])
        pow_arr = np.empty(n, dtype=U64)
        if n:
            pow_arr[0] = 1
            pow_arr[1:] = base
            np.cumprod(pow_arr, out=pow_arr)
    return prefix, pow_arr


def _text_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated utf-8 bytes, int64 per-doc byte offsets (n+1,))."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + arr.offset + 1)[
        arr.offset :
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    return data, (off - off[0]).astype(np.int64)


def chunk_spans(
    buf: np.ndarray, doc_offsets: np.ndarray, window: int, mask_bits: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starts, ends, doc_of_chunk) — CDC spans for every doc, vectorized.

    A boundary falls AFTER byte i when the rolling hash of
    buf[i-window+1 .. i] (entirely inside one doc) has its low
    ``mask_bits`` bits zero and i is not the doc's last byte; every doc
    end is an implicit boundary. Docs shorter than ``window`` bytes are
    a single chunk.
    """
    from raydedup.ops.substring import rolling_window_hashes

    n = len(buf)
    n_docs = len(doc_offsets) - 1
    mask = U64((1 << mask_bits) - 1)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    h = rolling_window_hashes(buf, window, _B1, _B1_INV)  # h[j] = window ending at j+window-1
    cand = np.nonzero((h & mask) == 0)[0] + (window - 1)  # window-end positions
    # keep only candidates whose window lies inside one doc and that
    # are not the doc's last byte
    d = np.searchsorted(doc_offsets, cand, side="right") - 1
    ok = (cand - (window - 1) >= doc_offsets[d]) & (cand < doc_offsets[d + 1] - 1)
    cuts = cand[ok]
    ends = np.sort(np.concatenate([cuts + 1, doc_offsets[1:]]))
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1]
    nb = np.bincount(np.searchsorted(doc_offsets, cuts, side="right") - 1, minlength=n_docs)
    doc_of_chunk = np.repeat(np.arange(n_docs, dtype=np.int64), nb + 1)
    # drop the zero-length "chunk" an empty doc would contribute
    keep = ends > starts
    return starts[keep], ends[keep], doc_of_chunk[keep]


def cdc_chunk_rows(
    batch: pa.Table,
    id_column: str,
    text_column: str,
    src_ids: dict[str, int],
    window: int = 16,
    mask_bits: int = 6,
    n_buckets: int = 64,
    source_column: str = "source",
) -> pa.Table:
    """Per-chunk narrow rows for one block (the map stage)."""
    from raydedup.sketches.hashing import fmix64

    buf, offs = _text_bytes(batch[text_column])
    starts, ends, doc_ix = chunk_spans(buf, offs, window, mask_bits)
    p1, w1 = _prefix_and_pow(buf, _B1, _B1_INV)
    p2, w2 = _prefix_and_pow(buf, _B2, _B2_INV)
    with np.errstate(over="ignore"):
        f1 = (p1[ends] - p1[starts]) * w1[ends - 1]
        f2 = (p2[ends] - p2[starts]) * w2[ends - 1]
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    enc = batch[source_column].combine_chunks().dictionary_encode()
    lut = np.array([src_ids[s] for s in enc.dictionary.to_pylist()], dtype=np.int64)
    src = lut[enc.indices.to_numpy(zero_copy_only=False)]
    return pa.table(
        {
            "_bkt": pa.array((fmix64(f1) % U64(n_buckets)).astype(np.int64)),
            "f1": pa.array(f1.view(np.int64), pa.int64()),
            "f2": pa.array(f2.view(np.int64), pa.int64()),
            "clen": pa.array(ends - starts),
            id_column: pa.array(ids[doc_ix]),
            "cstart": pa.array(starts - offs[doc_ix]),
            "src": pa.array(src[doc_ix]),
        }
    )


def _mark_bucket(g: pa.Table, id_column: str) -> pa.Table:
    f1 = g["f1"].to_numpy(zero_copy_only=False)
    f2 = g["f2"].to_numpy(zero_copy_only=False)
    ln = g["clen"].to_numpy(zero_copy_only=False)
    ids = g[id_column].to_numpy(zero_copy_only=False)
    cst = g["cstart"].to_numpy(zero_copy_only=False)
    src = g["src"].to_numpy(zero_copy_only=False)
    order = np.lexsort((cst, ids, ln, f2, f1))
    s1, s2, sl = f1[order], f2[order], ln[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) | (sl[1:] != sl[:-1])
    dup = ~first[np.argsort(order, kind="stable")]  # back to input order
    usrc, inv = np.unique(src, return_inverse=True)
    nb = len(usrc)
    return pa.table(
        {
            "src": pa.array(usrc),
            "n_chunks": pa.array(np.bincount(inv, minlength=nb).astype(np.int64)),
            "n_dup_chunks": pa.array(
                np.bincount(inv, weights=dup.astype(np.int64), minlength=nb).astype(np.int64)
            ),
            "total_bytes": pa.array(np.bincount(inv, weights=ln, minlength=nb).astype(np.int64)),
            "dup_bytes": pa.array(
                np.bincount(inv, weights=ln * dup, minlength=nb).astype(np.int64)
            ),
        }
    )


def cdc_dedup_stats(
    ds,
    id_column: str,
    text_column: str = "text",
    source_column: str = "source",
    window: int = 16,
    mask_bits: int = 6,
    n_buckets: int | None = None,
):
    """Per-source CDC dedup report:
    (source, n_chunks, n_dup_chunks, total_bytes, dup_bytes, dup_ratio).

    A chunk instance is DUP when an identical chunk (byte content)
    occurs at a smaller (doc_id, offset); dup bytes are attributed to
    the repeating instance's source. The source dictionary is gathered
    with one column-pruned count groupby — bounded by source-label
    cardinality (a dataset/provenance tag, not a per-page domain; the
    same cap rationale as ``ops/zscore.BROADCAST_GROUP_CAP``).
    """
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from raydedup.ops._bucketed import resolve_buckets

    # ~40 B of fingerprint row per ~2^mask_bits-byte chunk => sub-1x
    # blowup; floor keeps the historical default at test scales
    n_buckets = resolve_buckets(ds, n_buckets)

    srcs = sorted(
        r[source_column] for r in ds.groupby(source_column).count().select_columns([source_column]).take_all()
    )
    src_ids = {s: i for i, s in enumerate(srcs)}

    rows = ds.select_columns([id_column, text_column, source_column]).map_batches(
        lambda b: cdc_chunk_rows(
            b, id_column, text_column, src_ids, window, mask_bits, n_buckets, source_column
        ),
        batch_format="pyarrow",
    )
    partials = rows.groupby("_bkt").map_groups(
        lambda g: _mark_bucket(g, id_column), batch_format="pyarrow"
    )
    out = partials.groupby("src").aggregate(
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("n_dup_chunks", alias_name="n_dup_chunks"),
        Sum("total_bytes", alias_name="total_bytes"),
        Sum("dup_bytes", alias_name="dup_bytes"),
    )
    rev = pa.array(srcs, pa.string())

    def finalize(batch: pa.Table) -> pa.Table:
        names = rev.take(batch["src"].combine_chunks())
        ratio = pc.divide(
            pc.cast(batch["dup_bytes"], pa.float64()),
            pc.cast(batch["total_bytes"], pa.float64()),
        )
        return pa.table(
            {
                source_column: names,
                "n_chunks": batch["n_chunks"],
                "n_dup_chunks": batch["n_dup_chunks"],
                "total_bytes": batch["total_bytes"],
                "dup_bytes": batch["dup_bytes"],
                "dup_ratio": ratio,
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def cdc_dedup_local(
    tbl: pa.Table,
    id_column: str,
    text_column: str = "text",
    source_column: str = "source",
    window: int = 16,
    mask_bits: int = 6,
) -> pa.Table:
    """Single-process naive twin for the oracle sidecar.

    Independent formulation on purpose: the rolling hash is a direct
    window sum (not the inverse-prefix trick), chunk identity is the
    RAW BYTES (python dict), and dup order is an explicit sequential
    walk in (doc_id, offset) order — so the sidecar check covers the
    prefix-trick algebra, the 128-bit fingerprint identity, and the
    distributed order-independence all at once.
    """
    mask = (1 << mask_bits) - 1
    df = tbl.select([id_column, text_column, source_column]).to_pandas()
    df = df.sort_values(id_column, kind="mergesort")
    pw = np.empty(window, dtype=U64)
    pw[0] = 1
    pw[1:] = _B1
    np.cumprod(pw, out=pw)
    pw = pw[::-1].copy()  # base^(window-1) ... base^0
    seen: set[bytes] = set()
    agg: dict[str, list[int]] = {}
    with np.errstate(over="ignore"):
        for _, doc_id, text, source in df.itertuples():
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            n = len(b)
            if n == 0:  # empty doc -> no chunks (matches chunk_spans);
                # a source whose docs are all empty is absent from the
                # report in both implementations
                continue
            cuts = []
            if n >= window:
                h = np.zeros(n - window + 1, dtype=U64)
                for j in range(window):
                    h += b[j : n - window + 1 + j].astype(U64) * pw[j]
                pos = np.nonzero((h & U64(mask)) == 0)[0] + window - 1
                cuts = [int(p) for p in pos if p < n - 1]
            bounds = [0] + [c + 1 for c in cuts] + [n]
            a = agg.setdefault(source, [0, 0, 0, 0])
            for s, e in zip(bounds[:-1], bounds[1:]):
                chunk = b[s:e].tobytes()
                a[0] += 1
                a[2] += e - s
                if chunk in seen:
                    a[1] += 1
                    a[3] += e - s
                else:
                    seen.add(chunk)
    names = sorted(agg)
    return pa.table(
        {
            source_column: pa.array(names, pa.string()),
            "n_chunks": pa.array([agg[s][0] for s in names], pa.int64()),
            "n_dup_chunks": pa.array([agg[s][1] for s in names], pa.int64()),
            "total_bytes": pa.array([agg[s][2] for s in names], pa.int64()),
            "dup_bytes": pa.array([agg[s][3] for s in names], pa.int64()),
            "dup_ratio": pa.array(
                [agg[s][3] / agg[s][2] for s in names], pa.float64()
            ),
        }
    )
