"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented
operator (SURVEY.md §2) with DuckDB-checkable SQL where expressible.
Ray is initialised by the driver BEFORE this module is imported — no
``ray.init``/``ray.shutdown`` here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mod(arr: pa.Array | pa.ChunkedArray, m: int) -> pa.Array:
    """Integer modulo as an Arrow array (pyarrow.compute lacks one)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(arr.to_numpy(zero_copy_only=False) % m)


def _documents_as_pages(sf_dir: str):
    """documents table → pages shape (url, text) for the dedup pipeline."""
    import ray.data as rd

    def to_pages(batch: pa.Table) -> pa.Table:
        urls = pc.binary_join_element_wise(
            "https://synth.local/doc/",
            pc.cast(batch["doc_id"], pa.string()),
            "",
        )
        return pa.table({"url": urls, "text": batch["text"], "doc_id": batch["doc_id"]})

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )


def entry() -> Any:
    """Flagship: near-dup detection + clustering on sf0.001 documents."""
    from raydedup.config import DedupConfig
    from raydedup.pipeline.run import run_dedup

    pages = _documents_as_pages("/root/testdata/sf0.001")
    res = run_dedup(pages, DedupConfig(), n_buckets=32, concurrency=(1, 4))
    return res.assignments


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_exact_dedup(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.exact import exact_dedup_representatives

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_representatives(ds, "doc_id").sort("doc_id")


def _q_token_stats(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.text_stats import token_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lambda b: token_stats(b, "doc_id"), batch_format="pyarrow").sort("doc_id")


def _q_jsonl_docs(sf_dir: str):
    """Source-format parity: documents → sharded JSONL (the other wire
    format web-crawl pipelines exchange) → read back → per-doc token
    stats. The oracle reads the ORIGINAL parquet, so a green row proves
    the JSONL sink+source round-trips every row and value byte-exactly.
    Shards are one-file-per-block (resumable, never one giant file)."""
    import shutil
    import ray.data as rd

    from raydedup.ops.text_stats import token_stats

    out = f"/tmp/raydedup_jsonl/{abs(hash(sf_dir)) & 0xFFFFFFFF:x}"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds.write_json(out)
    back = rd.read_json(out)
    return back.map_batches(lambda b: token_stats(b, "doc_id"), batch_format="pyarrow").sort(
        "doc_id"
    )


def _q_partitioned_docs(sf_dir: str):
    """Partitioned-sink parity: documents → hive-partitioned parquet
    (one directory per lang — the resumable-output layout: a failed run
    skips finished partitions) → read back with partition-column
    recovery → per-(lang, source) rollup. The oracle reads the ORIGINAL
    table, so a green row proves the partitioned sink+source
    round-trips every row and value exactly."""
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    out = f"/tmp/raydedup_partdocs/{abs(hash(sf_dir)) & 0xFFFFFFFF:x}"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"])
    ds.write_parquet(out, partition_cols=["lang"])
    back = rd.read_parquet(out)
    agg = (
        back.groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"), Sum("doc_id", alias_name="sum_doc_id"))
    )

    def fix_types(batch: pa.Table) -> pa.Table:
        # partition-column values come back as dictionary-encoded strings
        i = batch.column_names.index("lang")
        return batch.set_column(i, "lang", pc.cast(batch["lang"], pa.string()))

    return agg.map_batches(fix_types, batch_format="pyarrow").sort(["lang", "source"])


def _q_distinct_orderkeys(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.exact import distinct_texts_theta

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])

    def as_text(batch: pa.Table) -> pa.Table:
        return pa.table({"text": pc.cast(batch["l_orderkey"], pa.string())})

    sk = distinct_texts_theta(ds.map_batches(as_text, batch_format="pyarrow"), lg_k=20)
    return pa.table({"n_distinct": pa.array([int(round(sk.estimate()))], pa.int64())})


def _q_docs_per_source(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    out = ds.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )
    return out.sort("source")


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary (general aggregate parity)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            batch = batch.set_column(
                batch.column_names.index(c), c, pc.round(batch[c], ndigits=2)
            )
        return batch

    return out.map_batches(round_cols, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def _q_fingerprints(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.text_stats import fingerprint

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lambda b: fingerprint(b, "doc_id"), batch_format="pyarrow").sort("doc_id")


_DEDUP_RESULTS: dict = {}


def _dedup_result(sf_dir: str):
    """One default-config pipeline run per sf_dir per process. Four
    queries (dedup_assignments, best_in_cluster, cluster_sizes,
    sig_distance_quantiles) consume the identical DedupResult; the
    driver's correctness gate calls each query separately and would
    otherwise pay the full pipeline once per query. The internals are
    already materialized (run.py), so cached consumers re-derive only
    their own small tail."""
    res = _DEDUP_RESULTS.get(sf_dir)
    if res is None:
        from raydedup.config import DedupConfig
        from raydedup.pipeline.run import run_dedup

        pages = _documents_as_pages(sf_dir)
        res = run_dedup(pages, DedupConfig(), n_buckets=32, concurrency=(1, 4))
        _DEDUP_RESULTS[sf_dir] = res
    return res


def _q_dedup_assignments(sf_dir: str):
    """Full near-dup pipeline over documents (non-SQL-expressible)."""
    return _dedup_result(sf_dir).assignments.sort("url")


def _q_corpus_vocab(sf_dir: str):
    """Corpus-wide vocabulary report in ONE scan: total words, exact
    distinct words, exact distinct 5-gram shingles. Blocks emit their
    LOCAL unique hash sets tagged by kind (plus one total-words row);
    per-bucket kernels count bucket-level uniques, one Sum finishes.
    The exchange carries unique hashes, never tokens. Distinctness is
    over murmur u64 hashes (collision odds ~n²/2⁶⁵ — documented, not
    defended). Oracle: DuckDB distinct over the same word/gram
    derivation the ngram oracles use."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from raydedup.pipeline.extract import text_to_shingle_sets, tokenize_word_hashes
    from raydedup.sketches.hashing import fmix64

    U64 = np.uint64
    NB = 32

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        wh, offs = tokenize_word_hashes(batch["text"])
        sh, _, _ = text_to_shingle_sets(batch["text"], k=5)
        wu = np.unique(wh)
        su = np.unique(sh)
        kind = np.concatenate(
            [
                np.zeros(len(wu), np.int64),
                np.ones(len(su), np.int64),
                np.full(1, 2, np.int64),
            ]
        )
        h = np.concatenate([wu, su, np.array([len(wh)], np.uint64)])
        bucket = (fmix64(h) % U64(NB)).astype(np.int64)
        bucket[kind == 2] = 0
        return pa.table(
            {
                "kind": pa.array(kind),
                "_gb": pa.array(kind * NB + bucket),
                "h": pa.array(h, pa.uint64()),
            }
        )

    def count_bucket(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        k = int(kind[0])
        if k == 2:
            val = int(h.sum())  # total words: sum of per-block counts
        else:
            val = len(np.unique(h))
        return pa.table(
            {"kind": pa.array([k], pa.int64()), "val": pa.array([val], pa.int64())}
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(count_bucket, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("val", alias_name="val"))
        .to_pandas()
    )
    vals = {int(r.kind): int(r.val) for r in agg.itertuples()}
    return pa.table(
        {
            "n_words": pa.array([vals[2]], pa.int64()),
            "n_distinct_words": pa.array([vals[0]], pa.int64()),
            "n_distinct_5grams": pa.array([vals[1]], pa.int64()),
        }
    )


def _q_window_anomalies(sf_dir: str):
    """Per-user hourly event-rate anomaly detection: window counts
    (map-side packed-key combiner partials, one exchange), then each
    user's windows z-scored against that user's own window-count
    moments (exact integer sums, broadcast lookup) and flagged when
    z > 2. Oracle mirrors the identical double expression."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from raydedup.ops.zscore import grouped_zscore

    HOUR_US = 3_600_000_000
    P32 = np.int64(1) << np.int64(32)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def wc_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        w = ts.astype(np.int64) // HOUR_US
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = u * P32 + w
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {"pk": pa.array(pku, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        ev.map_batches(wc_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("n", alias_name="n"))
    )

    def unpack(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(pk // P32),
                "window_start_us": pa.array((pk % P32) * HOUR_US),
                "n": batch["n"],
            }
        )

    wc = counts.map_batches(unpack, batch_format="pyarrow")
    scored = grouped_zscore(wc, group="user_id", x="n", decimals=0)

    def flag(batch: pa.Table) -> pa.Table:
        z = batch["z"].to_numpy(zero_copy_only=False)
        keep = z > 2.0  # NaN (degenerate users) compares False
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start_us": t["window_start_us"],
                "n_events": t["n"],
                "z": t["z"],
            }
        )

    return scored.map_batches(flag, batch_format="pyarrow").sort(
        ["user_id", "window_start_us"]
    )


def _q_leakage_safe_split(sf_dir: str):
    """Leakage-safe train/val split: the split key is the near-dup
    CLUSTER representative, not the document, so near-duplicates can
    never straddle train and val (the classic eval-contamination bug
    in web-corpus splits). Composition: dedup assignments → pure map
    (val iff cluster-representative id % 10 == 0). Oracle: the
    recursive-CTE connected components + the same modulo rule."""
    prefix = "https://synth.local/doc/"

    res = _dedup_result(sf_dir)

    def split(batch: pa.Table) -> pa.Table:
        cid = batch["cluster_id"]
        if isinstance(cid, pa.ChunkedArray):
            cid = cid.combine_chunks()
        num = pc.cast(pc.utf8_slice_codeunits(cid, len(prefix), 64), pa.int64())
        n = num.to_numpy(zero_copy_only=False)
        lab = np.where(n % 10 == 0, "val", "train")
        return pa.table({"url": batch["url"], "split": pa.array(lab)})

    return res.assignments.map_batches(split, batch_format="pyarrow").sort("url")


def _q_best_in_cluster(sf_dir: str):
    """Representative selection after near-dup clustering: keep the
    highest-token-count member of every cluster (ties → min url) —
    the keep-the-longest curation policy over dedup_assignments."""
    from raydedup.ops.select import best_in_cluster

    pages = _documents_as_pages(sf_dir)
    res = _dedup_result(sf_dir)
    return best_in_cluster(res.assignments, pages, n_buckets=32).sort("cluster_id")


def _q_cluster_sizes(sf_dir: str):
    """Dedup report: histogram of near-dup cluster sizes (how much of
    the corpus sits in duplicate clusters, and how big they are).
    Two tiny groupby exchanges over (url, cluster_id) rows after the
    pipeline — nothing text-sized shuffles, output is O(max cluster
    size) rows regardless of corpus size."""
    from ray.data.aggregate import Count

    res = _dedup_result(sf_dir)
    sizes = res.assignments.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size")
    )
    return (
        sizes.groupby("cluster_size")
        .aggregate(Count(alias_name="n_clusters"))
        .sort("cluster_size")
    )


def _q_cosine_dup_pairs(sf_dir: str):
    """Embedding near-dup pairs (cosine >= 0.45) — exact, distributed
    blockwise all-pairs (no driver materialization of the corpus; the
    SRP-LSH approximate path serves high-tau near-dup instead)."""
    import ray.data as rd

    from raydedup.ops.ann import cosine_all_pairs_blockwise

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = cosine_all_pairs_blockwise(ds, tau=0.45).to_pandas()
    out["cosine"] = out["cosine"].round(3)
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_events_distinct_users(sf_dir: str):
    """Grouped approximate distinct: HLL per event_type over user_id
    via the sparse-partial grouped aggregate (``HllDistinct`` — tiny
    groups shuffle ~4 B/coupon, not 2^lg_k registers). The merged
    sketch is split-invariant (coupon-set union below the promotion
    point, register max above), so the in-process sidecar twin matches
    value-exactly."""
    import ray.data as rd

    from raydedup.sketches.aggregates import HllDistinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return (
        ev.groupby("event_type")
        .aggregate(HllDistinct("user_id", lg_k=12, alias_name="n_users_est"))
        .sort("event_type")
    )


def _q_events_tumbling(sf_dir: str):
    """1-minute tumbling window count+sum per user."""
    import ray.data as rd

    from raydedup.ops.windows import tumbling_window_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    out = tumbling_window_aggregate(ds, "user_id", "ts", "value", width_s=60)

    def round_cols(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("total_value")
        return batch.set_column(i, "total_value", pc.round(batch["total_value"], ndigits=2))

    return out.map_batches(round_cols, batch_format="pyarrow").sort(["user_id", "window_start"])


def _q_events_hopping(sf_dir: str):
    """2-minute windows hopping every minute per user (each event in
    two windows) — the overlapping windowed-aggregate shape; map-side
    k-fold replicate of 3-column rows + one groupby exchange."""
    import ray.data as rd

    from raydedup.ops.windows import hopping_window_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    out = hopping_window_aggregate(ds, "user_id", "ts", "value", width_s=120, hop_s=60)

    def round_cols(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("total_value")
        return batch.set_column(i, "total_value", pc.round(batch["total_value"], ndigits=2))

    return out.map_batches(round_cols, batch_format="pyarrow").sort(["user_id", "window_start"])


def _q_events_sessions(sf_dir: str):
    """Gap-based session windows (30-minute gap) per user."""
    import ray.data as rd

    from raydedup.ops.windows import session_windows

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return session_windows(ds, "user_id", "ts", gap_s=1800).sort(["user_id", "session_start"])


def _q_cumulative_spend(sf_dir: str):
    """Per-customer running spend in order-date order — the
    ordered-window aggregate (``SUM() OVER (PARTITION BY key ORDER BY
    ...)``) Ray Data has no native form for. Coarse-bucketed
    lexsort + segmented-cumsum kernel (no per-key groups); values
    accumulate as integer cents, so the running sums are exact under
    any blocking and bit-match the oracle's integer window sum."""
    import ray.data as rd

    from raydedup.ops.windows import cumulative_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )
    out = cumulative_per_key(
        ds,
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
        "o_totalprice",
        out_col="running_spend",
    )
    return out.sort(["o_custkey", "o_orderdate", "o_orderkey"])


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_customers_no_orders(sf_dir: str):
    """Semi/anti join (EXISTS flags): which customers placed an order
    since 1998. Bloom of the right keys broadcast once — left Bloom
    misses never shuffle; hits confirm exactly in a bucketed 128-bit
    cogroup (ops/antijoin.py, the flag_new_docs shape on arbitrary
    keys). Both join polarities checked in one flag table."""
    import ray.data as rd

    from raydedup.ops.antijoin import key_match_flags

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    import datetime as _dt

    _cut = pa.scalar(_dt.datetime(1998, 1, 1), pa.timestamp("us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["o_orderdate"], _cut)),
        batch_format="pyarrow",
    )
    return key_match_flags(
        cust, orders, "c_custkey", "c_custkey", "o_custkey"
    ).sort("c_custkey")


def _q_funnel_stages(sf_dir: str):
    """Behavioral funnel: per user, the longest prefix of view →
    click → purchase completed in strict temporal order
    (first-completion semantics). Map-side type filter, one bucketed
    exchange of relevant (user, ts, step) rows, vectorized
    groupby-min per step inside the bucket kernel."""
    import ray.data as rd

    from raydedup.ops.funnel import funnel_stages

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_stages(
        ds, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).sort("user_id")


def _q_order_rank_in_cust(sf_dir: str):
    """Per-customer order ranking (RANK + PERCENT_RANK window
    semantics): same coarse-bucket lexsort kernel, unique tiebreak so
    rank == row_number, (rnk-1)/(n-1) identical to SQL percent_rank."""
    import ray.data as rd

    from raydedup.ops.windows import rank_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderkey"],
    )
    return rank_per_key(ds, "o_custkey", ["o_totalprice", "o_orderkey"]).sort(
        ["o_custkey", "rnk"]
    )


def _q_event_interarrival(sf_dir: str):
    """Per-user inter-arrival time (ts - LAG(ts), null first row) —
    the lag/lead window family over the bucketed kernel."""
    import ray.data as rd

    from raydedup.ops.windows import lag_delta_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    return lag_delta_per_key(ds, "user_id", "ts", ["ts", "event_id"]).sort(
        ["user_id", "ts", "event_id"]
    )


def _q_pivot_events(sf_dir: str):
    """Pivot (long → wide): per-user value sums, one column per event
    type (explicit category contract). Map-side completion to one wide
    row per (block, user); ONE groupby exchange of wide rows;
    integer-cent sums exact under any blocking."""
    import ray.data as rd

    from raydedup.ops.pivot import pivot_sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    return pivot_sum(ds, "user_id", "event_type", "value", _EVENT_TYPES).sort("user_id")


def _q_rolling_user_value(sf_dir: str):
    """Per-user rolling 5-event sum (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW) — the sliding ordered-window frame, same bucketed
    segmented-cumsum kernel as cumulative_spend with a lag bound;
    integer-cent accumulation keeps it exact under any blocking."""
    import ray.data as rd

    from raydedup.ops.windows import cumulative_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    out = cumulative_per_key(
        ds,
        "user_id",
        ["ts", "event_id"],
        "value",
        out_col="rolling_value",
        window=5,
    )
    return out.sort(["user_id", "ts", "event_id"])


def _q_top2_parts_per_brand(sf_dir: str):
    """Per-group top-k (row_number window semantics): the 2 priciest
    parts of each brand, ties broken by partkey."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand", "p_partkey", "p_retailprice"])

    # coarse-bucket on hash(brand) so one vectorized kernel handles ALL
    # brands in a bucket (no per-key pandas groups; bot-key safe)
    def add_bucket(batch: pa.Table) -> pa.Table:
        from raydedup.sketches.aggregates import _column_hashes

        h1, _ = _column_hashes(batch["p_brand"])
        return batch.append_column("_bkt", pa.array((h1 % np.uint64(32)).astype(np.int64)))

    def top2_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_brand", "p_retailprice", "p_partkey"], ascending=[True, False, True])
        out = g[g.groupby("p_brand", sort=False).cumcount() < 2]
        return out.drop(columns=["_bkt"])

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(top2_bucket, batch_format="pandas")
    )
    return out.sort(["p_brand", "p_retailprice", "p_partkey"], descending=[False, True, False])


def _q_region_revenue(sf_dir: str):
    """3-way dimension join: orders ⋈ customer ⋈ nation ⋈ region →
    revenue per region (small dims broadcast-merged inside map_batches
    — the guide's small-side pattern — after one hash join on the fact
    key)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    keys = dim.n_nationkey.to_numpy()
    order = np.argsort(keys)
    dref = ray.put((keys[order], dim.r_name.to_numpy()[order]))

    joined = orders.join(
        cust, join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",)
    )

    def attach_region(batch: pa.Table) -> pa.Table:
        import ray as _ray

        keys_s, names_s = _ray.get(dref)  # sorted broadcast dim, searchsorted lookup
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        rn = names_s[np.searchsorted(keys_s, nk)]
        return pa.table(
            {"r_name": pa.array(rn, pa.string()), "o_totalprice": batch["o_totalprice"]}
        )

    out = (
        joined.map_batches(attach_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("revenue")
        return batch.set_column(i, "revenue", pc.round(batch["revenue"], ndigits=2))

    return out.map_batches(round_cols, batch_format="pyarrow").sort("r_name")


def _promo_windows():
    """16 overlapping 270-day promo windows every 150 days from
    1995-01-01 — derived identically by the SQL oracle (inlined as a
    VALUES list), so the range-join kernel is what's tested."""
    from datetime import datetime, timedelta

    base = datetime(1995, 1, 1)
    return [
        (i, base + timedelta(days=150 * i), base + timedelta(days=150 * i + 269))
        for i in range(16)
    ]


def _q_promo_revenue(sf_dir: str):
    """Range (interval) join: orders × overlapping promo windows on
    ``lo <= o_orderdate <= hi`` via the broadcast interval kernel
    (``ops/rangejoin.py`` — small side ``ray.put`` once, map-only,
    zero shuffle), then revenue per window."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from raydedup.ops.rangejoin import range_join_broadcast

    wins = _promo_windows()
    ranges = pa.table(
        {
            "range_id": pa.array([w[0] for w in wins], pa.int64()),
            "lo": pa.array([w[1] for w in wins], pa.timestamp("us")),
            "hi": pa.array([w[2] for w in wins], pa.timestamp("us")),
        }
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    out = (
        range_join_broadcast(orders, ranges, "o_orderdate")
        .groupby("range_id")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("revenue")
        return batch.set_column(i, "revenue", pc.round(batch["revenue"], ndigits=2))

    return out.map_batches(round_cols, batch_format="pyarrow").sort("range_id")


def _q_asof_user_orders(sf_dir: str):
    """As-of join: each event matched to the user's latest order at or
    before the event time (custom operator — bucketed cogroup +
    per-bucket merge_asof; DuckDB oracle uses native ASOF JOIN)."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from raydedup.ops.asof import asof_join

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(batch["o_custkey"], pa.int64()),
                "o_orderdate": pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                "o_orderkey": batch["o_orderkey"],
            }
        )

    # one row per (user, date): deterministic tie-break = max orderkey
    orders = (
        orders.map_batches(rename, batch_format="pyarrow")
        .groupby(["user_id", "o_orderdate"])
        .aggregate(Max("o_orderkey", alias_name="o_orderkey"))
    )
    out = asof_join(
        events, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_values=["o_orderdate", "o_orderkey"],
    )

    def to_us(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("o_orderdate")
        return batch.set_column(
            i, "o_orderdate", pc.cast(batch["o_orderdate"], pa.timestamp("us"))
        )

    return out.map_batches(to_us, batch_format="pyarrow").sort("event_id")


def _q_parse_props(sf_dir: str):
    """JSON props parsing: extract k, aggregate per event_type.

    Vectorized: one ``pc.extract_regex`` kernel over the whole column
    (the k field is numeric) — no per-row ``json.loads`` loop.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        hit = pc.extract_regex(batch["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        ks = pc.cast(pc.struct_field(hit, "k"), pa.int64())
        return pa.table({"event_type": batch["event_type"], "k": ks})

    out = ds.map_batches(parse, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("k", alias_name="sum_k"), Max("k", alias_name="max_k")
    )
    return out.sort("event_type")


def _q_ngram_dup_pairs(sf_dir: str):
    """Exact 5-gram-Jaccard duplicate pairs (J >= 0.8) over documents.

    MinHash-LSH candidates + exact shingle-set verification; the DuckDB
    oracle computes the same pairs by brute-force cross join over
    shingle lists — candidate recall at J>=0.8 is 1-(1-0.8^4)^32
    (~1 - 5e-8 per pair), so the outputs coincide.
    """
    from raydedup.config import DedupConfig
    from raydedup.pipeline.run import run_dedup
    import pandas as pd

    pages = _documents_as_pages(sf_dir)

    def id_as_url(batch: pa.Table) -> pa.Table:
        return pa.table({"url": pc.cast(batch["doc_id"], pa.string()), "text": batch["text"]})

    pages = pages.map_batches(id_as_url, batch_format="pyarrow")
    res = run_dedup(pages, DedupConfig(threshold=0.8), n_buckets=32, concurrency=(1, 4))
    ver = res.verified.to_pandas()
    dups = ver[ver.is_dup].copy()
    a = dups.url_a.astype(np.int64).to_numpy()
    b = dups.url_b.astype(np.int64).to_numpy()
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    out = pd.DataFrame(
        {"doc_a": lo, "doc_b": hi, "jaccard": dups.exact_jaccard.round(6).to_numpy()}
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_distinct_custkeys_cpc(sf_dir: str):
    """CPC distinct count of order custkeys. ``cpc_union([sk])`` forces
    the merged/ICON estimate — a pure function of the OR-merged bit
    matrix, so the value is identical across block splits, which lets
    the sidecar oracle compare it value-exact against an in-process
    build (accuracy vs exact asserted in pytest, ~3% at lg_k=11)."""
    import ray.data as rd

    from raydedup.sketches.aggregates import cpc_distinct
    from raydedup.sketches.cpc import cpc_union

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    sk = cpc_union([cpc_distinct(ds, "o_custkey", lg_k=11)])
    return pa.table({"n_distinct_est": pa.array([float(sk.estimate())], pa.float64())})


def _q_group_distinct_orders(sf_dir: str):
    """Per-group theta distinct (exact mode at lg_k=16) via AggregateFnV2."""
    import ray.data as rd

    from raydedup.sketches.aggregates import ThetaDistinct

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_orderkey"])
    out = ds.groupby("l_returnflag").aggregate(
        ThetaDistinct("l_orderkey", lg_k=16, alias_name="n_orders")
    )
    return out.sort("l_returnflag")


def _q_events_by_type(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="total_value")
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("total_value")
        return batch.set_column(i, "total_value", pc.round(batch["total_value"], ndigits=2))

    return out.map_batches(round_cols, batch_format="pyarrow").sort("event_type")


def _q_top_users(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))
    return out.sort(["n_events", "user_id"], descending=[True, False]).limit(10)


def _q_segment_revenue(sf_dir: str):
    """orders ⋈ customer hash join → revenue per market segment."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    out = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    )

    def round_cols(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("revenue")
        return batch.set_column(i, "revenue", pc.round(batch["revenue"], ndigits=2))

    return out.map_batches(round_cols, batch_format="pyarrow").sort("c_mktsegment")


def _q_top_parts_by_price(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(20)


def _q_quantity_quantiles(sf_dir: str):
    """t-digest quantiles of l_quantity via the blocking-independent
    bucketed build (``tdigest_of_det``) — the digest is a pure function
    of the column multiset, so the sidecar oracle (in-process twin over
    the same parquet) compares value-exact; accuracy vs exact quantiles
    is asserted in pytest."""
    import ray.data as rd

    from raydedup.sketches.aggregates import tdigest_of_det

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    td = tdigest_of_det(ds, "l_quantity", n_buckets=32)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array([td.quantile(q) for q in qs], pa.float64()),
        }
    )


def _q_heavy_hitter_sources(sf_dir: str):
    """Misra-Gries heavy hitters over documents.source (exact below map cap)."""
    import ray.data as rd

    from raydedup.sketches.aggregates import frequent_items_of

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    sk = frequent_items_of(ds, "source", max_map_size=1024)
    rows = sk.frequent_items(threshold=0)
    rows.sort(key=lambda r: (str(r[0])))
    return pa.table(
        {
            "source": pa.array([str(r[0]) for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _q_ann_topk(sf_dir: str):
    """Exact top-10 cosine neighbours of the first 5 embedding rows."""
    import ray.data as rd

    from raydedup.ops.ann import topk_cosine

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    queries_m = np.stack(qdf["embedding"].to_numpy())
    out = topk_cosine(ds, queries_m, k=10).to_pandas()
    # DuckDB's list_cosine_similarity runs in float32 (~1e-7 noise), so
    # the oracle contract is top-k MEMBERSHIP, not float-equal scores.
    out = out.sort_values(["query_id", "vec_id"])[["query_id", "vec_id"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _q_rerank_topk(sf_dir: str):
    """Retrieve-then-rerank: exact top-10 cosine candidates per query
    (first 5 embedding rows) rescored by the deterministic stand-in
    cross-encoder (ops/rerank.py) in an actor-pool stage — model built
    once per actor, doc vectors attached by a vec_id hash join, one
    einsum per batch. Sidecar oracle: the same pure kernels replayed
    in one process."""
    import ray.data as rd

    from raydedup.ops.ann import topk_cosine
    from raydedup.ops.rerank import rerank_candidates

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    queries_m = np.stack(qdf["embedding"].to_numpy())
    cands = topk_cosine(ds, queries_m, k=10).select(["query_id", "vec_id"])
    out = rerank_candidates(rd.from_arrow(cands), ds, queries_m)
    return out.sort(["query_id", "rerank"])


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs over documents (rows-only)."""
    import ray.data as rd

    from raydedup.ops.simhash import SimHashStage, simhash_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fp = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"id_column": "doc_id"},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return simhash_pairs(fp, "doc_id", max_hamming=3, n_buckets=32).sort(["id_a", "id_b"])


def _q_langid(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.text_stats import LangIdStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4)).sort("doc_id")


def _q_regex_token_stats(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.text_stats import regex_token_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lambda b: regex_token_stats(b, "doc_id"), batch_format="pyarrow").sort("doc_id")


def _q_quality_scores(sf_dir: str):
    import ray.data as rd

    from raydedup.ops.text_stats import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        out = quality_scores(b, "doc_id")
        for c in ("punct_ratio", "digit_ratio", "mean_word_len"):
            out = out.set_column(out.column_names.index(c), c, pc.round(out[c], ndigits=6))
        return out

    return ds.map_batches(kernel, batch_format="pyarrow").sort("doc_id")


def _q_repetition_stats(sf_dir: str):
    """Gopher-style within-doc repetition filter signals (dup k-gram
    fractions) — one vectorized pass over the shared word/shingle
    kernels; no shuffle (per-doc scalars)."""
    import ray.data as rd

    from raydedup.ops.text_stats import repetition_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        out = repetition_stats(b, "doc_id")
        for c in ("dup_frac_2", "dup_frac_3"):
            out = out.set_column(out.column_names.index(c), c, pc.round(out[c], ndigits=6))
        return out

    return ds.map_batches(kernel, batch_format="pyarrow").sort("doc_id")


def _q_top_ngrams(sf_dir: str):
    """Corpus-wide boilerplate scan: top-20 word bigrams by occurrence.

    The map side collapses each block to distinct (gram, count)
    partials (``bigram_counts`` — the combiner pattern), so the groupby
    exchange carries vocabulary-sized rows, not one row per token; the
    top-20 is a deterministic (count desc, gram asc) sort + limit."""
    import ray.data as rd

    from raydedup.ops.text_stats import bigram_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = ds.map_batches(lambda b: bigram_counts(b), batch_format="pyarrow")
    agg = partials.groupby("gram").sum("count")

    def rename(b: pa.Table) -> pa.Table:
        other = [c for c in b.column_names if c != "gram"][0]
        return pa.table({"gram": b["gram"], "n": b[other].cast(pa.int64())})

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["n", "gram"], descending=[True, False])
        .limit(20)
    )


_BM25_TERMS = ["hash", "join", "vector", "spark"]


def _q_bm25_topk(sf_dir: str):
    """BM25 keyword retrieval: top-10 docs for a 4-term query — the
    lexical-search baseline next to embedding ANN. One tokenize pass to
    a |Q|+2-column narrow table, ONE tree aggregate for N/avgdl/df,
    zero-shuffle scoring, per-block partial top-k before the final
    sort+limit."""
    import ray.data as rd

    from raydedup.ops.bm25 import bm25_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_topk(ds, _BM25_TERMS, k=10)


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two lexical
    rankings for the standing 4-term query: BM25 top-50 and summed
    TF-IDF top-50, fused as sum(1/(60+rank)) and cut to top-10. Both
    source rankings reuse their gate-checked ops verbatim (ops/bm25,
    ops/tfidf — per-term weights rounded to 6dp before the sum, so
    ranks are ulp-stable), ranks tie-break by doc_id, and the fusion
    itself is a report-shaped driver fold over two 50-row lists. At
    scale the query-term filter pushes into the TF map exactly as the
    BM25 op already does."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from raydedup.ops.bm25 import bm25_topk
    from raydedup.ops.tfidf import doc_term_tfidf

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bm = bm25_topk(ds, _BM25_TERMS, k=50).to_pandas()  # (doc_id, bm25) desc

    terms_arr = pa.array(_BM25_TERMS)

    def qterms_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["term"], value_set=terms_arr))

    tf = (
        doc_term_tfidf(ds)
        .map_batches(qterms_only, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("tfidf", alias_name="s"))
        .sort(["s", "doc_id"], descending=[True, False])
        .limit(50)
        .to_pandas()
    )
    rrf: dict[int, float] = {}
    for rank, d in enumerate(bm["doc_id"], start=1):
        rrf[int(d)] = rrf.get(int(d), 0.0) + 1.0 / (60 + rank)
    for rank, d in enumerate(tf["doc_id"], start=1):
        rrf[int(d)] = rrf.get(int(d), 0.0) + 1.0 / (60 + rank)
    top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in top], pa.int64()),
            "rrf_score": pa.array([round(s, 6) for _, s in top], pa.float64()),
        }
    )


def _q_collocations(sf_dir: str):
    """PMI collocation mining: top-20 word pairs co-occurring far more
    than chance (support >= 5). Map-side combined unigram/bigram
    partials (vocabulary-sized exchanges), support filter BEFORE the
    two unigram hash joins, one vectorized PMI kernel over candidates."""
    import ray.data as rd

    from raydedup.ops.collocations import collocations

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return collocations(ds, min_count=5, top_k=20)


def _q_incremental_dedup(sf_dir: str):
    """Cross-snapshot exact dedup (the continuous-crawl shape): docs
    from the 'new crawl' half of the sources flagged against the
    'previous snapshot' half. Bloom of the base tree-reduced +
    broadcast; only Bloom hits shuffle into the 128-bit confirm
    cogroup (``ops/exact.py::flag_new_docs``)."""
    import ray.data as rd

    from raydedup.ops.exact import flag_new_docs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    base = ds.filter(expr="source < 'src5'")
    new = ds.filter(expr="source >= 'src5'")
    return flag_new_docs(new, base, "doc_id").sort("doc_id")


def _q_incremental_near_dup(sf_dir: str):
    """Near-dup counterpart of ``incremental_dedup``: flag docs of the
    'new crawl' half whose 5-gram Jaccard vs ANY 'previous snapshot'
    doc reaches the dedup threshold. A thin composition of the
    flagship pipeline: one ``run_dedup`` over the tagged union of both
    snapshots (signatures/LSH/verify paid once), then the verified dup
    pairs are classified by url namespace and the flags reduce over a
    (doc_id) groupby — ids only, nothing proportional to the corpora
    re-shuffles."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from raydedup.config import DedupConfig
    from raydedup.pipeline.run import run_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def pages_of(side: str, pred: str):
        def to_pages(b: pa.Table) -> pa.Table:
            urls = pc.binary_join_element_wise(
                side + "/", pc.cast(b["doc_id"], pa.string()), ""
            )
            return pa.table({"url": urls, "text": b["text"]})

        return ds.filter(expr=pred).map_batches(to_pages, batch_format="pyarrow")

    pages = pages_of("base", "source < 'src5'").union(pages_of("new", "source >= 'src5'"))
    res = run_dedup(pages, DedupConfig(), n_buckets=32, concurrency=(1, 4))

    def cross_flags(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()), "flag": pa.array([], pa.int64())})
        if len(b) == 0:
            return empty
        an = pc.starts_with(b["url_a"], pattern="new/").to_numpy(zero_copy_only=False)
        bn = pc.starts_with(b["url_b"], pattern="new/").to_numpy(zero_copy_only=False)
        ua = b["url_a"].combine_chunks().filter(pa.array(an & ~bn))
        ub = b["url_b"].combine_chunks().filter(pa.array(bn & ~an))
        urls = pa.concat_arrays([ua, ub])
        if len(urls) == 0:
            return empty
        ids = pc.cast(pc.utf8_slice_codeunits(urls, 4, 1 << 30), pa.int64())
        return pa.table({"doc_id": ids, "flag": pa.array(np.ones(len(ids), np.int64))})

    flagged = res.dup_pairs.map_batches(cross_flags, batch_format="pyarrow")
    new_ids = ds.filter(expr="source >= 'src5'").map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "flag": pa.array(np.zeros(len(b), np.int64))}
        ),
        batch_format="pyarrow",
    )
    out = new_ids.union(flagged).groupby("doc_id").aggregate(Max("flag", alias_name="f"))
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "is_near_dup": pc.equal(b[[c for c in b.column_names if c != "doc_id"][0]], 1),
            }
        ),
        batch_format="pyarrow",
    ).sort("doc_id")


def _q_chunk_docs(sf_dir: str):
    """Context-window packing prep: split every doc into 64-word
    chunks (map-side only — chunking is embarrassingly parallel and
    re-offsets the split word buffer zero-copy)."""
    import ray.data as rd

    from raydedup.ops.text_stats import chunk_docs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_docs(b, "doc_id", chunk_words=64), batch_format="pyarrow"
    ).sort(["doc_id", "chunk_idx"])


def _q_curation(sf_dir: str):
    """Corpus curation decision (C4/Gopher filter chain): language,
    mean-word-length band, punctuation ratio, bigram repetition — one
    actor-pool pass over the corpus emitting (doc_id, keep, reason)."""
    import ray.data as rd

    from raydedup.ops.text_stats import CurationStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        CurationStage, batch_format="pyarrow", concurrency=(1, 4)
    ).sort("doc_id")


def _q_latest_per_url(sf_dir: str):
    """Snapshot consolidation (the Common-Crawl recrawl shape): two
    deterministic snapshots derived from documents — snapshot A is
    every doc, snapshot B re-crawls every doc_id % 3 == 0 one day
    later with edited text — unioned and resolved to the newest
    capture per url by ``ops.snapshots.latest_per_url`` (one bucketed
    payload shuffle, vectorized last-of-run per bucket)."""
    import ray.data as rd

    from raydedup.ops.snapshots import latest_per_url

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    epoch = pa.scalar(1577836800_000_000, pa.timestamp("us"))  # 2020-01-01

    def snap_a(b: pa.Table) -> pa.Table:
        urls = pc.binary_join_element_wise(
            "https://synth.local/doc/", pc.cast(b["doc_id"], pa.string()), ""
        )
        ts = pc.cast(
            pc.add(1577836800_000_000, pc.multiply(pc.cast(b["doc_id"], pa.int64()), 1_000_000)),
            pa.timestamp("us"),
        )
        return pa.table({"url": urls, "warc_ts": ts, "text": b["text"]})

    def snap_b(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        b = b.filter(pc.equal(_mod(ids, 3), 0))
        t = snap_a(b)
        ts = pc.cast(
            pc.add(pc.cast(t["warc_ts"], pa.int64()), 86_400_000_000), pa.timestamp("us")
        )
        text = pc.binary_join_element_wise(t["text"], " updated v2", "")
        return pa.table({"url": t["url"], "warc_ts": ts, "text": text})

    _ = epoch
    captures = ds.map_batches(snap_a, batch_format="pyarrow").union(
        ds.map_batches(snap_b, batch_format="pyarrow")
    )
    return latest_per_url(
        captures, n_buckets=32, tiebreak_column="text"
    ).select_columns(["url", "warc_ts", "text"]).sort("url")


def _q_decontaminate(sf_dir: str):
    """Test-set decontamination: docs with doc_id % 20 == 0 act as the
    held-out benchmark; every other doc is flagged if it shares any
    word 8-gram with it. Benchmark gram set tree-reduced + broadcast;
    the corpus side is a pure map-side probe (zero shuffle)."""
    import ray.data as rd

    from raydedup.ops.decontam import decontaminate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def side(want_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(_mod(pc.cast(b["doc_id"], pa.int64()), 20), 0)
            return b.filter(m if want_bench else pc.invert(m))

        return ds.map_batches(f, batch_format="pyarrow")

    return decontaminate(side(False), side(True), "doc_id", k=8).sort("doc_id")


def _q_image_features(sf_dir: str):
    """Multimodal plumbing demo: deterministic fake corpus + actor-pool
    decode stage, exploded to long-format scalar rows so the sidecar
    oracle (single-process run of the same kernel) compares the
    distributed plumbing value-exact."""
    import ray.data as rd

    from raydedup.ops.multimodal import decode_images, explode_features, synth_image_table

    ds = rd.from_arrow(synth_image_table(500, seed=42))
    feats = decode_images(ds, mode="fake", batch_size=64)
    return feats.map_batches(explode_features, batch_format="pyarrow").sort(
        ["image_id", "feat_idx"]
    )


def _q_png_features(sf_dir: str):
    """REAL image decode through the actor-pool stage: a planted
    corpus of genuine PNG payloads (``synth_png_table``) decoded by the
    built-in zlib+numpy PNG decoder (PIL preferred when installed) into
    8x8 block-mean luma thumbnails, exploded to long-format scalar rows.
    Sidecar oracle: the same decode kernel run single-process — the
    driver's gate compares the distributed actor batching value-exact
    against in-process pixel ground truth."""
    import ray.data as rd

    from raydedup.ops.multimodal import decode_images, explode_features, synth_png_table

    ds = rd.from_arrow(synth_png_table(120, seed=7))
    feats = decode_images(ds, mode="real", batch_size=32)
    return feats.map_batches(explode_features, batch_format="pyarrow").sort(
        ["image_id", "feat_idx"]
    )


def _q_ivf_partitioned_topk(sf_dir: str):
    """IVF ANN with FILE-LEVEL probe pruning: deterministic centroids
    (k-means over the blocking-independent ``vec_id % 7 == 0`` sample),
    cluster-partitioned parquet index under /tmp, then top-10 per query
    reading ONLY the probed cluster directories. Output is top-k
    MEMBERSHIP (query_id, vec_id) like ann_topk. Sidecar oracle: the
    same centroids/probe/brute-force kernels in one process."""
    import ray.data as rd

    from raydedup.ops.ann import IVFIndex

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def mod7(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v % 7 == 0))

    sample = ds.map_batches(mod7, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    idx = IVFIndex(n_clusters=8)
    idx.train(np.stack(sample["embedding"].to_numpy()))
    assigned = idx.assign(ds)

    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="raydedup_ivf_")
    try:
        idx.write_partitioned(assigned, path)
        qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
        qm = np.stack(qdf["embedding"].to_numpy())
        out = idx.search_partitioned(path, qm, k=10, nprobe=3).to_pandas()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    out = out.sort_values(["query_id", "vec_id"])[["query_id", "vec_id"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _q_sig_distance_quantiles(sf_dir: str):
    """KLL quantiles of candidate-pair signature distances — the
    north_star's partition-parallel telemetry sketch over the verify
    output. The KLL runs through the blocking-independent bucketed
    build (``kll_of_det``), so the quantiles are a pure function of the
    verified-pair distance multiset and the sidecar oracle (an
    in-process reference run of the same signature/band/verify kernels
    over the same documents) compares value-exact."""
    import pyarrow.compute as _pc

    from raydedup.sketches.kll import kll_of_det

    res = _dedup_result(sf_dir)
    dist = res.verified.map_batches(
        lambda b: pa.table({"dist": _pc.subtract(1.0, b["jaccard_sig_est"])}),
        batch_format="pyarrow",
    )
    sk = kll_of_det(dist, "dist", n_buckets=32)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "sig_distance": pa.array([float(sk.quantile(q)) for q in qs], pa.float64()),
        }
    )


def _q_video_frames(sf_dir: str):
    """Multimodal video plumbing demo: deterministic fake corpus →
    actor-pool frame sampling (flat_map fan-out, small batches for the
    wide binary) → per-frame murmur fingerprints so wide payload bytes
    never leave the stage. Sidecar oracle: single-process run of the
    same kernels, compared value-exact."""
    import ray.data as rd

    from raydedup.ops.multimodal import frame_fingerprints, sample_frames, synth_video_table

    ds = rd.from_arrow(synth_video_table(300, seed=42))
    frames = sample_frames(ds, k=4, mode="fake", batch_size=32)
    return frames.map_batches(frame_fingerprints, batch_format="pyarrow").sort(
        ["video_id", "frame_idx"]
    )


def _q_y4m_frames(sf_dir: str):
    """Real-pixel video decode with ZERO optional deps (round-4 verdict
    item 5): planted uncompressed YUV4MPEG2 corpus whose per-frame
    planes are constants in closed form over (video_id, frame_idx) →
    actor-pool frame sampling in mode='real' (stdlib ``decode_y4m``:
    header parse, raw planar read, BT.601 full-range YUV→RGB with
    floor(x+0.5) rounding) → per-frame mean channel values. Every
    sampled frame decodes to one closed-form RGB value, so the DuckDB
    oracle recomputes the identical double expressions over
    ``generate_series`` — a value-exact gate on real pixel decoding,
    no pyav/PIL anywhere."""
    import ray.data as rd

    from raydedup.ops.multimodal import sample_frames, synth_y4m_table

    W, H = 32, 24
    ds = rd.from_arrow(synth_y4m_table(48, width=W, height=H))
    frames = sample_frames(ds, k=16, mode="real", batch_size=8)

    def stats(batch: pa.Table) -> pa.Table:
        pays = batch["frame_payload"].to_numpy(zero_copy_only=False)
        if len(pays):
            m = np.stack([np.frombuffer(x, np.uint8).reshape(H * W, 3) for x in pays])
            means = m.mean(axis=1)  # constant planes -> exact integers
        else:
            means = np.empty((0, 3))
        return pa.table(
            {
                "video_id": batch["video_id"],
                "frame_idx": pc.cast(batch["frame_idx"], pa.int64()),
                "r": pa.array(means[:, 0].astype(np.int64)),
                "g": pa.array(means[:, 1].astype(np.int64)),
                "b": pa.array(means[:, 2].astype(np.int64)),
            }
        )

    return frames.map_batches(stats, batch_format="pyarrow").sort(
        ["video_id", "frame_idx"]
    )


def _q_audio_features(sf_dir: str):
    """Multimodal audio plumbing demo: deterministic fake PCM corpus +
    framed RMS/zero-crossing features (sidecar oracle: a single-process
    run of the same kernel is planted and compared value-identical)."""
    import ray.data as rd

    from raydedup.ops.multimodal import audio_features, synth_audio_table

    ds = rd.from_arrow(synth_audio_table(200, seed=42))
    return audio_features(ds, frame_len=400).sort(["audio_id", "frame_idx"])


def _q_paragraph_dedup(sf_dir: str):
    """Sub-document (paragraph-level) exact dedup over a corpus with
    planted partial overlaps: every doc_id % 3 == 0 doc gets a copy
    whose text is the original plus a distinct 5-word tail, so the
    copy's leading 32-word chunks duplicate the original's and its
    tail chunk does not (dup_frac strictly between 0 and 1)."""
    import ray.data as rd

    from raydedup.ops.exact import paragraph_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def make_copies(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(ids % 3 == 0))
        s = pc.cast(t["doc_id"], pa.string())
        text2 = pc.binary_join_element_wise(t["text"], "za", s, "zb", s, "zc", " ")
        return pa.table({"doc_id": pc.add(t["doc_id"], 100000), "text": text2})

    corpus = docs.union(docs.map_batches(make_copies, batch_format="pyarrow"))
    return paragraph_dedup(corpus, "doc_id", chunk_words=32).sort("doc_id")


def _q_pii_redact(sf_dir: str):
    """PII scrub over documents with deterministically planted PII
    (email + IPv4 + phone derived from doc_id, identically planted in
    the SQL oracle): per-doc redaction counts and the clean text."""
    import ray.data as rd

    from raydedup.ops.text_stats import pii_redact

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def augment(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        s = pc.cast(b["doc_id"], pa.string())
        m256 = pc.cast(pa.array(ids % 256), pa.string())
        m10 = pc.cast(pa.array(ids % 10), pa.string())
        aug = pc.binary_join_element_wise(
            b["text"],
            " contact user",
            s,
            "@mail.example.com ip 10.0.",
            m256,
            ".7 call +1-555-000-0",
            m10,
            "",
        )
        return pa.table({"doc_id": b["doc_id"], "text": aug})

    return (
        docs.map_batches(augment, batch_format="pyarrow")
        .map_batches(lambda b: pii_redact(b, "doc_id"), batch_format="pyarrow")
        .sort("doc_id")
    )


# the "data recipe": per-source keep rates with 0.0 and 1.0 edges;
# shared (verbatim) by _q_mix_sources and its SQL oracle
_MIX_RATES = {f"src{i}": ((i * 7) % 11) / 10 for i in range(20)}


def _q_mix_sources(sf_dir: str):
    """Dataset mixing (the training-data recipe step): keep each doc of
    source s with rate _MIX_RATES[s], deterministically by murmur3
    priority — map-only, zero shuffle at any corpus size (sidecar
    oracle: the same doc_id→priority table + threshold CASE)."""
    import ray.data as rd

    from raydedup.ops.sample import mix_sources

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return mix_sources(docs, "doc_id", "source", _MIX_RATES).sort(["source", "doc_id"])


def _q_shuffle_order(sf_dir: str):
    """Deterministic global training-order shuffle: dense 0-based rank
    under (murmur3 priority, doc_id) order — distributed via uniform
    priority-bit bucketing + one bincount aggregate (sidecar oracle:
    the shared doc_id→priority table + row_number)."""
    import ray.data as rd

    from raydedup.ops.sample import shuffle_ranks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return shuffle_ranks(docs, "doc_id", n_buckets=32).sort("doc_id")


def _q_stratified_sample(sf_dir: str):
    """Deterministic 20-per-language sample by murmur3 priority
    (sidecar oracle: in-process doc_id→priority table + row_number)."""
    import ray.data as rd

    from raydedup.ops.sample import stratified_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return stratified_sample(docs, "doc_id", "lang", k=20).sort(["lang", "sample_rank"])


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]


def _q_rollup_pricing(sf_dir: str):
    """ROLLUP (grouping sets): pricing sums at (returnflag, linestatus),
    (returnflag, ALL), (ALL, ALL). One corpus pass (map-side integer
    partials + the finest groupby); coarser levels re-aggregate the
    previous groups-sized level only."""
    import ray.data as rd

    from raydedup.ops.rollup import rollup_sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    return rollup_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        {"l_quantity": 0, "l_extendedprice": 2},
    )


def _q_doc_pagerank(sf_dir: str):
    """Iterative distributed graph analytics: 5 rounds of
    integer-arithmetic PageRank (d=0.85 in micro-units, bit
    deterministic under any blocking) over a deterministic synthetic
    link graph (doc i → (i²+1) mod N and (13i+3) mod N — the quadratic
    map is non-bijective, so indegrees and hence ranks vary). Each round =
    two bucketed cogroup exchanges of narrow int64 rows; ranks
    materialize per round (checkpoint boundary). Oracle: the same
    integer recurrence unrolled as 5 chained SQL CTE levels."""
    import ray.data as rd

    from raydedup.ops.graph import pagerank_int

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([(i * i + 1) % n, (i * 13 + 3) % n])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return pagerank_int(
        docs, edges, node_col="doc_id", iterations=5, n_buckets=32
    ).sort("doc_id")


_PAGERANK_SQL_HEAD = """
    WITH nodes AS (SELECT doc_id AS node FROM documents),
    nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT doc_id AS src, (doc_id * doc_id + 1) % (SELECT n FROM nn) AS dst
      FROM documents
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 3) % (SELECT n FROM nn) FROM documents
    ),
    od AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)
"""


def _pagerank_sql(iterations: int = 5) -> str:
    levels = []
    for t in range(1, iterations + 1):
        levels.append(
            f""", pr{t} AS (
              SELECT n.node,
                     CAST(150000 + (85 * COALESCE(s.inflow, 0)) // 100
                       AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, sum(p.r // od.d) AS inflow
                FROM edges e
                JOIN pr{t - 1} p ON p.node = e.src
                JOIN od ON od.node = e.src
                GROUP BY e.dst
              ) s USING (node)
            )"""
        )
    return (
        _PAGERANK_SQL_HEAD
        + "".join(levels)
        + f" SELECT node AS doc_id, r AS rank_u FROM pr{iterations} ORDER BY doc_id"
    )


def _q_csv_events(sf_dir: str):
    """Source-format parity for CSV: integer/string event columns →
    sharded CSV → read back → per-type rollup. Oracle reads the
    ORIGINAL parquet, so green proves the CSV sink+source round-trips
    the rows exactly (floats deliberately excluded — CSV is not a
    lossless float wire format)."""
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    out = f"/tmp/raydedup_csv/{abs(hash(sf_dir)) & 0xFFFFFFFF:x}"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    ds.write_csv(out)
    back = rd.read_csv(out)
    return (
        back.groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("event_id", alias_name="sum_event_id"),
            Max("user_id", alias_name="max_user_id"),
        )
        .sort("event_type")
    )


def _q_user_mode_event(sf_dir: str):
    """Per-user modal event type (ties → lexicographically smallest):
    map-side (user, type, count) combiner partials, one bucketed
    exchange, per-bucket lexsort argmax kernel. Oracle: row_number over
    (count desc, type asc)."""
    import ray.data as rd

    from raydedup.ops.stats import grouped_mode

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    out = grouped_mode(ev, group="user_id", value="event_type", n_buckets=16)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "mode_type": batch["mode_value"],
                "n_events": batch["n_rows"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("user_id")


def _q_part_name_linkage(sf_dir: str):
    """Record linkage: parts sharing a brand (blocking key) whose names
    are within Levenshtein distance 3 — one bucketed exchange, equal-key
    runs per bucket, and a Wagner-Fischer DP batched across the pair
    axis (the insertion prefix-min closed-form via minimum.accumulate).
    Oracle: DuckDB's levenshtein over the blocked self-join."""
    import ray.data as rd

    from raydedup.ops.linkage import linkage_pairs

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand"]
    )
    return linkage_pairs(
        parts, block_col="p_brand", name_col="p_name", id_col="p_partkey", max_dist=3
    ).sort(["id_a", "id_b"])


def _q_event_intervals(sf_dir: str):
    """Per-user interval coalescing: events become [ts, ts+dur) spans
    (dur = 60 + event_id % 120 seconds, deterministic) and
    overlapping/touching spans merge into islands — gaps-and-islands
    with explicit durations, one lexsort + segment-cummax kernel per
    hash bucket (never per-key groups). Oracle: the window-function
    max-end / break / island formulation."""
    import ray.data as rd

    from raydedup.ops.intervals import coalesce_intervals

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def spans(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        s = ts.astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = s + (60 + eid % 120) * 1_000_000
        return pa.table(
            {
                "user_id": batch["user_id"],
                "s": pa.array(s),
                "e": pa.array(e),
            }
        )

    iv = ev.map_batches(spans, batch_format="pyarrow")
    out = coalesce_intervals(iv, key="user_id", start="s", end="e", n_buckets=16)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "start_us": batch["s"],
                "end_us": batch["e"],
                "n_events": batch["n_events"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow").sort(
        ["user_id", "start_us"]
    )


def _q_co_citation(sf_dir: str):
    """Co-citation pairs over the synthetic link graph: sources sharing
    common destinations, counted per pair. Stage 1 groups edges by dst
    and emits per-dst source pairs map-side pre-aggregated to (packed
    pair key, count); stage 2 is a pairs-only bucketed sum. Oracle:
    distinct-edge self-join on dst with a < b."""
    import ray.data as rd

    from raydedup.ops.graph import co_citation_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([(i * i + 1) % n, (i * 13 + 3) % n])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return co_citation_counts(edges, min_common=1, n_buckets=32).sort(
        ["doc_a", "doc_b"]
    )


def _q_graph_components(sf_dir: str):
    """Connected components over a deterministic multi-component graph
    (path segments broken every 5 ids + sparse long-range chords) via
    the distributed min-label propagation of pipeline/cluster.py — the
    driver materializes nothing O(nodes). Ids travel zero-padded so
    the engine's lexicographic min-label equals numeric min. Oracle:
    recursive-CTE reachability, min reachable id per node."""
    import ray.data as rd

    from raydedup.pipeline.cluster import label_propagation_components

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = i[(i % 5 != 4) & (i + 1 < n)]
        chord = i[i % 40 == 0]
        a = np.concatenate([seg, chord])
        bb = np.concatenate([seg + 1, (chord + 7) % n])
        pad = np.char.zfill(a.astype("U6"), 6)
        pad_b = np.char.zfill(bb.astype("U6"), 6)
        return pa.table({"url_a": pa.array(pad), "url_b": pa.array(pad_b)})

    edges = docs.map_batches(mk_edges, batch_format="pyarrow").materialize()
    comps = label_propagation_components(edges, n_buckets=16)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["url"], pa.int64()),
                "cluster_id": pc.cast(batch["cluster_id"], pa.int64()),
            }
        )

    return comps.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def _q_phrase_search(sf_dir: str):
    """Positional phrase search ('table value') over the documents
    token stream: a pure map-side vectorized k-shift scan over murmur
    word hashes — no shuffle, no index, doc boundaries enforced per
    window. Oracle derives the same tokens and positions with DuckDB
    list lambdas."""
    import ray.data as rd

    from raydedup.ops.phrase import phrase_match

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return phrase_match(docs, "table value").sort("doc_id")


def _q_doc_triangles(sf_dir: str):
    """Directed triangle (closed 3-walk) count over the same synthetic
    link graph as doc_pagerank: round 1 cogroups edges-by-dst with
    edges-by-src and emits length-2 paths per-key cross-product; round
    2 matches packed closing-edge keys with both sides pre-aggregated
    to (key, count). Oracle: the SQL triple self-join count."""
    import ray.data as rd

    from raydedup.ops.graph import count_closed_triangles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([(i * i + 1) % n, (i * 13 + 3) % n])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = docs.map_batches(mk_edges, batch_format="pyarrow").materialize()
    tri = count_closed_triangles(edges, n_buckets=32)
    return pa.table({"triangles": pa.array([tri], pa.int64())})


def _q_prefix_jaccard_join(sf_dir: str):
    """Exact 5-gram-Jaccard self-join (J >= 0.7) via PREFIX FILTERING
    (PPJoin-style) instead of LSH: each doc emits only the first
    m - ceil(0.7 m) + 1 hash-ordered shingles, shared prefix tokens
    generate a provably complete candidate superset (no probabilistic
    recall bound), and the shared verify stage computes exact Jaccard.
    Oracle: the brute-force cross join — which here checks the prefix
    filter's COMPLETENESS, not a recall approximation."""
    from raydedup.config import DedupConfig
    from raydedup.pipeline.ppjoin import prefix_candidates
    from raydedup.pipeline.run import build_signatures
    from raydedup.pipeline.verify import verify_pairs
    import pandas as pd

    pages = _documents_as_pages(sf_dir)

    def id_as_url(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"url": pc.cast(batch["doc_id"], pa.string()), "text": batch["text"]}
        )

    pages = pages.map_batches(id_as_url, batch_format="pyarrow")
    cfg = DedupConfig(threshold=0.7)
    sigs = build_signatures(pages, cfg).materialize()
    cands = prefix_candidates(sigs, cfg, n_buckets=32).materialize()
    ver = verify_pairs(cands, sigs, cfg).to_pandas()
    dups = ver[ver.is_dup].copy()
    a = dups.url_a.astype(np.int64).to_numpy()
    b = dups.url_b.astype(np.int64).to_numpy()
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    out = (
        pd.DataFrame(
            {"doc_a": lo, "doc_b": hi, "jaccard": dups.exact_jaccard.round(6).to_numpy()}
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_source_drift(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between the word
    distributions of the corpus sources — the standard drift metric
    between crawl slices. One vocabulary-sized exchange; per-bucket
    dense (words × slices) term kernels; slice totals broadcast."""
    import ray.data as rd

    from raydedup.ops.drift import js_divergence_matrix

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return js_divergence_matrix(docs, slice_col="source")


def _q_doc_entropy(sf_dir: str):
    """Per-doc unigram Shannon entropy (nats) — repetitiveness /
    quality signal, pure map-side lexsort run-counting kernel."""
    import ray.data as rd

    from raydedup.ops.text_stats import doc_entropy

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: doc_entropy(b, "doc_id"), batch_format="pyarrow"
    ).sort("doc_id")


def _q_cust_mad_spend(sf_dir: str):
    """Per-customer robust dispersion (median absolute deviation) of
    order totals — two passes: exact integer group medians kept as
    undivided middle-pair sums, broadcast, then the same median kernel
    over half-cent deviations."""
    import ray.data as rd

    from raydedup.ops.stats import grouped_mad

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return grouped_mad(orders, group="o_custkey", value="o_totalprice").sort(
        "o_custkey"
    )


def _q_cust_p90_spend(sf_dir: str):
    """Exact per-customer p90 order total: element at 1-based rank
    ceil(0.9·n), computed with the integer formula (9n+9)//10 on both
    engine and oracle sides so there is no float rank fuzz."""
    import ray.data as rd

    from raydedup.ops.stats import grouped_quantile_disc

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return grouped_quantile_disc(
        orders, group="o_custkey", value="o_totalprice", q_num=9, q_den=10,
        out_col="p90",
    ).sort("o_custkey")


def _q_cust_median_spend(sf_dir: str):
    """Exact per-customer median order total (DuckDB median semantics,
    computed over exact cents so even-count halves are exact): the
    per-key ordered-analytics shape — coarse-bucket, one lexsort per
    bucket, middles gathered by segment offsets."""
    import ray.data as rd

    from raydedup.ops.stats import grouped_median

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return grouped_median(orders, group="o_custkey", value="o_totalprice").sort(
        "o_custkey"
    )


def _q_price_ols(sf_dir: str):
    """Per-returnflag OLS of extendedprice on quantity from exact
    int128 moment partials — one exchange of (block, group) moment
    rows, fixed double expressions mirrored by the oracle."""
    import ray.data as rd

    from raydedup.ops.stats import grouped_ols

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_ols(
        li, group="l_returnflag", x="l_quantity", y="l_extendedprice"
    ).sort("l_returnflag")


def _q_containment_join(sf_dir: str):
    """Exact min-side containment join (|A∩B| / min >= 0.9): catches
    substring-style near-subsets that Jaccard-threshold LSH cannot see
    (a small doc inside a big one has low J, high containment).
    Candidates: smaller-side prefix tokens probed against a full-token
    index per bucket — a complete superset; the shared verify stage
    computes exact containment. Oracle: brute-force cross join."""
    from raydedup.config import DedupConfig
    from raydedup.pipeline.ppjoin import containment_candidates
    from raydedup.pipeline.run import build_signatures
    from raydedup.pipeline.verify import verify_pairs
    import pandas as pd

    pages = _documents_as_pages(sf_dir)

    def id_as_url(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"url": pc.cast(batch["doc_id"], pa.string()), "text": batch["text"]}
        )

    pages = pages.map_batches(id_as_url, batch_format="pyarrow")
    tau = 0.9
    cfg = DedupConfig(threshold=tau)
    sigs = build_signatures(pages, cfg).materialize()
    cands = containment_candidates(sigs, tau, n_buckets=32).materialize()
    ver = verify_pairs(cands, sigs, cfg).to_pandas()
    hits = ver[ver.containment >= tau].copy()
    a = hits.url_a.astype(np.int64).to_numpy()
    b = hits.url_b.astype(np.int64).to_numpy()
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    out = (
        pd.DataFrame(
            {
                "doc_a": lo,
                "doc_b": hi,
                "containment": hits.containment.round(6).to_numpy(),
            }
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_part_skyline(sf_dir: str):
    """2-D skyline / Pareto frontier (maximize p_size, p_retailprice):
    block-local skylines via one lexsort + prefix-max kernel, then one
    tiny merge task over the pruned survivors — the local-prune /
    global-merge shape; no pairwise O(n²) anywhere. Oracle: the
    NOT EXISTS dominance anti-join."""
    import ray.data as rd

    from raydedup.ops.skyline import skyline2d

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )
    return skyline2d(parts, "p_size", "p_retailprice").sort("p_partkey")


def _q_orders_zscore(sf_dir: str):
    """Per-priority z-score of order totals: one exact integer moment
    row per group (int128 hi/lo sums), broadcast via ray.put, then a
    stateless streaming normalize pass — the classic small-side lookup
    instead of a shuffle join-back. Oracle mirrors the identical
    left-to-right double expression over the same exact integer sums."""
    import ray.data as rd

    from raydedup.ops.zscore import grouped_zscore

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    return grouped_zscore(orders, "o_orderpriority", "o_totalprice").sort("o_orderkey")


def _q_doc_pagerank_seeded(sf_dir: str):
    """Personalized (seeded) PageRank: initial mass and teleport apply
    only to seed docs (doc_id % 17 == 0) — the seed-expansion /
    quality-propagation shape — over the same link graph and integer
    recurrence as doc_pagerank. Oracle: the seeded recurrence unrolled
    as chained CTEs."""
    import ray.data as rd

    from raydedup.ops.graph import pagerank_int

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def with_seed(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(i),
                "seed": pa.array((i % 17 == 0).astype(np.int64)),
            }
        )

    def mk_edges(b: pa.Table) -> pa.Table:
        i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([(i * i + 1) % n, (i * 13 + 3) % n])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    seeded = docs.map_batches(with_seed, batch_format="pyarrow")
    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return pagerank_int(
        seeded, edges, node_col="doc_id", iterations=5, n_buckets=32, seed_col="seed"
    ).sort("doc_id")


_PAGERANK_SEEDED_SQL_HEAD = """
    WITH nodes AS (
      SELECT doc_id AS node,
             CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS seed
      FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT doc_id AS src, (doc_id * doc_id + 1) % (SELECT n FROM nn) AS dst
      FROM documents
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 3) % (SELECT n FROM nn) FROM documents
    ),
    od AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT node, CAST(1000000 * seed AS BIGINT) AS r FROM nodes)
"""


def _pagerank_seeded_sql(iterations: int = 5) -> str:
    levels = []
    for t in range(1, iterations + 1):
        levels.append(
            f""", pr{t} AS (
              SELECT n.node,
                     CAST(150000 * n.seed + (85 * COALESCE(s.inflow, 0)) // 100
                       AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, sum(p.r // od.d) AS inflow
                FROM edges e
                JOIN pr{t - 1} p ON p.node = e.src
                JOIN od ON od.node = e.src
                GROUP BY e.dst
              ) s USING (node)
            )"""
        )
    return (
        _PAGERANK_SEEDED_SQL_HEAD
        + "".join(levels)
        + f" SELECT node AS doc_id, r AS rank_u FROM pr{iterations} ORDER BY doc_id"
    )


def _q_snapshot_churn(sf_dir: str):
    """Crawl-delta report between two deterministic snapshots derived
    from documents (old = id%5!=4 original text, new = id%5!=0 with
    id%3==0 texts edited): urls classified added / removed / changed.
    Payload never shuffles — narrow (url-hash, content-hash, side)
    rows through ONE bucketed exchange, lexsort + run analysis per
    bucket."""
    import ray.data as rd

    from raydedup.ops.snapshots import snapshot_churn

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def mk_url(b: pa.Table) -> pa.ChunkedArray:
        return pc.binary_join_element_wise(
            "https://synth.local/doc/", pc.cast(b["doc_id"], pa.string()), ""
        )

    def snap_old(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        b = b.filter(pc.not_equal(_mod(ids, 5), 4))
        return pa.table({"url": mk_url(b), "text": b["text"]})

    def snap_new(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        b = b.filter(pc.not_equal(_mod(ids, 5), 0))
        ids = pc.cast(b["doc_id"], pa.int64())
        edited = pc.binary_join_element_wise(b["text"], " updated v2", "")
        text = pc.if_else(pc.equal(_mod(ids, 3), 0), edited, b["text"])
        return pa.table({"url": mk_url(b), "text": text})

    old = ds.map_batches(snap_old, batch_format="pyarrow")
    new = ds.map_batches(snap_new, batch_format="pyarrow")
    return snapshot_churn(old, new, n_buckets=32).sort("url")


def _q_user_event_path(sf_dir: str):
    """Clickstream journey per user: the ordered event-type path
    string (string_agg ORDER BY ts) + step count — one bucketed
    exchange, per-bucket vectorized lexsort, paths assembled inside
    the bucket kernel."""
    import ray.data as rd

    from raydedup.ops.windows import path_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )
    return path_per_key(
        ds, "user_id", ["ts", "event_id"], "event_type", sep=">"
    ).sort("user_id")


def _q_cube_pricing(sf_dir: str):
    """GROUP BY CUBE: pricing sums at every subset of (returnflag,
    linestatus) — adds the (ALL, linestatus) slice to the ROLLUP
    levels. One corpus pass; every coarser set re-aggregates the
    groups-sized finest level."""
    import ray.data as rd

    from raydedup.ops.rollup import cube_sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    return cube_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        {"l_quantity": 0, "l_extendedprice": 2},
    )


def _q_order_ntile(sf_dir: str):
    """Per-customer NTILE(4) + DENSE_RANK window analytics: quartile
    assignment over (o_orderdate, o_orderkey) order and dense rank
    over o_orderdate — both from ONE coarse-bucket lexsort pass (no
    per-key groups)."""
    import ray.data as rd

    from raydedup.ops.windows import ntile_dense_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    return ntile_dense_per_key(
        ds, "o_custkey", ["o_orderdate", "o_orderkey"], 4, "o_orderdate"
    ).sort(["o_custkey", "rnk"])


def _q_lineitem_corr_stats(sf_dir: str):
    """One-pass mergeable moments: per-returnflag count / mean /
    sample-variance / stddev / Pearson corr(quantity, price). Each
    block ships exact int128 (hi/lo int64) moment sums per group; all
    statistics are fixed double expressions over the exact integer
    totals, so the result is blocking-invariant and the SQL oracle
    (DuckDB HUGEINT sums) reproduces it bit-for-bit."""
    import ray.data as rd

    from raydedup.ops.stats import grouped_moments

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_moments(
        ds, "l_returnflag", "l_quantity", "l_extendedprice", 0, 2
    ).sort("l_returnflag")


def _q_profile_orders(sf_dir: str):
    """Column profiling (the SUMMARIZE/data-quality pass): per-column
    rows/nulls/EXACT distinct/numeric min-max. Counts+min/max are one
    O(blocks*columns) exchange; exact distinct dedups 128-bit value
    hashes map-side, then globally."""
    import ray.data as rd

    from raydedup.ops.profile import profile_columns

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=_PROFILE_COLS)
    return profile_columns(ds, _PROFILE_COLS)


def _q_price_histogram(sf_dir: str):
    """Fixed-width histogram of l_extendedprice (5000-wide bins):
    per-block distinct (bin, count) partials, one O(blocks*bins)
    exchange, bit-identical bin math vs the oracle."""
    import ray.data as rd

    from raydedup.ops.profile import histogram_fixed

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    return histogram_fixed(ds, "l_extendedprice", lo=0.0, width=5000.0)


def _q_weighted_sample(sf_dir: str):
    """A-ES weighted sampling without replacement: 25 docs with
    inclusion probability proportional to n_chars (quality-weighted
    data selection). Map-side keys + per-block partial top-k; the
    final sort sees blocks*k rows (sidecar oracle: the shared
    doc_id→priority table + the same ln(u)/w ordering)."""
    import ray.data as rd

    from raydedup.ops.sample import weighted_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return weighted_sample(docs, "doc_id", "n_chars", k=25)


def _derive_messy_urls(b: pa.Table) -> pa.Table:
    """doc_id → deterministically messy URL (mixed case, default and
    non-default ports, tracking params, fragments) — identically
    derived by the SQL oracles so the normalizer is what's tested."""
    ids = pc.cast(b["doc_id"], pa.int64())

    def m(k):
        return _mod(ids, k)

    def s(x):
        return pc.cast(x, pa.string())

    sch = pc.if_else(pc.equal(m(2), 1), "HTTPS", "HTTP")
    www = pc.if_else(pc.equal(m(3), 0), "WWW.", "")
    m4 = m(4)
    port = pc.if_else(
        pc.equal(m4, 0),
        ":443",
        pc.if_else(pc.equal(m4, 1), ":80", pc.if_else(pc.equal(m4, 2), ":8080", "")),
    )
    m5, q9 = m(5), s(m(9))
    query = pc.if_else(
        pc.less(m5, 2),
        pc.binary_join_element_wise("?utm_source=feed&q=", q9, "&utm_medium=rss", ""),
        pc.if_else(
            pc.equal(m5, 2),
            pc.binary_join_element_wise("?q=", q9, "&gclid=abc", ""),
            pc.if_else(pc.equal(m5, 3), pc.binary_join_element_wise("?q=", q9, ""), ""),
        ),
    )
    frag = pc.if_else(pc.equal(m(6), 0), "#sec", "")
    url = pc.binary_join_element_wise(
        sch, "://", www, "Sub", s(m(11)), ".Example", s(m(50)), ".COM",
        port, "/p/", s(ids), query, frag, ""
    )
    return pa.table({"doc_id": b["doc_id"], "url": url})


def _q_url_normalize(sf_dir: str):
    """URL canonicalization (lowercased scheme/host, default ports
    dropped, fragments and utm_*/gclid/fbclid stripped) + naive
    registered domain, over deterministically messy derived URLs."""
    import ray.data as rd

    from raydedup.ops.urltools import normalize_urls

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    urls = docs.map_batches(_derive_messy_urls, batch_format="pyarrow")
    out = normalize_urls(urls, column="url")
    return out.select_columns(["doc_id", "url_norm", "domain"]).sort("doc_id")


def _q_domain_stats(sf_dir: str):
    """Per registered-domain rollup (doc count + total normalized-url
    length) — the domain-level gating aggregate, one small groupby
    after the map-side normalize."""
    import ray.data as rd

    from raydedup.ops.urltools import domain_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    urls = docs.map_batches(_derive_messy_urls, batch_format="pyarrow")
    return domain_stats(urls, column="url").sort("domain")


def _q_quantile_filter(sf_dir: str):
    """Sketch-driven curation: keep docs whose token count clears the
    corpus p25, the threshold computed by the deterministic
    (blocking-independent) t-digest — a sketch driving a pipeline
    decision, not just a report. The sidecar twin computes the same
    threshold bit-exactly in one process and the SQL re-derives the
    kept set from it."""
    import ray.data as rd

    from raydedup.ops.text_stats import token_stats
    from raydedup.sketches.aggregates import tdigest_of_det

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    counts = docs.map_batches(
        lambda b: token_stats(b, "doc_id").select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    ).materialize()
    thr = tdigest_of_det(counts, "n_tokens", n_buckets=32).quantile(0.25)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(pc.cast(b["n_tokens"], pa.float64()), thr))

    return counts.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def _q_tfidf(sf_dir: str):
    """Distributed TF-IDF (ops/tfidf.py): map-side-complete per-doc
    term counts, one vocabulary-sized DF groupby, one term-keyed hash
    join — the exchange never carries per-token rows."""
    import ray.data as rd

    from raydedup.ops.tfidf import doc_term_tfidf

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return doc_term_tfidf(docs).sort(["doc_id", "term"])


def _q_pack_sequences(sf_dir: str):
    """Sequence packing (the post-curation training-data layout step):
    concat docs in ascending doc_id order into one token stream, chunk
    at 2048-token boundaries, assign each doc the pack where its first
    token lands. Distributed prefix sum (ops/packing.py) — nothing
    proportional to the corpus on the driver. Ids are zero-padded so
    the engine's lexicographic order equals the oracle's numeric
    ORDER BY; output casts back to int64."""
    import ray.data as rd

    from raydedup.ops.packing import pack_concat_chunks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pad(b: pa.Table) -> pa.Table:
        s = pc.utf8_lpad(pc.cast(b["doc_id"], pa.string()), 12, "0")
        return pa.table({"doc_id": s, "text": b["text"]})

    out = pack_concat_chunks(
        docs.map_batches(pad, batch_format="pyarrow"), seq_len=2048, n_buckets=32
    )

    def unpad(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("doc_id"), "doc_id", pc.cast(b["doc_id"], pa.int64())
        )

    return out.map_batches(unpad, batch_format="pyarrow").sort("doc_id")


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (arXiv:2303.09540): deterministic distributed spherical
    k-means over the embeddings + within-cluster cosine dedup. The
    fixed-point Lloyd iterations make the output a pure function of the
    row multiset, so the sidecar (same kernels, one process, no Ray)
    checks the distributed plumbing value-exact."""
    import ray.data as rd

    from raydedup.ops.semdedup import semantic_dedup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return semantic_dedup(ds, k=8, tau=0.45, n_iters=10).sort("vec_id")


def _q_tiered_dedup(sf_dir: str):
    """Three-tier web-scale dedup (the graft's namesake): exact hash →
    MinHash-LSH near-dup → embedding-cosine semantic, each tier over
    the previous tier's survivors; every doc labeled with the first
    tier that removed it and its keeper. Exact-dup coverage is planted
    (doc_id+100000 copies of every doc_id % 7 == 0) since the synth
    corpus has no byte-identical texts; the SQL oracle derives the
    same augmented corpus."""
    import ray.data as rd

    from raydedup.pipeline.tiered import tiered_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def planted_copies(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(_mod(batch["doc_id"], 7), 0))
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], pa.scalar(100000, pa.int64())),
                "text": sel["text"],
            }
        )

    aug = docs.union(docs.map_batches(planted_copies, batch_format="pyarrow"))
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return tiered_dedup(aug, emb, tau_semantic=0.45).sort("doc_id")


def _q_top_words_per_source(sf_dir: str):
    """Per-group frequent items: top-10 words per source via mergeable
    Misra-Gries partials (one bounded sketch image per (block, group)
    through the exchange, never per-token rows). The synth vocabulary
    sits far below the 0.75*max_map_size exactness bound, so counts
    are exact and the SQL oracle re-derives them with a plain
    group-count + row_number window (same (count desc, word asc)
    tie-break)."""
    import ray.data as rd

    from raydedup.ops.text_stats import top_words_per_group

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return top_words_per_group(docs, "source", k=10).sort(["source", "rank"])


def _q_exact_price_quantiles(sf_dir: str):
    """EXACT distributed order statistics without a global sort:
    histogram-bisection selection (`ops/selection.py::exact_quantile`)
    — each round is a map-only scan tree-reduced to `bins` counts, the
    driver narrows the value range to the bin holding the target rank,
    and one bounded filter pass finishes with np.partition. The
    max_materialize cap forces real bisection rounds even at sf0.01."""
    import ray.data as rd

    from raydedup.ops.selection import exact_quantile

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    qs = [0.01, 0.25, 0.5, 0.75, 0.95]
    vals = [exact_quantile(ds, "l_extendedprice", q, bins=256, max_materialize=2000) for q in qs]
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(vals, pa.float64())})


def _q_events_value_quantiles(sf_dir: str):
    """Per-group quantiles via the GROUPED deterministic t-digest
    (`grouped_tdigest_det`): every event type's digest is a pure
    function of its value multiset (value-hash buckets, per-bucket
    build over sorted values, ascending-bucket fold), so the sidecar
    twin plants p50/p95 bit-identically and the gate checks the
    distributed two-stage grouped reduce against in-process truth."""
    import ray.data as rd

    from raydedup.sketches.aggregates import grouped_tdigest_det
    from raydedup.sketches.tdigest import TDigest

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    g = grouped_tdigest_det(ev, "event_type", "value", n_buckets=32)

    def finalize(b: pa.Table) -> pa.Table:
        types, ns, p50, p95 = [], [], [], []
        for t, blob in zip(b["event_type"].to_pylist(), b["blob"].to_pylist()):
            td = TDigest.from_bytes(blob)
            types.append(t)
            ns.append(int(td.total_weight))
            p50.append(td.quantile(0.5))
            p95.append(td.quantile(0.95))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n_events": pa.array(ns, pa.int64()),
                "p50": pa.array(p50, pa.float64()),
                "p95": pa.array(p95, pa.float64()),
            }
        )

    return g.map_batches(finalize, batch_format="pyarrow").sort("event_type")


def _q_lm_score(sf_dir: str):
    """Bigram stupid-backoff LM quality scoring (the CCNet
    perplexity-filter shape): the model trains on the even-doc_id half
    of the corpus (so unseen bigrams and unseen words genuinely hit
    the backoff branches when scoring odd docs), is broadcast once,
    and every doc scores map-side with zero shuffle."""
    from raydedup.ops.lm import lm_score

    docs = _read_docs_scaled(sf_dir, ["doc_id", "text"])

    def even_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(_mod(b["doc_id"], 2), 0))

    train = docs.map_batches(even_only, batch_format="pyarrow")
    return lm_score(docs, train, "doc_id").sort("doc_id")


def _read_docs_scaled(sf_dir: str, columns):
    """documents read with a byte-scaled block count (~32 MB of file
    per block, min 8). The multi-stage substring ops pay per-task
    scheduling overhead on EVERY stage, so a tiny corpus split into
    the default 64 blocks spends its wall time launching 64-128
    near-empty tasks per stage; at real scale the file size drives the
    block count back up and parallelism is unchanged."""
    import os

    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    nb = int(max(8, os.path.getsize(path) // (32 << 20)))
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)


def _q_substring_dedup(sf_dir: str):
    """Corpus-wide exact-substring duplication (Lee et al. 2022
    ExactSubstr shape): per doc, the bytes covered by any 48-byte
    window whose bytes occur >=2 times anywhere in the corpus (union
    of duplicated spans). Copies with a distinct suffix are planted
    for doc_id % 4 == 0 so originals mark fully duplicated while the
    copies' planted tails stay clean; the corpus's natural near-dups
    contribute the rest of the signal."""
    from raydedup.ops.substring import duplicated_span_stats

    docs = _read_docs_scaled(sf_dir, ["doc_id", "text"])

    def planted_copies(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(_mod(batch["doc_id"], 4), 0))
        s = pc.cast(sel["doc_id"], pa.string())
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], pa.scalar(200000, pa.int64())),
                "text": pc.binary_join_element_wise(sel["text"], pc.binary_join_element_wise(pa.array(["zz"] * len(sel), pa.string()), s, ""), " "),
            }
        )

    corpus = docs.union(docs.map_batches(planted_copies, batch_format="pyarrow"))
    return duplicated_span_stats(corpus, "doc_id", min_len=48).sort("doc_id")


def _q_substring_cut(sf_dir: str):
    """The ExactSubstr TRANSFORM over the same planted corpus as
    `substring_dedup`: every byte covered by a duplicated 48-byte
    window is cut from every occurrence; output is the cleaned text
    (plus cut-byte count). Docs and their duplicated window starts
    co-group on id-buckets; one mask-and-rebuild kernel per bucket."""
    from raydedup.ops.substring import remove_duplicated_spans

    docs = _read_docs_scaled(sf_dir, ["doc_id", "text"])

    def planted_copies(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(_mod(batch["doc_id"], 4), 0))
        s = pc.cast(sel["doc_id"], pa.string())
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], pa.scalar(200000, pa.int64())),
                "text": pc.binary_join_element_wise(sel["text"], pc.binary_join_element_wise(pa.array(["zz"] * len(sel), pa.string()), s, ""), " "),
            }
        )

    corpus = docs.union(docs.map_batches(planted_copies, batch_format="pyarrow"))
    return remove_duplicated_spans(corpus, "doc_id", min_len=48).sort("doc_id")


def _q_gram_novelty(sf_dir: str):
    """Per-doc duplicate-5-gram fraction vs earlier docs (the
    RefinedWeb-style dup-ngram curation signal). Distinct gram hashes
    bucket-grouped once; narrow int64 exchanges only (ops/novelty.py)."""
    import ray.data as rd

    from raydedup.ops.novelty import gram_novelty

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return gram_novelty(ds, "doc_id", k=5, n_buckets=32).sort("doc_id")


def _q_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup report per source (storage-level
    dedup tier): chunk at rolling-hash boundaries, count repeated chunk
    instances/bytes corpus-wide (ops/cdc.py). Sidecar oracle: a naive
    single-process twin with an independent hash formulation and raw-
    bytes chunk identity."""
    import ray.data as rd

    from raydedup.ops.cdc import cdc_dedup_stats

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return cdc_dedup_stats(ds, "doc_id", n_buckets=32).sort("source")


def _q_dup_ratio_by_source(sf_dir: str):
    """Near-dup rate per source: share of docs that are non-keepers
    (url != cluster_id) in their MinHash-LSH cluster — the per-slice
    dedup report a curation run publishes. Reuses the cached pipeline
    result; one narrow join + one tiny groupby."""
    from ray.data.aggregate import Count, Sum

    res = _dedup_result(sf_dir)

    def flag(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        doc_id = pc.cast(pc.utf8_replace_slice(url, 0, 24, ""), pa.int64())
        dup = pc.cast(pc.not_equal(url, batch["cluster_id"]), pa.int64())
        return pa.table({"doc_id": doc_id, "is_dup": dup})

    import ray.data as rd

    flags = res.assignments.map_batches(flag, batch_format="pyarrow")
    src = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    joined = flags.join(src, join_type="inner", num_partitions=8, on=("doc_id",))
    out = joined.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("is_dup", alias_name="n_dup")
    )

    def ratio(batch: pa.Table) -> pa.Table:
        r = pc.divide(
            pc.cast(batch["n_dup"], pa.float64()), pc.cast(batch["n_docs"], pa.float64())
        )
        return batch.append_column("dup_ratio", r)

    return out.map_batches(ratio, batch_format="pyarrow").sort("source")


def _q_normalized_dedup(sf_dir: str):
    """Near-exact dedup tier: casefold + whitespace-collapse BEFORE the
    exact-hash dedup, so docs differing only in case/spacing collapse.
    One normalize map composed with ops/exact.py::exact_dedup_representatives
    (the shuffle still carries only hash128+id)."""
    import ray.data as rd

    from raydedup.ops.exact import exact_dedup_representatives

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(batch["text"]), r"\s+", " "),
            " ",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    return exact_dedup_representatives(
        ds.map_batches(norm, batch_format="pyarrow"), "doc_id"
    ).sort("doc_id")


_TOKEN_BUDGET = 600


def _q_token_budget_sample(sf_dir: str):
    """Token-budget sampling (the "take ~N tokens per source" recipe
    step): docs ordered per source by deterministic murmur3 priority,
    kept while the running token total stays within the budget.
    Composition: one tokenize map + the grouped exact prefix-sum
    (ops/windows.py::cumulative_per_key) + a map-side filter."""
    import ray.data as rd

    from raydedup.ops.text_stats import token_stats
    from raydedup.ops.windows import cumulative_per_key
    from raydedup.sketches.aggregates import _column_hashes

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = token_stats(batch, "doc_id")
        h1, _ = _column_hashes(batch["doc_id"].combine_chunks())
        # top-bit flip: signed int64 order == unsigned u64 order, so the
        # pandas kernel never ships uint64 (Ray's pandas->Arrow path
        # overflows on values > 2^63)
        sp = (h1 ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tokens": t["n_tokens"],
                "priority": pa.array(sp, pa.int64()),
            }
        )

    cum = cumulative_per_key(
        docs.map_batches(prep, batch_format="pyarrow"),
        "source",
        ["priority", "doc_id"],
        "n_tokens",
        out_col="cum_tokens",
        decimals=0,
        n_buckets=32,
    )

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.less_equal(batch["cum_tokens"], pa.scalar(float(_TOKEN_BUDGET)))
        return batch.filter(m).select(["doc_id", "source", "cum_tokens"])

    return cum.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def _q_stitch_shards(sf_dir: str):
    """Shard-overlap stitching (ingestion repair): find (a, b) pairs
    whose K-char suffix/prefix windows coincide. The corpus plants
    two-shard splits (48-char overlap) of every fifth doc alongside the
    originals — ops/stitch.py matches tail keys to head keys through
    one bucketed exchange of 128-bit hashes (text never shuffles)."""
    import ray.data as rd

    from raydedup.ops.stitch import stitch_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def shards(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = pa.array((ids % 5 == 0) & (n >= 120))
        sel = batch.filter(m)
        nn = n[(ids % 5 == 0) & (n >= 120)]
        half = nn // 2
        # split points vary per row; slice offsets are scalars, so group
        # rows by split point (few distinct doc lengths per batch)
        text = sel["text"].combine_chunks()
        lid = pc.add(sel["doc_id"], pa.scalar(300000, pa.int64()))
        rid = pc.add(sel["doc_id"], pa.scalar(400000, pa.int64()))
        out_id, out_tx = [], []
        for h in np.unique(half):
            gm = pa.array(half == h)
            g = text.filter(gm)
            out_id.append(lid.filter(gm))
            out_tx.append(pc.utf8_slice_codeunits(g, 0, int(h) + 48))
            out_id.append(rid.filter(gm))
            out_tx.append(pc.utf8_slice_codeunits(g, int(h), np.iinfo(np.int32).max))
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        return pa.table(
            {
                "doc_id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_id]),
                "text": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_tx]),
            }
        )

    corpus = docs.union(docs.map_batches(shards, batch_format="pyarrow"))
    return stitch_pairs(corpus, "doc_id", k=48, n_buckets=32).sort(["id_a", "id_b"])


def _q_streaming_dedup(sf_dir: str, checkpoint_mid: bool = False):
    """Online dedup service: micro-batches of docs (100 per batch, in
    doc_id order) probe-then-commit a sharded mutable LSH index
    (state/lsh_index.py — raw actors; the one semantics Dataset lineage
    can't express). Signatures are computed distributedly; the driver
    streams only the narrow (url, sig, band_hash) rows to the service
    in stream order (a production consumer would be sharded). Sidecar
    oracle: a sequential dict-walk twin over the same micro-batches."""
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.pipeline.run import build_signatures
    from raydedup.state.lsh_index import StreamingDedupIndex

    cfg = DedupConfig()
    pages = _documents_as_pages(sf_dir)
    sigs = build_signatures(pages, cfg).select_columns(["url", "sig", "band_hash"])

    urls_all, sig_chunks, band_chunks = [], [], []
    for b in sigs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        urls_all.extend(b["url"].to_pylist())
        sig_chunks.append(
            b["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        )
        band_chunks.append(
            b["band_hash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        )
    sig_m = np.concatenate(sig_chunks).reshape(-1, cfg.num_perms)
    band_m = np.concatenate(band_chunks).reshape(-1, cfg.bands)
    # deterministic stream order: by doc id (urls embed zero-unpadded
    # ids, so order numerically by the parsed id)
    ids = np.array([int(u.rsplit("/", 1)[1]) for u in urls_all], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    urls_all = [urls_all[i] for i in order]
    sig_m, band_m = sig_m[order], band_m[order]

    index = StreamingDedupIndex(n_shards=4, min_agree=0.8, max_key_group=64)
    out_url, out_dup, out_match = [], [], []
    B = 100
    starts = list(range(0, len(urls_all), B))
    ckpt_at = starts[len(starts) // 2] if checkpoint_mid else None
    for s0 in starts:
        if checkpoint_mid and s0 == ckpt_at:
            # snapshot + rebuild mid-stream: the resumed service must
            # continue exactly where the committed history left off
            import tempfile

            with tempfile.TemporaryDirectory(prefix="raydedup_sd_ckpt_") as d:
                index.checkpoint(d)
                index = StreamingDedupIndex.restore(d)
        u = urls_all[s0 : s0 + B]
        sm = sig_m[s0 : s0 + B]
        bm = band_m[s0 : s0 + B]
        doc_of_key = np.repeat(np.arange(len(u), dtype=np.int64), cfg.bands)
        is_dup, murl = index.process_batch(
            u, bm.reshape(-1).view(np.int64), doc_of_key, sm
        )
        out_url.extend(u)
        out_dup.append(is_dup)
        out_match.extend(murl.tolist())
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "is_dup": pa.array(np.concatenate(out_dup)),
            "match_url": pa.array(out_match, pa.string()),
        }
    ).sort_by("url")


def _q_streaming_dedup_resumed(sf_dir: str):
    """The streaming service's resumability contract under the gate:
    the SAME stream as streaming_dedup, but the index is checkpointed
    to parquet (one file per shard + manifest) and restored into a
    fresh actor fleet halfway through — output must be value-identical
    to the uninterrupted sequential twin."""
    return _q_streaming_dedup(sf_dir, checkpoint_mid=True)


def _q_bbit_jaccard(sf_dir: str):
    """b-bit MinHash (Li & Koenig 2010): 1-bit-per-slot Jaccard
    estimates for every verified near-dup pair — the 32x-smaller
    signature a 100-TB index keeps hot (ops/bbit.py). Sidecar oracle:
    the single-process pipeline replay recomputes the same folds and
    estimator over the same pair set."""
    from raydedup.ops.bbit import bbit_jaccard_pairs

    res = _dedup_result(sf_dir)
    return bbit_jaccard_pairs(res.signatures, res.verified, id_column="url").sort(
        ["url_a", "url_b"]
    )


def _q_soft_dedup_weights(sf_dir: str):
    """Soft dedup: instead of dropping near-dup docs, weight every
    cluster member by 1/cluster_size so repeated content contributes
    one doc's worth of training mass. One tiny groupby over (url,
    cluster_id) + one narrow join — reuses the cached pipeline run."""
    from ray.data.aggregate import Count

    res = _dedup_result(sf_dir)
    sizes = res.assignments.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size")
    )
    joined = res.assignments.join(
        sizes, join_type="inner", num_partitions=8, on=("cluster_id",)
    )

    def weight(batch: pa.Table) -> pa.Table:
        w = pc.divide(
            pa.scalar(1.0, pa.float64()), pc.cast(batch["cluster_size"], pa.float64())
        )
        return pa.table(
            {
                "url": batch["url"],
                "cluster_size": batch["cluster_size"],
                "weight": w,
            }
        )

    return joined.map_batches(weight, batch_format="pyarrow").sort("url")


def _q_events_debounce(sf_dir: str):
    """Event-stream dedup: drop telemetry events repeated by the same
    (user, type) key within 6 h of their predecessor (LAG semantics —
    ops/windows.py::debounce_events; the sessions coarse-bucket +
    one-lexsort-kernel shape)."""
    import ray.data as rd

    from raydedup.ops.windows import debounce_events

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    return debounce_events(
        ev, "user_id", "event_type", "ts", "event_id", gap_s=21600, n_buckets=32
    ).sort("event_id")


def _q_fd_label_spectra(sf_dir: str):
    """Grouped Frequent Directions: per-label embedding spectra (the
    drift-report shape — one ℓ×d sketch per group, blocking-invariant
    because map_groups hands the whole group and rows absorb in
    ascending vec_id order). Sidecar twin value-exact."""
    import ray.data as rd

    from raydedup.ops.fd_embed import fd_group_spectra

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return fd_group_spectra(emb, "label", ell=8, top=4).sort(["label", "rank"])


def _q_cm_heavy_tokens(sf_dir: str):
    """Count-Min in a distributed pipeline: per-block tokenize+update
    partials tree-merged off-driver (``block_reduce``), evaluated at
    the exact global top-20 tokens (Misra-Gries partials, exact under
    the vocab bound). Output (word, n_exact, cm_est, rank); the merged
    CM is split-invariant (partial count matrices sum), so the
    in-process sidecar twin matches value-exactly, and cm_est ≥
    n_exact by construction (one-sided CM error)."""
    import ray.data as rd

    from raydedup.ops.text_stats import top_words_per_group
    from raydedup.sketches.aggregates import block_reduce
    from raydedup.sketches.countmin import CountMinSketch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def const_group(b: pa.Table) -> pa.Table:
        return pa.table(
            {"g": pa.array(["all"] * len(b), pa.string()), "text": b["text"]}
        )

    grouped = docs.map_batches(const_group, batch_format="pyarrow")
    top = top_words_per_group(grouped, "g", k=20).to_pandas()
    top = top.sort_values("rank").reset_index(drop=True)

    def partial(block: pa.Table) -> bytes:
        return CountMinSketch(5, 2048).update(_tokens_of(block["text"])).to_bytes()

    row = docs.aggregate(
        block_reduce(
            partial,
            lambda a, b: CountMinSketch.from_bytes(a)
            .merge(CountMinSketch.from_bytes(b))
            .to_bytes(),
            name="cm",
        )
    )
    cm = CountMinSketch.from_bytes(row["cm"])
    words = pa.array(top.word.tolist(), pa.string())
    est = cm.estimate(words).astype(np.int64)
    return pa.table(
        {
            "word": words,
            "n_exact": pa.array(top.n.to_numpy(np.int64)),
            "cm_est": pa.array(est),
            "rank": pa.array(top["rank"].to_numpy(np.int64)),
        }
    )


def _tokens_of(text) -> pa.Array:
    """The board's shared word derivation: split_whitespace(lower),
    drop empties — identical to top_words_per_group's partials and the
    SQL oracles' string_split_regex('\\s+') + len>0 filter."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat = pc.utf8_split_whitespace(pc.utf8_lower(text))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat = flat.flatten()
    return flat.filter(pc.greater(pc.utf8_length(flat), 0))


def _q_dedup_threshold_sweep(sf_dir: str):
    """Dedup-aggressiveness tuning table: cluster statistics at
    thresholds 0.8/0.85/0.9/0.95 from ONE pipeline run (the report a
    curation owner reads before fixing the near-dup threshold). Pair
    completeness at ≥0.8 is the LSH design point (recall
    1-(1-0.8^4)^32 per pair); every higher threshold filters that
    complete set, so all four rows are exact. Per threshold: connected
    components over pairs with exact_jaccard >= thr (driver union-find
    over the O(dup-pairs) edge list — the flagship's own bounded
    step), emitting (threshold, n_dup_pairs, n_clusters, n_dup_docs,
    n_keepers)."""
    import ray.data as rd

    from raydedup.pipeline.cluster import connected_components

    res = _dedup_result(sf_dir)
    ver = res.verified.select_columns(["url_a", "url_b", "exact_jaccard"]).to_pandas()
    n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    rows = []
    for thr in (0.8, 0.85, 0.9, 0.95):
        d = ver[ver.exact_jaccard >= thr]
        labels = connected_components(
            d.url_a.to_numpy(dtype=object), d.url_b.to_numpy(dtype=object)
        )
        n_dup_docs = len(labels)
        n_clusters = len(set(labels.values()))
        rows.append(
            {
                "threshold": thr,
                "n_dup_pairs": len(d),
                "n_clusters": n_clusters,
                "n_dup_docs": n_dup_docs,
                "n_keepers": n_docs - n_dup_docs + n_clusters,
            }
        )
    return pa.table(
        {
            "threshold": pa.array([r["threshold"] for r in rows], pa.float64()),
            "n_dup_pairs": pa.array([r["n_dup_pairs"] for r in rows], pa.int64()),
            "n_clusters": pa.array([r["n_clusters"] for r in rows], pa.int64()),
            "n_dup_docs": pa.array([r["n_dup_docs"] for r in rows], pa.int64()),
            "n_keepers": pa.array([r["n_keepers"] for r in rows], pa.int64()),
        }
    )


def _q_fd_spectrum(sf_dir: str):
    """Corpus embedding spectrum via a Frequent Directions sketch
    (Liberty 2013; sketches/fd.py): rows hash-bucket once, each bucket
    absorbs in ascending vec_id order, bucket sketches fold in
    ascending bucket order — the canonical-order plan that makes FD
    (an order-dependent sketch) blocking-invariant, so the
    single-process sidecar twin matches value-exactly."""
    import ray.data as rd

    from raydedup.ops.fd_embed import fd_corpus_sketch, spectrum_table

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return spectrum_table(fd_corpus_sketch(emb, ell=16, n_buckets=8), top=16)


def _q_window_distinct_users(sf_dir: str):
    """Windowed approximate distinct — the streaming "daily active
    users" shape: users per 1-day tumbling window via the sparse-HLL
    grouped aggregate (window assignment is a map-side floor; only
    (window, coupon) partials shuffle, never user rows). The merged
    sketch is split-invariant, so the in-process sidecar twin matches
    value-exactly. Window keys ride as int64 epoch-µs through the
    groupby (Ray hash-partitioning of timestamp keys is untested
    territory; the cast back is free) and return as timestamps."""
    import ray.data as rd

    from raydedup.sketches.aggregates import HllDistinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def win(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.int64())
        return pa.table({"w": day, "user_id": batch["user_id"]})

    out = (
        ev.map_batches(win, batch_format="pyarrow")
        .groupby("w")
        .aggregate(HllDistinct("user_id", lg_k=12, alias_name="n_users_est"))
    )

    def back(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.cast(batch["w"], pa.timestamp("us")),
                "n_users_est": batch["n_users_est"],
            }
        )

    return out.map_batches(back, batch_format="pyarrow").sort("window_start")


def _q_source_overlap(sf_dir: str):
    """Cross-source overlap matrix: pairwise distinct-5-gram Jaccard
    between sources via theta sketch set algebra (ops/overlap.py) —
    map-side KMV partials, ONE sketch-sized groupby, O(S²) pairwise
    intersection over S source-level sketches. Sidecar oracle: the
    single-process from_hashes twin (union-of-partials is provably
    split-invariant, so the match is value-exact)."""
    import ray.data as rd

    from raydedup.ops.overlap import source_overlap

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return source_overlap(docs, k=5, lg_k=12)


def _q_source_unique_grams(sf_dir: str):
    """Per-source unique-content estimate: theta A-NOT-B of each
    source's distinct-5-gram sketch against the union of every other
    source (sketches/theta.py::theta_a_not_b — the DataSketches AnotB
    op the Rust reference lacks). Same map-side KMV partial plan as
    source_overlap; sidecar twin value-exact (split-invariant
    partials, deterministic algebra)."""
    import ray.data as rd

    from raydedup.ops.overlap import source_unique_grams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return source_unique_grams(docs, k=5, lg_k=12)


def _q_snm_dup_pairs(sf_dir: str):
    """Sorted-neighborhood dedup (Hernandez-Stolfo 1995, the classic
    sort-merge blocking family): global sort by a normalized 48-char
    key, compare ONLY rank neighbors within window 6, keep pairs
    within Levenshtein 4 (ops/snm.py — rank via the packing prefix-sum
    shape, window pairs via one anchor/probe hash exchange, shared
    batched Wagner-Fischer verify). Near-dup coverage is planted
    (doc_id % 5 == 0 -> doc_id + 100000 with chars 41-42 overwritten —
    a TAIL edit, so the sort prefixes still collate adjacently); the
    oracle derives the same corpus and re-checks the full window
    semantics via row_number + rank-distance self-join + levenshtein."""
    import ray.data as rd

    from raydedup.ops.snm import normalize_sort_key, snm_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def planted(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(_mod(batch["doc_id"], 5), 0))
        t = sel["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        edited = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(t, 0, 40),
            pa.scalar("qq"),
            pc.utf8_slice_codeunits(t, 42, 2**62),
            pa.scalar(""),
        )
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], pa.scalar(100000, pa.int64())),
                "text": edited,
            }
        )

    aug = docs.union(docs.map_batches(planted, batch_format="pyarrow"))

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "key": normalize_sort_key(batch["text"], key_len=48),
            }
        )

    return snm_pairs(
        aug.map_batches(keyed, batch_format="pyarrow"),
        "doc_id",
        "key",
        window=6,
        max_dist=4,
        key_len=48,
    ).sort(["doc_a", "doc_b"])


def _q_containment_search(sf_dir: str):
    """Asymmetric containment search (ops/censemble.py, the LSH
    Ensemble idea — Zhu et al. VLDB 2016): find corpus docs containing
    >= 50% of a query's distinct 5-gram shingles. Queries are planted
    150-char prefixes of every 50th doc (high containment vs their
    source, LOW Jaccard — the pair shape the flagship's 0.8-tuned
    bands are designed to miss). Size-partitioned conservative banding
    generates candidates; an exact broadcast-probe verify computes the
    returned containment values, so the full SQL oracle (shingle-set
    intersection over all pairs) checks both completeness and values."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raydedup.ops.censemble import containment_search

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_numpy()
    sel = pa.array(ids % 50 == 0)
    qtext = pc.utf8_slice_codeunits(tbl["text"].combine_chunks().filter(sel), 0, 150)
    queries = pa.table(
        {"qid": pa.array(ids[ids % 50 == 0].astype(np.int64)), "text": qtext}
    )
    corpus = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return containment_search(corpus, queries, tau=0.5).sort(["qid", "doc_id"])


def _wj_augmented_docs(sf_dir: str):
    """Corpus with planted tf-shifted near-dups for the weighted-
    Jaccard queries: doc_id % 5 == 0 gains a copy (id + 100000) whose
    text is the original plus its own first 80 chars — same token SET
    (mostly), shifted term frequencies, so J_w < 1 while unweighted
    Jaccard stays ~1. SQL derives the identical corpus."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def planted(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(_mod(batch["doc_id"], 5), 0))
        t = sel["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        edited = pc.binary_join_element_wise(
            t, pc.utf8_slice_codeunits(t, 0, 80), pa.scalar(" ")
        )
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], pa.scalar(100000, pa.int64())),
                "text": edited,
            }
        )

    return docs.union(docs.map_batches(planted, batch_format="pyarrow"))


def _wj_pair_table(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    sel = np.sort(ids[ids % 5 == 0])
    return pa.table(
        {
            "doc_a": pa.array(sel, pa.int64()),
            "doc_b": pa.array(sel + 100000, pa.int64()),
        }
    )


def _q_wjaccard_pairs(sf_dir: str):
    """Exact weighted (tf) Jaccard for the planted pair list
    (ops/wjaccard.py — one tf map, vectorized pair fan-out from the
    report-shaped candidate list, ONE bucketed exchange with a
    min/max-fold kernel). Full SQL oracle: per-pair token tf tables
    FULL-joined via a side-tagged union, sum(least)/sum(greatest)."""
    from raydedup.ops.wjaccard import weighted_jaccard_pairs

    return weighted_jaccard_pairs(
        _wj_augmented_docs(sf_dir), _wj_pair_table(sf_dir)
    ).sort(["doc_a", "doc_b"])


def _q_icws_jaccard(sf_dir: str):
    """ICWS weighted MinHash (Ioffe 2010, sketches/icws.py): per-doc
    128-slot signatures computed distributedly (map-only — the tf
    kernel + per-doc segment-min sampling inside map_batches), then
    the planted pairs' slot-agreement estimates. Deterministic fmix64
    randomness -> the single-process sidecar twin is value-exact. The
    exact counterpart (wjaccard_pairs) is the SQL-checked anchor."""
    from raydedup.ops.wjaccard import token_tf_rows
    from raydedup.sketches.icws import icws_estimate, icws_signatures

    pairs = _wj_pair_table(sf_dir)
    wanted = set(pairs["doc_a"].to_pylist()) | set(pairs["doc_b"].to_pylist())

    def sig_batch(batch: pa.Table) -> pa.Table:
        tf = token_tf_rows(batch, "doc_id")
        ids = tf["doc_id"].to_numpy(zero_copy_only=False)
        tok = tf["tok"].to_numpy(zero_copy_only=False).view(np.uint64)
        w = tf["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        uids, doc_of = np.unique(ids, return_inverse=True)
        order = np.argsort(doc_of, kind="stable")
        sig = icws_signatures(
            tok[order], w[order], doc_of[order], len(uids), num_hashes=128
        )
        return pa.table(
            {
                "doc_id": pa.array(uids),
                "sig": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(128 * 8),
                    len(uids),
                    [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())],
                ),
            }
        )

    wanted_arr = pa.array(sorted(wanted), pa.int64())

    def member_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted_arr))

    sigs = (
        _wj_augmented_docs(sf_dir)
        .map_batches(member_filter, batch_format="pyarrow")
        .map_batches(sig_batch, batch_format="pyarrow")
        .to_pandas()  # bounded: pair members only (report-shaped)
    )
    by_id = {
        int(d): np.frombuffer(s, dtype=np.uint64)
        for d, s in zip(sigs["doc_id"], sigs["sig"])
    }
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    est = np.array(
        [float(icws_estimate(by_id[int(x)], by_id[int(y)])) for x, y in zip(a, b)]
    )
    return pa.table(
        {
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "est_wj": pa.array(est, pa.float64()),
        }
    )


def _q_source_datasheet(sf_dir: str):
    """Per-source data card (the summary table a curation run
    publishes): doc count, total whitespace tokens, mean chars,
    language count and dominant language. One narrow tokenize map,
    two pre-aggregated groupbys (per-source stats; per-(source,lang)
    counts folded to top-lang per source), and a bounded broadcast
    attach — the source domain is report-shaped (capped), never
    corpus-shaped."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Sum

    from raydedup.ops.text_stats import token_stats

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def narrow(batch: pa.Table) -> pa.Table:
        ts = token_stats(batch, "doc_id")
        return pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "n_chars": ts["n_chars"],
                "n_tokens": ts["n_tokens"],
            }
        )

    n = docs.map_batches(narrow, batch_format="pyarrow").materialize()
    agg = n.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Mean("n_chars", alias_name="mean_chars"),
    )
    lc = (
        n.groupby(["source", "lang"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # bounded: |sources| x |langs| (report-shaped)
    )
    if len(lc) > 100_000:
        raise ValueError("source_datasheet: source x lang domain exceeds report cap")
    top_lang: dict[str, str] = {}
    n_langs: dict[str, int] = {}
    for src, grp in lc.groupby("source"):
        grp = grp.sort_values(["cnt", "lang"], ascending=[False, True])
        top_lang[src] = grp["lang"].iloc[0]
        n_langs[src] = grp["lang"].nunique()

    def attach(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        return batch.append_column(
            "n_langs", pa.array([n_langs[s] for s in srcs], pa.int64())
        ).append_column("top_lang", pa.array([top_lang[s] for s in srcs], pa.string()))

    return agg.map_batches(attach, batch_format="pyarrow").sort("source")


def _q_lsh_plan(sf_dir: str):
    """LSH banding planner surface (pipeline/plan.py): the S-curve
    false-positive / false-negative error areas for every divisor
    split of 128 permutations at three target thresholds — the table
    a user reads to pick (bands, rows). Pure math, but gate-checkable:
    the oracle recomputes the same 512-point trapezoid integrals in
    SQL (power() + generate_series), value-exact at 6 decimals.
    ``chosen`` marks the (bands, rows) the planner picks per threshold
    (argmin of the default 0.2*FP + 0.8*FN recall-leaning cost — the
    oracle re-derives it with a window min), and ``sig_mode`` is the
    planner's signature-kernel choice for a planned config
    (``DedupConfig.plan``: OPH — faster and better-scaling at every
    measured corpus size with identical exact-verify results; the SQL
    twin pins the same constant)."""
    from raydedup.config import DedupConfig
    from raydedup.pipeline.plan import error_areas, optimal_bands

    th, bs, rs, fps, fns, chosen, modes = [], [], [], [], [], [], []
    for t in (0.7, 0.8, 0.9):
        best_b, best_r, _, _ = optimal_bands(128, t)
        mode = DedupConfig.plan(threshold=t).sig_mode
        for r in (1, 2, 4, 8, 16, 32, 64, 128):
            b = 128 // r
            fp, fn = error_areas(b, r, t)
            th.append(t)
            bs.append(b)
            rs.append(r)
            fps.append(fp)
            fns.append(fn)
            chosen.append((b, r) == (best_b, best_r))
            modes.append(mode)
    return pa.table(
        {
            "threshold": pa.array(th, pa.float64()),
            "bands": pa.array(bs, pa.int64()),
            "rows_pb": pa.array(rs, pa.int64()),
            "fp_area": pa.array(fps, pa.float64()),
            "fn_area": pa.array(fns, pa.float64()),
            "chosen": pa.array(chosen, pa.bool_()),
            "sig_mode": pa.array(modes, pa.string()),
        }
    )


def _q_mirror_hosts(sf_dir: str):
    """Mirror detection: host pairs serving >= 2 identical documents
    (ops/mirror.py — 128-bit content fingerprints, per-bucket distinct
    (fp, host) + run all-pairs, ONE pair-count rollup; content never
    shuffles). Hosts are planted ('h'||doc_id%7; every doc_id%3==0 also
    served from 'm'||doc_id%2) since the synth corpus has no host
    column; the oracle derives the same corpus and joins on exact
    text equality — also a completeness check of the fingerprint
    identity."""
    import ray.data as rd

    from raydedup.ops.mirror import host_content_overlap

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hosted(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False)
        host = pa.array(np.char.add("h", (idv % 7).astype(str)))
        base = pa.table({"host": host, "text": batch["text"]})
        sel = idv % 3 == 0
        mirror = pa.table(
            {
                "host": pa.array(np.char.add("m", (idv[sel] % 2).astype(str))),
                "text": pa.Table.from_arrays([batch["text"]], ["t"])["t"]
                .combine_chunks()
                .filter(pa.array(sel)),
            }
        )
        return pa.concat_tables([base, mirror])

    corpus = docs.map_batches(hosted, batch_format="pyarrow")
    return host_content_overlap(corpus, "host", "text", min_shared=2).sort(
        ["host_a", "host_b"]
    )


def _q_template_prefixes(sf_dir: str):
    """Boilerplate template detection: docs sharing the same normalized
    64-char prefix form a template group (the cheap tier-0 signal a web
    pipeline uses to spot mirror/boilerplate families before any
    sketch work). One normalize+slice map, one count groupby, filter
    to groups >1 — full-SQL oracle."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def prefix(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(batch["text"]), r"\s+", " "),
            " ",
        )
        return pa.table({"prefix": pc.utf8_slice_codeunits(t, 0, 64)})

    out = (
        ds.map_batches(prefix, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(Count(alias_name="n_docs"))
    )
    return out.filter(expr="n_docs > 1").sort("prefix")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "exact_dedup": _q_exact_dedup,
        "token_stats": _q_token_stats,
        "jsonl_docs": _q_jsonl_docs,
        "partitioned_docs": _q_partitioned_docs,
        "distinct_orderkeys_theta": _q_distinct_orderkeys,
        "docs_per_source": _q_docs_per_source,
        "pricing_summary": _q_pricing_summary,
        "fingerprints": _q_fingerprints,
        "dedup_assignments": _q_dedup_assignments,
        "best_in_cluster": _q_best_in_cluster,
        "cluster_sizes": _q_cluster_sizes,
        "group_distinct_orders": _q_group_distinct_orders,
        "events_by_type": _q_events_by_type,
        "events_distinct_users": _q_events_distinct_users,
        "top_users": _q_top_users,
        "segment_revenue": _q_segment_revenue,
        "top_parts_by_price": _q_top_parts_by_price,
        "quantity_quantiles": _q_quantity_quantiles,
        "heavy_hitter_sources": _q_heavy_hitter_sources,
        "top2_parts_per_brand": _q_top2_parts_per_brand,
        "region_revenue": _q_region_revenue,
        "asof_user_orders": _q_asof_user_orders,
        "promo_revenue": _q_promo_revenue,
        "parse_props": _q_parse_props,
        "cosine_dup_pairs": _q_cosine_dup_pairs,
        "events_tumbling": _q_events_tumbling,
        "events_hopping": _q_events_hopping,
        "events_sessions": _q_events_sessions,
        "cumulative_spend": _q_cumulative_spend,
        "rolling_user_value": _q_rolling_user_value,
        "pivot_events": _q_pivot_events,
        "customers_no_orders": _q_customers_no_orders,
        "order_rank_in_cust": _q_order_rank_in_cust,
        "event_interarrival": _q_event_interarrival,
        "funnel_stages": _q_funnel_stages,
        "ngram_dup_pairs": _q_ngram_dup_pairs,
        "distinct_custkeys_cpc": _q_distinct_custkeys_cpc,
        "ann_topk": _q_ann_topk,
        "rerank_topk": _q_rerank_topk,
        "simhash_pairs": _q_simhash_pairs,
        "langid": _q_langid,
        "regex_token_stats": _q_regex_token_stats,
        "quality_scores": _q_quality_scores,
        "repetition_stats": _q_repetition_stats,
        "incremental_dedup": _q_incremental_dedup,
        "latest_per_url": _q_latest_per_url,
        "decontaminate": _q_decontaminate,
        "curation": _q_curation,
        "chunk_docs": _q_chunk_docs,
        "incremental_near_dup": _q_incremental_near_dup,
        "top_ngrams": _q_top_ngrams,
        "collocations": _q_collocations,
        "bm25_topk": _q_bm25_topk,
        "rrf_fusion": _q_rrf_fusion,
        "image_features": _q_image_features,
        "png_features": _q_png_features,
        "ivf_partitioned_topk": _q_ivf_partitioned_topk,
        "audio_features": _q_audio_features,
        "video_frames": _q_video_frames,
        "y4m_frames": _q_y4m_frames,
        "sig_distance_quantiles": _q_sig_distance_quantiles,
        "paragraph_dedup": _q_paragraph_dedup,
        "substring_dedup": _q_substring_dedup,
        "substring_cut": _q_substring_cut,
        "lm_score": _q_lm_score,
        "events_value_quantiles": _q_events_value_quantiles,
        "exact_price_quantiles": _q_exact_price_quantiles,
        "top_words_per_source": _q_top_words_per_source,
        "pii_redact": _q_pii_redact,
        "stratified_sample": _q_stratified_sample,
        "weighted_sample": _q_weighted_sample,
        "profile_orders": _q_profile_orders,
        "price_histogram": _q_price_histogram,
        "rollup_pricing": _q_rollup_pricing,
        "lineitem_corr_stats": _q_lineitem_corr_stats,
        "order_ntile": _q_order_ntile,
        "cube_pricing": _q_cube_pricing,
        "user_event_path": _q_user_event_path,
        "snapshot_churn": _q_snapshot_churn,
        "doc_pagerank": _q_doc_pagerank,
        "doc_pagerank_seeded": _q_doc_pagerank_seeded,
        "part_skyline": _q_part_skyline,
        "prefix_jaccard_join": _q_prefix_jaccard_join,
        "doc_triangles": _q_doc_triangles,
        "phrase_search": _q_phrase_search,
        "graph_components": _q_graph_components,
        "co_citation": _q_co_citation,
        "event_intervals": _q_event_intervals,
        "part_name_linkage": _q_part_name_linkage,
        "user_mode_event": _q_user_mode_event,
        "csv_events": _q_csv_events,
        "leakage_safe_split": _q_leakage_safe_split,
        "window_anomalies": _q_window_anomalies,
        "corpus_vocab": _q_corpus_vocab,
        "containment_join": _q_containment_join,
        "price_ols": _q_price_ols,
        "cust_median_spend": _q_cust_median_spend,
        "cust_mad_spend": _q_cust_mad_spend,
        "cust_p90_spend": _q_cust_p90_spend,
        "doc_entropy": _q_doc_entropy,
        "source_drift": _q_source_drift,
        "orders_zscore": _q_orders_zscore,
        "shuffle_order": _q_shuffle_order,
        "mix_sources": _q_mix_sources,
        "url_normalize": _q_url_normalize,
        "domain_stats": _q_domain_stats,
        "semantic_dedup": _q_semantic_dedup,
        "tiered_dedup": _q_tiered_dedup,
        "pack_sequences": _q_pack_sequences,
        "tfidf": _q_tfidf,
        "quantile_filter": _q_quantile_filter,
        "gram_novelty": _q_gram_novelty,
        "cdc_dedup": _q_cdc_dedup,
        "dup_ratio_by_source": _q_dup_ratio_by_source,
        "events_debounce": _q_events_debounce,
        "normalized_dedup": _q_normalized_dedup,
        "token_budget_sample": _q_token_budget_sample,
        "stitch_shards": _q_stitch_shards,
        "soft_dedup_weights": _q_soft_dedup_weights,
        "bbit_jaccard": _q_bbit_jaccard,
        "streaming_dedup": _q_streaming_dedup,
        "streaming_dedup_resumed": _q_streaming_dedup_resumed,
        "source_overlap": _q_source_overlap,
        "template_prefixes": _q_template_prefixes,
        "snm_dup_pairs": _q_snm_dup_pairs,
        "mirror_hosts": _q_mirror_hosts,
        "lsh_plan": _q_lsh_plan,
        "source_datasheet": _q_source_datasheet,
        "wjaccard_pairs": _q_wjaccard_pairs,
        "containment_search": _q_containment_search,
        "icws_jaccard": _q_icws_jaccard,
        "window_distinct_users": _q_window_distinct_users,
        "fd_spectrum": _q_fd_spectrum,
        "dedup_threshold_sweep": _q_dedup_threshold_sweep,
        "cm_heavy_tokens": _q_cm_heavy_tokens,
        "fd_label_spectra": _q_fd_label_spectra,
        "source_unique_grams": _q_source_unique_grams,
    }


_ORACLE_SIDECAR_DIR = "/tmp/raydedup_oracle_sidecar"
_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _ensure_oracle_sidecars() -> set[str]:
    """Plant engine-kernel-computed expected tables for the
    kernel-/sketch-valued oracles: the pure kernels run directly over
    their inputs in ONE process (NO Ray — sf0.01 parquet for real
    tables, the deterministic synth corpora for multimodal), and the
    oracle SQL reads the sidecars — so the driver's gate compares the
    DISTRIBUTED plumbing (blocking, shuffles, actor batching, merge
    order) against in-process ground truth. Per sidecar:

    - fingerprints / audio_features / image_features: same kernel,
      single-process run (DuckDB has no murmur3/PCM/feature kernels).
    - simhash_pairs: planted fingerprints, then the SQL independently
      re-derives ALL pairs by brute-force ``bit_count(xor(...))``
      cross join — an exhaustive-plan completeness check of the
      engine's block-permutation LSH.
    - quantity_quantiles / sig_distance_quantiles: the digests are
      blocking-independent by construction (``tdigest_of_det`` /
      ``kll_of_det``), so the in-process twins produce bit-identical
      quantiles; sig_distance additionally replays the WHOLE dedup
      pipeline single-process (``pipeline.reference``).
    - distinct_custkeys_cpc: the merged/ICON CPC estimate is a pure
      function of the OR-merged bit matrix (split-invariant).

    Returns the set of sidecar names available (entries for missing
    ones are omitted → the driver records a rows-only check)."""
    import os

    import pyarrow.parquet as pq

    paths = {
        name: f"{_ORACLE_SIDECAR_DIR}/{fname}"
        for name, fname in (
            ("fingerprints", "fingerprints.parquet"),
            ("simhash_pairs", "simhash.parquet"),
            ("audio_features", "audio_features.parquet"),
            ("image_features", "image_features.parquet"),
            ("png_features", "png_features.parquet"),
            ("ivf_partitioned_topk", "ivf_partitioned_topk.parquet"),
            ("video_frames", "video_frames.parquet"),
            ("quantity_quantiles", "quantity_quantiles.parquet"),
            ("distinct_custkeys_cpc", "distinct_custkeys_cpc.parquet"),
            ("sig_distance_quantiles", "sig_distance_quantiles.parquet"),
            ("bbit_jaccard", "bbit_jaccard.parquet"),
            ("streaming_dedup", "streaming_dedup.parquet"),
            ("streaming_dedup_resumed", "streaming_dedup_resumed.parquet"),
            ("icws_jaccard", "icws_jaccard.parquet"),
            ("source_overlap", "source_overlap.parquet"),
            ("window_distinct_users", "window_distinct_users.parquet"),
            ("fd_spectrum", "fd_spectrum.parquet"),
            ("cm_heavy_tokens", "cm_heavy_tokens.parquet"),
            ("fd_label_spectra", "fd_label_spectra.parquet"),
            ("source_unique_grams", "source_unique_grams.parquet"),
            ("stratified_sample", "stratified_sample.parquet"),
            ("semantic_dedup", "semantic_dedup.parquet"),
            ("quantile_filter", "quantile_filter.parquet"),
            ("rerank_topk", "rerank_topk.parquet"),
            ("events_distinct_users", "events_distinct_users.parquet"),
            ("events_value_quantiles", "events_value_quantiles.parquet"),
            ("cdc_dedup", "cdc_dedup.parquet"),
        )
    }
    if all(os.path.exists(p) for p in paths.values()):
        return set(paths)
    try:
        tbl = pq.read_table(f"{_ORACLE_SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    except Exception:
        return set()
    from raydedup.config import DedupConfig
    from raydedup.ops.multimodal import (
        AudioFeatureStage,
        DecodeImageStage,
        SampleFramesStage,
        explode_features,
        frame_fingerprints,
        synth_audio_table,
        synth_image_table,
        synth_png_table,
        synth_video_table,
    )
    from raydedup.ops.simhash import simhash_batch_fn
    from raydedup.ops.text_stats import fingerprint
    from raydedup.pipeline.reference import verified_metrics
    from raydedup.sketches.aggregates import _column_hashes, tdigest_column_det
    from raydedup.sketches.cpc import CpcSketch, cpc_union
    from raydedup.sketches.kll import kll_column_det

    os.makedirs(_ORACLE_SIDECAR_DIR, exist_ok=True)
    outputs: dict[str, pa.Table] = {
        "fingerprints": fingerprint(tbl, "doc_id"),
        "simhash_pairs": simhash_batch_fn(tbl, id_column="doc_id"),
        "audio_features": AudioFeatureStage(mode="fake", frame_len=400)(
            synth_audio_table(200, seed=42)
        ),
        "image_features": explode_features(
            DecodeImageStage(mode="fake")(synth_image_table(500, seed=42))
        ),
        "video_frames": frame_fingerprints(
            SampleFramesStage(k=4, mode="fake")(synth_video_table(300, seed=42))
        ),
        # REAL pixel ground truth: the same built-in PNG decode kernel
        # over the same planted payloads, one process
        "png_features": explode_features(
            DecodeImageStage(mode="real")(synth_png_table(120, seed=7))
        ),
    }

    # cdc_dedup twin: independent hash formulation + raw-bytes chunk
    # identity, sequential (doc_id, offset) walk (ops/cdc.py docstring)
    from raydedup.ops.cdc import cdc_dedup_local

    tbl_src = pq.read_table(
        f"{_ORACLE_SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    outputs["cdc_dedup"] = cdc_dedup_local(tbl_src, "doc_id")

    # streaming_dedup twin: the sequential dict-walk service replay
    # (state/lsh_index.py::streaming_dedup_local) over the SAME
    # micro-batches in the SAME stream order; signatures come from a
    # one-process SignatureStage run (per-doc deterministic), so a
    # green row covers the sharded-actor routing, probe/commit
    # atomicity and the vectorized best-match reduction.
    from raydedup.pipeline.lsh import SignatureStage as _SigStage
    from raydedup.state.lsh_index import streaming_dedup_local

    _scfg = DedupConfig()
    _urls_sd = pc.binary_join_element_wise(
        "https://synth.local/doc/", pc.cast(tbl["doc_id"], pa.string()), ""
    )
    _sd_tbl = _SigStage(_scfg)(pa.table({"url": _urls_sd, "text": tbl["text"]}))
    _sd_urls = _sd_tbl["url"].to_pylist()
    _sd_sig = (
        _sd_tbl["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, _scfg.num_perms)
    _sd_band = (
        _sd_tbl["band_hash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, _scfg.bands)
    _sd_ids = np.array([int(u.rsplit("/", 1)[1]) for u in _sd_urls], dtype=np.int64)
    _sd_o = np.argsort(_sd_ids, kind="stable")
    _sd_urls = [_sd_urls[i] for i in _sd_o]
    _sd_sig, _sd_band = _sd_sig[_sd_o], _sd_band[_sd_o]
    _sd_batches = []
    for s0 in range(0, len(_sd_urls), 100):
        u = _sd_urls[s0 : s0 + 100]
        bm = _sd_band[s0 : s0 + 100]
        dok = np.repeat(np.arange(len(u), dtype=np.int64), _scfg.bands)
        _sd_batches.append((u, bm.reshape(-1).view(np.int64), dok, _sd_sig[s0 : s0 + 100]))
    _sd_dup, _sd_match = streaming_dedup_local(_sd_batches, min_agree=0.8, max_key_group=64)
    outputs["streaming_dedup"] = pa.table(
        {
            "url": pa.array(_sd_urls, pa.string()),
            "is_dup": pa.array(_sd_dup),
            "match_url": pa.array(_sd_match.tolist(), pa.string()),
        }
    ).sort_by("url")
    # the resumed run's contract is identity with the uninterrupted twin
    outputs["streaming_dedup_resumed"] = outputs["streaming_dedup"]

    # icws_jaccard twin: same deterministic kernels (tf fold + ICWS
    # segment-min sampling), ONE process over the same augmented
    # corpus — fmix64 randomness makes the distributed run value-exact
    from raydedup.ops.wjaccard import token_tf_rows as _tfr
    from raydedup.sketches.icws import icws_estimate as _ie
    from raydedup.sketches.icws import icws_signatures as _isig

    _ids0 = tbl["doc_id"].to_numpy()
    _txt = tbl["text"].combine_chunks()
    _sel = _ids0 % 5 == 0
    _selmask = pa.array(_sel)
    _edited = pc.binary_join_element_wise(
        _txt.filter(_selmask),
        pc.utf8_slice_codeunits(_txt.filter(_selmask), 0, 80),
        pa.scalar(" "),
    )
    _aug = pa.table(
        {
            "doc_id": pa.array(
                np.concatenate([_ids0, _ids0[_sel] + 100000]).astype(np.int64)
            ),
            "text": pa.concat_arrays([_txt, _edited]),
        }
    )
    _tf = _tfr(_aug, "doc_id")
    _tids = _tf["doc_id"].to_numpy(zero_copy_only=False)
    _uids, _doc_of = np.unique(_tids, return_inverse=True)
    _ordx2 = np.argsort(_doc_of, kind="stable")
    _sigm = _isig(
        _tf["tok"].to_numpy(zero_copy_only=False).view(np.uint64)[_ordx2],
        _tf["tf"].to_numpy(zero_copy_only=False).astype(np.float64)[_ordx2],
        _doc_of[_ordx2],
        len(_uids),
        num_hashes=128,
    )
    _row_of = {int(d): i for i, d in enumerate(_uids)}
    _pa_ids = np.sort(_ids0[_sel])
    _est = np.array(
        [
            float(_ie(_sigm[_row_of[int(x)]], _sigm[_row_of[int(x) + 100000]]))
            for x in _pa_ids
        ]
    )
    outputs["icws_jaccard"] = pa.table(
        {
            "doc_a": pa.array(_pa_ids.astype(np.int64)),
            "doc_b": pa.array((_pa_ids + 100000).astype(np.int64)),
            "est_wj": pa.array(_est, pa.float64()),
        }
    )

    # cm_heavy_tokens twin: one-process CM over the same token stream
    # + exact counts via np.unique; split-invariance of the count
    # matrix makes the comparison value-exact
    from raydedup.sketches.countmin import CountMinSketch

    toks = _tokens_of(tbl["text"])
    cm_tw = CountMinSketch(5, 2048).update(toks)
    tv = toks.to_numpy(zero_copy_only=False)
    uw, uc = np.unique(tv, return_counts=True)
    ordx = np.lexsort((uw, -uc))[:20]
    words_tw = pa.array([str(w) for w in uw[ordx]], pa.string())
    outputs["cm_heavy_tokens"] = pa.table(
        {
            "word": words_tw,
            "n_exact": pa.array(uc[ordx].astype(np.int64)),
            "cm_est": pa.array(cm_tw.estimate(words_tw).astype(np.int64)),
            "rank": pa.array(np.arange(1, len(ordx) + 1, dtype=np.int64)),
        }
    )

    # fd_spectrum twin: same canonical-order Frequent Directions walk
    # (bucket -> in-bucket id order -> ascending-bucket fold), one
    # process (ops/fd_embed.py docstring states the contract)
    from raydedup.ops.fd_embed import fd_spectrum_local

    embt_fd = pq.read_table(
        f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    outputs["fd_spectrum"] = fd_spectrum_local(embt_fd, ell=16, n_buckets=8, top=16)

    from raydedup.ops.fd_embed import fd_group_spectra_local

    embt_fdg = pq.read_table(
        f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    outputs["fd_label_spectra"] = fd_group_spectra_local(embt_fdg, "label", ell=8, top=4)

    # source_overlap twin: per-source from_hashes over ALL distinct
    # grams in one process (ops/overlap.py docstring proves the
    # distributed union-of-partials is bit-identical)
    from raydedup.ops.overlap import source_overlap_local

    outputs["source_overlap"] = source_overlap_local(tbl_src, k=5, lg_k=12)

    from raydedup.ops.overlap import source_unique_grams_local

    outputs["source_unique_grams"] = source_unique_grams_local(tbl_src, k=5, lg_k=12)

    embt = pq.read_table(f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    from raydedup.ops.ann import _emb_matrix
    from raydedup.ops.semdedup import semantic_dedup_local

    sem = semantic_dedup_local(
        embt["vec_id"].to_numpy(), _emb_matrix(embt, "embedding"), k=8, tau=0.45, n_iters=10
    )
    outputs["semantic_dedup"] = pa.Table.from_pandas(sem, preserve_index=False)

    # rerank_topk twin: same retrieve (f32 cosine, ties by vec_id) and
    # same scoring kernel (seeded bilinear W, round-6 f64), one process.
    from raydedup.ops.ann import _normalize
    from raydedup.ops.rerank import cross_scorer_weights, score_pairs

    eids = embt["vec_id"].to_numpy()
    E = np.ascontiguousarray(_emb_matrix(embt, "embedding"), dtype=np.float32)
    qsel = np.argsort(eids)[: np.count_nonzero(eids < 5)]
    qsel = qsel[eids[qsel] < 5]
    qm = E[qsel]
    cos = _normalize(qm) @ _normalize(E).T
    rq, rv, rs, rr = [], [], [], []
    W = cross_scorer_weights(qm.shape[1])
    for qi in range(len(qm)):
        order = np.lexsort((eids, -cos[qi]))[:10]
        s = np.round(score_pairs(np.repeat(qm[qi][None, :], 10, 0), E[order], W), 6)
        rerank = np.lexsort((eids[order], -s))
        for r, j in enumerate(rerank):
            rq.append(qi)
            rv.append(int(eids[order][j]))
            rs.append(float(s[j]))
            rr.append(r + 1)
    outputs["rerank_topk"] = pa.table(
        {
            "query_id": pa.array(rq, pa.int64()),
            "vec_id": pa.array(rv, pa.int64()),
            "rerank_score": pa.array(rs, pa.float64()),
            "rerank": pa.array(rr, pa.int64()),
        }
    )

    # ivf_partitioned_topk twin: same deterministic centroids (k-means
    # over the vec_id % 7 == 0 sample in vec_id order), same probe
    # union + in-probe brute force, top-10 MEMBERSHIP, one process.
    from raydedup.ops.ann import _kmeans

    id_order = np.argsort(eids, kind="stable")
    samp_rows = id_order[eids[id_order] % 7 == 0]
    cent = _kmeans(E[samp_rows], 8, seed=42)
    q_rows = id_order[eids[id_order] < 5]
    q_n = _normalize(E[q_rows].astype(np.float32))
    probe = np.argsort(-(q_n @ cent.T), axis=1)[:, :3]
    probe_set = sorted({int(c) for row in probe for c in row})
    assign_all = np.argmax(_normalize(E) @ cent.T, axis=1).astype(np.int32)
    in_probe = np.isin(assign_all, probe_set)
    sub_ids, sub_E = eids[in_probe], _normalize(E[in_probe])
    iq, iv = [], []
    for qi in range(len(q_n)):
        sc = (sub_E @ q_n[qi]).astype(np.float64)
        top = np.lexsort((sub_ids, -sc))[:10]
        for v in sorted(sub_ids[top].tolist()):
            iq.append(qi)
            iv.append(int(v))
    outputs["ivf_partitioned_topk"] = pa.table(
        {"query_id": pa.array(iq, pa.int64()), "vec_id": pa.array(iv, pa.int64())}
    )

    pr1, _pr2 = _column_hashes(tbl["doc_id"].combine_chunks())
    outputs["stratified_sample"] = pa.table(
        {"doc_id": tbl["doc_id"], "priority": pa.array(pr1, pa.uint64())}
    )

    # events_distinct_users twin: same sparse-HLL build per group, one
    # process (split-invariant merged state, see _q_events_distinct_users)
    from raydedup.sketches.hll import HllSketch, coupons_from_hashes

    evt = pq.read_table(
        f"{_ORACLE_SF_DIR}/events.parquet", columns=["event_type", "user_id"]
    )
    et = evt["event_type"].to_numpy(zero_copy_only=False)
    uid = evt["user_id"].combine_chunks()
    h1e, h2e = _column_hashes(uid)
    names, ests = [], []
    for t in sorted(set(et)):
        mask = et == t
        slot, value = coupons_from_hashes(h1e[mask], h2e[mask])
        sk = HllSketch.sparse(12).update_coupons(slot, value)
        names.append(t)
        ests.append(int(round(sk.estimate())))
    outputs["events_distinct_users"] = pa.table(
        {
            "event_type": pa.array(names, pa.string()),
            "n_users_est": pa.array(ests, pa.int64()),
        }
    )

    # window_distinct_users twin: same sparse-HLL build per 1-day
    # window, one process (split-invariant merged state)
    evw = pq.read_table(f"{_ORACLE_SF_DIR}/events.parquet", columns=["ts", "user_id"])
    wday = pc.cast(pc.floor_temporal(evw["ts"].combine_chunks(), unit="day"), pa.int64()).to_numpy()
    uidw = evw["user_id"].combine_chunks()
    h1w, h2w = _column_hashes(uidw)
    wins, wests = [], []
    for w in np.unique(wday):
        mask = wday == w
        slot, value = coupons_from_hashes(h1w[mask], h2w[mask])
        sk = HllSketch.sparse(12).update_coupons(slot, value)
        wins.append(int(w))
        wests.append(int(round(sk.estimate())))
    outputs["window_distinct_users"] = pa.table(
        {
            "window_start": pa.array(np.array(wins, dtype="datetime64[us]")),
            "n_users_est": pa.array(wests, pa.int64()),
        }
    )

    # events_value_quantiles twin: same grouped deterministic digest
    # (value-hash buckets, per-bucket sorted build, ascending fold), one
    # process — p50/p95 per event type are bit-identical by construction.
    from raydedup.sketches.aggregates import grouped_tdigest_column_det

    evq = pq.read_table(f"{_ORACLE_SF_DIR}/events.parquet", columns=["event_type", "value"])
    tds = grouped_tdigest_column_det(
        evq["event_type"].to_numpy(zero_copy_only=False), evq["value"], n_buckets=32
    )
    outputs["events_value_quantiles"] = pa.table(
        {
            "event_type": pa.array(list(tds), pa.string()),
            "n_events": pa.array([int(t.total_weight) for t in tds.values()], pa.int64()),
            "p50": pa.array([t.quantile(0.5) for t in tds.values()], pa.float64()),
            "p95": pa.array([t.quantile(0.95) for t in tds.values()], pa.float64()),
        }
    )

    from raydedup.ops.text_stats import token_stats as _tok

    nt = _tok(tbl, "doc_id")["n_tokens"]
    td_thr = tdigest_column_det(nt, n_buckets=32).quantile(0.25)
    outputs["quantile_filter"] = pa.table({"thr": pa.array([float(td_thr)], pa.float64())})

    li = pq.read_table(f"{_ORACLE_SF_DIR}/lineitem.parquet", columns=["l_quantity"])
    td = tdigest_column_det(li["l_quantity"], n_buckets=32)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    outputs["quantity_quantiles"] = pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array([td.quantile(q) for q in qs], pa.float64()),
        }
    )

    ok = pq.read_table(f"{_ORACLE_SF_DIR}/orders.parquet", columns=["o_custkey"])
    h1, h2 = _column_hashes(ok["o_custkey"].combine_chunks())
    cpc_est = cpc_union([CpcSketch(11).update_hashes(h1, h2)]).estimate()
    outputs["distinct_custkeys_cpc"] = pa.table(
        {"n_distinct_est": pa.array([float(cpc_est)], pa.float64())}
    )

    urls = pc.binary_join_element_wise(
        "https://synth.local/doc/", pc.cast(tbl["doc_id"], pa.string()), ""
    )
    metrics = verified_metrics(
        pa.table({"url": urls, "text": tbl["text"]}), DedupConfig(), n_buckets=32
    )
    if metrics is not None:  # None = hot-band salting could differ; skip
        dist = pa.array(1.0 - metrics["jaccard_sig_est"].to_numpy(), pa.float64())
        sk = kll_column_det(dist, n_buckets=32)
        sq = [0.1, 0.25, 0.5, 0.75, 0.9]
        outputs["sig_distance_quantiles"] = pa.table(
            {
                "q": pa.array(sq, pa.float64()),
                "sig_distance": pa.array([float(sk.quantile(q)) for q in sq], pa.float64()),
            }
        )

        # bbit_jaccard twin: same signatures (per-doc deterministic),
        # same 1-bit fold + estimator, over the replay's pair set
        from raydedup.ops.bbit import _popcount_u64, _sig_matrix, fold_sig_bits
        from raydedup.pipeline.lsh import SignatureStage

        cfg = DedupConfig()
        sig_tbl = SignatureStage(cfg)(pa.table({"url": urls, "text": tbl["text"]}))
        words = fold_sig_bits(_sig_matrix(sig_tbl["sig"], cfg.num_perms))
        pos = {u: i for i, u in enumerate(sig_tbl["url"].to_pylist())}
        ia = np.array([pos[u] for u in metrics["url_a"]], dtype=np.int64)
        ib = np.array([pos[u] for u in metrics["url_b"]], dtype=np.int64)
        x = ~(words[ia] ^ words[ib])
        agree = _popcount_u64(x)
        j = np.maximum(2.0 * (agree / float(cfg.num_perms)) - 1.0, 0.0)
        bb = pa.table(
            {
                "url_a": pa.array(list(metrics["url_a"]), pa.string()),
                "url_b": pa.array(list(metrics["url_b"]), pa.string()),
                "agree_bits": pa.array(agree, pa.int64()),
                "j_b1": pa.array(j, pa.float64()),
            }
        )
        outputs["bbit_jaccard"] = bb.sort_by([("url_a", "ascending"), ("url_b", "ascending")])

    for name, out in outputs.items():
        tmp = paths[name] + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, paths[name])
    return set(outputs)


def _threshold_sweep_sql(thresholds=(0.8, 0.85, 0.9, 0.95)) -> str:
    """Per threshold: brute-force exact-Jaccard pairs + recursive-CTE
    connected components (the dedup_assignments oracle's derivation),
    aggregated to the sweep's count columns; UNION ALL over
    thresholds."""
    blocks = []
    for thr in thresholds:
        blocks.append(
            f"""
            SELECT {thr} AS threshold,
                   (SELECT CAST(count(*) AS BIGINT) FROM p{int(thr * 100)}) AS n_dup_pairs,
                   CAST(count(DISTINCT l) AS BIGINT) AS n_clusters,
                   CAST(count(*) AS BIGINT) AS n_dup_docs,
                   (SELECT CAST(count(*) AS BIGINT) FROM documents)
                     - count(*) + count(DISTINCT l) AS n_keepers
            FROM lab{int(thr * 100)}
            """
        )
    ctes = ["""
            words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            )"""]
    for thr in thresholds:
        t = int(thr * 100)
        ctes.append(
            f"""
            p{t} AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {thr}
            ), e{t} AS (
              SELECT ua AS src, ub AS dst FROM p{t}
              UNION ALL SELECT ub, ua FROM p{t}
            ), cc{t}(node, label) AS (
              SELECT ua, ua FROM p{t} UNION SELECT ub, ub FROM p{t}
              UNION
              SELECT e.dst, cc.label FROM e{t} e JOIN cc{t} cc ON cc.node = e.src
            ), lab{t} AS (
              SELECT node, min(label) AS l FROM cc{t} GROUP BY node
            )"""
        )
    return (
        "WITH RECURSIVE "
        + ",".join(ctes)
        + " SELECT * FROM ("
        + " UNION ALL ".join(blocks)
        + ") ORDER BY threshold"
    )


def oracle_sql() -> dict[str, str]:
    sidecars = _ensure_oracle_sidecars()
    candidates: dict[str, str] = {
        "fingerprints": f"""
            SELECT doc_id, fingerprint
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/fingerprints.parquet')
            ORDER BY doc_id
        """,
        "audio_features": f"""
            SELECT audio_id, frame_idx, rms, zero_cross
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/audio_features.parquet')
            ORDER BY audio_id, frame_idx
        """,
        "image_features": f"""
            SELECT image_id, feat_idx, value
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/image_features.parquet')
            ORDER BY image_id, feat_idx
        """,
        "png_features": f"""
            SELECT image_id, feat_idx, value
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/png_features.parquet')
            ORDER BY image_id, feat_idx
        """,
        "ivf_partitioned_topk": f"""
            SELECT query_id, vec_id
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/ivf_partitioned_topk.parquet')
            ORDER BY query_id, vec_id
        """,
        "video_frames": f"""
            SELECT video_id, frame_idx, frame_fp
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/video_frames.parquet')
            ORDER BY video_id, frame_idx
        """,
        "quantity_quantiles": f"""
            SELECT q, value
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/quantity_quantiles.parquet')
            ORDER BY q
        """,
        "distinct_custkeys_cpc": f"""
            SELECT n_distinct_est
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/distinct_custkeys_cpc.parquet')
        """,
        "sig_distance_quantiles": f"""
            SELECT q, sig_distance
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/sig_distance_quantiles.parquet')
            ORDER BY q
        """,
        "simhash_pairs": f"""
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/simhash.parquet') a
            JOIN read_parquet('{_ORACLE_SIDECAR_DIR}/simhash.parquet') b
              ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY id_a, id_b
        """,
        "events_distinct_users": f"""
            SELECT event_type, n_users_est
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/events_distinct_users.parquet')
            ORDER BY event_type
        """,
        "events_value_quantiles": f"""
            SELECT event_type, n_events, p50, p95
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/events_value_quantiles.parquet')
            ORDER BY event_type
        """,
        "rerank_topk": f"""
            SELECT query_id, vec_id, rerank_score, rerank
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/rerank_topk.parquet')
            ORDER BY query_id, rerank
        """,
        "quantile_filter": f"""
            WITH t AS (
              SELECT thr FROM read_parquet('{_ORACLE_SIDECAR_DIR}/quantile_filter.parquet')
            ), s AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            )
            SELECT s.doc_id, s.n_tokens FROM s, t
            WHERE CAST(s.n_tokens AS DOUBLE) >= t.thr
            ORDER BY doc_id
        """,
        "semantic_dedup": f"""
            SELECT vec_id, cluster, sim_centroid, keep
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/semantic_dedup.parquet')
            ORDER BY vec_id
        """,
        "stratified_sample": f"""
            WITH pr AS (
              SELECT doc_id, priority
              FROM read_parquet('{_ORACLE_SIDECAR_DIR}/stratified_sample.parquet')
            ), r AS (
              SELECT d.lang, d.doc_id,
                     row_number() OVER (PARTITION BY d.lang
                                        ORDER BY pr.priority, d.doc_id) AS rn
              FROM documents d JOIN pr USING (doc_id)
            )
            SELECT lang, doc_id, CAST(rn AS BIGINT) AS sample_rank
            FROM r WHERE rn <= 20 ORDER BY lang, sample_rank
        """,
        "shuffle_order": f"""
            WITH pr AS (
              SELECT doc_id, priority
              FROM read_parquet('{_ORACLE_SIDECAR_DIR}/stratified_sample.parquet')
            )
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY priority, doc_id) - 1 AS BIGINT)
                     AS shuffle_rank
            FROM pr ORDER BY doc_id
        """,
        "mix_sources": f"""
            WITH pr AS (
              SELECT doc_id, priority
              FROM read_parquet('{_ORACLE_SIDECAR_DIR}/stratified_sample.parquet')
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN pr USING (doc_id)
            WHERE CASE d.source {" ".join(
                f"WHEN '{s}' THEN " + (
                    "TRUE" if r >= 1.0 else "FALSE" if r <= 0.0
                    else f"pr.priority < {int(r * (1 << 64))}::UBIGINT"
                )
                for s, r in sorted(_MIX_RATES.items())
            )} ELSE FALSE END
            ORDER BY source, doc_id
        """,
        "weighted_sample": f"""
            WITH pr AS (
              SELECT doc_id, priority
              FROM read_parquet('{_ORACLE_SIDECAR_DIR}/stratified_sample.parquet')
            ), sel AS (
              SELECT d.doc_id, d.n_chars
              FROM documents d JOIN pr USING (doc_id)
              WHERE d.n_chars > 0
              ORDER BY ln((CAST(pr.priority AS DOUBLE) + 0.5)
                          / 18446744073709551616.0) / d.n_chars DESC,
                       d.doc_id
              LIMIT 25
            )
            SELECT doc_id, n_chars FROM sel ORDER BY doc_id
        """,
        "cdc_dedup": f"""
            SELECT source, n_chunks, n_dup_chunks, total_bytes, dup_bytes,
                   dup_ratio
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/cdc_dedup.parquet')
            ORDER BY source
        """,
        "bbit_jaccard": f"""
            SELECT url_a, url_b, agree_bits, j_b1
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/bbit_jaccard.parquet')
            ORDER BY url_a, url_b
        """,
        "streaming_dedup": f"""
            SELECT url, is_dup, match_url
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/streaming_dedup.parquet')
            ORDER BY url
        """,
        "streaming_dedup_resumed": f"""
            SELECT url, is_dup, match_url
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/streaming_dedup_resumed.parquet')
            ORDER BY url
        """,
        "source_overlap": f"""
            SELECT source_a, source_b, jaccard_est
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/source_overlap.parquet')
            ORDER BY source_a, source_b
        """,
        "window_distinct_users": f"""
            SELECT window_start, n_users_est
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/window_distinct_users.parquet')
            ORDER BY window_start
        """,
        "fd_spectrum": f"""
            SELECT rank, sigma
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/fd_spectrum.parquet')
            ORDER BY rank
        """,
        "cm_heavy_tokens": f"""
            SELECT word, n_exact, cm_est, rank
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/cm_heavy_tokens.parquet')
            ORDER BY rank
        """,
        "fd_label_spectra": f"""
            SELECT label, rank, sigma
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/fd_label_spectra.parquet')
            ORDER BY label, rank
        """,
        "source_unique_grams": f"""
            SELECT source, n_unique_est
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/source_unique_grams.parquet')
            ORDER BY source
        """,
        "token_budget_sample": f"""
            WITH pr AS (
              SELECT doc_id, priority
              FROM read_parquet('{_ORACLE_SIDECAR_DIR}/stratified_sample.parquet')
            ), tok AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tokens
              FROM documents
            ), c AS (
              SELECT t.doc_id, t.source,
                     CAST(sum(t.n_tokens) OVER (
                       PARTITION BY t.source
                       ORDER BY pr.priority, t.doc_id) AS DOUBLE) AS cum_tokens
              FROM tok t JOIN pr USING (doc_id)
            )
            SELECT doc_id, source, cum_tokens
            FROM c WHERE cum_tokens <= {_TOKEN_BUDGET} ORDER BY doc_id
        """,
    }
    # mix_sources and shuffle_order share the stratified_sample sidecar
    # (same doc_id -> murmur3 priority table)
    if "stratified_sample" in sidecars:
        sidecars = sidecars | {
            "mix_sources",
            "shuffle_order",
            "weighted_sample",
            "token_budget_sample",
        }
    extra = {name: sql for name, sql in candidates.items() if name in sidecars}
    _vals = ", ".join(
        f"({i}, TIMESTAMP '{lo:%Y-%m-%d}', TIMESTAMP '{hi:%Y-%m-%d}')"
        for i, lo, hi in _promo_windows()
    )
    extra["dedup_threshold_sweep"] = _threshold_sweep_sql()
    extra["promo_revenue"] = f"""
        WITH r(range_id, lo, hi) AS (VALUES {_vals})
        SELECT CAST(range_id AS BIGINT) AS range_id,
               round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o JOIN r ON o.o_orderdate BETWEEN r.lo AND r.hi
        GROUP BY range_id ORDER BY range_id
    """
    return extra | {
        "soft_dedup_weights": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p
              UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT url, url FROM words
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            ), a AS (
              SELECT node AS url, min(label) AS cluster_id FROM cc GROUP BY node
            )
            SELECT url,
                   CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                     AS cluster_size,
                   1.0 / count(*) OVER (PARTITION BY cluster_id) AS weight
            FROM a ORDER BY url
        """,
        "stitch_shards": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 300000, substr(text, 1, (len(text) // 2) + 48)
              FROM documents WHERE doc_id % 5 = 0 AND len(text) >= 120
              UNION ALL
              SELECT doc_id + 400000, substr(text, (len(text) // 2) + 1)
              FROM documents WHERE doc_id % 5 = 0 AND len(text) >= 120
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM corpus a JOIN corpus b
              ON a.doc_id <> b.doc_id
             AND right(a.text, 48) = left(b.text, 48)
            WHERE len(a.text) >= 48 AND len(b.text) >= 48
            ORDER BY id_a, id_b
        """,
        "template_prefixes": r"""
            WITH n AS (
              SELECT substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 64) AS prefix
              FROM documents
            )
            SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs
            FROM n GROUP BY prefix HAVING count(*) > 1
            ORDER BY prefix
        """,
        "containment_search": r"""
            WITH q AS (
              SELECT doc_id AS qid, substr(text, 1, 150) AS text
              FROM documents WHERE doc_id % 50 = 0
            ), qw AS (
              SELECT qid, list_filter(string_split_regex(lower(text), '\s+'),
                                      w -> len(w) > 0) AS w
              FROM q
            ), qs AS (
              SELECT qid, list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM qw WHERE len(w) > 0
            ), dw AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         w -> len(w) > 0) AS w
              FROM documents
            ), ds AS (
              SELECT doc_id, list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM dw WHERE len(w) > 0
            )
            SELECT qs.qid, ds.doc_id,
                   len(list_intersect(qs.s, ds.s))::DOUBLE / len(qs.s) AS containment
            FROM qs JOIN ds
              ON len(list_intersect(qs.s, ds.s))::DOUBLE / len(qs.s) >= 0.5
            ORDER BY qid, doc_id
        """,
        "rrf_fusion": r"""
            WITH w AS (
              SELECT doc_id, word FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                FROM documents
              ) raw WHERE word <> ''
            ), dl AS (
              SELECT d.doc_id, count(w.word) AS dl
              FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
              GROUP BY d.doc_id
            ), stats AS (
              SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl
            ), q(term) AS (VALUES ('hash'), ('join'), ('vector'), ('spark')),
            btf AS (
              SELECT doc_id, word AS term, count(*) AS tf FROM w
              WHERE word IN ('hash', 'join', 'vector', 'spark')
              GROUP BY doc_id, word
            ), dfq AS (
              SELECT q.term, count(DISTINCT btf.doc_id) AS df
              FROM q LEFT JOIN btf USING (term) GROUP BY q.term
            ), contrib AS (
              SELECT btf.doc_id,
                     ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                       * btf.tf * (1.2 + 1)
                       / (btf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                          / (CAST(stats.sum_dl AS DOUBLE) / stats.n))) AS c
              FROM btf JOIN dfq USING (term) JOIN dl USING (doc_id)
              CROSS JOIN stats
            ), bscore AS (
              SELECT doc_id, round(sum(c), 6) AS s FROM contrib GROUP BY doc_id
            ), brank AS (
              SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
              FROM bscore QUALIFY r <= 50
            ), tterm AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                          x -> len(x) > 0)) AS term
                FROM documents
              ) GROUP BY doc_id, term
            ), tdf AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df FROM tterm GROUP BY term
            ), tn AS (SELECT count(*) AS n FROM documents),
            tscore AS (
              SELECT t.doc_id,
                     sum(round(t.tf * ln(CAST(tn.n AS DOUBLE) / d.df), 6)) AS s
              FROM tterm t JOIN tdf d USING (term), tn
              WHERE t.term IN ('hash', 'join', 'vector', 'spark')
              GROUP BY t.doc_id
            ), trank AS (
              SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
              FROM tscore QUALIFY r <= 50
            ), u AS (
              SELECT doc_id, 1.0 / (60 + r) AS c FROM brank
              UNION ALL
              SELECT doc_id, 1.0 / (60 + r) FROM trank
            )
            SELECT doc_id, round(sum(c), 6) AS rrf_score
            FROM u GROUP BY doc_id
            ORDER BY rrf_score DESC, doc_id LIMIT 10
        """,
        "wjaccard_pairs": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     text || ' ' || substr(text, 1, 80) AS text
              FROM documents WHERE doc_id % 5 = 0
            ), tok AS (
              SELECT doc_id, w AS token, CAST(count(*) AS BIGINT) AS tf
              FROM corpus,
                   unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> len(x) > 0)) AS t(w)
              GROUP BY doc_id, w
            ), pairs AS (
              SELECT doc_id AS a, doc_id + 100000 AS b
              FROM documents WHERE doc_id % 5 = 0
            ), sided AS (
              SELECT p.a, p.b, t.token, t.tf, 0 AS side
              FROM pairs p JOIN tok t ON t.doc_id = p.a
              UNION ALL
              SELECT p.a, p.b, t.token, t.tf, 1
              FROM pairs p JOIN tok t ON t.doc_id = p.b
            ), m AS (
              SELECT a, b, token,
                     coalesce(sum(CASE WHEN side = 0 THEN tf END), 0) AS fa,
                     coalesce(sum(CASE WHEN side = 1 THEN tf END), 0) AS fb
              FROM sided GROUP BY a, b, token
            )
            SELECT a AS doc_a, b AS doc_b,
                   CAST(sum(least(fa, fb)) AS DOUBLE)
                     / sum(greatest(fa, fb)) AS w_jaccard
            FROM m GROUP BY a, b ORDER BY doc_a, doc_b
        """,
        "icws_jaccard": f"""
            SELECT doc_a, doc_b, est_wj
            FROM read_parquet('{_ORACLE_SIDECAR_DIR}/icws_jaccard.parquet')
            ORDER BY doc_a, doc_b
        """,
        "source_datasheet": r"""
            WITH t AS (
              SELECT source, lang, length(text) AS n_chars,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
              FROM documents
            ), agg AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                     avg(n_chars) AS mean_chars,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
              FROM t GROUP BY source
            ), lc AS (
              SELECT source, lang, count(*) AS cnt FROM t GROUP BY source, lang
            ), top AS (
              SELECT source, lang AS top_lang,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY cnt DESC, lang) AS rn
              FROM lc
            )
            SELECT a.source, a.n_docs, a.total_tokens, a.mean_chars,
                   a.n_langs, top.top_lang
            FROM agg a JOIN top ON top.source = a.source AND top.rn = 1
            ORDER BY a.source
        """,
        "lsh_plan": r"""
            WITH splits(bands, rows_pb) AS (
              VALUES (128,1),(64,2),(32,4),(16,8),(8,16),(4,32),(2,64),(1,128)
            ), th(threshold) AS (
              VALUES (0.7),(0.8),(0.9)
            ), grid AS (
              SELECT i FROM generate_series(0, 511) AS g(i)
            ), lo AS (
              SELECT t.threshold, s.bands, s.rows_pb, g.i,
                     1 - power(1 - power(t.threshold * g.i / 511.0, s.rows_pb), s.bands) AS p
              FROM th t CROSS JOIN splits s CROSS JOIN grid g
            ), fp AS (
              SELECT threshold, bands, rows_pb,
                     sum(CASE WHEN i = 0 OR i = 511 THEN p / 2 ELSE p END)
                       * (threshold / 511.0) AS fp_area
              FROM lo GROUP BY threshold, bands, rows_pb
            ), hi AS (
              SELECT t.threshold, s.bands, s.rows_pb, g.i,
                     power(1 - power(t.threshold + (1 - t.threshold) * g.i / 511.0,
                                     s.rows_pb), s.bands) AS q
              FROM th t CROSS JOIN splits s CROSS JOIN grid g
            ), fn AS (
              SELECT threshold, bands, rows_pb,
                     sum(CASE WHEN i = 0 OR i = 511 THEN q / 2 ELSE q END)
                       * ((1 - threshold) / 511.0) AS fn_area
              FROM hi GROUP BY threshold, bands, rows_pb
            )
            SELECT fp.threshold, CAST(fp.bands AS BIGINT) AS bands,
                   CAST(fp.rows_pb AS BIGINT) AS rows_pb,
                   fp.fp_area, fn.fn_area,
                   (0.2 * fp.fp_area + 0.8 * fn.fn_area)
                     = min(0.2 * fp.fp_area + 0.8 * fn.fn_area)
                       OVER (PARTITION BY fp.threshold) AS chosen,
                   'oph' AS sig_mode
            FROM fp JOIN fn USING (threshold, bands, rows_pb)
            ORDER BY threshold, rows_pb
        """,
        "y4m_frames": r"""
            WITH vids AS (
              SELECT i AS video_id, 8 + i % 5 AS f
              FROM generate_series(0, 47) AS t(i)
            ), fr AS (
              SELECT v.video_id, g.j AS frame_idx,
                     CAST((3 * v.video_id + 5 * g.j) % 256 AS DOUBLE) AS y,
                     CAST((7 * v.video_id + g.j) % 256 AS DOUBLE) AS u,
                     CAST((11 * v.video_id + 2 * g.j) % 256 AS DOUBLE) AS w
              FROM vids v JOIN generate_series(0, 11) AS g(j) ON g.j < v.f
            )
            SELECT video_id, frame_idx,
                   CAST(LEAST(255, GREATEST(0,
                     FLOOR(y + 1.402 * (w - 128) + 0.5))) AS BIGINT) AS r,
                   CAST(LEAST(255, GREATEST(0,
                     FLOOR(y - 0.344136 * (u - 128) - 0.714136 * (w - 128) + 0.5))) AS BIGINT) AS g,
                   CAST(LEAST(255, GREATEST(0,
                     FLOOR(y + 1.772 * (u - 128) + 0.5))) AS BIGINT) AS b
            FROM fr
            ORDER BY video_id, frame_idx
        """,
        "mirror_hosts": r"""
            WITH corpus AS (
              SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) AS host, text
              FROM documents
              UNION ALL
              SELECT 'm' || CAST(doc_id % 2 AS VARCHAR) AS host, text
              FROM documents WHERE doc_id % 3 = 0
            ), h AS (
              SELECT DISTINCT host, text FROM corpus
            )
            SELECT a.host AS host_a, b.host AS host_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM h a JOIN h b ON a.text = b.text AND a.host < b.host
            GROUP BY a.host, b.host
            HAVING count(*) >= 2
            ORDER BY host_a, host_b
        """,
        "snm_dup_pairs": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     substr(text, 1, 40) || 'qq' || substr(text, 43) AS text
              FROM documents WHERE doc_id % 5 = 0
            ), k AS (
              SELECT doc_id,
                     substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 48) AS key
              FROM corpus
            ), r AS (
              SELECT doc_id, key,
                     row_number() OVER (ORDER BY key, doc_id) AS rnk
              FROM k
            )
            SELECT least(a.doc_id, b.doc_id) AS doc_a,
                   greatest(a.doc_id, b.doc_id) AS doc_b,
                   CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
            FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk - a.rnk <= 5
            WHERE levenshtein(a.key, b.key) <= 4
            ORDER BY doc_a, doc_b
        """,
        "normalized_dedup": r"""
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents
            )
            SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
            FROM n GROUP BY t ORDER BY doc_id
        """,
        "events_debounce": r"""
            WITH e AS (
              SELECT event_id, user_id, event_type, ts,
                     lag(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS p
              FROM events
            )
            SELECT event_id, user_id, event_type, ts
            FROM e
            WHERE p IS NULL OR ts - p > INTERVAL 21600 SECOND
            ORDER BY event_id
        """,
        "gram_novelty": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' ')))) AS g
              FROM words WHERE len(w) > 0
            ), m AS (
              SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
            )
            SELECT sh.doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN m.first_doc < sh.doc_id
                                 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
                   CAST(sum(CASE WHEN m.first_doc < sh.doc_id
                                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                     AS dup_frac
            FROM sh JOIN m USING (g)
            GROUP BY sh.doc_id ORDER BY doc_id
        """,
        "dup_ratio_by_source": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p
              UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT url, url FROM words
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            ), a AS (
              SELECT node AS url, min(label) AS cluster_id FROM cc GROUP BY node
            )
            SELECT d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN a.cluster_id <> a.url
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                   CAST(sum(CASE WHEN a.cluster_id <> a.url
                                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                     AS dup_ratio
            FROM a
            JOIN words w ON w.url = a.url
            JOIN documents d ON d.doc_id = w.doc_id
            GROUP BY d.source ORDER BY d.source
        """,
        "tiered_dedup": r"""
            WITH RECURSIVE corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text
              FROM documents WHERE doc_id % 7 = 0
            ), t1 AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keeper1
              FROM corpus
            ), s1 AS (
              SELECT c.doc_id, c.text FROM corpus c
              JOIN t1 ON t1.doc_id = c.doc_id WHERE t1.keeper1 = c.doc_id
            ), words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM s1
            ), sh AS (
              SELECT doc_id, list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.doc_id AS ua, b.doc_id AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT doc_id, doc_id FROM s1
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            ), t2 AS (
              SELECT node AS doc_id, min(label) AS keeper2 FROM cc GROUP BY node
            ), s2 AS (
              SELECT doc_id FROM t2 WHERE keeper2 = doc_id
            ), ep AS (
              SELECT a.vec_id AS ua, b.vec_id AS ub
              FROM embeddings a
              JOIN s2 sa ON sa.doc_id = a.vec_id
              JOIN embeddings b ON a.vec_id < b.vec_id
              JOIN s2 sb ON sb.doc_id = b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
            ), ee AS (
              SELECT ua AS src, ub AS dst FROM ep UNION ALL SELECT ub, ua FROM ep
            ), cc3(node, label) AS (
              SELECT doc_id, doc_id FROM s2
              UNION
              SELECT ee.dst, cc3.label FROM ee JOIN cc3 ON cc3.node = ee.src
            ), t3 AS (
              SELECT node AS doc_id, min(label) AS keeper3 FROM cc3 GROUP BY node
            )
            SELECT c.doc_id,
              CASE WHEN t1.keeper1 <> c.doc_id THEN 'exact'
                   WHEN t2.keeper2 IS NOT NULL AND t2.keeper2 <> c.doc_id THEN 'near'
                   WHEN t3.keeper3 IS NOT NULL AND t3.keeper3 <> c.doc_id THEN 'semantic'
                   ELSE 'kept' END AS tier,
              CASE WHEN t1.keeper1 <> c.doc_id THEN t1.keeper1
                   WHEN t2.keeper2 IS NOT NULL AND t2.keeper2 <> c.doc_id THEN t2.keeper2
                   WHEN t3.keeper3 IS NOT NULL AND t3.keeper3 <> c.doc_id THEN t3.keeper3
                   ELSE c.doc_id END AS keeper_id
            FROM corpus c
            JOIN t1 ON t1.doc_id = c.doc_id
            LEFT JOIN t2 ON t2.doc_id = c.doc_id
            LEFT JOIN t3 ON t3.doc_id = c.doc_id
            ORDER BY c.doc_id
        """,
        "paragraph_dedup": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     text || ' za ' || CAST(doc_id AS VARCHAR)
                          || ' zb ' || CAST(doc_id AS VARCHAR) || ' zc' AS text
              FROM documents WHERE doc_id % 3 = 0
            ), words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 w -> len(w) > 0) AS ws
              FROM corpus
            ), chunks AS (
              SELECT doc_id, g.i AS chunk_idx,
                     array_to_string(ws[(g.i * 32 + 1):((g.i + 1) * 32)], ' ')
                       AS chunk_text
              FROM words,
                   LATERAL (SELECT unnest(range((len(ws) + 31) // 32)) AS i) g
            ), marked AS (
              SELECT doc_id,
                     CASE WHEN row_number() OVER (PARTITION BY chunk_text
                                                  ORDER BY doc_id, chunk_idx) > 1
                          THEN 1 ELSE 0 END AS is_dup
              FROM chunks
            )
            SELECT doc_id, COUNT(*) AS n_chunks,
                   CAST(SUM(is_dup) AS BIGINT) AS n_dup_chunks,
                   ROUND(SUM(is_dup) * 1.0 / COUNT(*), 6) AS dup_frac
            FROM marked GROUP BY doc_id ORDER BY doc_id
        """,
        "pii_redact": r"""
            WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@mail.example.com ip 10.0.'
                          || CAST(doc_id % 256 AS VARCHAR)
                          || '.7 call +1-555-000-0'
                          || CAST(doc_id % 10 AS VARCHAR) AS text
              FROM documents
            ), s1 AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                       AS n_email,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS text
              FROM aug
            ), s2 AS (
              SELECT doc_id, n_email,
                     CAST(len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
                     regexp_replace(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text
              FROM s1
            ), s3 AS (
              SELECT doc_id, n_email, n_ip,
                     CAST(len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d')) AS BIGINT)
                       AS n_phone,
                     regexp_replace(text, '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS text
              FROM s2
            )
            SELECT doc_id, n_email, n_ip, n_phone, text AS clean_text
            FROM s3 ORDER BY doc_id
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "token_stats": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "partitioned_docs": """
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "top_words_per_source": r"""
            WITH words AS (
              SELECT source,
                     unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        w -> len(w) > 0)) AS word
              FROM documents
            ), c AS (
              SELECT source, word, CAST(count(*) AS BIGINT) AS n
              FROM words GROUP BY 1, 2
            ), r AS (
              SELECT source, word, n,
                     CAST(row_number() OVER (
                       PARTITION BY source ORDER BY n DESC, word) AS BIGINT)
                       AS rank
              FROM c
            )
            SELECT source, word, n, rank FROM r
            WHERE rank <= 10 ORDER BY source, rank
        """,
        "exact_price_quantiles": r"""
            SELECT CAST(0.01 AS DOUBLE) AS q,
                   CAST(quantile_disc(l_extendedprice, 0.01) AS DOUBLE) AS value
            FROM lineitem
            UNION ALL SELECT CAST(0.25 AS DOUBLE),
                   CAST(quantile_disc(l_extendedprice, 0.25) AS DOUBLE) FROM lineitem
            UNION ALL SELECT CAST(0.5 AS DOUBLE),
                   CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) FROM lineitem
            UNION ALL SELECT CAST(0.75 AS DOUBLE),
                   CAST(quantile_disc(l_extendedprice, 0.75) AS DOUBLE) FROM lineitem
            UNION ALL SELECT CAST(0.95 AS DOUBLE),
                   CAST(quantile_disc(l_extendedprice, 0.95) AS DOUBLE) FROM lineitem
            ORDER BY q
        """,
        "substring_cut": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     text || ' zz' || CAST(doc_id AS VARCHAR) AS text
              FROM documents WHERE doc_id % 4 = 0
            ), pos AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS i,
                     substring(text, CAST(g.i + 1 AS BIGINT), 48) AS gram
              FROM corpus,
                   LATERAL (SELECT unnest(range(length(text) - 48 + 1)) AS i) g
            ), dup AS (
              SELECT gram FROM pos GROUP BY gram HAVING COUNT(*) > 1
            ), marked AS (
              SELECT p.doc_id, p.i FROM pos p JOIN dup USING (gram)
            ), gaps AS (
              SELECT doc_id,
                     LEAST(48, i - COALESCE(
                       LAG(i) OVER (PARTITION BY doc_id ORDER BY i), i - 48))
                       AS contrib
              FROM marked
            ), agg AS (
              SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS dup_chars
              FROM gaps GROUP BY doc_id
            ), isl AS (
              SELECT doc_id, i,
                     CASE WHEN i - COALESCE(
                            LAG(i) OVER (PARTITION BY doc_id ORDER BY i),
                            i - 49) > 48
                          THEN 1 ELSE 0 END AS brk
              FROM marked
            ), isl2 AS (
              SELECT doc_id, i,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
              FROM isl
            ), spans AS (
              SELECT doc_id, MIN(i) AS s, MAX(i) + 48 AS e
              FROM isl2 GROUP BY doc_id, grp
            ), segs AS (
              SELECT doc_id,
                     COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS b,
                     s AS t
              FROM spans
              UNION ALL
              SELECT doc_id, MAX(e) AS b, NULL AS t FROM spans GROUP BY doc_id
            ), clean AS (
              SELECT c.doc_id,
                     COALESCE(string_agg(
                       substring(c.text, g.b + 1,
                                 COALESCE(g.t, length(c.text)) - g.b),
                       '' ORDER BY g.b), '') AS clean_text
              FROM corpus c JOIN segs g ON c.doc_id = g.doc_id
              WHERE COALESCE(g.t, length(c.text)) > g.b
              GROUP BY c.doc_id
            )
            SELECT c.doc_id,
                   CASE WHEN cl.doc_id IS NOT NULL THEN cl.clean_text
                        WHEN a.doc_id IS NOT NULL THEN ''
                        ELSE c.text END AS clean_text,
                   COALESCE(a.dup_chars, 0) AS dup_chars
            FROM corpus c
            LEFT JOIN clean cl USING (doc_id)
            LEFT JOIN agg a USING (doc_id)
            ORDER BY c.doc_id
        """,
        "lm_score": r"""
            WITH wl AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS ws
              FROM documents
            ), uni AS (
              SELECT w, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest(ws) AS w FROM wl WHERE doc_id % 2 = 0)
              GROUP BY w
            ), tot AS (
              SELECT CAST(count(*) AS DOUBLE) AS t
              FROM (SELECT unnest(ws) AS w FROM wl WHERE doc_id % 2 = 0)
            ), bi AS (
              SELECT doc_id, ws[g.i + 1] AS w1, ws[g.i + 2] AS w2
              FROM wl, LATERAL (SELECT unnest(range(len(ws) - 1)) AS i) g
            ), bic AS (
              SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
              FROM bi WHERE doc_id % 2 = 0 GROUP BY 1, 2
            ), scored AS (
              SELECT b.doc_id,
                     ln(CASE WHEN bc.c IS NOT NULL THEN bc.c * 1.0 / u1.c
                             WHEN u2.c IS NOT NULL THEN 0.4 * u2.c / tot.t
                             ELSE 0.4 * 0.4 / tot.t END) AS lp
              FROM bi b
              LEFT JOIN bic bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
              LEFT JOIN uni u1 ON b.w1 = u1.w
              LEFT JOIN uni u2 ON b.w2 = u2.w
              CROSS JOIN tot
            ), agg AS (
              SELECT doc_id, SUM(lp) AS s, COUNT(*) AS n
              FROM scored GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(len(w.ws) AS BIGINT) AS n_words,
                   CAST(GREATEST(len(w.ws) - 1, 0) AS BIGINT) AS n_bigrams,
                   ROUND(COALESCE(a.s / a.n, 0.0), 6) AS lm_score
            FROM wl w LEFT JOIN agg a USING (doc_id)
            ORDER BY w.doc_id
        """,
        "substring_dedup": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     text || ' zz' || CAST(doc_id AS VARCHAR) AS text
              FROM documents WHERE doc_id % 4 = 0
            ), pos AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS i,
                     substring(text, CAST(g.i + 1 AS BIGINT), 48) AS gram
              FROM corpus,
                   LATERAL (SELECT unnest(range(length(text) - 48 + 1)) AS i) g
            ), dup AS (
              SELECT gram FROM pos GROUP BY gram HAVING COUNT(*) > 1
            ), marked AS (
              SELECT p.doc_id, p.i FROM pos p JOIN dup USING (gram)
            ), gaps AS (
              SELECT doc_id,
                     LEAST(48, i - COALESCE(
                       LAG(i) OVER (PARTITION BY doc_id ORDER BY i), i - 48))
                       AS contrib
              FROM marked
            ), agg AS (
              SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS dup_chars
              FROM gaps GROUP BY doc_id
            )
            SELECT c.doc_id, length(c.text) AS n_chars,
                   COALESCE(a.dup_chars, 0) AS dup_chars,
                   ROUND(COALESCE(a.dup_chars, 0) * 1.0 / length(c.text), 6)
                     AS dup_frac
            FROM corpus c LEFT JOIN agg a USING (doc_id)
            ORDER BY c.doc_id
        """,
        "tfidf": r"""
            WITH words AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        w -> len(w) > 0)) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM words GROUP BY 1, 2
            ), dfx AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
            ), n AS (
              SELECT count(*) AS n FROM documents
            )
            SELECT t.doc_id, t.term, t.tf, d.df,
                   round(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
            FROM tf t JOIN dfx d USING (term), n
            ORDER BY doc_id, term
        """,
        "pack_sequences": """
            WITH toks AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
              FROM toks
            )
            SELECT doc_id, n_tokens,
                   CAST(strt // 2048 AS BIGINT) AS pack_id,
                   CAST(strt % 2048 AS BIGINT) AS pack_pos
            FROM c ORDER BY doc_id
        """,
        "jsonl_docs": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "distinct_orderkeys_theta": """
            SELECT count(DISTINCT l_orderkey) AS n_distinct FROM lineitem
        """,
        "docs_per_source": """
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY source ORDER BY source
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "group_distinct_orders": """
            SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "events_by_type": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_users": """
            SELECT user_id, count(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY n_events DESC, user_id LIMIT 10
        """,
        "segment_revenue": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "top_parts_by_price": """
            SELECT p_partkey, p_name, p_retailprice
            FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20
        """,
        "heavy_hitter_sources": """
            SELECT source, count(*) AS n_docs
            FROM documents GROUP BY source ORDER BY source
        """,
        "top2_parts_per_brand": """
            SELECT p_brand, p_partkey, p_retailprice
            FROM part
            QUALIFY row_number() OVER (
                PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey
            ) <= 2
            ORDER BY p_brand, p_retailprice DESC, p_partkey
        """,
        "region_revenue": """
            SELECT r_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "asof_user_orders": """
            WITH o AS (
              SELECT o_custkey AS user_id, o_orderdate,
                     max(o_orderkey) AS o_orderkey
              FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, e.ts, o.o_orderdate, o.o_orderkey
            FROM events e
            ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
            ORDER BY e.event_id
        """,
        "parse_props": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "cosine_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 3) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
            ORDER BY id_a, id_b
        """,
        "events_tumbling": """
            SELECT user_id,
                   make_timestamp((epoch_us(ts) // 60000000) * 60000000) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY user_id, window_start
        """,
        "events_hopping": """
            SELECT user_id,
                   make_timestamp((epoch_us(ts) // 60000000 - j) * 60000000) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events, generate_series(0, 1) AS g(j)
            GROUP BY 1, 2 ORDER BY user_id, window_start
        """,
        "events_sessions": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS new_session
              FROM events
            ), sess AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "cumulative_spend": """
            SELECT o_custkey, o_orderdate, o_orderkey,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) / 100.0 AS running_spend
            FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey
        """,
        "rolling_user_value": """
            SELECT user_id, ts, event_id,
                   sum(CAST(round(value * 100, 0) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0
                     AS rolling_value
            FROM events ORDER BY user_id, ts, event_id
        """,
        "funnel_stages": """
            WITH u AS (
              SELECT DISTINCT user_id FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
            ), v AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
              SELECT e.user_id, min(e.ts) AS t2 FROM events e
              JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id
            ), p AS (
              SELECT e.user_id, min(e.ts) AS t3 FROM events e
              JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id
            )
            SELECT u.user_id,
                   CASE WHEN p.user_id IS NOT NULL THEN 3
                        WHEN c.user_id IS NOT NULL THEN 2
                        WHEN v.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS stage
            FROM u
            LEFT JOIN v USING (user_id)
            LEFT JOIN c USING (user_id)
            LEFT JOIN p USING (user_id)
            ORDER BY u.user_id
        """,
        "order_rank_in_cust": """
            SELECT o_custkey, o_totalprice, o_orderkey,
                   CAST(row_number() OVER w AS BIGINT) AS rnk,
                   round(percent_rank() OVER w, 6) AS pct_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_custkey, rnk
        """,
        "event_interarrival": """
            SELECT user_id, ts, event_id,
                   CAST(epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS DOUBLE) AS delta_us
            FROM events ORDER BY user_id, ts, event_id
        """,
        "customers_no_orders": """
            SELECT c_custkey,
                   EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '1998-01-01')
                     AS matched
            FROM customer ORDER BY c_custkey
        """,
        "pivot_events": """
            SELECT user_id,
        """
        + ",\n".join(
            f"""sum(CASE WHEN event_type = '{c}'
                         THEN CAST(round(value * 100, 0) AS BIGINT)
                         ELSE 0 END) / 100.0 AS {c}"""
            for c in _EVENT_TYPES
        )
        + """
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "ngram_dup_pairs": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ORDER BY doc_a, doc_b
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 5)
            SELECT qid AS query_id, e.vec_id
            FROM q CROSS JOIN embeddings e
            QUALIFY row_number() OVER (
                PARTITION BY qid
                ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id
            ) <= 10
            ORDER BY query_id, vec_id
        """,
        "regex_token_stats": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_scores": r"""
            WITH t AS (
              SELECT doc_id, text,
                     greatest(length(text), 1) AS total,
                     length(text) - length(replace(text, ' ', '')) AS ws
              FROM documents
            ), counted AS (
              SELECT doc_id, total, ws,
                     (length(text) - length(replace(text,'.','')))
                   + (length(text) - length(replace(text,',','')))
                   + (length(text) - length(replace(text,';','')))
                   + (length(text) - length(replace(text,':','')))
                   + (length(text) - length(replace(text,'!','')))
                   + (length(text) - length(replace(text,'?','')))
                   + (length(text) - length(replace(text,'"','')))
                   + (length(text) - length(replace(text,'''','')))
                   + (length(text) - length(replace(text,'(','')))
                   + (length(text) - length(replace(text,')','')))
                   + (length(text) - length(replace(text,'[','')))
                   + (length(text) - length(replace(text,']','')))
                   + (length(text) - length(replace(text,'{','')))
                   + (length(text) - length(replace(text,'}','')))
                     AS punct,
                     (length(text) - length(replace(text,'0','')))
                   + (length(text) - length(replace(text,'1','')))
                   + (length(text) - length(replace(text,'2','')))
                   + (length(text) - length(replace(text,'3','')))
                   + (length(text) - length(replace(text,'4','')))
                   + (length(text) - length(replace(text,'5','')))
                   + (length(text) - length(replace(text,'6','')))
                   + (length(text) - length(replace(text,'7','')))
                   + (length(text) - length(replace(text,'8','')))
                   + (length(text) - length(replace(text,'9','')))
                     AS digits
              FROM t
            )
            SELECT doc_id,
                   round(punct / CAST(total AS DOUBLE), 6) AS punct_ratio,
                   round(digits / CAST(total AS DOUBLE), 6) AS digit_ratio,
                   round((total - ws) / greatest(ws + 1.0, 1.0), 6) AS mean_word_len
            FROM counted ORDER BY doc_id
        """,
        "repetition_stats": r"""
            WITH w AS (
              SELECT doc_id, word, pos FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                FROM documents
              ) raw WHERE word <> ''
            ), g2 AS (
              SELECT doc_id,
                     word || ' ' || lead(word, 1) OVER win AS gram
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
            ), s2 AS (
              SELECT doc_id, count(gram) AS n, count(DISTINCT gram) AS u
              FROM g2 WHERE gram IS NOT NULL GROUP BY doc_id
            ), g3 AS (
              SELECT doc_id,
                     word || ' ' || lead(word, 1) OVER win
                          || ' ' || lead(word, 2) OVER win AS gram
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
            ), s3 AS (
              SELECT doc_id, count(gram) AS n, count(DISTINCT gram) AS u
              FROM g3 WHERE gram IS NOT NULL GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(s2.n, 0) AS n_grams_2,
                   coalesce(s2.n, 0) - coalesce(s2.u, 0) AS n_dup_grams_2,
                   round(CASE WHEN coalesce(s2.n, 0) > 0
                         THEN (s2.n - s2.u) / CAST(s2.n AS DOUBLE)
                         ELSE 0.0 END, 6) AS dup_frac_2,
                   coalesce(s3.n, 0) AS n_grams_3,
                   coalesce(s3.n, 0) - coalesce(s3.u, 0) AS n_dup_grams_3,
                   round(CASE WHEN coalesce(s3.n, 0) > 0
                         THEN (s3.n - s3.u) / CAST(s3.n AS DOUBLE)
                         ELSE 0.0 END, 6) AS dup_frac_3
            FROM documents d
            LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
            ORDER BY d.doc_id
        """,
        "incremental_dedup": r"""
            SELECT d.doc_id,
                   NOT EXISTS (SELECT 1 FROM documents b
                               WHERE b.source < 'src5' AND b.text = d.text) AS is_new
            FROM documents d WHERE d.source >= 'src5' ORDER BY d.doc_id
        """,
        "chunk_docs": r"""
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS words
              FROM documents WHERE length(trim(text)) > 0
            )
            SELECT doc_id, g.i AS chunk_idx,
                   least((g.i + 1) * 64, len(words)) - g.i * 64 AS n_words,
                   array_to_string(words[(g.i * 64 + 1):((g.i + 1) * 64)], ' ')
                     AS chunk_text
            FROM w, LATERAL (SELECT unnest(range((len(words) + 63) // 64)) AS i) g
            ORDER BY doc_id, chunk_idx
        """,
        "curation": r"""
            WITH m(lang, pri, w) AS (VALUES
              ('en',0,'the'),('en',0,'and'),('en',0,'of'),('en',0,'to'),
              ('en',0,'a'),('en',0,'in'),('en',0,'is'),('en',0,'that'),
              ('en',0,'it'),('en',0,'for'),
              ('de',1,'der'),('de',1,'die'),('de',1,'das'),('de',1,'und'),
              ('de',1,'ist'),('de',1,'nicht'),('de',1,'ein'),('de',1,'mit'),
              ('de',1,'auf'),('de',1,'von'),
              ('fr',2,'le'),('fr',2,'la'),('fr',2,'les'),('fr',2,'et'),
              ('fr',2,'est'),('fr',2,'un'),('fr',2,'une'),('fr',2,'dans'),
              ('fr',2,'pour'),('fr',2,'que'),
              ('es',3,'el'),('es',3,'la'),('es',3,'los'),('es',3,'y'),
              ('es',3,'es'),('es',3,'un'),('es',3,'una'),('es',3,'en'),
              ('es',3,'por'),('es',3,'que')
            ), lw AS (
              SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents
            ), lhits AS (
              SELECT lw.doc_id, m.lang, m.pri, count(DISTINCT m.w) AS n
              FROM lw JOIN m ON lw.w = m.w GROUP BY 1, 2, 3
            ), lbest AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, pri) AS rn
              FROM lhits WHERE n > 0
            ), lang AS (
              SELECT d.doc_id, coalesce(b.lang, 'unknown') AS lang_pred
              FROM documents d LEFT JOIN lbest b ON d.doc_id = b.doc_id AND b.rn = 1
            ), qt AS (
              SELECT doc_id,
                     greatest(length(text), 1) AS total,
                     length(text) - length(replace(text, ' ', '')) AS ws,
                     (length(text) - length(replace(text,'.','')))
                   + (length(text) - length(replace(text,',','')))
                   + (length(text) - length(replace(text,';','')))
                   + (length(text) - length(replace(text,':','')))
                   + (length(text) - length(replace(text,'!','')))
                   + (length(text) - length(replace(text,'?','')))
                   + (length(text) - length(replace(text,'"','')))
                   + (length(text) - length(replace(text,'''','')))
                   + (length(text) - length(replace(text,'(','')))
                   + (length(text) - length(replace(text,')','')))
                   + (length(text) - length(replace(text,'[','')))
                   + (length(text) - length(replace(text,']','')))
                   + (length(text) - length(replace(text,'{','')))
                   + (length(text) - length(replace(text,'}','')))
                     AS punct
              FROM documents
            ), q AS (
              SELECT doc_id,
                     punct / CAST(total AS DOUBLE) AS punct_ratio,
                     (total - ws) / greatest(ws + 1.0, 1.0) AS mean_word_len
              FROM qt
            ), rw AS (
              SELECT doc_id, word, pos FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                FROM documents
              ) raw WHERE word <> ''
            ), rg AS (
              SELECT doc_id, word || ' ' || lead(word, 1) OVER win AS gram
              FROM rw WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
            ), rs AS (
              SELECT doc_id, count(gram) AS n, count(DISTINCT gram) AS u
              FROM rg WHERE gram IS NOT NULL GROUP BY doc_id
            ), rep AS (
              SELECT d.doc_id,
                     CASE WHEN coalesce(rs.n, 0) > 0
                          THEN (rs.n - rs.u) / CAST(rs.n AS DOUBLE)
                          ELSE 0.0 END AS dup2
              FROM documents d LEFT JOIN rs USING (doc_id)
            ), rules AS (
              SELECT d.doc_id,
                     lang.lang_pred <> 'en' AS f_lang,
                     q.mean_word_len < 3.0 OR q.mean_word_len > 12.0 AS f_wlen,
                     q.punct_ratio > 0.1 AS f_punct,
                     rep.dup2 > 0.2 AS f_rep
              FROM documents d
              JOIN lang USING (doc_id) JOIN q USING (doc_id) JOIN rep USING (doc_id)
            )
            SELECT doc_id,
                   NOT (f_lang OR f_wlen OR f_punct OR f_rep) AS keep,
                   CASE WHEN f_lang THEN 'lang'
                        WHEN f_wlen THEN 'word_len'
                        WHEN f_punct THEN 'punct'
                        WHEN f_rep THEN 'repetition'
                        ELSE '' END AS reason
            FROM rules ORDER BY doc_id
        """,
        "latest_per_url": r"""
            WITH a AS (
              SELECT doc_id,
                     'https://synth.local/doc/' || CAST(doc_id AS VARCHAR) AS url,
                     TIMESTAMP '2020-01-01 00:00:00'
                       + doc_id * INTERVAL 1 SECOND AS warc_ts,
                     text
              FROM documents
            ), b AS (
              SELECT doc_id, url, warc_ts + INTERVAL 1 DAY AS warc_ts,
                     text || ' updated v2' AS text
              FROM a WHERE doc_id % 3 = 0
            ), u AS (
              SELECT url, warc_ts, text FROM a
              UNION ALL SELECT url, warc_ts, text FROM b
            ), r AS (
              SELECT url, warc_ts, text,
                     row_number() OVER (PARTITION BY url
                                        ORDER BY warc_ts DESC, text DESC) AS rn
              FROM u
            )
            SELECT url, warc_ts, text FROM r WHERE rn = 1 ORDER BY url
        """,
        "decontaminate": r"""
            WITH w AS (
              SELECT doc_id, word, pos FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                FROM documents
              ) raw WHERE word <> ''
            ), g AS (
              SELECT doc_id,
                     word
                       || ' ' || lead(word, 1) OVER win
                       || ' ' || lead(word, 2) OVER win
                       || ' ' || lead(word, 3) OVER win
                       || ' ' || lead(word, 4) OVER win
                       || ' ' || lead(word, 5) OVER win
                       || ' ' || lead(word, 6) OVER win
                       || ' ' || lead(word, 7) OVER win AS gram
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
            ), bench_g AS (
              SELECT DISTINCT gram FROM g
              WHERE doc_id % 20 = 0 AND gram IS NOT NULL
            ), hits AS (
              SELECT g.doc_id, count(DISTINCT g.gram) AS n
              FROM g JOIN bench_g USING (gram)
              WHERE g.doc_id % 20 <> 0
              GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n, 0) > 0 AS contaminated,
                   coalesce(h.n, 0) AS n_contaminated_grams
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 20 <> 0 ORDER BY d.doc_id
        """,
        "incremental_near_dup": r"""
            WITH words AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, source,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), hits AS (
              SELECT DISTINCT n.doc_id
              FROM sh n JOIN sh b ON n.source >= 'src5' AND b.source < 'src5'
              WHERE len(list_intersect(n.s, b.s))::DOUBLE
                    / (len(n.s) + len(b.s) - len(list_intersect(n.s, b.s))) >= 0.8
            )
            SELECT d.doc_id,
                   d.doc_id IN (SELECT doc_id FROM hits) AS is_near_dup
            FROM documents d WHERE d.source >= 'src5' ORDER BY d.doc_id
        """,
        "top_ngrams": r"""
            WITH w AS (
              SELECT doc_id, word, pos FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                FROM documents
              ) raw WHERE word <> ''
            ), g AS (
              SELECT word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
              FROM w
            )
            SELECT gram, count(*) AS n FROM g WHERE gram IS NOT NULL
            GROUP BY gram ORDER BY n DESC, gram LIMIT 20
        """,
        "profile_orders": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS col_name, count(*) AS n_rows,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   {f"CAST(min({c}) AS DOUBLE)" if c not in ("o_orderstatus", "o_orderpriority") else "CAST(NULL AS DOUBLE)"} AS min_num,
                   {f"CAST(max({c}) AS DOUBLE)" if c not in ("o_orderstatus", "o_orderpriority") else "CAST(NULL AS DOUBLE)"} AS max_num
            FROM orders
            """
            for c in _PROFILE_COLS
        )
        + " ORDER BY col_name",
        "rollup_pricing": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   sum(CAST(round(l_quantity, 0) AS BIGINT)) * 1.0
                     AS sum_l_quantity,
                   sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
                     AS sum_l_extendedprice,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "doc_pagerank": _pagerank_sql(5),
        "doc_pagerank_seeded": _pagerank_seeded_sql(5),
        "csv_events": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(event_id) AS BIGINT) AS sum_event_id,
                   max(user_id) AS max_user_id
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "user_mode_event": """
            WITH c AS (
              SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY user_id, event_type
            )
            SELECT user_id, event_type AS mode_type, n AS n_events
            FROM c
            QUALIFY row_number() OVER (
              PARTITION BY user_id ORDER BY n DESC, event_type) = 1
            ORDER BY user_id
        """,
        "part_name_linkage": """
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM part a
            JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 3
            ORDER BY id_a, id_b
        """,
        "event_intervals": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + (60 + event_id % 120) * 1000000 AS e
              FROM events
            ), o AS (
              SELECT *, max(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
              FROM iv
            ), m AS (
              SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                             THEN 1 ELSE 0 END AS brk
              FROM o
            ), g AS (
              SELECT *, sum(brk) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS UNBOUNDED PRECEDING) AS island
              FROM m
            )
            SELECT user_id, min(s) AS start_us, max(e) AS end_us,
                   count(*) AS n_events
            FROM g GROUP BY user_id, island
            ORDER BY user_id, start_us
        """,
        "co_citation": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            edges AS (
              SELECT doc_id AS src,
                     (doc_id * doc_id + 1) % (SELECT n FROM nn) AS dst
              FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 13 + 3) % (SELECT n FROM nn) FROM documents
            ),
            de AS (SELECT DISTINCT src, dst FROM edges)
            SELECT a.src AS doc_a, b.src AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM de a JOIN de b ON a.dst = b.dst AND a.src < b.src
            GROUP BY 1, 2
            ORDER BY doc_a, doc_b
        """,
        "graph_components": """
            WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
            base AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 5 <> 4 AND doc_id + 1 < (SELECT n FROM nn)
              UNION ALL
              SELECT doc_id, (doc_id + 7) % (SELECT n FROM nn) FROM documents
              WHERE doc_id % 40 = 0
            ),
            e AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
            vs AS (SELECT DISTINCT a AS v FROM e),
            reach(a, b) AS (
              SELECT v, v FROM vs
              UNION
              SELECT reach.a, e.b FROM reach JOIN e ON e.a = reach.b
            )
            SELECT a AS doc_id, min(b) AS cluster_id
            FROM reach GROUP BY a ORDER BY doc_id
        """,
        "phrase_search": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), hits AS (
              SELECT doc_id, i
              FROM words, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
              WHERE w[i] = 'table' AND w[i + 1] = 'value'
            )
            SELECT doc_id, count(*) AS n_matches, min(i) AS first_pos
            FROM hits GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_triangles": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            edges AS (
              SELECT doc_id AS src,
                     (doc_id * doc_id + 1) % (SELECT n FROM nn) AS dst
              FROM documents
              UNION ALL
              SELECT doc_id, (doc_id * 13 + 3) % (SELECT n FROM nn) FROM documents
            )
            SELECT CAST(count(*) AS BIGINT) AS triangles
            FROM edges a
            JOIN edges b ON a.dst = b.src
            JOIN edges c ON b.dst = c.src AND c.dst = a.src
        """,
        "prefix_jaccard_join": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
            ORDER BY doc_a, doc_b
        """,
        "part_skyline": """
            SELECT p_partkey, p_size, p_retailprice FROM part a
            WHERE NOT EXISTS (
              SELECT 1 FROM part b
              WHERE b.p_size >= a.p_size
                AND b.p_retailprice >= a.p_retailprice
                AND (b.p_size > a.p_size OR b.p_retailprice > a.p_retailprice))
            ORDER BY p_partkey
        """,
        "orders_zscore": """
            WITH c AS (
              SELECT o_orderkey, o_orderpriority, o_totalprice,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ), m AS (
              SELECT o_orderpriority, count(*) AS n,
                     sum(cents) AS s, sum(cents * cents) AS ss
              FROM c GROUP BY o_orderpriority
            )
            SELECT c.o_orderkey, c.o_orderpriority, c.o_totalprice,
                   round((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / sqrt((CAST(ss AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / CAST(n - 1 AS DOUBLE)), 6) AS z
            FROM c JOIN m USING (o_orderpriority)
            ORDER BY c.o_orderkey
        """,
        "snapshot_churn": """
            WITH old AS (
              SELECT 'https://synth.local/doc/' || CAST(doc_id AS VARCHAR) AS url,
                     text
              FROM documents WHERE doc_id % 5 <> 4
            ), new AS (
              SELECT 'https://synth.local/doc/' || CAST(doc_id AS VARCHAR) AS url,
                     CASE WHEN doc_id % 3 = 0 THEN text || ' updated v2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 5 <> 0
            )
            SELECT COALESCE(o.url, n.url) AS url,
                   CASE WHEN o.url IS NULL THEN 'added'
                        WHEN n.url IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.url = n.url
            WHERE o.url IS NULL OR n.url IS NULL OR o.text <> n.text
            ORDER BY url
        """,
        "user_event_path": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
                   count(*) AS n_steps
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "cube_pricing": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   sum(CAST(round(l_quantity, 0) AS BIGINT)) * 1.0
                     AS sum_l_quantity,
                   sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
                     AS sum_l_extendedprice,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "order_ntile": """
            SELECT o_custkey, o_orderdate, o_orderkey,
                   CAST(row_number() OVER w AS BIGINT) AS rnk,
                   CAST(ntile(4) OVER w AS BIGINT) AS tile,
                   CAST(dense_rank() OVER
                        (PARTITION BY o_custkey ORDER BY o_orderdate)
                     AS BIGINT) AS drnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, rnk
        """,
        "lineitem_corr_stats": """
            WITH c AS (
              SELECT l_returnflag,
                     CAST(round(l_quantity, 0) AS BIGINT) AS qc,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
              FROM lineitem
            ), m AS (
              SELECT l_returnflag,
                     count(*) AS n_rows,
                     CAST(sum(qc) AS DOUBLE) AS sx,
                     CAST(sum(pc) AS DOUBLE) AS sy,
                     CAST(sum(CAST(qc AS HUGEINT) * qc) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(pc AS HUGEINT) * pc) AS DOUBLE) AS syy,
                     CAST(sum(CAST(qc AS HUGEINT) * pc) AS DOUBLE) AS sxy
              FROM c GROUP BY l_returnflag
            ), v AS (
              SELECT *,
                     (sxx - sx * sx / n_rows) / (n_rows - 1) AS varcx,
                     (syy - sy * sy / n_rows) / (n_rows - 1) AS varcy
              FROM m
            )
            SELECT l_returnflag, n_rows,
                   round(sx / n_rows / 1.0, 6) AS mean_l_quantity,
                   round(sy / n_rows / 100.0, 6) AS mean_l_extendedprice,
                   round(varcx / 1.0, 6) AS var_l_quantity,
                   round(varcy / 10000.0, 6) AS var_l_extendedprice,
                   round(sqrt(greatest(varcx, 0.0)) / 1.0, 6) AS std_l_quantity,
                   round(sqrt(greatest(varcy, 0.0)) / 100.0, 6)
                     AS std_l_extendedprice,
                   round((n_rows * sxy - sx * sy)
                         / (sqrt(n_rows * sxx - sx * sx)
                            * sqrt(n_rows * syy - sy * sy)), 6) AS corr
            FROM v ORDER BY l_returnflag
        """,
        "price_histogram": """
            SELECT CAST(floor((l_extendedprice - 0.0) / 5000.0) AS BIGINT) AS bin,
                   count(*) AS n
            FROM lineitem GROUP BY bin ORDER BY bin
        """,
        "bm25_topk": r"""
            WITH w AS (
              SELECT doc_id, word FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                FROM documents
              ) raw WHERE word <> ''
            ), dl AS (
              SELECT d.doc_id, count(w.word) AS dl
              FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
              GROUP BY d.doc_id
            ), stats AS (
              SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl
            ), q(term) AS (VALUES ('hash'), ('join'), ('vector'), ('spark')),
            tf AS (
              SELECT doc_id, word AS term, count(*) AS tf FROM w
              WHERE word IN ('hash', 'join', 'vector', 'spark')
              GROUP BY doc_id, word
            ), dfq AS (
              SELECT q.term, count(DISTINCT tf.doc_id) AS df
              FROM q LEFT JOIN tf USING (term) GROUP BY q.term
            ), contrib AS (
              SELECT tf.doc_id,
                     ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                          / (CAST(stats.sum_dl AS DOUBLE) / stats.n))) AS c
              FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
              CROSS JOIN stats
            )
            SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib
            GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10
        """,
        "collocations": r"""
            WITH w AS (
              SELECT doc_id, word, pos FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                FROM documents
              ) raw WHERE word <> ''
            ), uni AS (
              SELECT word, count(*) AS c FROM w GROUP BY word
            ), tu AS (SELECT count(*) AS t FROM w
            ), g AS (
              SELECT word AS w1,
                     lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
              FROM w
            ), bi AS (
              SELECT w1, w2, count(*) AS c FROM g WHERE w2 IS NOT NULL
              GROUP BY w1, w2
            ), tb AS (SELECT sum(c) AS t FROM bi)
            SELECT bi.w1 || ' ' || bi.w2 AS gram, bi.c AS n,
                   round(ln(CAST(bi.c AS DOUBLE) / tb.t * tu.t / u1.c
                            * tu.t / u2.c), 6) AS pmi
            FROM bi
            JOIN uni u1 ON bi.w1 = u1.word
            JOIN uni u2 ON bi.w2 = u2.word
            CROSS JOIN tb CROSS JOIN tu
            WHERE bi.c >= 5
            ORDER BY pmi DESC, gram LIMIT 20
        """,
        "dedup_assignments": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p
              UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT url, url FROM words
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            )
            SELECT node AS url, min(label) AS cluster_id
            FROM cc GROUP BY node ORDER BY url
        """,
        "source_drift": r"""
            WITH fw AS (
              SELECT source,
                     unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        w -> len(w) > 0)) AS word
              FROM documents
            ), c AS (
              SELECT source, word, CAST(count(*) AS BIGINT) AS c
              FROM fw GROUP BY source, word
            ), t AS (
              SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY source
            ), p AS (
              SELECT source, word,
                     CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
              FROM c JOIN t USING (source)
            ), pairs AS (
              SELECT a.source AS sa, b.source AS sb
              FROM t a JOIN t b ON a.source < b.source
            ), joined AS (
              SELECT pairs.sa, pairs.sb,
                     COALESCE(pa.p, 0) AS p, COALESCE(pb.p, 0) AS q
              FROM pairs
              JOIN (SELECT DISTINCT word FROM c) w ON TRUE
              LEFT JOIN p pa ON pa.source = pairs.sa AND pa.word = w.word
              LEFT JOIN p pb ON pb.source = pairs.sb AND pb.word = w.word
              WHERE COALESCE(pa.p, 0) > 0 OR COALESCE(pb.p, 0) > 0
            )
            SELECT sa AS slice_a, sb AS slice_b,
                   round(sum(CASE WHEN p > 0
                                  THEN 0.5 * p * ln(2 * p / (p + q)) ELSE 0 END
                           + CASE WHEN q > 0
                                  THEN 0.5 * q * ln(2 * q / (p + q)) ELSE 0 END),
                         6) AS js
            FROM joined GROUP BY sa, sb ORDER BY slice_a, slice_b
        """,
        "doc_entropy": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), fw AS (
              SELECT doc_id, unnest(w) AS word FROM words
            ), c AS (
              SELECT doc_id, word, count(*) AS c
              FROM fw GROUP BY doc_id, word
            ), n AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY doc_id
            ), h AS (
              SELECT c.doc_id,
                     round(sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                               * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS entropy
              FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(n.n, 0) AS n_tokens,
                   h.entropy
            FROM documents d
            LEFT JOIN n ON d.doc_id = n.doc_id
            LEFT JOIN h ON d.doc_id = h.doc_id
            ORDER BY d.doc_id
        """,
        "cust_p90_spend": """
            WITH c AS (
              SELECT o_custkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                     count(*) OVER (PARTITION BY o_custkey) AS n,
                     row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS rn
              FROM orders
            )
            SELECT o_custkey, n AS n_rows,
                   round(CAST(c AS DOUBLE) / 100.0, 6) AS p90
            FROM c
            WHERE rn = greatest((9 * n + 9) // 10, 1)
            ORDER BY o_custkey
        """,
        "cust_mad_spend": """
            WITH c AS (
              SELECT o_custkey AS g,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS c
              FROM orders
            ), m AS (
              SELECT g, count(*) AS n, median(c) AS med FROM c GROUP BY g
            ), d AS (
              SELECT c.g,
                     abs(2 * c.c - CAST(round(med * 2) AS BIGINT)) AS dev
              FROM c JOIN m USING (g)
            )
            SELECT d.g AS o_custkey, m.n AS n_rows,
                   round(med / 100.0, 6) AS median,
                   round(median(dev) / 2.0 / 100.0, 6) AS mad
            FROM d JOIN m USING (g)
            GROUP BY d.g, m.n, med
            ORDER BY o_custkey
        """,
        "cust_median_spend": """
            SELECT o_custkey, count(*) AS n_rows,
                   round(median(CAST(round(o_totalprice * 100) AS BIGINT))
                         / 100.0, 6) AS median
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        "price_ols": """
            WITH c AS (
              SELECT l_returnflag AS g,
                     CAST(round(l_quantity) AS BIGINT) AS cx,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS cy
              FROM lineitem
            ), m AS (
              SELECT g, count(*) AS n,
                     CAST(sum(cx) AS BIGINT) AS sx,
                     CAST(sum(cy) AS BIGINT) AS sy,
                     CAST(sum(cx * cx) AS BIGINT) AS sxx,
                     CAST(sum(cx * cy) AS BIGINT) AS sxy
              FROM c GROUP BY g
            ), b AS (
              SELECT *,
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bc
              FROM m
              WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            )
            SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   round(bc * (1.0 / 100.0), 6) AS slope,
                   round(((CAST(sy AS DOUBLE) - bc * CAST(sx AS DOUBLE))
                          / CAST(n AS DOUBLE)) / 100.0, 6) AS intercept
            FROM b ORDER BY l_returnflag
        """,
        "containment_join": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / least(len(a.s), len(b.s)), 6) AS containment
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / least(len(a.s), len(b.s)) >= 0.9
            ORDER BY doc_a, doc_b
        """,
        "corpus_vocab": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), fw AS (
              SELECT unnest(w) AS word FROM words
            ), grams AS (
              SELECT array_to_string(w[i:i+4], ' ') AS g
              FROM words, UNNEST(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
              WHERE len(w) > 0
            )
            SELECT CAST((SELECT count(*) FROM fw) AS BIGINT) AS n_words,
                   CAST((SELECT count(DISTINCT word) FROM fw) AS BIGINT)
                     AS n_distinct_words,
                   CAST((SELECT count(DISTINCT g) FROM grams) AS BIGINT)
                     AS n_distinct_5grams
        """,
        "window_anomalies": """
            WITH wc AS (
              SELECT user_id, epoch_us(ts) // 3600000000 AS w, count(*) AS n
              FROM events GROUP BY user_id, w
            ), m AS (
              SELECT user_id, count(*) AS k,
                     CAST(sum(n) AS BIGINT) AS s,
                     CAST(sum(n * n) AS BIGINT) AS ss
              FROM wc GROUP BY user_id
            ), scored AS (
              SELECT wc.user_id, wc.w * 3600000000 AS window_start_us,
                     wc.n AS n_events,
                     round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                           / sqrt((CAST(ss AS DOUBLE)
                                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                     / CAST(k AS DOUBLE))
                                  / CAST(k - 1 AS DOUBLE)), 6) AS z
              FROM wc JOIN m USING (user_id)
              WHERE k >= 2
                AND (CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                    / CAST(k - 1 AS DOUBLE) > 0.0
            )
            SELECT * FROM scored WHERE z > 2.0
            ORDER BY user_id, window_start_us
        """,
        "leakage_safe_split": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p
              UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT url, url FROM words
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            ), asg AS (
              SELECT node AS url, min(label) AS cluster_id
              FROM cc GROUP BY node
            )
            SELECT url,
                   CASE WHEN CAST(substr(cluster_id, 25) AS BIGINT) % 10 = 0
                        THEN 'val' ELSE 'train' END AS split
            FROM asg ORDER BY url
        """,
        "best_in_cluster": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p
              UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT url, url FROM words
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            ), lab AS (
              SELECT node AS url, min(label) AS cluster_id FROM cc GROUP BY node
            ), tok AS (
              SELECT concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
              FROM documents
            ), ranked AS (
              SELECT l.cluster_id, l.url, t.n_tokens,
                     row_number() OVER (PARTITION BY l.cluster_id
                                        ORDER BY t.n_tokens DESC, l.url) AS rn,
                     count(*) OVER (PARTITION BY l.cluster_id) AS n_members
              FROM lab l JOIN tok t ON l.url = t.url
            )
            SELECT cluster_id, url AS keeper_url,
                   n_tokens AS keeper_tokens, n_members
            FROM ranked WHERE rn = 1 ORDER BY cluster_id
        """,
        "cluster_sizes": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     concat('https://synth.local/doc/', CAST(doc_id AS VARCHAR)) AS url,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) AS w
              FROM documents
            ), sh AS (
              SELECT doc_id, url,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 4, 1)),
                       i -> array_to_string(w[i:i+4], ' '))) AS s
              FROM words WHERE len(w) > 0
            ), p AS (
              SELECT a.url AS ua, b.url AS ub
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
            ), e AS (
              SELECT ua AS src, ub AS dst FROM p
              UNION ALL SELECT ub, ua FROM p
            ), cc(node, label) AS (
              SELECT url, url FROM words
              UNION
              SELECT e.dst, cc.label FROM e JOIN cc ON cc.node = e.src
            ), lab AS (
              SELECT node AS url, min(label) AS cluster_id FROM cc GROUP BY node
            ), sz AS (
              SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
            )
            SELECT cluster_size, count(*) AS n_clusters
            FROM sz GROUP BY cluster_size ORDER BY cluster_size
        """,
        "langid": r"""
            WITH m(lang, pri, w) AS (VALUES
              ('en',0,'the'),('en',0,'and'),('en',0,'of'),('en',0,'to'),
              ('en',0,'a'),('en',0,'in'),('en',0,'is'),('en',0,'that'),
              ('en',0,'it'),('en',0,'for'),
              ('de',1,'der'),('de',1,'die'),('de',1,'das'),('de',1,'und'),
              ('de',1,'ist'),('de',1,'nicht'),('de',1,'ein'),('de',1,'mit'),
              ('de',1,'auf'),('de',1,'von'),
              ('fr',2,'le'),('fr',2,'la'),('fr',2,'les'),('fr',2,'et'),
              ('fr',2,'est'),('fr',2,'un'),('fr',2,'une'),('fr',2,'dans'),
              ('fr',2,'pour'),('fr',2,'que'),
              ('es',3,'el'),('es',3,'la'),('es',3,'los'),('es',3,'y'),
              ('es',3,'es'),('es',3,'un'),('es',3,'una'),('es',3,'en'),
              ('es',3,'por'),('es',3,'que')
            ), words AS (
              SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents
            ), hits AS (
              SELECT words.doc_id, m.lang, m.pri, count(DISTINCT m.w) AS n
              FROM words JOIN m ON words.w = m.w
              GROUP BY 1, 2, 3
            ), best AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, pri) AS rn
              FROM hits WHERE n > 0
            )
            SELECT d.doc_id, coalesce(b.lang, 'unknown') AS lang_pred
            FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
            ORDER BY d.doc_id
        """,
        "url_normalize": r"""
            WITH raw AS (
              SELECT doc_id,
                (CASE WHEN doc_id % 2 = 1 THEN 'HTTPS' ELSE 'HTTP' END
                 || '://'
                 || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
                 || 'Sub' || CAST(doc_id % 11 AS VARCHAR) || '.Example'
                 || CAST(doc_id % 50 AS VARCHAR) || '.COM'
                 || CASE WHEN doc_id % 4 = 0 THEN ':443'
                         WHEN doc_id % 4 = 1 THEN ':80'
                         WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END
                 || '/p/' || CAST(doc_id AS VARCHAR)
                 || CASE WHEN doc_id % 5 < 2 THEN '?utm_source=feed&q='
                              || CAST(doc_id % 9 AS VARCHAR) || '&utm_medium=rss'
                         WHEN doc_id % 5 = 2 THEN '?q='
                              || CAST(doc_id % 9 AS VARCHAR) || '&gclid=abc'
                         WHEN doc_id % 5 = 3 THEN '?q=' || CAST(doc_id % 9 AS VARCHAR)
                         ELSE '' END
                 || CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
              FROM documents
            ), parts AS (
              SELECT doc_id,
                lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]+)', 1)) AS host,
                regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#:]+:([0-9]+)', 1) AS port,
                regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#:]+(:[0-9]+)?', '') AS rest
              FROM raw
            ), cleaned AS (
              SELECT doc_id, scheme, host, port,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(rest, '#.*$', '', 'g'),
                  '([?&])(?:utm_[^=&#]*|gclid|fbclid)=[^&#]*', '\1', 'g'),
                  '\?&', '?', 'g'),
                  '&&+', '&', 'g'),
                  '[?&]$', '', 'g') AS rest
              FROM parts
            )
            SELECT doc_id,
              scheme || '://' || host ||
              CASE WHEN port = '' THEN ''
                   WHEN scheme = 'http' AND port = '80' THEN ''
                   WHEN scheme = 'https' AND port = '443' THEN ''
                   ELSE ':' || port END || rest AS url_norm,
              CASE WHEN regexp_extract(regexp_replace(host, '^www\.', ''),
                                       '([^.]+\.[^.]+)$', 1) = ''
                   THEN regexp_replace(host, '^www\.', '')
                   ELSE regexp_extract(regexp_replace(host, '^www\.', ''),
                                       '([^.]+\.[^.]+)$', 1) END AS domain
            FROM cleaned ORDER BY doc_id
        """,
        "domain_stats": r"""
            WITH raw AS (
              SELECT doc_id,
                (CASE WHEN doc_id % 2 = 1 THEN 'HTTPS' ELSE 'HTTP' END
                 || '://'
                 || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
                 || 'Sub' || CAST(doc_id % 11 AS VARCHAR) || '.Example'
                 || CAST(doc_id % 50 AS VARCHAR) || '.COM'
                 || CASE WHEN doc_id % 4 = 0 THEN ':443'
                         WHEN doc_id % 4 = 1 THEN ':80'
                         WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END
                 || '/p/' || CAST(doc_id AS VARCHAR)
                 || CASE WHEN doc_id % 5 < 2 THEN '?utm_source=feed&q='
                              || CAST(doc_id % 9 AS VARCHAR) || '&utm_medium=rss'
                         WHEN doc_id % 5 = 2 THEN '?q='
                              || CAST(doc_id % 9 AS VARCHAR) || '&gclid=abc'
                         WHEN doc_id % 5 = 3 THEN '?q=' || CAST(doc_id % 9 AS VARCHAR)
                         ELSE '' END
                 || CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
              FROM documents
            ), parts AS (
              SELECT doc_id,
                lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]+)', 1)) AS host,
                regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#:]+:([0-9]+)', 1) AS port,
                regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#:]+(:[0-9]+)?', '') AS rest
              FROM raw
            ), cleaned AS (
              SELECT doc_id, scheme, host, port,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(rest, '#.*$', '', 'g'),
                  '([?&])(?:utm_[^=&#]*|gclid|fbclid)=[^&#]*', '\1', 'g'),
                  '\?&', '?', 'g'),
                  '&&+', '&', 'g'),
                  '[?&]$', '', 'g') AS rest
              FROM parts
            ), norm AS (
              SELECT doc_id,
                scheme || '://' || host ||
                CASE WHEN port = '' THEN ''
                     WHEN scheme = 'http' AND port = '80' THEN ''
                     WHEN scheme = 'https' AND port = '443' THEN ''
                     ELSE ':' || port END || rest AS url_norm,
                CASE WHEN regexp_extract(regexp_replace(host, '^www\.', ''),
                                         '([^.]+\.[^.]+)$', 1) = ''
                     THEN regexp_replace(host, '^www\.', '')
                     ELSE regexp_extract(regexp_replace(host, '^www\.', ''),
                                         '([^.]+\.[^.]+)$', 1) END AS domain
              FROM cleaned
            )
            SELECT domain, COUNT(*) AS n_docs,
                   CAST(SUM(length(url_norm)) AS BIGINT) AS total_url_len
            FROM norm GROUP BY domain ORDER BY domain
        """,
        # Every query has an oracle: the kernel-/sketch-valued ones
        # (fingerprints, simhash_pairs, audio/image_features,
        # quantity/sig_distance quantiles, CPC estimate) compare
        # against in-process sidecar ground truth (see
        # _ensure_oracle_sidecars) — those entries drop out to
        # rows-only only if the sidecar inputs are unavailable.
    }
