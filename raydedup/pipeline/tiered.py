"""Tiered web-scale dedup: exact → MinHash-LSH near-dup → embedding-
cosine semantic, each tier running only on the previous tier's
survivors — the cost-ordered composition production corpora run
(cheap hash pass first shrinks the input of the quadratic-ish tiers).

Output: one row per input doc — (doc_id, tier, keeper_id) where
``tier`` names the FIRST tier that removed the doc ('exact', 'near',
'semantic') or 'kept', and ``keeper_id`` is the retained doc covering
it (itself when kept). Keepers are numeric-min per duplicate group in
every tier.

Scale shapes (the 100-TB lens):
- Tier 1 shuffles (hash128, id) only — text never moves — through a
  coarse-bucket exchange + one lexsort run-boundary kernel per bucket
  (the ``paragraph_dedup`` shape), NOT one group per distinct text.
- Tier 2 is the flagship ``run_dedup`` pipeline unchanged (token-only
  band shuffle, salted hot bands, Bloom-prefiltered verify); survivor
  texts re-attach by a distributed hash join, not a broadcast.
- Tier 3 reuses ``cosine_all_pairs_blockwise`` (exact low-tau
  all-pairs as one groupby shuffle of chunk-pair replicas). Its edge
  list streams to the driver under the same bounded-edge budget as
  ``cluster_assignments`` (components of near-dup EDGES, not corpus);
  labels re-attach as a distributed left join. Past the budget it
  routes through ``label_propagation_components`` automatically —
  distributed min-label propagation, nothing O(edges) on the driver.
  When exact all-pairs itself is too wide (survivor count where
  n²/chunks stops fitting the cluster), substitute SemDeDup's
  cluster-then-within-cluster rule (``ops/semdedup.py``) — same
  output contract, O(n·k + Σ cluster²) instead of O(n²).
- Tier flags combine via two distributed left-outer joins keyed once
  by doc_id — no per-doc state ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig

_PAD = 12  # zero-padded ids make lexicographic min == numeric min


def exact_assignments(docs, id_column: str = "doc_id", text_column: str = "text", n_buckets: int = 64):
    """(id, keeper1) for every doc: keeper1 = min id among identical text."""
    from raydedup.ops.exact import add_content_hash

    def hash_and_bucket(batch: pa.Table) -> pa.Table:
        t = add_content_hash(batch, text_column).drop_columns([text_column])
        bucket = t["content_h1"].to_numpy(zero_copy_only=False) % np.uint64(n_buckets)
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_column].to_numpy()
        h1 = g["content_h1"].to_numpy()
        h2 = g["content_h2"].to_numpy()
        order = np.lexsort((ids, h2, h1))
        h1s, h2s, idss = h1[order], h2[order], ids[order]
        new_run = np.empty(len(ids), dtype=bool)
        new_run[0] = True
        new_run[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        keeper = idss[new_run][np.cumsum(new_run) - 1]  # first of run = min id
        return pd.DataFrame({id_column: idss, "keeper1": keeper})

    return (
        docs.select_columns([id_column, text_column])
        .map_batches(hash_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark, batch_format="pandas")
    )


def _padded_url(ids: pa.Array) -> pa.Array:
    padded = pc.utf8_lpad(pc.cast(ids, pa.string()), _PAD, "0")
    return pc.binary_join_element_wise("doc/", padded, "")


def _url_to_id(urls: pa.Array) -> pa.Array:
    return pc.cast(pc.utf8_slice_codeunits(urls, 4, 4 + _PAD), pa.int64())


def tiered_dedup(
    docs,
    emb,
    cfg: DedupConfig | None = None,
    tau_semantic: float = 0.45,
    id_column: str = "doc_id",
    emb_id_column: str = "vec_id",
    n_buckets: int = 32,
    num_join_partitions: int = 4,
    concurrency=(1, 4),
    max_driver_edges: int = 50_000_000,
):
    """docs (doc_id, text) + emb (vec_id, embedding; vec_id == doc_id)
    → Dataset (doc_id, tier, keeper_id)."""
    import ray.data as rd

    from raydedup.ops.ann import cosine_all_pairs_blockwise
    from raydedup.pipeline.cluster import connected_components_arrays
    from raydedup.pipeline.run import run_dedup

    cfg = cfg or DedupConfig()

    def survivors(keeper_col):
        def f(batch: pa.Table) -> pa.Table:
            kept = batch.filter(pc.equal(batch[id_column], batch[keeper_col]))
            return kept.select([id_column])

        return f

    # ---- tier 1: exact -------------------------------------------------
    t1 = exact_assignments(docs, id_column, n_buckets=n_buckets)
    s1_ids = t1.map_batches(survivors("keeper1"), batch_format="pyarrow")

    # ---- tier 2: MinHash-LSH near-dup over exact survivors -------------
    s1_docs = docs.select_columns([id_column, "text"]).join(
        s1_ids,
        join_type="inner",
        num_partitions=num_join_partitions,
        on=(id_column,),
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        return pa.table({"url": _padded_url(batch[id_column]), "text": batch["text"]})

    pages = s1_docs.map_batches(to_pages, batch_format="pyarrow")
    assignments = run_dedup(pages, cfg, n_buckets=n_buckets, concurrency=concurrency).assignments

    def to_keeper2(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: _url_to_id(batch["url"]),
                "keeper2": _url_to_id(batch["cluster_id"]),
            }
        )

    t2 = assignments.map_batches(to_keeper2, batch_format="pyarrow")
    s2_ids = t2.map_batches(survivors("keeper2"), batch_format="pyarrow")

    # ---- tier 3: semantic (exact cosine all-pairs) over survivors ------
    # Arrow's hash join rejects list<float> payload columns, so the
    # vector rides through the join packed as fixed-size binary (pure
    # buffer reinterpretation both ways — no per-row Python).
    from raydedup.ops.ann import _emb_matrix

    def pack_emb(batch: pa.Table) -> pa.Table:
        m = np.ascontiguousarray(_emb_matrix(batch, "embedding"), dtype=np.float32)
        packed = pa.Array.from_buffers(
            pa.binary(m.shape[1] * 4), len(batch), [None, pa.py_buffer(m.tobytes())]
        )
        return pa.table({emb_id_column: batch[emb_id_column], "embpk": packed})

    def unpack_emb(batch: pa.Table) -> pa.Table:
        arr = batch["embpk"].combine_chunks()
        width = arr.type.byte_width
        dim = width // 4
        flat = np.frombuffer(
            arr.buffers()[1], dtype=np.float32, count=len(arr) * dim, offset=arr.offset * width
        )
        emb_col = pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
        return pa.table({emb_id_column: batch[emb_id_column], "embedding": emb_col})

    s2_emb = (
        emb.select_columns([emb_id_column, "embedding"])
        .map_batches(pack_emb, batch_format="pyarrow")
        .join(
            s2_ids,
            join_type="inner",
            num_partitions=num_join_partitions,
            on=(emb_id_column,),
            right_on=(id_column,),
        )
        .map_batches(unpack_emb, batch_format="pyarrow")
    )
    pairs = cosine_all_pairs_blockwise(
        s2_emb, tau=tau_semantic, id_column=emb_id_column
    ).materialize()  # consumed twice: edge count, then components

    n_edges = pairs.count()
    if n_edges > max_driver_edges:
        # distributed components — same fallback cluster_assignments
        # uses past its edge budget: edges become zero-padded url
        # strings (lexicographic min == numeric min), min-label
        # propagation runs as bucketed cogroup rounds, and labels map
        # back to ids. Nothing O(edges) touches the driver.
        from raydedup.pipeline.cluster import label_propagation_components

        def to_url_edges(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url_a": _padded_url(batch["id_a"]),
                    "url_b": _padded_url(batch["id_b"]),
                }
            )

        comp = label_propagation_components(
            pairs.select_columns(["id_a", "id_b"]).map_batches(
                to_url_edges, batch_format="pyarrow"
            ),
            n_buckets=n_buckets,
        )

        def to_keeper3(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_column: _url_to_id(batch["url"]),
                    "keeper3": _url_to_id(batch["cluster_id"]),
                }
            )

        t3 = comp.map_batches(to_keeper3, batch_format="pyarrow")
    else:
        ea, eb = [], []
        for b in pairs.select_columns(["id_a", "id_b"]).iter_batches(batch_format="pyarrow"):
            ea.append(b["id_a"].to_numpy(zero_copy_only=False))
            eb.append(b["id_b"].to_numpy(zero_copy_only=False))
        if ea:
            nodes, roots = connected_components_arrays(np.concatenate(ea), np.concatenate(eb))
            keeper3 = nodes[roots]
        else:
            nodes = keeper3 = np.empty(0, dtype=np.int64)
        t3 = rd.from_arrow(
            pa.table(
                {
                    id_column: pa.array(nodes.astype(np.int64)),
                    "keeper3": pa.array(keeper3.astype(np.int64)),
                }
            )
        )

    # ---- combine: first tier that removed the doc wins ------------------
    # Union + bucketed cogroup, NOT hash joins: the tier tables come
    # from groupby/map_groups stages, which can emit schema-less empty
    # pandas blocks that crash Ray's hash-join key resolution (the
    # engine-wide quirk _assign_distributed documents). One row per
    # (doc, tier) tagged with its side, one vectorized kernel per
    # bucket — same id hashes to the same bucket on every side, and
    # tier 1 covers every doc, so the kernel sees each doc's full
    # tier history. Absence from a side = "that tier kept it".
    from raydedup.sketches.hashing import hash_u64_column

    def tag_side(keeper_col: str, side: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            h1, _ = hash_u64_column(pa.chunked_array([pa.array(ids, pa.int64())]))
            return pa.table(
                {
                    "bucket": pa.array((h1 % np.uint64(n_buckets)).astype(np.int64)),
                    id_column: pa.array(ids),
                    "keeper": batch[keeper_col].cast(pa.int64()),
                    "side": pa.array(np.full(len(ids), side, np.int64)),
                }
            )

        return f

    tagged = (
        t1.map_batches(tag_side("keeper1", 1), batch_format="pyarrow")
        .union(t2.map_batches(tag_side("keeper2", 2), batch_format="pyarrow"))
        .union(t3.map_batches(tag_side("keeper3", 3), batch_format="pyarrow"))
    )

    def label(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_column].to_numpy()
        k = df["keeper"].to_numpy()
        s = df["side"].to_numpy()
        base = s == 1
        order = np.argsort(ids[base], kind="stable")
        bids = ids[base][order]
        k1 = k[base][order]

        def attach(side: int) -> np.ndarray:
            m = s == side
            res = bids.copy()  # default: own id (doc never reached the tier)
            if m.any():
                pos = np.searchsorted(bids, ids[m])
                res[pos] = k[m]
            return res

        k2, k3 = attach(2), attach(3)
        tier = np.full(len(bids), "kept", dtype=object)
        keeper = bids.copy()
        sem = k3 != bids
        tier[sem], keeper[sem] = "semantic", k3[sem]
        near = k2 != bids
        tier[near], keeper[near] = "near", k2[near]
        exact = k1 != bids
        tier[exact], keeper[exact] = "exact", k1[exact]
        return pd.DataFrame({id_column: bids, "tier": tier, "keeper_id": keeper})

    return tagged.groupby("bucket").map_groups(label, batch_format="pandas")
