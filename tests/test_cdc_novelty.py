"""CDC chunk-dedup and gram-novelty ops: kernels + distributed plumbing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs_table():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])


# ---------------------------------------------------------------------------
# CDC kernels (no Ray)
# ---------------------------------------------------------------------------


def test_chunk_spans_cover_and_respect_docs():
    from raydedup.ops.cdc import _text_bytes, chunk_spans

    tbl = _docs_table()
    buf, offs = _text_bytes(tbl["text"])
    starts, ends, doc_ix = chunk_spans(buf, offs, window=16, mask_bits=6)
    assert (ends > starts).all()
    # chunks tile each doc exactly: per-doc byte sums match, no chunk
    # crosses a doc boundary
    per_doc = np.bincount(doc_ix, weights=ends - starts, minlength=len(offs) - 1)
    assert np.array_equal(per_doc.astype(np.int64), np.diff(offs))
    assert (starts >= offs[doc_ix]).all() and (ends <= offs[doc_ix + 1]).all()


def test_chunk_boundaries_are_content_defined():
    """The same passage embedded at different offsets yields identical
    interior chunks — the property that distinguishes CDC from
    fixed-width chunking."""
    from raydedup.ops.cdc import _text_bytes, chunk_spans

    rng = np.random.default_rng(7)
    passage = bytes(rng.integers(97, 123, size=400, dtype=np.uint8))
    pre_a = bytes(rng.integers(97, 123, size=133, dtype=np.uint8))
    pre_b = bytes(rng.integers(97, 123, size=57, dtype=np.uint8))
    tbl = pa.table(
        {"text": pa.array([(pre_a + passage).decode(), (pre_b + passage).decode()])}
    )
    buf, offs = _text_bytes(tbl["text"])
    starts, ends, doc_ix = chunk_spans(buf, offs, window=16, mask_bits=5)
    chunks = [
        {buf[s:e].tobytes() for s, e in zip(starts[doc_ix == d], ends[doc_ix == d])}
        for d in (0, 1)
    ]
    shared = chunks[0] & chunks[1]
    # interior chunks of the shared passage coincide despite offsets
    assert sum(len(c) for c in shared) > len(passage) // 2


def test_cdc_fingerprints_match_raw_bytes_identity():
    """(f1, f2, len) triples collide exactly when chunk bytes match —
    validated exhaustively on the test corpus."""
    from raydedup.ops.cdc import _text_bytes, cdc_chunk_rows, chunk_spans

    tbl = _docs_table()
    srcs = sorted(set(tbl["source"].to_pylist()))
    rows = cdc_chunk_rows(tbl, "doc_id", "text", {s: i for i, s in enumerate(srcs)})
    buf, offs = _text_bytes(tbl["text"])
    starts, ends, doc_ix = chunk_spans(buf, offs, 16, 6)
    raw = [buf[s:e].tobytes() for s, e in zip(starts, ends)]
    trip = list(
        zip(
            rows["f1"].to_pylist(),
            rows["f2"].to_pylist(),
            rows["clen"].to_pylist(),
        )
    )
    by_trip: dict[tuple, bytes] = {}
    for t, r in zip(trip, raw):
        assert by_trip.setdefault(t, r) == r
    assert len(by_trip) == len(set(raw))


def test_cdc_local_twin_short_and_empty_docs():
    from raydedup.ops.cdc import cdc_dedup_local

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["short", "", "short"]),
            "source": pa.array(["a", "a", "b"]),
        }
    )
    out = cdc_dedup_local(tbl, "doc_id").to_pandas().set_index("source")
    # doc 2 is empty -> no chunks; doc 3 repeats doc 1's single chunk
    assert out.loc["a", "n_chunks"] == 1 and out.loc["a", "n_dup_chunks"] == 0
    assert out.loc["b", "n_chunks"] == 1 and out.loc["b", "n_dup_chunks"] == 1
    assert out.loc["b", "dup_bytes"] == 5


# ---------------------------------------------------------------------------
# Distributed plumbing (Ray)
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_cdc_dedup_stats_matches_local_twin_any_blocking():
    import ray.data as rd

    from raydedup.ops.cdc import cdc_dedup_local, cdc_dedup_stats

    tbl = _docs_table()
    expect = cdc_dedup_local(tbl, "doc_id").to_pandas()
    ds = rd.from_arrow(tbl).repartition(7)
    got = (
        cdc_dedup_stats(ds, "doc_id", n_buckets=8)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, expect.sort_values("source").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_gram_novelty_matches_naive():
    import ray.data as rd

    from raydedup.ops.novelty import gram_novelty
    from raydedup.pipeline.extract import segmented_unique, text_to_shingle_sets

    tbl = _docs_table()
    ids = tbl["doc_id"].to_numpy()
    sh, offs, _ = text_to_shingle_sets(tbl["text"], k=5)
    su, uoffs = segmented_unique(sh, offs)
    doc = np.repeat(ids, np.diff(uoffs))
    first: dict[int, int] = {}
    for g, d in sorted(zip(su.tolist(), doc.tolist()), key=lambda t: (t[0], t[1])):
        first.setdefault(g, d)
    tot: dict[int, int] = {}
    dup: dict[int, int] = {}
    for g, d in zip(su.tolist(), doc.tolist()):
        tot[d] = tot.get(d, 0) + 1
        dup[d] = dup.get(d, 0) + (1 if first[g] < d else 0)

    ds = rd.from_arrow(tbl.select(["doc_id", "text"])).repartition(5)
    got = gram_novelty(ds, "doc_id", n_buckets=8).to_pandas().set_index("doc_id")
    assert len(got) == len(tot)
    for d in tot:
        assert got.loc[d, "n_grams"] == tot[d]
        assert got.loc[d, "dup_grams"] == dup[d]
        assert got.loc[d, "dup_frac"] == pytest.approx(dup[d] / tot[d])


def test_gram_novelty_monotone_duplicate_doc():
    """An exact copy of an earlier doc has dup_frac 1.0; the original
    keeps 0 unless its grams appear elsewhere (checked on a planted
    3-doc corpus, no Ray — kernel level via the query's building
    blocks)."""
    from raydedup.pipeline.extract import segmented_unique, text_to_shingle_sets

    texts = pa.array(
        [
            "alpha beta gamma delta epsilon zeta eta",
            "alpha beta gamma delta epsilon zeta eta",
            "totally different words in this one here",
        ]
    )
    sh, offs, _ = text_to_shingle_sets(texts, k=5)
    su, uoffs = segmented_unique(sh, offs)
    n = np.diff(uoffs)
    assert n[0] == n[1] > 0
    assert set(su[uoffs[0] : uoffs[1]]) == set(su[uoffs[1] : uoffs[2]])
    assert not (set(su[uoffs[0] : uoffs[1]]) & set(su[uoffs[2] : uoffs[3]]))
