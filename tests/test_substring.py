"""Exact-substring duplication (ops/substring.py) vs brute force.

The brute-force twin enumerates every L-byte window with a dict and
unions duplicated spans per doc — O(n*L) memory, test-only. The
distributed kernel must match it exactly for arbitrary corpora and
arbitrary block splits (rolling-hash identity, boundary masking,
bucket exchange, interval union, zero-dup left join)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from raydedup.ops.substring import (
    _B1,
    _B1_INV,
    duplicated_span_stats,
    rolling_window_hashes,
)


def _brute(docs: dict[int, str], L: int) -> dict[int, tuple[int, int]]:
    cnt = Counter()
    for s in docs.values():
        b = s.encode()
        for p in range(len(b) - L + 1):
            cnt[b[p : p + L]] += 1
    out = {}
    for i, s in docs.items():
        b = s.encode()
        cov = set()
        for p in range(len(b) - L + 1):
            if cnt[b[p : p + L]] > 1:
                cov.update(range(p, p + L))
        out[i] = (len(b), len(cov))
    return out


def _run(docs: dict[int, str], L: int, n_blocks: int) -> dict[int, tuple[int, int]]:
    import ray.data as rd

    items = sorted(docs.items())
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in items], pa.int64()),
            "text": pa.array([s for _, s in items], pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(n_blocks)
    res = duplicated_span_stats(ds, "doc_id", min_len=L).to_pandas()
    assert len(res) == len(docs)
    frac = dict(zip(res["doc_id"], res["dup_frac"]))
    for i in docs:
        n, d = int(res[res.doc_id == i].n_chars.iloc[0]), int(res[res.doc_id == i].dup_chars.iloc[0])
        assert frac[i] == pytest.approx(round(d / n, 6))
    return {int(r.doc_id): (int(r.n_chars), int(r.dup_chars)) for r in res.itertuples()}


def test_rolling_hash_matches_direct():
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 256, size=300, dtype=np.uint8)
    L = 17
    h = rolling_window_hashes(buf, L, _B1, _B1_INV)
    assert len(h) == 300 - L + 1
    with np.errstate(over="ignore"):
        for i in [0, 1, 100, 283]:
            acc = np.uint64(0)
            for j in range(L):
                acc = acc * _B1 + np.uint64(buf[i + j])
            assert h[i] == acc
    # shorter-than-window buffer
    assert len(rolling_window_hashes(buf[:5], 17, _B1, _B1_INV)) == 0


def test_substring_dedup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["alpha", "bravo", "chase", "delta", "eagle", "frost", "gamma", "hotel"]
    docs = {}
    for i in range(40):
        words = rng.choice(vocab, size=rng.integers(8, 40)).tolist()
        docs[i] = " ".join(words)
    # plant: full copy, partial overlap (shared prefix), contained doc
    docs[100] = docs[0]
    docs[101] = docs[1] + " unique tail " + "x" * 30
    docs[102] = docs[2][: max(len(docs[2]) // 2, 30)]
    L = 24
    expected = _brute(docs, L)
    for n_blocks in (1, 3, 7):
        got = _run(docs, L, n_blocks)
        assert got == expected, f"split {n_blocks}"


def test_substring_dedup_all_unique_and_short_docs(ray_session):
    # no duplicated windows anywhere; docs shorter than L yield zero rows
    docs = {1: "a" * 10, 2: "completely distinct sentence one two three four", 3: "zq"}
    L = 64
    got = _run(docs, L, 2)
    assert got == {i: (len(s.encode()), 0) for i, s in docs.items()}


def test_substring_dedup_within_doc_repeat(ray_session):
    # a single doc repeating its own content must self-mark
    body = "the quick brown fox jumps over the lazy dog "  # 45 bytes
    docs = {5: body * 3, 6: "some other text without repeats at all here"}
    L = 40
    expected = _brute(docs, L)
    got = _run(docs, L, 1)
    assert got == expected
    assert got[5][1] > 0 and got[6][1] == 0


def _brute_cut(docs: dict[int, str], L: int) -> dict[int, tuple[str, int]]:
    cnt = Counter()
    for s in docs.values():
        b = s.encode()
        for p in range(len(b) - L + 1):
            cnt[b[p : p + L]] += 1
    out = {}
    for i, s in docs.items():
        b = s.encode()
        cov = np.zeros(len(b), dtype=bool)
        for p in range(len(b) - L + 1):
            if cnt[b[p : p + L]] > 1:
                cov[p : p + L] = True
        out[i] = (bytes(np.frombuffer(b, np.uint8)[~cov]).decode(), int(cov.sum()))
    return out


def test_remove_duplicated_spans_matches_bruteforce(ray_session):
    import ray.data as rd

    from raydedup.ops.substring import remove_duplicated_spans

    rng = np.random.default_rng(23)
    vocab = ["alpha", "bravo", "chase", "delta", "eagle", "frost"]
    docs = {}
    for i in range(30):
        docs[i] = " ".join(rng.choice(vocab, size=rng.integers(6, 35)).tolist())
    docs[100] = docs[0]                       # full copy -> both fully cut
    docs[101] = "HEAD " + docs[1]             # shared suffix
    docs[102] = docs[2] + " TAIL"             # shared prefix
    docs[103] = "totally novel words only here never repeated elsewhere"
    L = 24
    expected = _brute_cut(docs, L)
    items = sorted(docs.items())
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in items], pa.int64()),
            "text": pa.array([s for _, s in items], pa.string()),
        }
    )
    for n_blocks in (1, 4):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        res = remove_duplicated_spans(ds, "doc_id", min_len=L).to_pandas()
        assert len(res) == len(docs)
        got = {int(r.doc_id): (r.clean_text, int(r.dup_chars)) for r in res.itertuples()}
        assert got == expected, f"split {n_blocks}"
    # sanity on intent: the exact copy pair got fully cut, the novel doc kept
    assert expected[100][0] == "" and expected[103][1] == 0


def test_remove_spans_stats_consistency(ray_session):
    # dup_chars from the transform == dup_chars from the stats op
    import ray.data as rd

    from raydedup.ops.substring import duplicated_span_stats, remove_duplicated_spans

    texts = ["the quick brown fox jumps over the lazy dog " * 2 + f"tail {i}" for i in range(6)]
    tbl = pa.table(
        {"doc_id": pa.array(list(range(6)), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    ds = rd.from_arrow(tbl).repartition(2)
    L = 40
    stats = duplicated_span_stats(ds, "doc_id", min_len=L).to_pandas().sort_values("doc_id")
    cut = remove_duplicated_spans(ds, "doc_id", min_len=L).to_pandas().sort_values("doc_id")
    assert stats.dup_chars.tolist() == cut.dup_chars.tolist()
    kept = [len(t.encode()) - d for t, d in zip(texts, stats.dup_chars)]
    assert [len(c.encode()) for c in cut.clean_text] == kept
