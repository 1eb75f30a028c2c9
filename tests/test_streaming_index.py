"""Streaming (online) near-dup index: sharded actor service vs the
sequential dict-walk twin (raydedup/state/lsh_index.py).

The service answers the ingestion-time form of the dedup question:
each micro-batch is probed against — then committed to — everything
previously committed. These tests pin the sharded implementation to
the explicit sequential semantics on corpora with planted duplicates.
"""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.pipeline.lsh import SignatureStage
from raydedup.state.lsh_index import (
    StreamingDedupIndex,
    _best_match,
    streaming_dedup_local,
)


def _corpus(n=240, seed=11):
    """Synthetic docs with planted near-dup chains across the stream."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(500)]
    texts, base = [], []
    for i in range(n):
        if i >= 3 and rng.random() < 0.3:
            # near-duplicate of an EARLIER doc: copy + light edit
            j = int(rng.integers(0, i))
            toks = base[j].split()
            pos = int(rng.integers(0, len(toks)))
            toks[pos] = words[int(rng.integers(0, len(words)))]
            t = " ".join(toks)
        else:
            t = " ".join(rng.choice(words, size=60).tolist())
        texts.append(t)
        base.append(t)
    urls = [f"https://synth.local/doc/{i}" for i in range(n)]
    return urls, texts


def _batches(urls, texts, cfg, batch_size):
    sig_tbl = SignatureStage(cfg)(
        pa.table({"url": pa.array(urls), "text": pa.array(texts)})
    )
    sig = (
        sig_tbl["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, cfg.num_perms)
    band = (
        sig_tbl["band_hash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, cfg.bands)
    out = []
    for s0 in range(0, len(urls), batch_size):
        u = urls[s0 : s0 + batch_size]
        bm = band[s0 : s0 + batch_size]
        dok = np.repeat(np.arange(len(u), dtype=np.int64), cfg.bands)
        out.append((u, bm.reshape(-1).view(np.int64), dok, sig[s0 : s0 + batch_size]))
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_shards", [1, 4])
def test_sharded_index_matches_sequential_twin(n_shards):
    cfg = DedupConfig()
    urls, texts = _corpus()
    batches = _batches(urls, texts, cfg, batch_size=50)

    exp_dup, exp_match = streaming_dedup_local(batches, min_agree=0.8, max_key_group=64)

    index = StreamingDedupIndex(n_shards=n_shards, min_agree=0.8, max_key_group=64)
    got_dup, got_match = [], []
    for u, keys, dok, sigs in batches:
        d, m = index.process_batch(u, keys, dok, sigs)
        got_dup.append(d)
        got_match.extend(m.tolist())
    got_dup = np.concatenate(got_dup)

    assert got_dup.tolist() == exp_dup.tolist()
    assert got_match == exp_match.tolist()
    # the planted chains must actually produce dups (non-trivial fixture)
    assert int(exp_dup.sum()) > 10
    # every committed entry lives in exactly one shard
    stats = index.stats()
    assert sum(s["n_entries"] for s in stats) > 0


@pytest.mark.usefixtures("ray_session")
def test_first_batch_never_dup_and_history_only_matches():
    """Within-batch pairs are NOT flagged (batch = atomicity unit);
    a doc repeated in a later batch IS flagged against history."""
    cfg = DedupConfig()
    texts = ["alpha beta gamma delta " * 20, "alpha beta gamma delta " * 20]
    urls = ["https://synth.local/doc/0", "https://synth.local/doc/1"]
    one_batch = _batches(urls, texts, cfg, batch_size=2)
    d, m = streaming_dedup_local(one_batch)
    assert not d.any()

    two_batches = _batches(urls, texts, cfg, batch_size=1)
    index = StreamingDedupIndex(n_shards=2)
    d0, _ = index.process_batch(*two_batches[0])
    d1, m1 = index.process_batch(*two_batches[1])
    assert not d0.any()
    assert d1.tolist() == [True]
    assert m1.tolist() == ["https://synth.local/doc/0"]


def test_best_match_tiebreak_min_url():
    """Equal agreement -> lexicographically smallest url wins."""
    sigs_q = np.zeros((1, 8), dtype=np.uint32)
    cand_idx = np.array([0, 0], dtype=np.int64)
    cand_urls = np.array(["b", "a"], dtype=object)
    cand_sigs = np.zeros((2, 8), dtype=np.uint32)
    agree, murl = _best_match(1, sigs_q, cand_idx, cand_urls, cand_sigs, 0.8)
    assert agree[0] == 1.0 and murl[0] == "a"

    # below-threshold candidates produce no match
    cand_sigs2 = np.ones((2, 8), dtype=np.uint32)
    agree2, murl2 = _best_match(1, sigs_q, cand_idx, cand_urls, cand_sigs2, 0.8)
    assert agree2[0] == 0.0 and murl2[0] == ""


def test_max_key_group_caps_hot_key():
    """A hot band key retains only the first max_key_group entries."""
    n, P = 10, 4
    urls = [f"u{i:02d}" for i in range(n)]
    keys = np.zeros(n, dtype=np.int64)  # everyone shares ONE key
    dok = np.arange(n, dtype=np.int64)
    sigs = np.arange(n * P, dtype=np.uint32).reshape(n, P)
    sigs[:] = sigs[0]  # identical signatures -> all agree 1.0
    batches = [([u], keys[i : i + 1], np.zeros(1, np.int64), sigs[i : i + 1]) for i, u in enumerate(urls)]
    d, m = streaming_dedup_local(batches, min_agree=0.8, max_key_group=3)
    # first doc unmatched; the rest match the earliest committed (u00)
    assert d.tolist() == [False] + [True] * (n - 1)
    assert all(x == "u00" for x in m[1:])


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_restore_resumes_identically(tmp_path):
    """checkpoint() mid-stream + restore() must continue EXACTLY as the
    uninterrupted service would: same dup flags, same match urls, same
    shard stats. Also pins the manifest lineage (per-shard row counts)."""
    cfg = DedupConfig()
    urls, texts = _corpus(n=160, seed=23)
    batches = _batches(urls, texts, cfg, batch_size=40)

    # uninterrupted run
    full = StreamingDedupIndex(n_shards=3, min_agree=0.8, max_key_group=64)
    want = [full.process_batch(*b) for b in batches]

    # run half, snapshot, restore into a NEW service, run the rest
    half = StreamingDedupIndex(n_shards=3, min_agree=0.8, max_key_group=64)
    got = [half.process_batch(*b) for b in batches[:2]]
    manifest = half.checkpoint(str(tmp_path / "ckpt"))
    assert manifest["n_shards"] == 3
    assert sum(r["n_rows"] for r in manifest["shards"]) > 0
    resumed = StreamingDedupIndex.restore(str(tmp_path / "ckpt"))
    assert resumed.min_agree == 0.8 and resumed.max_key_group == 64
    got += [resumed.process_batch(*b) for b in batches[2:]]

    for (wd, wm), (gd, gm) in zip(want, got):
        assert (wd == gd).all()
        assert (wm == gm).all()
    assert resumed.stats() == full.stats()


@pytest.mark.usefixtures("ray_session")
def test_restore_rejects_manifest_row_mismatch(tmp_path):
    import json
    import os

    cfg = DedupConfig()
    urls, texts = _corpus(n=40, seed=29)
    batches = _batches(urls, texts, cfg, batch_size=40)
    idx = StreamingDedupIndex(n_shards=2, min_agree=0.8, max_key_group=64)
    idx.process_batch(*batches[0])
    path = str(tmp_path / "ckpt")
    idx.checkpoint(path)
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["shards"][0]["n_rows"] += 1
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="manifest says"):
        StreamingDedupIndex.restore(path)


@pytest.mark.usefixtures("ray_session")
def test_ttl_eviction_matches_twin_and_survives_checkpoint(tmp_path):
    """Crawl-recency TTL: with max_age=2 a repeat of a doc seen 3+
    batches ago is NOT flagged; the sharded service matches the
    sequential twin under the same TTL, and checkpoint/restore carries
    the stamps and batch counter so eviction resumes correctly."""
    cfg = DedupConfig()
    base = " ".join(f"tok{i}" for i in range(60))
    # batch 0: doc A; batches 1-2: fillers; batch 3: exact repeat of A
    texts = [base] + [f"filler {i} " * 30 for i in range(2)] + [base]
    urls = [f"u{i}" for i in range(4)]
    batches = _batches(urls, texts, cfg, batch_size=1)

    exp_dup, exp_match = streaming_dedup_local(
        batches, min_agree=0.8, max_key_group=64, max_age=2
    )
    assert not exp_dup[3]  # aged out under TTL 2
    no_ttl_dup, _ = streaming_dedup_local(batches, min_agree=0.8, max_key_group=64)
    assert no_ttl_dup[3]  # and WOULD match without the TTL

    idx = StreamingDedupIndex(n_shards=3, min_agree=0.8, max_key_group=64, max_age=2)
    got = [idx.process_batch(*b) for b in batches[:2]]
    idx.checkpoint(str(tmp_path / "ck"))
    resumed = StreamingDedupIndex.restore(str(tmp_path / "ck"))
    assert resumed.max_age == 2 and resumed.batch_no == 2
    got += [resumed.process_batch(*b) for b in batches[2:]]
    gd = np.concatenate([g[0] for g in got])
    gm = np.concatenate([g[1] for g in got])
    assert (gd == exp_dup).all()
    assert (gm == exp_match).all()


@pytest.mark.usefixtures("ray_session")
def test_uint64_band_keys_checkpoint_and_match(tmp_path):
    """Raw uint64 band keys (the natural ``band_keys()`` dtype) with
    values >= 2**63 must insert, probe AND checkpoint — round-4 advisor
    found dump() overflowed exactly when snapshotting. The canonical
    int64 normalization also makes a uint64 probe match an entry that
    was inserted via the int64 view of the same bit pattern."""
    cfg = DedupConfig()
    sigs = np.arange(2 * cfg.num_perms, dtype=np.uint32).reshape(2, -1)
    sigs[1] = sigs[0]  # identical signatures -> agreement 1.0
    hi_keys = np.array([2**63 + 5, 2**64 - 17], dtype=np.uint64)
    dok = np.zeros(len(hi_keys), dtype=np.int64)

    idx = StreamingDedupIndex(n_shards=2, min_agree=0.8)
    is_dup, _ = idx.process_batch(["a"], hi_keys, dok, sigs[:1])
    assert not is_dup[0]
    # checkpoint used to raise OverflowError with uint64-keyed state
    idx.checkpoint(str(tmp_path / "ck"))
    resumed = StreamingDedupIndex.restore(str(tmp_path / "ck"))
    # probe with the int64 view of the SAME keys: must match "a"
    is_dup2, match2 = resumed.process_batch(
        ["b"], hi_keys.view(np.int64), dok, sigs[1:]
    )
    assert is_dup2[0] and match2[0] == "a"


def test_bloom_contains_and_insert_equivalence():
    """Single-pass probe-and-set == contains() then insert() from the
    same state (bloom/sketch.rs:120-123 analog), bit-for-bit."""
    from raydedup.sketches.bloom import BloomFilter

    rng = np.random.default_rng(3)
    a = BloomFilter.with_accuracy(10_000, 0.01)
    b = BloomFilter.with_accuracy(10_000, 0.01)
    for _ in range(5):
        toks = rng.integers(0, 5_000, 400, dtype=np.uint64)
        want = b.contains(toks)
        b.insert(toks)
        got = a.contains_and_insert(toks)
        assert (got == want).all()
        assert (a.bits == b.bits).all()


@pytest.mark.usefixtures("ray_session")
def test_prefilter_skips_fresh_keys_and_preserves_results():
    """The streaming index's Bloom pre-filter must (a) leave the
    dup/match outputs identical to the sequential twin and (b) ship
    strictly fewer probe keys than the unfiltered service — batch 0 is
    all-fresh, so it probes ~0 keys."""
    cfg = DedupConfig()
    urls, texts = _corpus(n=120, seed=5)
    batches = _batches(urls, texts, cfg, batch_size=30)
    exp_dup, exp_match = streaming_dedup_local(batches, min_agree=0.8)

    idx = StreamingDedupIndex(n_shards=3, min_agree=0.8)
    got = [idx.process_batch(*b) for b in batches]
    gd = np.concatenate([g[0] for g in got])
    gm = np.concatenate([g[1] for g in got])
    assert (gd == exp_dup).all()
    assert (gm == exp_match).all()
    # measured saving: fewer probe keys shipped than total keys
    assert idx.n_keys_total == sum(len(b[1]) for b in batches)
    assert idx.n_keys_probed < idx.n_keys_total
