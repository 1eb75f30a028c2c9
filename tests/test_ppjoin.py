"""Prefix-filter join: completeness vs brute-force Jaccard."""

import numpy as np
import pandas as pd


def _corpus(rng, n_docs=40, vocab=30):
    """Texts with planted near-duplicates (word-level mutations)."""
    words = [f"w{i}" for i in range(vocab)]
    texts = []
    for i in range(n_docs):
        body = [words[int(j)] for j in rng.integers(0, vocab, 30)]
        texts.append(" ".join(body))
        if i % 3 == 0:  # mutate a copy: near-dup with high J
            body2 = list(body)
            body2[int(rng.integers(0, len(body2)))] = words[int(rng.integers(0, vocab))]
            texts.append(" ".join(body2))
    return pd.DataFrame({"url": [str(i) for i in range(len(texts))], "text": texts})


def _brute_pairs(sigs_df, tau):
    """All (ha, hb) with exact shingle-set Jaccard >= tau."""
    sets = {r.uh: set(r.sh) for r in sigs_df.itertuples()}
    keys = sorted(sets)
    out = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= tau:
                out.add((min(a, b), max(a, b)))
    return out


def test_containment_candidates_complete(ray_session):
    """Small-doc-inside-big-doc pairs (low Jaccard, high containment)
    must all be candidates, and the verify metric must match brute
    force."""
    import ray.data as rd
    import pyarrow as pa

    from raydedup.config import DedupConfig
    from raydedup.pipeline.ppjoin import containment_candidates
    from raydedup.pipeline.run import build_signatures
    from raydedup.pipeline.verify import verify_pairs
    from raydedup.sketches.hashing import hash_strings

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(25):
        body = [vocab[int(j)] for j in rng.integers(0, 40, 15)]
        texts.append(" ".join(body))
        if i % 2 == 0:  # containment pair: small doc embedded in a big one
            extra = [vocab[int(j)] for j in rng.integers(0, 40, 40)]
            texts.append(" ".join(body + extra))
    df = pd.DataFrame({"url": [str(i) for i in range(len(texts))], "text": texts})
    tau = 0.8
    cfg = DedupConfig(threshold=tau)
    sigs = build_signatures(rd.from_pandas(df).repartition(3), cfg).materialize()
    sp = sigs.to_pandas()
    uh, _ = hash_strings(pa.chunked_array([pa.array(sp.url)]))
    sp["uh"] = uh
    sets = {int(u): set(s) for u, s in zip(sp.uh, sp.shingles)}
    keys = sorted(sets)
    want = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(sets[a] & sets[b])
            mn = min(len(sets[a]), len(sets[b]))
            if mn and inter / mn >= tau:
                want[(a, b)] = round(inter / mn, 6)
    assert want, "fixture must contain containment pairs"
    cands = containment_candidates(sigs, tau, n_buckets=8).materialize()
    got_c = {
        (min(int(r.ha), int(r.hb)), max(int(r.ha), int(r.hb)))
        for r in cands.to_pandas().itertuples()
    }
    assert set(want) <= got_c, "containment prefix filter missed true pairs"
    ver = verify_pairs(cands, sigs, cfg).to_pandas()
    hits = ver[ver.containment >= tau]
    ha, _ = hash_strings(pa.chunked_array([pa.array(hits.url_a.astype(str))]))
    hb, _ = hash_strings(pa.chunked_array([pa.array(hits.url_b.astype(str))]))
    got = {
        (min(int(a), int(b)), max(int(a), int(b))): round(float(c), 6)
        for a, b, c in zip(ha, hb, hits.containment)
    }
    assert got == want


def test_prefix_candidates_complete_and_verify_exact(ray_session):
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.pipeline.ppjoin import prefix_candidates
    from raydedup.pipeline.run import build_signatures
    from raydedup.pipeline.verify import verify_pairs
    from raydedup.sketches.hashing import hash_strings
    import pyarrow as pa

    rng = np.random.default_rng(17)
    for tau in (0.5, 0.7, 0.9):
        df = _corpus(rng)
        cfg = DedupConfig(threshold=tau)
        sigs = (
            build_signatures(rd.from_pandas(df).repartition(4), cfg)
            .materialize()
        )
        sp = sigs.to_pandas()
        uh, _ = hash_strings(pa.chunked_array([pa.array(sp.url)]))
        sp["uh"] = uh
        sp["sh"] = [list(s) for s in sp.shingles]
        want = _brute_pairs(sp, tau)

        cands = prefix_candidates(sigs, cfg, n_buckets=8).materialize()
        got_c = {
            (min(int(r.ha), int(r.hb)), max(int(r.ha), int(r.hb)))
            for r in cands.to_pandas().itertuples()
        }
        assert want <= got_c, f"tau={tau}: prefix filter missed true pairs"

        ver = verify_pairs(cands, sigs, cfg).to_pandas()
        dup = ver[ver.is_dup]
        ha, _ = hash_strings(pa.chunked_array([pa.array(dup.url_a.astype(str))]))
        hb, _ = hash_strings(pa.chunked_array([pa.array(dup.url_b.astype(str))]))
        got = {
            (min(int(a), int(b)), max(int(a), int(b))) for a, b in zip(ha, hb)
        }
        assert got == want, f"tau={tau}: verified join != brute force"
