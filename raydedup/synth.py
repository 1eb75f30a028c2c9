"""Deterministic Common-Crawl-style corpus with planted duplicate clusters.

Generates the ``pages`` table of `BASELINE.json.input_hint` shape —
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — plus a ``golden_clusters(url, cluster_id, kind)``
side table recording the planted structure (FIXTURES.md §1):

- **exact-dup** (~5%): byte-identical ``text`` under distinct urls.
- **near-dup** (~15%): shingle-level edits of a base doc targeting
  5-gram Jaccard tiers {0.95, 0.9, 0.85, 0.8, 0.7}; the 0.7 tier sits
  below the dedup threshold and must mostly NOT cluster.
- **substring-dup**: a text fully contained in a longer wrapper.
- **boilerplate trap**: many distinct pages sharing one large common
  template region (creates a hot LSH band).
- **singletons**: the rest.

Everything derives from one ``numpy`` PCG64 stream seeded by ``seed``,
so any scale regenerates identically. ``html`` is a fixed template
around ``text`` so ``extract(html) == text`` byte-identically (the
per-row invariant in BASELINE.json.input_hint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HTML_PREFIX = b"<html><head><title>page</title></head><body>"
HTML_SUFFIX = b"</body></html>"

_SYLLABLES = [
    c + v for c in "bcdfghjklmnprstvwz" for v in ["a", "e", "i", "o", "u", "ar", "en", "is", "or", "ul"]
]


def _make_vocab(n_words: int, rng: np.random.Generator) -> list[str]:
    syl = np.array(_SYLLABLES)
    n_syl = rng.integers(2, 5, size=n_words)
    words = []
    for k in n_syl:
        words.append("".join(rng.choice(syl, size=k)))
    return words


def _zipf_word_ids(rng: np.random.Generator, vocab_size: int, n: int) -> np.ndarray:
    # zipf-ish: rank ~ floor(exp(u * ln(V))) gives a heavy head
    u = rng.random(n)
    ids = np.floor(vocab_size ** u).astype(np.int64) - 1
    return np.clip(ids, 0, vocab_size - 1)


def _doc_words(rng: np.random.Generator, vocab: list[str], n_words: int) -> list[str]:
    ids = _zipf_word_ids(rng, len(vocab), n_words)
    return [vocab[i] for i in ids]


def _edit_for_jaccard(words: list[str], target_j: float, rng: np.random.Generator, vocab: list[str], k: int = 5) -> list[str]:
    """Replace spread-out words so 5-gram shingle Jaccard ≈ target_j.

    Each replacement at distance >= k from the others kills k shingles
    on each side: J = (S - k*m) / (S + k*m) → m = S(1-J) / (k(1+J)).
    """
    s = max(1, len(words) - k + 1)
    m = max(1, round(s * (1 - target_j) / (k * (1 + target_j))))
    out = list(words)
    # spread positions at least k apart, away from the ends
    avail = list(range(k, len(words) - k))
    rng.shuffle(avail)
    chosen: list[int] = []
    for p in avail:
        if all(abs(p - q) >= k for q in chosen):
            chosen.append(p)
            if len(chosen) == m:
                break
    for p in chosen:
        out[p] = vocab[int(rng.integers(0, len(vocab)))]
    return out


def generate_pages(
    n_rows: int,
    seed: int = 42,
    n_domains: int = 1000,
    boilerplate_frac: float = 0.08,
) -> tuple[pa.Table, pa.Table]:
    """Build (pages, golden_clusters) deterministically.

    Cluster ids are the row index of the cluster's first member; kind is
    one of exact/near-{tier}/substring/boilerplate/singleton.
    """
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(4000, rng)
    boiler_words = _doc_words(rng, vocab, 120)  # the shared template region

    texts: list[str] = []
    kinds: list[str] = []
    cluster_ids: list[int] = []
    tiers = [0.95, 0.9, 0.85, 0.8, 0.7]

    i = 0
    while i < n_rows:
        r = rng.random()
        remaining = n_rows - i
        if r < 0.05 and remaining >= 2:  # exact-dup cluster
            size = min(int(rng.integers(2, 6)), remaining)
            base = " ".join(_doc_words(rng, vocab, int(rng.integers(60, 400))))
            for _ in range(size):
                texts.append(base)
                kinds.append("exact")
                cluster_ids.append(i)
            i += size
        elif r < 0.20 and remaining >= 2:  # near-dup cluster at a tier
            tier = tiers[int(rng.integers(0, len(tiers)))]
            size = min(int(rng.integers(2, 4)), remaining)
            base_words = _doc_words(rng, vocab, int(rng.integers(150, 500)))
            texts.append(" ".join(base_words))
            kinds.append(f"near-{tier}")
            cluster_ids.append(i)
            for _ in range(size - 1):
                var = _edit_for_jaccard(base_words, tier, rng, vocab)
                texts.append(" ".join(var))
                kinds.append(f"near-{tier}")
                cluster_ids.append(i)
            i += size
        elif r < 0.23 and remaining >= 2:  # substring-dup pair
            inner = _doc_words(rng, vocab, int(rng.integers(80, 200)))
            pre = _doc_words(rng, vocab, int(rng.integers(40, 120)))
            post = _doc_words(rng, vocab, int(rng.integers(40, 120)))
            texts.append(" ".join(inner))
            texts.append(" ".join(pre + inner + post))
            kinds.extend(["substring", "substring"])
            cluster_ids.extend([i, i])
            i += 2
        elif r < 0.23 + boilerplate_frac:  # boilerplate-trap page (distinct tail)
            own = _doc_words(rng, vocab, int(rng.integers(100, 300)))
            texts.append(" ".join(boiler_words + own))
            kinds.append("boilerplate")
            cluster_ids.append(-1)  # not a duplicate cluster
            i += 1
        else:  # singleton
            texts.append(" ".join(_doc_words(rng, vocab, int(rng.integers(50, 600)))))
            kinds.append("singleton")
            cluster_ids.append(-1)
            i += 1

    n = len(texts)
    # urls: zipf-distributed domains (hot hosts), unique path per row
    dom_ids = _zipf_word_ids(rng, n_domains, n)
    urls = [f"https://site{dom_ids[j]}.example.com/page/{j:09d}" for j in range(n)]
    ts = (1_600_000_000_000_000 + np.arange(n, dtype=np.int64) * 1_000_000
          + rng.integers(0, 1_000_000, size=n, dtype=np.int64))
    langs = np.where(
        rng.random(n) < 0.9, "en", np.array(["de", "fr", "es"])[rng.integers(0, 3, size=n)]
    )
    html = [HTML_PREFIX + t.encode() + HTML_SUFFIX for t in texts]

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )
    golden = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "cluster_id": pa.array(cluster_ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return pages, golden


def write_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_files: int = 8,
    row_group_size: int = 4096,
) -> None:
    """Write the corpus as partitioned parquet (resumable layout).

    ``row_group_size`` matters for read parallelism: Ray's parquet
    datasource can split a file into multiple read tasks only at
    row-group boundaries, so a file written as ONE row group caps the
    whole downstream map pipeline at n_files concurrent tasks no
    matter how many CPUs the cluster has (measured: the 16-file
    single-row-group bench corpus starved half of a 32-CPU box through
    the signature stage).
    """
    import os

    import pyarrow.parquet as pq

    pages, golden = generate_pages(n_rows, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    step = (pages.num_rows + n_files - 1) // n_files
    for f in range(n_files):
        part = pages.slice(f * step, step)
        if part.num_rows:
            pq.write_table(
                part, f"{out_dir}/pages_{f:04d}.parquet", row_group_size=row_group_size
            )
    pq.write_table(golden, f"{out_dir}/golden_clusters.parquet")


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raydedup_corpus"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    write_corpus(out, n)
    print(f"wrote {n} pages to {out}")
