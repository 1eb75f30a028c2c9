"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints. All vectorized Arrow/NumPy inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.sketches.hashing import hash_strings

_PUNCT = ".,;:!?\"'()[]{}"

# tiny deterministic stopword sets per language for n-gram-free lang id
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


def token_stats(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """(id, n_chars, n_tokens) — whitespace tokens, unicode chars."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text)
    words = pc.utf8_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    n_docs = len(offs) - 1
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    counts = np.bincount(doc_of_word[nonempty], minlength=n_docs)
    return pa.table(
        {
            id_column: batch[id_column],
            "n_chars": n_chars.cast(pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
        }
    )


def doc_entropy(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """Per-doc unigram (word) Shannon entropy in nats:
    ``H = -Σ (c/n)·ln(c/n)`` over the doc's word-frequency
    distribution — a standard repetitiveness / quality signal (0 for
    one-word spam, ln(n) for all-distinct). Pure map-side: word hashes
    lexsorted per (doc, word) run, counts from run lengths, entropy as
    one segment-sum — no shuffle, no per-doc Python. Rounded to 6
    (the fixed-expression float-oracle discipline; a SQL oracle
    derives the same counts and the same ln expression)."""
    from raydedup.pipeline.extract import tokenize_word_hashes

    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    wh, offs = tokenize_word_hashes(text)
    n_docs = len(offs) - 1
    n_per_doc = np.diff(offs)
    ent = np.zeros(n_docs, np.float64)
    if len(wh):
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_per_doc)
        order = np.lexsort((wh, doc_of))
        d_s, w_s = doc_of[order], wh[order]
        new = np.ones(len(w_s), bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (w_s[1:] != w_s[:-1])
        run = np.cumsum(new) - 1
        c = np.bincount(run).astype(np.float64)
        run_doc = d_s[new]
        p = c / n_per_doc[run_doc]
        terms = -p * np.log(p)
        np.add.at(ent, run_doc, terms)
    ent = np.round(ent, 6)
    out = np.where(n_per_doc > 0, ent, np.nan)
    return pa.table(
        {
            id_column: batch[id_column],
            "n_tokens": pa.array(n_per_doc.astype(np.int64)),
            "entropy": pa.array(out, pa.float64()),
        }
    )


_BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_stats(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """BPE-ish regex token counts per doc: runs of letters, runs of
    digits, and single punctuation marks each count as one token (the
    usual pre-tokenization shape of byte-pair encoders). Vectorized via
    one Arrow re2 kernel over the whole column."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = pc.count_substring_regex(text, _BPEISH)
    return pa.table(
        {
            id_column: batch[id_column],
            "n_bpeish_tokens": n.cast(pa.int64()),
        }
    )


def quality_scores(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """Heuristic quality features per doc:
    (id, punct_ratio, digit_ratio, mean_word_len)."""
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    out = {
        id_column: batch[id_column],
    }
    total = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    total = np.maximum(total, 1.0)

    def count_matching(chars: str) -> np.ndarray:
        c = np.zeros(n)
        for ch in chars:
            c += pc.count_substring(text, ch).to_numpy(zero_copy_only=False)
        return c

    punct = count_matching(_PUNCT)
    digits = count_matching("0123456789")
    ws = pc.count_substring(text, " ").to_numpy(zero_copy_only=False)
    n_tokens = np.maximum(ws + 1.0, 1.0)
    out["punct_ratio"] = pa.array(punct / total, pa.float64())
    out["digit_ratio"] = pa.array(digits / total, pa.float64())
    out["mean_word_len"] = pa.array((total - ws) / n_tokens, pa.float64())
    return pa.table(out)


class LangIdStage:
    """Stopword-marker language ID (actor pool; marker hash table built
    once per actor).

    Picks the language with the highest count of *distinct* marker
    words present in the doc; ties and zero-marker docs fall back to
    'unknown'. Fully vectorized: tokens are hashed once per batch and
    matched against a sorted u64 marker-hash array (searchsorted) —
    no per-row Python, no ``to_pylist``.
    """

    def __init__(self):
        self.lang_names = list(_LANG_MARKERS)  # order = tie-break priority
        # one entry per DISTINCT marker word, with a language bitmask —
        # words shared across languages ("la", "un", "que") must credit
        # every language that lists them
        mask_of: dict[str, int] = {}
        for li, (_, ms) in enumerate(_LANG_MARKERS.items()):
            for w in ms:
                mask_of[w] = mask_of.get(w, 0) | (1 << li)
        words = sorted(mask_of)
        h, _ = hash_strings(pa.array(words, pa.string()))
        order = np.argsort(h)
        self.marker_hashes = h[order]
        self.marker_mask = np.asarray([mask_of[w] for w in words], np.int64)[order]
        self.n_markers = len(words)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_docs = len(text)
        n_langs = len(self.lang_names)
        offs_arr = pc.utf8_split_whitespace(pc.utf8_lower(text))
        if isinstance(offs_arr, pa.ChunkedArray):
            offs_arr = offs_arr.combine_chunks()
        offs = offs_arr.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        preds = np.full(n_docs, "unknown", dtype=object)
        if len(doc_of_word):
            ht, _ = hash_strings(offs_arr.flatten())
            pos = np.minimum(np.searchsorted(self.marker_hashes, ht), self.n_markers - 1)
            hit = self.marker_hashes[pos] == ht
            if hit.any():
                docs = doc_of_word[hit]
                midx = pos[hit]
                # distinct (doc, marker-word) pairs → per-(doc, lang)
                # counts, crediting every language in the word's mask
                key = np.unique(docs * np.int64(self.n_markers) + midx)
                d = key // self.n_markers
                masks = self.marker_mask[key % self.n_markers]
                counts = np.zeros((n_docs, n_langs), np.int64)
                for li in range(n_langs):
                    sel = (masks >> li) & 1 == 1
                    if sel.any():
                        counts[:, li] = np.bincount(d[sel], minlength=n_docs)
                best = counts.argmax(axis=1)  # first max wins = dict order
                names = np.asarray(self.lang_names, dtype=object)
                nonzero = counts.max(axis=1) > 0
                preds[nonzero] = names[best[nonzero]]
        out = pa.table(
            {c: batch[c] for c in batch.column_names if c != "text"}
            | {"lang_pred": pa.array(preds, pa.string())}
        )
        return out


def fingerprint(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """128-bit content fingerprint (murmur3 h1/h2 hex) per document.

    Hex encoding is vectorized: big-endian (h1, h2) bytes → one
    ``binascii.hexlify`` over the whole batch, sliced into 32-char
    strings via a zero-copy Arrow offsets buffer.
    """
    import binascii

    h1, h2 = hash_strings(batch[text_column])
    n = len(h1)
    be = np.empty((n, 2), dtype=">u8")
    be[:, 0] = h1
    be[:, 1] = h2
    hexbytes = binascii.hexlify(be.tobytes())
    offsets = (np.arange(n + 1, dtype=np.int32) * 32).tobytes()
    fp = pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offsets), pa.py_buffer(hexbytes)]
    )
    return pa.table({id_column: batch[id_column], "fingerprint": fp})


def repetition_stats(
    batch: pa.Table, id_column: str, text_column: str = "text", ks: tuple = (2, 3)
) -> pa.Table:
    """Gopher-style within-document repetition signals: for each k in
    ``ks``, the word-k-gram count, the number of duplicated k-gram
    occurrences (total - distinct) and the duplicate fraction — the
    classic repetition filter for web-crawl training corpora.

    Fully vectorized on the shared shingle kernels (words are hashed
    once; k-gram hashes and per-doc distinct counts reuse
    ``shingle_hashes`` / ``segmented_unique``). Documents shorter than
    k words have zero k-grams (the dedup pipeline's short-doc sentinel
    shingle is masked out here — it is not a k-gram).
    """
    from raydedup.pipeline.extract import (
        segmented_unique,
        shingle_hashes,
        tokenize_word_hashes,
    )

    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    word_h1, off = tokenize_word_hashes(text)
    w = np.diff(off)
    cols: dict = {id_column: batch[id_column]}
    for k in ks:
        sh, sh_off = shingle_hashes(word_h1, off, k=k)
        full = w >= k
        total = np.where(full, np.diff(sh_off), 0).astype(np.int64)
        _, uo = segmented_unique(sh, sh_off)
        uniq = np.where(full, np.diff(uo), 0).astype(np.int64)
        dup = total - uniq
        frac = np.divide(
            dup.astype(np.float64),
            total.astype(np.float64),
            out=np.zeros(len(total), np.float64),
            where=total > 0,
        )
        cols[f"n_grams_{k}"] = pa.array(total, pa.int64())
        cols[f"n_dup_grams_{k}"] = pa.array(dup, pa.int64())
        cols[f"dup_frac_{k}"] = pa.array(frac, pa.float64())
    return pa.table(cols)


def bigram_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-batch partial word-bigram counts → (gram, count) rows.

    The map-side combiner for the corpus-wide ``top_ngrams`` boilerplate
    scan: each block collapses to its distinct grams before the groupby
    shuffle, so the exchange carries vocabulary-sized partials instead
    of one row per token. Gram strings are built with one vectorized
    Arrow join over adjacent in-document words (lowercased, empty
    split-tokens dropped — the tokenizer's semantics).
    """
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    empty = pa.table({"gram": pa.array([], pa.string()), "count": pa.array([], pa.int64())})
    if len(text) == 0:
        return empty
    words = pc.utf8_split_whitespace(pc.utf8_lower(text))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    n_docs = len(off) - 1
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not nonempty.all():
        doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(nonempty))
        counts = np.bincount(doc_of_word[nonempty], minlength=n_docs)
        off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
    if len(flat) == 0:
        return empty
    # adjacency within a doc: position i pairs with i+1 unless i is the
    # doc's last word
    last = np.zeros(len(flat), dtype=bool)
    last[off[1:] - 1] = True
    lead = np.nonzero(~last[: len(flat) - 1])[0] if len(flat) > 1 else np.empty(0, np.int64)
    if len(lead) == 0:
        return empty
    a = flat.take(pa.array(lead))
    b = flat.take(pa.array(lead + 1))
    gram = pc.binary_join_element_wise(a, b, " ")
    vc = pc.value_counts(gram)
    return pa.table(
        {"gram": vc.field("values"), "count": vc.field("counts").cast(pa.int64())}
    )


class CurationStage:
    """Corpus-curation decision per document — the C4/Gopher-style
    filter chain composed from the engine's text-analysis kernels in
    ONE actor-pool pass (marker hash table built once per actor):

    - ``lang``: language-ID prediction must be in ``keep_langs``;
    - ``word_len``: mean word length within [min_word_len,
      max_word_len] (C4 drops lorem-ipsum-ish and symbol-soup docs);
    - ``punct``: punctuation ratio <= max_punct_ratio;
    - ``repetition``: duplicate-bigram fraction <= max_dup_frac
      (Gopher repetition filter).

    Emits ``(id, keep, reason)`` where ``reason`` is the FIRST failing
    rule in the order above ('' when kept) — the per-rule attrition
    accounting a curation pipeline reports.
    """

    RULES = ("lang", "word_len", "punct", "repetition")

    def __init__(
        self,
        id_column: str = "doc_id",
        keep_langs: tuple = ("en",),
        min_word_len: float = 3.0,
        max_word_len: float = 12.0,
        max_punct_ratio: float = 0.1,
        max_dup_frac: float = 0.2,
    ):
        self.id_column = id_column
        self.keep_langs = set(keep_langs)
        self.min_word_len = min_word_len
        self.max_word_len = max_word_len
        self.max_punct_ratio = max_punct_ratio
        self.max_dup_frac = max_dup_frac
        self.langid = LangIdStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        idc = self.id_column
        lang = self.langid(batch)["lang_pred"].to_numpy(zero_copy_only=False)
        q = quality_scores(batch, idc)
        rep = repetition_stats(batch, idc, ks=(2,))
        mwl = q["mean_word_len"].to_numpy(zero_copy_only=False)
        punct = q["punct_ratio"].to_numpy(zero_copy_only=False)
        dup2 = rep["dup_frac_2"].to_numpy(zero_copy_only=False)
        n = len(batch)
        fails = np.stack(
            [
                ~np.isin(lang, list(self.keep_langs)),
                (mwl < self.min_word_len) | (mwl > self.max_word_len),
                punct > self.max_punct_ratio,
                dup2 > self.max_dup_frac,
            ]
        )
        any_fail = fails.any(axis=0)
        first = fails.argmax(axis=0)  # first True row = first failing rule
        names = np.asarray(("",) + self.RULES, dtype=object)
        reason = names[np.where(any_fail, first + 1, 0)]
        return pa.table(
            {
                idc: batch[idc],
                "keep": pa.array(~any_fail),
                "reason": pa.array(reason, pa.string()),
            }
        )


def chunk_docs(
    batch: pa.Table,
    id_column: str,
    text_column: str = "text",
    chunk_words: int = 64,
) -> pa.Table:
    """Split documents into fixed word-count chunks — the
    context-window packing prep step of a training pipeline. Emits
    (id, chunk_idx, n_words, chunk_text); empty docs emit no chunks.

    Fully vectorized and allocation-light: words are split once with
    Arrow, chunk rows are a zero-copy re-offsetting of the SAME flat
    word buffer (a new ListArray over new offsets), and chunk text is
    one ``pc.binary_join`` over that list — no per-doc Python.
    """
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.utf8_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()  # slice-safe (values() ignores array offset)
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    # Arrow's split emits empty tokens at boundaries ("", "a ") — drop
    # them and rebuild offsets (same policy as tokenize_word_hashes)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if len(flat) and not nonempty.all():
        n_docs = len(off) - 1
        doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
        flat = flat.filter(pa.array(nonempty))
        counts = np.bincount(doc_of_word[nonempty], minlength=n_docs)
        off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
    n_words_doc = np.diff(off)
    n_chunks = (n_words_doc + chunk_words - 1) // chunk_words
    total = int(n_chunks.sum())
    ids = batch[id_column].combine_chunks() if isinstance(
        batch[id_column], pa.ChunkedArray
    ) else batch[id_column]
    if total == 0:
        return pa.table(
            {
                id_column: ids.slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
    doc_of = np.repeat(np.arange(len(n_chunks), dtype=np.int64), n_chunks)
    cum = np.zeros(len(n_chunks), np.int64)
    np.cumsum(n_chunks[:-1], out=cum[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - cum[doc_of]
    starts = off[:-1][doc_of] + chunk_idx * chunk_words
    ends = np.minimum(starts + chunk_words, off[1:][doc_of])
    # new list offsets over the SAME flat word values: starts are
    # contiguous per doc (each chunk starts where the previous ended),
    # so offsets = [starts..., last end]
    new_off = np.empty(total + 1, np.int64)
    new_off[:-1] = starts
    new_off[-1] = ends[-1]
    # non-contiguity across docs (a doc's last end == next doc's start
    # by construction since chunks tile the doc exactly) — holds, so a
    # single offsets vector is valid
    chunks_list = pa.ListArray.from_arrays(pa.array(new_off, pa.int32() if new_off[-1] < 2**31 else pa.int64()), flat)
    chunk_text = pc.binary_join(chunks_list, " ")
    return pa.table(
        {
            id_column: ids.take(pa.array(doc_of)),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_words": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "chunk_text": chunk_text,
        }
    )


# PII patterns — RE2 syntax so the Arrow kernel and a DuckDB
# `regexp_replace(..., 'g')` oracle execute the SAME automaton.
# Order matters (emails carry digits; IPs carry dots): email → ip → phone.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def pii_redact(batch: pa.Table, id_column: str, text_column: str = "text") -> pa.Table:
    """Redact PII spans (emails, IPv4s, phone-like digit runs) and
    count each kind — the corpus-hygiene pass a training pipeline runs
    before tokenization. Returns (id, n_email, n_ip, n_phone,
    clean_text). One compiled-RE2 Arrow kernel per pattern over the
    whole batch; patterns apply in a fixed order so counts are
    non-overlapping by construction.
    """
    text = batch[text_column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out: dict[str, object] = {id_column: batch[id_column]}
    for name, pattern, token in PII_PATTERNS:
        out[f"n_{name}"] = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
        text = pc.replace_substring_regex(text, pattern, token)
    out["clean_text"] = text
    return pa.table(out)


def top_words_per_group(
    ds,
    group_column: str,
    text_column: str = "text",
    k: int = 10,
    max_map_size: int = 1024,
):
    """Per-group frequent words via mergeable Misra-Gries partials.

    Map-side, each block collapses every group it holds to ONE bounded
    MG sketch image (`FrequentItemsSketch`, the reference's
    frequencies family) — the exchange carries (group, blob) rows with
    blob size O(max_map_size), never per-token rows, at any corpus
    size. The per-group fold merges images and emits the top ``k``
    items ordered by (count desc, word asc). Counts are EXACT while a
    group's distinct-word count stays below 0.75*max_map_size (the
    reference's exactness bound, `frequencies/mod.rs:43-44`); beyond
    it they carry the documented <= 3.5W/M error envelope.
    """
    from raydedup.sketches.frequencies import FrequentItemsSketch

    def partials(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        out_g, out_b = [], []
        if len(text):
            words = pc.utf8_split_whitespace(pc.utf8_lower(text))
            if isinstance(words, pa.ChunkedArray):
                words = words.combine_chunks()
            flat = words.flatten()
            off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            off = off - off[0]
            n_docs = len(off) - 1
            doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off))
            wv = flat.to_numpy(zero_copy_only=False)
            nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
            wv, doc_of_word = wv[nonempty], doc_of_word[nonempty]
            groups = batch[group_column].to_numpy(zero_copy_only=False)
            wg = groups[doc_of_word]
            for g in np.unique(wg):
                sk = FrequentItemsSketch(max_map_size).update_batch(wv[wg == g])
                out_g.append(g)
                out_b.append(sk.to_bytes())
        return pa.table(
            {
                group_column: pa.array(out_g, pa.string()),
                "blob": pa.array(out_b, pa.large_binary()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        sks = [FrequentItemsSketch.from_bytes(b) for b in g["blob"].to_pylist()]
        acc = sks[0]
        for s in sks[1:]:
            acc = acc.merge(s)
        top = acc.frequent_items()[:k]
        n = len(top)
        return pa.table(
            {
                group_column: g[group_column].take(pa.array([0] * n)),
                "word": pa.array([str(t[0]) for t in top], pa.string()),
                "n": pa.array([int(t[1]) for t in top], pa.int64()),
                "rank": pa.array(list(range(1, n + 1)), pa.int64()),
            }
        )

    return (
        ds.select_columns([group_column, text_column])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(fold, batch_format="pyarrow")
    )
