"""Text-analysis batch transforms for large-scale training-data pipelines:
language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting.  All vectorized (pyarrow.compute / pandas str
kernels); regexes compiled once per actor via the callable-class pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish word/number/punct split
WS_TOKEN_RE = r"\S+"

# small marker-word lists per language (n-gram heuristic; public common words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "por", "que", "una", "con"),
}

STOPWORDS = frozenset(LANG_MARKERS["en"])


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens`` (whitespace tokens) and ``n_bpe_tokens``
    (BPE-ish regex pieces) — pure pc kernels."""
    t = batch[text_col]
    ws = pc.count_substring_regex(t, WS_TOKEN_RE)
    bpe = pc.count_substring_regex(t, TOKEN_RE)
    out = batch.append_column("n_tokens", pc.cast(ws, pa.int64()))
    return out.append_column("n_bpe_tokens", pc.cast(bpe, pa.int64()))


def pack_greedy(lens: np.ndarray, capacity: int) -> np.ndarray:
    """Greedy in-order sequence packing (training-batch construction):
    walk documents in the given order, open a new bin whenever the current
    one would overflow ``capacity``; a document longer than ``capacity``
    gets a bin of its own (real pipelines chunk it first).  Returns the
    bin index per document.

    The reset-cumsum is inherently sequential, so instead of a per-doc
    Python loop this iterates once per BIN (≈ docs × mean_len / capacity —
    30-60× fewer steps) using searchsorted over the prefix sums.
    """
    n = len(lens)
    bins = np.empty(n, dtype=np.int64)
    if n == 0:
        return bins
    cs = np.cumsum(lens, dtype=np.int64)
    start, b = 0, 0
    while start < n:
        base = cs[start - 1] if start > 0 else 0
        # last doc that still fits together with everything since `start`
        end = int(np.searchsorted(cs, base + capacity, side="right"))
        if end == start:  # single doc longer than capacity: own bin
            end = start + 1
        bins[start:end] = b
        b += 1
        start = end
    return bins


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features + composite score ∈ [0,1]:
    length, punctuation ratio, stopword ratio, mean word length."""
    t = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(t), pa.float64()).fill_null(0).to_numpy(zero_copy_only=False)
    n_tok = pc.cast(pc.count_substring_regex(t, WS_TOKEN_RE), pa.float64()).fill_null(0).to_numpy(zero_copy_only=False)
    n_punct = pc.cast(pc.count_substring_regex(t, r"[^\w\s]"), pa.float64()).fill_null(0).to_numpy(zero_copy_only=False)
    n_stop = pc.cast(
        pc.count_substring_regex(t, r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"),
        pa.float64(),
    ).fill_null(0).to_numpy(zero_copy_only=False)

    tok = np.maximum(n_tok, 1.0)
    punct_ratio = n_punct / np.maximum(n_chars, 1.0)
    stop_ratio = n_stop / tok
    mean_word_len = np.maximum(n_chars - (tok - 1), 0) / tok
    len_score = np.clip(n_chars / 500.0, 0, 1)
    word_len_score = np.exp(-0.5 * ((mean_word_len - 5.0) / 3.0) ** 2)
    score = 0.4 * len_score + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1)) + 0.3 * word_len_score

    out = batch
    for name, vals in (
        ("punct_ratio", punct_ratio),
        ("stopword_ratio", stop_ratio),
        ("mean_word_len", mean_word_len),
        ("quality_score", score),
    ):
        out = out.append_column(name, pa.array(vals, type=pa.float64()))
    return out


class LangId:
    """Actor-pool language-ID stage: marker regexes compiled once per
    actor (``__init__``), per-batch work is K regex-count kernels +
    argmax — no per-row Python."""

    def __init__(self, langs: dict[str, tuple[str, ...]] | None = None):
        self.langs = langs or LANG_MARKERS
        self.patterns = {
            lang: r"(?i)\b(?:" + "|".join(words) + r")\b"
            for lang, words in self.langs.items()
        }

    def __call__(self, batch: pa.Table, text_col: str = "text") -> pa.Table:
        t = batch[text_col]
        n_tok = pc.cast(pc.count_substring_regex(t, WS_TOKEN_RE), pa.float64()).fill_null(0).to_numpy(zero_copy_only=False)
        scores = np.zeros((len(batch), len(self.patterns)))
        names = list(self.patterns)
        for j, lang in enumerate(names):
            hits = pc.cast(
                pc.count_substring_regex(t, self.patterns[lang]), pa.float64()
            ).fill_null(0).to_numpy(zero_copy_only=False)
            scores[:, j] = hits / np.maximum(n_tok, 1.0)
        best = np.argmax(scores, axis=1)
        conf = scores[np.arange(len(batch)), best]
        lang_arr = np.array(names, dtype=object)[best]
        lang_arr[conf == 0] = "und"  # no markers hit
        out = batch.append_column("lang_pred", pa.array(lang_arr, type=pa.string()))
        return out.append_column("lang_conf", pa.array(conf, type=pa.float64()))


def add_winnow_fingerprints(
    batch: pa.Table, text_col: str = "text", k: int = 5, window: int = 8
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): rolling k-gram hashes over the
    normalized character stream, minimum per sliding window, deduplicated
    → ``winnow: list<uint64>`` per document.  Guarantees any shared
    substring of length ≥ window+k-1 yields a shared fingerprint.

    Fully vectorized: one polynomial rolling hash over the CONCATENATED
    byte buffer of the whole batch (k multiply-adds), grams crossing
    document boundaries masked out via the string offsets, sliding-window
    min via ``sliding_window_view``, per-doc dedup via one lexsort.
    """
    t = pc.utf8_lower(batch[text_col]).fill_null("")
    arr = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
    large = pa.types.is_large_string(arr.type)
    otype = np.int64 if large else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=otype)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    buf = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(offs[0]), int(offs[-1])
    raw = buf[lo:hi]
    offs = offs - lo
    n_docs = len(arr)

    # whitespace collapse (the `\s+` → " " normalization) in numpy byte
    # passes instead of an RE2 replace: same ASCII \s class, 2.7× faster
    # (33 → 90 MB/s measured) and it emits exactly the (bytes, offsets)
    # pair the rolling-hash core consumes — no Arrow array rebuild.
    if len(raw):
        ws = (
            (raw == 32) | (raw == 9) | (raw == 10)
            | (raw == 13) | (raw == 11) | (raw == 12)
        )
        prev = np.empty_like(ws)
        prev[0] = False
        prev[1:] = ws[:-1]
        # a run must not continue across a doc boundary: doc-leading
        # whitespace still collapses to one " " of its OWN doc
        starts = offs[:-1]
        prev[starts[starts < len(prev)]] = False
        keep = ~(ws & prev)
        data = np.where(ws, np.uint8(32), raw)[keep]
        kept_cum = np.cumsum(keep)
        new_offs = np.zeros(len(offs), dtype=np.int64)
        np.take(kept_cum, offs[1:] - 1, out=new_offs[1:])
        new_offs[1:][offs[1:] == 0] = 0  # all-empty prefix docs
        offs = new_offs
    else:
        data = raw
    N = len(data)

    empty = pa.LargeListArray.from_arrays(
        pa.array(np.zeros(n_docs + 1, dtype=np.int64)), pa.array([], type=pa.uint64())
    )
    if N < k:
        return batch.append_column("winnow", empty)

    # CACHE-BLOCKED core: the rolling hash + log-doubling window-min are
    # multi-pass streams over 8×-expanded uint64 temporaries — run
    # monolithically they stream DRAM on every pass, which both caps
    # single-core throughput and eats the memory bandwidth that 32-way
    # map_batches workers share (the 8→32 scaling killer, BASELINE.md).
    # Processing the concatenated buffer in 256 KiB chunks keeps every
    # pass L2-resident: measured 3× single-core (16 → 48 MB/s) with less
    # bandwidth drawn.  Chunks overlap by w+k-2 bytes so every window is
    # computed in at least one chunk; windows computed twice collapse in
    # the per-doc dedup below, so the fingerprint SET is unchanged.
    B = np.uint64(1099511628211)
    w = window
    chunk = 1 << 18
    overlap = w + k - 2
    d_parts: list[np.ndarray] = []
    v_parts: list[np.ndarray] = []
    start = 0
    # doc-of-byte maps are built PER CHUNK (repeat over the chunk's doc
    # slice found by two binary searches) instead of materializing one
    # N×4-byte map — a full extra write+read stream the throttled-
    # bandwidth probe in BASELINE.md showed is exactly what hurts at
    # fleet concurrency.  Gram at position p belongs to doc d iff
    # [p, p+k) ⊆ [offs[d], offs[d+1]).
    while start < N:
        end = min(N, start + chunk)
        seg = data[start:end]
        d0 = int(np.searchsorted(offs, start, side="right")) - 1
        d1 = int(np.searchsorted(offs, end, side="left"))
        seg_lens = np.diff(np.clip(offs[d0 : d1 + 1], start, end))
        bd = np.repeat(np.arange(d0, d1, dtype=np.int32), seg_lens)
        n = len(seg)
        if n >= k:
            H = seg[: n - k + 1].astype(np.uint64)
            for j in range(1, k):
                H *= B
                H += seg[j : n - k + 1 + j]
            doc_of = bd[: n - k + 1]
            in_doc = doc_of == bd[k - 1 :]
            if len(H) >= w:
                # sliding-window min via log-doubling pairwise minima: min
                # is idempotent, so overlapping spans merge freely —
                # ⌈log2 w⌉ passes instead of a w-wide strided reduction
                m = H.copy()
                span = 1
                while span < w:
                    step = min(span, w - span)
                    np.minimum(m[: len(m) - step], m[step:], out=m[: len(m) - step])
                    span += step
                win_min = m[: len(H) - w + 1]
                # a window is valid iff all its grams are valid and in one doc
                win_doc = doc_of[: len(win_min)]
                win_ok = (
                    (doc_of[w - 1 :] == win_doc)
                    & in_doc[: len(win_min)]
                    & in_doc[w - 1 :]
                )
                # consecutive windows usually share their minimum (winnowing
                # density ~2/(w+1)); selecting only (doc, value) change
                # points shrinks the gathered pairs + lexsort input ~w×
                # without changing the final SET: within a run (same doc,
                # same min), window validity is monotone True→False toward
                # the doc end, so if any element of a run is valid its
                # first element is.
                change = np.empty(len(win_min), dtype=bool)
                change[0] = True
                np.not_equal(win_min[1:], win_min[:-1], out=change[1:])
                change[1:] |= win_doc[1:] != win_doc[:-1]
                win_ok &= change
                d_parts.append(win_doc[win_ok])
                v_parts.append(win_min[win_ok])
        if end == N:
            break
        start = end - overlap

    if not d_parts:
        return batch.append_column("winnow", empty)
    d = np.concatenate(d_parts)
    v = np.concatenate(v_parts)
    if len(d) == 0:
        return batch.append_column("winnow", empty)
    order = np.lexsort((v, d))
    d, v = d[order], v[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    d, v = d[keep], v[keep]
    counts = np.bincount(d, minlength=n_docs)
    list_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=list_offs[1:])
    col = pa.LargeListArray.from_arrays(
        pa.array(list_offs), pa.array(v, type=pa.uint64())
    )
    return batch.append_column("winnow", col)


def doc_word_ngrams(batch: pa.Table, n: int = 13, text_col: str = "text"):
    """Word ``n``-grams per document (space-joined strings), flat:
    returns ``(grams: pa.Array, doc_idx: np.ndarray)`` where gram i
    belongs to row ``doc_idx[i]``.  Vectorized: one split + n zero-copy
    slices joined element-wise; grams never cross document boundaries."""
    words = pc.split_pattern(batch[text_col].fill_null(""), " ")
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    n_docs = len(words)
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = offs[0]
    offs = offs - lo
    lens = np.diff(offs)
    flat = words.values.slice(lo, int(offs[-1]))
    M = len(flat) - (n - 1)
    if M <= 0:
        return pa.array([], type=pa.string()), np.zeros(0, dtype=np.int64)
    parts = [flat.slice(j, M) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    in_doc = doc_of[:M] == doc_of[n - 1 :]
    keep = pa.array(in_doc)
    return grams.filter(keep), doc_of[:M][in_doc]


def find_contaminated(
    ds,
    benchmark_grams,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Benchmark decontamination (the GPT-3 / Llama procedure): flag
    training documents sharing any word ``n``-gram with a held-out
    benchmark set.  ``benchmark_grams`` is the benchmark's distinct-gram
    Arrow array — the SMALL side, broadcast once via ``ray.put`` and read
    per worker; each batch matches its grams with one ``pc.is_in`` (no
    shuffle, no join).  Returns (id, n_matched) for contaminated docs,
    ``n_matched`` = DISTINCT matched grams per doc."""
    import ray

    bench_ref = (
        benchmark_grams
        if isinstance(benchmark_grams, ray.ObjectRef)
        else ray.put(benchmark_grams)
    )

    def match(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        grams, doc_of = doc_word_ngrams(batch, n=n, text_col=text_col)
        empty = pa.table(
            {
                id_col: pa.array([], type=batch.schema.field(id_col).type),
                "n_matched": pa.array([], type=pa.int64()),
            }
        )
        if len(grams) == 0:
            return empty
        hit = pc.is_in(grams, value_set=bench)
        hit_np = hit.fill_null(False).to_numpy(zero_copy_only=False)
        if not hit_np.any():
            return empty
        # matched set is tiny: dedup (doc, gram) pairs, count per doc
        import pandas as pd

        mdf = pd.DataFrame(
            {"d": doc_of[hit_np], "g": grams.filter(hit).to_pylist()}
        ).drop_duplicates()
        cnt = mdf.groupby("d").size()
        ids = batch[id_col].take(pa.array(cnt.index.to_numpy()))
        return pa.table(
            {
                id_col: ids,
                "n_matched": pa.array(cnt.to_numpy(), type=pa.int64()),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow")


def build_gram_bloom(benchmark_grams, n_bits: int = 1 << 23, k: int = 7):
    """Benchmark-gram Bloom filter (state/bloom.py).  For a benchmark that
    is itself a Dataset, build per-batch partials inside ``map_batches``
    and OR-merge — the filters are ``n_bits/8`` bytes each regardless of
    gram count."""
    from ..state.bloom import BloomFilter, hash_strings

    bf = BloomFilter(n_bits=n_bits, k=k)
    grams = (
        benchmark_grams.to_pylist()
        if hasattr(benchmark_grams, "to_pylist")
        else list(benchmark_grams)
    )
    if grams:
        bf.add_hashes(hash_strings(grams))
    return bf


def find_contaminated_bloom(
    ds,
    benchmark_grams,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 1 << 23,
    k: int = 7,
) -> pa.Table:
    """Bloom-filter decontamination — the 100-TB shape of
    :func:`find_contaminated`: the broadcast is a CONSTANT ``n_bits/8``
    bytes (1 MiB at the default) no matter how large the benchmark's
    distinct-gram set grows, at the cost of a tunable false-positive rate
    ``(1-e^{-kn/m})^k``.  NO false negatives: the output is a superset of
    the exact procedure's (every truly contaminated doc is flagged;
    ``n_matched`` counts bloom-hit distinct grams, an upper bound).
    Verify candidates with the exact pass over the (small) flagged set
    when exact counts matter."""
    import ray

    from ..state.bloom import BloomFilter, hash_strings

    bf = (
        benchmark_grams
        if isinstance(benchmark_grams, BloomFilter)
        else build_gram_bloom(benchmark_grams, n_bits=n_bits, k=k)
    )
    bf_ref = ray.put((bf.n_bits, bf.k, bf.words))

    def match(batch: pa.Table) -> pa.Table:
        nb, kk, words = ray.get(bf_ref)
        filt = BloomFilter(n_bits=nb, k=kk, words=words)
        grams, doc_of = doc_word_ngrams(batch, n=n, text_col=text_col)
        empty = pa.table(
            {
                id_col: pa.array([], type=batch.schema.field(id_col).type),
                "n_matched": pa.array([], type=pa.int64()),
            }
        )
        if len(grams) == 0:
            return empty
        gl = grams.to_pandas()
        hit_np = filt.contains_hashes(hash_strings(gl))
        if not hit_np.any():
            return empty
        import pandas as pd

        mdf = pd.DataFrame(
            {"d": doc_of[hit_np], "g": gl.to_numpy()[hit_np]}
        ).drop_duplicates()
        cnt = mdf.groupby("d").size()
        ids = batch[id_col].take(pa.array(cnt.index.to_numpy()))
        return pa.table(
            {
                id_col: ids,
                "n_matched": pa.array(cnt.to_numpy(), type=pa.int64()),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow")


# (kind, RE2 pattern, replacement) — ordered: emails first so an address's
# host part is never half-eaten by the IP rule.  RE2 semantics on BOTH
# engines that run these (Arrow here, DuckDB in the oracle SQL).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
)


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / phone numbers / IPv4s from ``text_col`` (global
    replace, vectorized RE2) and append per-kind match-count columns
    (``n_email``/``n_phone``/``n_ipv4``) plus the ``redacted`` text —
    the standard pre-training PII scrub stage."""
    t = batch[text_col].fill_null("")
    out = batch
    for kind, pat, _ in PII_PATTERNS:
        out = out.append_column(
            f"n_{kind}", pc.cast(pc.count_substring_regex(t, pat), pa.int64())
        )
    red = t
    for _, pat, repl in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, repl)
    return out.append_column("redacted", red)


def add_repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document, fully vectorized:

    - ``dup_word_frac`` = 1 − unique_words / total_words
    - ``top_2gram_frac`` = occurrences of the most frequent word 2-gram
      / total 2-grams (0 when the doc has < 2 words)

    High values flag boilerplate / degenerate generations (Gopher §A1.1,
    Rae et al. 2021 — public quality-filter heuristics).  One dictionary
    encode + two lexsorts over the flattened word stream; no Python rows.
    """
    words = pc.split_pattern(batch[text_col].fill_null(""), " ")
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    n_docs = len(words)
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = offs[0]
    offs = offs - lo
    lens = np.diff(offs)
    flat = words.values.slice(lo, int(offs[-1]))
    codes_arr = pc.dictionary_encode(flat)
    codes_arr = codes_arr.combine_chunks() if isinstance(codes_arr, pa.ChunkedArray) else codes_arr
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

    # unique words per doc: one lexsort, count (doc, code) change points
    if len(codes):
        order = np.lexsort((codes, doc_of))
        d, c = doc_of[order], codes[order]
        new = np.empty(len(d), dtype=bool)
        new[0] = True
        new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        uniq = np.bincount(d[new], minlength=n_docs)
    else:
        uniq = np.zeros(n_docs, dtype=np.int64)
    total = np.maximum(lens, 1)
    dup_frac = 1.0 - uniq / total
    dup_frac[lens == 0] = 0.0

    # top 2-gram per doc: encode adjacent code pairs, run-length count,
    # per-doc max via reduceat over doc segment starts in the run array
    top_frac = np.zeros(n_docs, dtype=np.float64)
    if len(codes) > 1:
        K = np.int64(len(codes_arr.dictionary) + 1)
        same = doc_of[1:] == doc_of[:-1]
        pair = codes[:-1] * K + codes[1:]
        pd_, pp = doc_of[:-1][same], pair[same]
        if len(pp):
            order = np.lexsort((pp, pd_))
            d, p = pd_[order], pp[order]
            run_start = np.empty(len(d), dtype=bool)
            run_start[0] = True
            run_start[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1])
            starts = np.flatnonzero(run_start)
            run_len = np.diff(np.append(starts, len(d)))
            run_doc = d[starts]
            doc_start = np.empty(len(run_doc), dtype=bool)
            doc_start[0] = True
            doc_start[1:] = run_doc[1:] != run_doc[:-1]
            seg = np.flatnonzero(doc_start)
            maxes = np.maximum.reduceat(run_len, seg)
            n2 = np.bincount(run_doc, weights=run_len, minlength=n_docs)
            present = run_doc[doc_start]
            top = np.zeros(n_docs, dtype=np.float64)
            top[present] = maxes
            with np.errstate(invalid="ignore", divide="ignore"):
                top_frac = np.where(n2 > 0, top / np.maximum(n2, 1), 0.0)

    out = batch.append_column("dup_word_frac", pa.array(dup_frac, type=pa.float64()))
    return out.append_column("top_2gram_frac", pa.array(top_frac, type=pa.float64()))


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic 64-bit content fingerprint of the normalized text
    (lowercased, whitespace-collapsed) — the exact-dedup key.  Uses
    pandas' SipHash (fixed key → stable across processes/nodes)."""
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, r"\s+", " ")
    s = t.to_pandas()
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()
    h[s.isna().to_numpy()] = 0
    return batch.append_column("fingerprint", pa.array(h.astype(np.uint64)))


# ---------------------------------------------------------------- line dedup


def frequent_lines(ds, *, text_col: str = "text", sep: str = "\n", min_docs: int = 2):
    """CCNet-style frequent-line discovery: lines (text split on ``sep``)
    that occur in ≥ ``min_docs`` DISTINCT documents — web boilerplate
    (nav bars, cookie banners, footers) repeats verbatim across pages.

    100-TB shape: per-batch Arrow explode (``pc.split_pattern`` →
    ``list_flatten``/``list_parent_indices``, no Python per row), within-
    batch (doc, line) distinct + per-line partial doc-counts collapse each
    batch to its distinct lines BEFORE the exchange (the combiner), then
    one ``groupby(line).sum`` + threshold filter.  Only line strings and
    int counts shuffle — never documents.  A document's lines always land
    in one batch (explode is per-row), so within-batch distinct is exact.

    Returns a Dataset of ``(line, n_docs)`` rows, boilerplate-sized.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lines = pc.split_pattern(batch[text_col], pattern=sep)
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines)
        pairs = pa.table({"__d__": parent, "line": flat})
        distinct = pairs.group_by(["__d__", "line"]).aggregate([])
        return (
            distinct.group_by("line")
            .aggregate([("__d__", "count")])
            .rename_columns(["line", "n_part"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("line")
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
    return counts.filter(expr=f"n_docs >= {int(min_docs)}")


def drop_lines(
    batch: pa.Table,
    drop: frozenset | set | pa.Array,
    *,
    text_col: str = "text",
    sep: str = "\n",
) -> pa.Table:
    """Remove every line in ``drop`` from each document; appends
    ``n_lines_removed``.  Vectorized: one ``is_in`` over the flattened
    lines, per-doc removal counts via ``bincount`` on parent indices, and
    the cleaned text rebuilt with ``pc.binary_join`` over a re-offset list
    array — no Python loop over rows or lines.

    ``drop`` is the boilerplate set — broadcast it once per job with
    ``ray.put`` and resolve inside the batch fn (constant-size regardless
    of corpus size; see ``q_line_dedup``)."""
    n = batch.num_rows
    lines = pc.split_pattern(batch[text_col], pattern=sep)
    flat = pc.list_flatten(lines)
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    # a prebuilt Arrow array (broadcast once via ray.put) skips the
    # per-batch sort + Python->Arrow conversion of the whole drop set
    value_set = (
        drop if isinstance(drop, pa.Array)
        else pa.array(sorted(drop), type=pa.string())
    )
    bad = pc.is_in(flat, value_set=value_set)
    bad_np = bad.to_numpy(zero_copy_only=False)
    removed = np.bincount(parent[bad_np], minlength=n).astype(np.int64)
    keep_np = ~bad_np
    kept_per_doc = np.bincount(parent[keep_np], minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(kept_per_doc, out=offsets[1:])
    kept_list = pa.ListArray.from_arrays(
        pa.array(offsets), flat.filter(pa.array(keep_np)).combine_chunks()
    )
    cleaned = pc.binary_join(kept_list, sep)
    out = batch.set_column(batch.column_names.index(text_col), text_col, cleaned)
    return out.append_column("n_lines_removed", pa.array(removed))


# ----------------------------------------------------- fused ASCII byte pass


def ascii_text_stats(arr: pa.Array | pa.ChunkedArray):
    """One pass over the raw UTF-8 buffer computing every count the
    extended content battery needs — exactly what the five separate RE2
    kernels compute, for ASCII input:

    - ``n_chars``  = ``pc.utf8_length``            (offset diffs)
    - ``n_tok``    = ``count_substring_regex(\\S+)`` (whitespace-run starts)
    - ``n_bpe``    = ``TOKEN_RE`` pieces            (alpha runs + digit runs
                     + other non-space bytes)
    - ``n_punct``  = ``[^\\w\\s]`` matches           (byte-class count)
    - ``n_stop``   = ``(?i)\\b(stopword)\\b`` matches (maximal ``\\w`` runs
                     equal, lowercased, to a stopword)

    Returns ``None`` unless every value is ASCII (caller falls back to the
    regex kernels — semantics are identical either way, differential-
    tested).

    **Measured negative result (round 4)**: same-phase A/B vs the five
    RE2 passes shows NO speedup (15 vs 17 MB/s single-core), with or
    without 256 KiB cache blocking — the ~25 numpy byte-class ops cost as
    much as RE2's fused state machines, so the battery keeps the regex
    kernels and this stays a standalone exact-parity op (useful where a
    caller wants all five counts in one call).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        z = np.zeros(0, dtype=np.float64)
        return {"n_chars": z, "n_tok": z, "n_bpe": z, "n_punct": z, "n_stop": z}
    if not pc.all(pc.string_is_ascii(arr)).as_py():
        return None
    if arr.null_count:
        arr = arr.fill_null("")

    # cache blocking (same trick as add_winnow_fingerprints): the pass is
    # ~20 numpy ops over byte-sized temporaries — run them over ≤256 KiB
    # row-aligned slices so every temp stays L2-resident and the data
    # buffer streams from DRAM exactly once
    _CHUNK = 1 << 18
    all_off = np.frombuffer(
        arr.buffers()[1],
        dtype=np.int64 if pa.types.is_large_string(arr.type) else np.int32,
        count=len(arr) + 1 + arr.offset,
    )[arr.offset:]
    total_bytes = int(all_off[-1] - all_off[0])
    if total_bytes > _CHUNK and len(arr) > 1:
        outs = []
        row = 0
        base = int(all_off[0])
        while row < len(arr):
            stop = int(np.searchsorted(all_off, base + _CHUNK, side="left"))
            stop = max(stop, row + 1)
            outs.append(_ascii_stats_block(arr.slice(row, stop - row)))
            base = int(all_off[stop]) if stop < len(arr) else int(all_off[-1])
            row = stop
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    return _ascii_stats_block(arr)


def _ascii_stats_block(arr: pa.Array):
    buffers = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset:].astype(np.int64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    data = np.frombuffer(buffers[2], dtype=np.uint8, count=hi)[lo:hi]
    starts = offsets[:-1] - lo
    ends = offsets[1:] - lo
    n_chars = (ends - starts).astype(np.float64)

    nb = len(data)
    # byte classes
    is_ws = ((data == 32) | ((data >= 9) & (data <= 13)))
    is_alpha = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    is_digit = (data >= 48) & (data <= 57)
    is_word = is_alpha | is_digit | (data == 95)  # \w = [A-Za-z0-9_]

    # prev-byte view with row boundaries acting as whitespace/non-word
    def run_starts(cls: np.ndarray) -> np.ndarray:
        s = cls.copy()
        s[1:] &= ~cls[:-1]
        s[starts[starts < nb]] = cls[starts[starts < nb]]  # row start = boundary
        return s

    def per_row(x) -> np.ndarray:
        cs = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
        return (cs[ends] - cs[starts]).astype(np.float64)

    nonws = ~is_ws
    n_tok = per_row(run_starts(nonws))
    alpha_starts = run_starts(is_alpha)
    digit_starts = run_starts(is_digit)
    other = nonws & ~is_alpha & ~is_digit  # TOKEN_RE third branch: one per byte
    n_bpe = per_row(alpha_starts) + per_row(digit_starts) + per_row(other)
    n_punct = per_row(nonws & ~is_word)

    # stopwords: maximal \w runs of length 2-4 equal (lowercased) to a marker
    w_starts = run_starts(is_word)
    ws_idx = np.nonzero(w_starts)[0]
    n_stop = np.zeros(len(arr), dtype=np.float64)
    if len(ws_idx):
        # run end = next position where is_word stops (within the row)
        w_ends_mask = is_word.copy()
        w_ends_mask[:-1] &= ~is_word[1:]
        e_in_row = ends[ends <= nb] - 1
        # row-final word bytes end their run
        w_ends_mask[e_in_row[e_in_row >= 0]] |= is_word[e_in_row[e_in_row >= 0]]
        we_idx = np.nonzero(w_ends_mask)[0]
        # align: every start has exactly one end ≥ it
        pos = np.searchsorted(we_idx, ws_idx)
        run_end = we_idx[pos]
        run_len = run_end - ws_idx + 1
        lower = data | np.uint8(0x20)  # alpha → lowercase; digits/_ unaffected for compare
        n_stop_hits = np.zeros(len(ws_idx), dtype=bool)
        by_len = {}
        for wrd in STOPWORDS:
            by_len.setdefault(len(wrd), []).append(
                np.frombuffer(wrd.encode(), dtype=np.uint8)
            )
        for L, words in by_len.items():
            sel = np.nonzero(run_len == L)[0]
            if not len(sel):
                continue
            base = ws_idx[sel]
            gathered = np.stack([lower[base + j] for j in range(L)], axis=1)
            m = np.zeros(len(sel), dtype=bool)
            for wb in words:
                m |= (gathered == wb[None, :]).all(axis=1)
            n_stop_hits[sel] = m
        hit_pos = ws_idx[n_stop_hits]
        if len(hit_pos):
            row_of = np.searchsorted(ends, hit_pos, side="right")
            np.add.at(n_stop, row_of, 1.0)

    return {
        "n_chars": n_chars, "n_tok": n_tok, "n_bpe": n_bpe,
        "n_punct": n_punct, "n_stop": n_stop,
    }
