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
    t = pc.replace_substring_regex(t, r"\s+", " ")
    arr = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
    large = pa.types.is_large_string(arr.type)
    otype = np.int64 if large else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=otype)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    buf = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(offs[0]), int(offs[-1])
    data = buf[lo:hi].astype(np.uint64)
    offs = offs - lo
    n_docs = len(arr)
    N = len(data)

    empty = pa.LargeListArray.from_arrays(
        pa.array(np.zeros(n_docs + 1, dtype=np.int64)), pa.array([], type=pa.uint64())
    )
    if N < k:
        return batch.append_column("winnow", empty)

    # Allocation discipline: this kernel runs per batch inside map_batches
    # workers on hosts where FIRST-TOUCH page faults can cost ~ms/MB, so
    # every avoided N-sized temporary matters more than instruction count.
    # In-place rolling hash (no per-iteration temporaries):
    B = np.uint64(1099511628211)
    H = data[: N - k + 1].copy()
    for j in range(1, k):
        H *= B
        H += data[j : N - k + 1 + j]
    # gram at position p belongs to doc d iff [p, p+k) ⊆ [offs[d], offs[d+1]).
    # One byte→doc int32 map via repeat serves both the doc id and the
    # containment test (no N-element arange + binary search — those
    # temporaries tripled peak memory)
    byte_doc = np.repeat(np.arange(n_docs, dtype=np.int32), np.diff(offs))
    doc_of = byte_doc[: N - k + 1]
    in_doc = doc_of == byte_doc[k - 1 :]

    w = window
    if len(H) < w:
        # no window of size w fits in any doc of this batch — same rule as
        # below (window fully inside one doc), so results stay identical
        # regardless of how docs are batched together
        return batch.append_column("winnow", empty)
    # sliding-window min via log-doubling pairwise minima: min is
    # idempotent, so overlapping spans merge freely — ⌈log2 w⌉ full-array
    # passes instead of the stride-view reduction's w-wide strided reads
    # (measured ~1.6× on this kernel's hot path)
    m = H.copy()
    span = 1
    while span < w:
        step = min(span, w - span)
        np.minimum(m[: len(m) - step], m[step:], out=m[: len(m) - step])
        span += step
    win_min = m[: len(H) - w + 1]
    # a window is valid iff all its grams are valid and in one doc
    win_doc = doc_of[: len(win_min)]
    win_ok = (doc_of[w - 1 :] == win_doc) & in_doc[: len(win_min)] & in_doc[w - 1 :]
    # consecutive windows usually share their minimum (winnowing density
    # ~2/(w+1)); selecting only (doc, value) change points shrinks the
    # gathered pairs + lexsort input ~w× without changing the final SET:
    # within a run (same doc, same min), window validity is monotone
    # True→False as the window approaches the doc end, so if any element
    # of a run is valid its first element is.
    change = np.empty(len(win_min), dtype=bool)
    change[0] = True
    np.not_equal(win_min[1:], win_min[:-1], out=change[1:])
    change[1:] |= win_doc[1:] != win_doc[:-1]
    win_ok &= change
    d = win_doc[win_ok]
    v = win_min[win_ok]
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
