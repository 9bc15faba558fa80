"""Bigram language-model quality scoring — the CCNet-style perplexity
filter of large-scale curation pipelines (score each document by how
"fluent" it is under a corpus n-gram LM; drop the worst tail).

No analog exists in the reference (it is a schema validator); this module
is one of the brief's training-data-pipeline additions, alongside
dedup/decontamination in ``functions/dedup.py`` / ``functions/text.py``.

Two passes, both streaming:

1. ``build_bigram_model``: exact unigram+bigram counts.  Each batch
   collapses to its DISTINCT grams via an Arrow ``TableGroupBy`` before
   the exchange (the classic combiner), the global groupby is
   vocabulary-sized, and the driver receives only the top-``max_*``
   grams via a distributed ``sort().limit()`` — never the full gram
   table.  Pruning is deterministic (count desc, gram asc), so the model
   — and every downstream score — is independent of block order.
2. ``score_perplexity``: bits-per-bigram for every document.  The model
   is broadcast once (``ray.put``) and cached per worker process; token →
   count lookup is ``pyarrow.compute.index_in`` (a C-level hash probe —
   no Python token objects on the hot path); per-document means are
   ``np.bincount`` segment reductions.

Probabilities use add-alpha smoothing over the unigram vocabulary:
``p(w2|w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)``.  When pruning
triggers (``max_vocab``/``max_bigrams`` smaller than the corpus
vocabulary), dropped grams score as unseen — a documented approximation
that keeps the broadcast model dimension-sized at any corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# per-worker-process model cache keyed by broadcast ObjectRef (same
# amortization pattern as similarity._WORKER_SCORERS)
_WORKER_MODELS: dict = {}


def _token_stream(batch: pa.Table, text_col: str):
    """Lowercase ``[a-z]+`` word tokens of every row, flattened:
    ``(tokens: pa.Array, row_idx: np.ndarray)``.  One RE2 split + numpy
    masking — no per-row Python."""
    col = batch[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), "[^a-z]+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(toks), dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        mask = pa.array(keep)
        flat = flat.filter(mask)
        row_idx = row_idx[keep]
    return flat, row_idx


def _bigrams(tokens: pa.Array, row_idx: np.ndarray):
    """Consecutive same-document token pairs:
    ``(w1, w2, gram, bi_row_idx)`` — Arrow slices are zero-copy."""
    n = len(tokens)
    if n < 2:
        empty = pa.array([], type=pa.string())
        return empty, empty, empty, np.array([], dtype=np.int64)
    mask = row_idx[:-1] == row_idx[1:]
    same = pa.array(mask)
    w1 = tokens.slice(0, n - 1).filter(same)
    w2 = tokens.slice(1, n - 1).filter(same)
    gram = pc.binary_join_element_wise(w1, w2, " ")
    return w1, w2, gram, row_idx[:-1][mask]


def build_bigram_model(
    ds,
    *,
    text_col: str = "text",
    max_vocab: int = 1 << 16,
    max_bigrams: int = 1 << 20,
    alpha: float = 0.1,
) -> dict:
    """Exact (up to deterministic top-N pruning) corpus bigram LM.

    Returns a plain picklable dict ready for ``ray.put``:
    ``{"uni": pa.Array, "uni_n": np.int64[], "bi": pa.Array,
    "bi_n": np.int64[], "V": int, "alpha": float}``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        tok, row_idx = _token_stream(batch, text_col)
        _, _, gram, _ = _bigrams(tok, row_idx)
        out = []
        for kind, arr in ((1, tok), (2, gram)):
            if len(arr) == 0:
                continue
            g = pa.TableGroupBy(pa.table({"gram": arr}), "gram").aggregate(
                [([], "count_all")]
            )
            g = g.rename_columns(["gram", "n_part"])
            out.append(
                g.append_column("kind", pa.array([kind] * len(g), type=pa.int64()))
            )
        if not out:
            return pa.table(
                {
                    "gram": pa.array([], type=pa.string()),
                    "n_part": pa.array([], type=pa.int64()),
                    "kind": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(out)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "gram"])
        .aggregate(Sum("n_part", alias_name="n"))
        # consumed twice (one top-N per kind): materialize the AGGREGATED
        # table — vocabulary-sized, the same table each sort must hold
        # anyway — so the corpus tokenization pass runs once, not twice
        .materialize()
    )

    def _top(kind: int, cap: int):
        # distributed top-N: the driver receives cap rows, never the
        # full vocabulary table; (n desc, gram asc) makes pruning
        # deterministic under ties
        t = (
            counts.filter(expr=f"kind == {kind}")
            .sort(["n", "gram"], descending=[True, False])
            .limit(cap)
            .to_pandas()
        )
        return t["gram"].tolist(), t["n"].to_numpy().astype(np.int64)

    uni_g, uni_n = _top(1, max_vocab)
    bi_g, bi_n = _top(2, max_bigrams)
    return {
        "uni": pa.array(uni_g, type=pa.string()),
        "uni_n": uni_n,
        "bi": pa.array(bi_g, type=pa.string()),
        "bi_n": bi_n,
        "V": len(uni_g),
        "alpha": float(alpha),
    }


def _lookup(arr: pa.Array, value_set: pa.Array, counts: np.ndarray) -> np.ndarray:
    """Vectorized gram → count: Arrow hash probe, 0 for unseen."""
    if len(value_set) == 0 or len(arr) == 0:
        return np.zeros(len(arr), dtype=np.int64)
    idx = pc.index_in(arr, value_set=value_set)
    idxn = idx.to_numpy(zero_copy_only=False)
    hit = ~np.isnan(idxn) if idxn.dtype.kind == "f" else idx.is_valid().to_numpy(
        zero_copy_only=False
    )
    out = np.zeros(len(arr), dtype=np.int64)
    safe = np.where(hit, idxn, 0).astype(np.int64)
    out[hit] = counts[safe[hit]]
    return out


def score_perplexity(
    ds,
    model_ref,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
):
    """Per-document bits-per-bigram under the broadcast model:
    adds ``bits`` (float64; null when the doc has < 2 tokens) and
    ``n_bigrams`` columns next to ``id_cols``."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        if hasattr(model_ref, "hex"):  # ObjectRef: stable content identity
            key = model_ref.hex()
            m = _WORKER_MODELS.get(key)
            if m is None:
                if len(_WORKER_MODELS) >= 4:  # bound worker-lifetime growth
                    _WORKER_MODELS.clear()
                m = ray.get(model_ref)
                _WORKER_MODELS[key] = m
        else:
            # plain-dict model: no caching — id() is not a content identity
            # (a GC'd dict's id can be reused by a DIFFERENT model within
            # the same worker and serve stale counts), and the dict is
            # already in-process so there is nothing to amortize
            m = model_ref
        tok, row_idx = _token_stream(batch, text_col)
        w1, _, gram, bi_rows = _bigrams(tok, row_idx)
        c_bi = _lookup(gram, m["bi"], m["bi_n"]).astype(np.float64)
        c_uni = _lookup(w1, m["uni"], m["uni_n"]).astype(np.float64)
        # pruning can keep a bigram whose left unigram fell out of the
        # vocab top-N; c(w1) >= c(w1 w2) always holds in the unpruned
        # counts, so restore that invariant — otherwise p > 1 and the
        # document scores NEGATIVE bits (hyper-fluent junk)
        c_uni = np.maximum(c_uni, c_bi)
        a, V = m["alpha"], m["V"]
        bits = -np.log2((c_bi + a) / (c_uni + a * max(V, 1)))
        n = batch.num_rows
        n_bi = np.bincount(bi_rows, minlength=n).astype(np.int64)
        sum_bits = np.bincount(bi_rows, weights=bits, minlength=n)
        with np.errstate(invalid="ignore"):
            mean_bits = np.where(n_bi > 0, sum_bits / np.maximum(n_bi, 1), np.nan)
        cols = {c: batch[c] for c in id_cols}
        cols["bits"] = pa.array(mean_bits, type=pa.float64(), from_pandas=True)
        cols["n_bigrams"] = pa.array(n_bi)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")
