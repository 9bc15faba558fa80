"""Bigram-LM perplexity scoring (functions/lm.py) + label centroids
(functions/similarity.label_centroids).

The LM scorer has no SQL oracle (n-gram scoring is not SQL-expressible),
so its gate is a pure-Python reference implementation here: identical
tokenization, exact counts, the same add-alpha formula — scores must
match to float64 noise, and both the model and the scores must be
invariant under repartitioning.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

DOCS = [
    "The quick brown fox jumps over the lazy dog. The dog sleeps.",
    "the quick brown fox, the quick brown fox!",
    "Completely 123 unrelated XYLOPHONE zzz gibberish qq.",
    "the dog sleeps and the dog dreams",
    "",
    "one",
]


def _ref_model(texts, alpha=0.1):
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        uni.update(toks)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    return uni, bi, len(uni), alpha


def _ref_bits(text, uni, bi, V, alpha):
    toks = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
    if len(toks) < 2:
        return None, 0
    vals = [
        -math.log2((bi[f"{a} {b}"] + alpha) / (uni[a] + alpha * V))
        for a, b in zip(toks, toks[1:])
    ]
    return sum(vals) / len(vals), len(vals)


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    )


def test_bigram_model_exact_counts(ray_session, docs_ds):
    from json_schema_ray.functions.lm import build_bigram_model

    m = build_bigram_model(docs_ds, text_col="text")
    uni, bi, V, _ = _ref_model(DOCS)
    got_uni = dict(zip(m["uni"].to_pylist(), m["uni_n"].tolist()))
    got_bi = dict(zip(m["bi"].to_pylist(), m["bi_n"].tolist()))
    assert got_uni == dict(uni)
    assert got_bi == dict(bi)
    assert m["V"] == V


def test_scores_match_pure_python_reference(ray_session, docs_ds):
    import ray

    from json_schema_ray.functions.lm import build_bigram_model, score_perplexity

    m = build_bigram_model(docs_ds, text_col="text")
    out = (
        score_perplexity(docs_ds, ray.put(m), id_cols=("doc_id",))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    uni, bi, V, alpha = _ref_model(DOCS)
    for i, text in enumerate(DOCS):
        want_bits, want_n = _ref_bits(text, uni, bi, V, alpha)
        assert out.loc[i, "n_bigrams"] == want_n
        if want_bits is None:
            assert np.isnan(out.loc[i, "bits"])
        else:
            assert out.loc[i, "bits"] == pytest.approx(want_bits, rel=1e-12)


def test_model_and_scores_invariant_under_repartition(ray_session, docs_ds):
    import ray

    from json_schema_ray.functions.lm import build_bigram_model, score_perplexity

    m1 = build_bigram_model(docs_ds, text_col="text")
    m2 = build_bigram_model(docs_ds.repartition(5), text_col="text")
    assert m1["uni"].to_pylist() == m2["uni"].to_pylist()
    assert m1["bi"].to_pylist() == m2["bi"].to_pylist()
    assert np.array_equal(m1["uni_n"], m2["uni_n"])
    assert np.array_equal(m1["bi_n"], m2["bi_n"])

    s1 = (
        score_perplexity(docs_ds, ray.put(m1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    s2 = (
        score_perplexity(docs_ds.repartition(5), ray.put(m2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(s1["bits"], s2["bits"], equal_nan=True)


def test_pruning_is_deterministic_topn(ray_session, docs_ds):
    from json_schema_ray.functions.lm import build_bigram_model

    m = build_bigram_model(docs_ds, text_col="text", max_vocab=3, max_bigrams=2)
    uni, bi, _, _ = _ref_model(DOCS)
    want_uni = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    want_bi = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert list(zip(m["uni"].to_pylist(), m["uni_n"].tolist())) == want_uni
    assert list(zip(m["bi"].to_pylist(), m["bi_n"].tolist())) == want_bi
    assert m["V"] == 3  # V is the PRUNED vocab size (documented approximation)


def test_unseen_grams_score_as_alpha_mass(ray_session):
    import ray
    import ray.data as rd

    from json_schema_ray.functions.lm import build_bigram_model, score_perplexity

    train = rd.from_arrow(pa.table({"doc_id": [0], "text": ["aa bb aa bb aa"]}))
    m = build_bigram_model(train, text_col="text")
    test = rd.from_arrow(pa.table({"doc_id": [0], "text": ["zz qq"]}))
    out = score_perplexity(test, ray.put(m)).to_pandas()
    # both gram and left word unseen: p = alpha / (0 + alpha*V)= 1/V
    assert out.loc[0, "bits"] == pytest.approx(math.log2(m["V"]))


def test_pruned_left_unigram_never_scores_negative_bits(ray_session):
    """Pruning can retain a bigram whose left word fell out of the vocab
    top-N; without the c_uni >= c_bi clamp that gives p > 1 and NEGATIVE
    bits (junk scored as hyper-fluent)."""
    import ray
    import ray.data as rd

    from json_schema_ray.functions.lm import build_bigram_model, score_perplexity

    # "zz qq" dominates bigrams, but max_vocab=2 keeps only the two most
    # frequent unigrams — construct so "zz" is pruned while "zz qq" stays
    train = rd.from_arrow(
        pa.table({"doc_id": [0], "text": ["aa bb. aa bb. aa bb. zz qq. zz qq."]})
    )
    m = build_bigram_model(train, text_col="text", max_vocab=2, max_bigrams=10)
    assert "zz" not in m["uni"].to_pylist()
    assert "zz qq" in m["bi"].to_pylist()
    test = rd.from_arrow(pa.table({"doc_id": [0], "text": ["zz qq zz qq zz qq"]}))
    out = score_perplexity(test, ray.put(m)).to_pandas()
    assert out.loc[0, "bits"] >= 0


def test_label_centroids_null_labels_raise(ray_session):
    import ray.data as rd

    from json_schema_ray.functions.similarity import label_centroids

    t = pa.table(
        {
            "embedding": pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float32())),
            "label": pa.array([1, None], type=pa.int32()),
        }
    )
    with pytest.raises(Exception, match="null labels"):
        label_centroids(rd.from_arrow(t))


def test_label_centroids_vs_numpy(ray_session):
    import ray.data as rd

    from json_schema_ray.functions.similarity import label_centroids

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=50).astype(np.int32)
    t = pa.table(
        {
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": labels,
        }
    )
    out = label_centroids(rd.from_arrow(t).repartition(6)).to_pandas()
    for lab in np.unique(labels):
        sel = vecs[labels == lab].astype(np.float64)
        want = np.round(sel.mean(axis=0), 4)
        got = out[out["label"] == lab].sort_values("dim")
        assert np.array_equal(got["centroid"].to_numpy(), want)
        assert (got["n_vecs"] == sel.shape[0]).all()
    assert len(out) == 4 * 8
