"""Tests for training-data ops: stats, text analysis, dedup family,
similarity search, multimodal stubs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def test_column_stats_exact(ray_session, sf_dir, docs_ds):
    import pyarrow.parquet as pq

    from json_schema_ray.stages.stats import column_stats

    got = column_stats(docs_ds, ["n_chars", "doc_id"], with_hll=True).to_pandas().set_index("column")
    exact = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    assert got.loc["n_chars", "n_rows"] == len(exact)
    assert got.loc["n_chars", "n_null"] == exact["n_chars"].isna().sum()
    assert got.loc["n_chars", "min_val"] == exact["n_chars"].min()
    assert got.loc["n_chars", "max_val"] == exact["n_chars"].max()
    est = got.loc["doc_id", "approx_distinct"]
    assert abs(est - exact["doc_id"].nunique()) / exact["doc_id"].nunique() < 0.05


def test_text_kernels(ray_session):
    from json_schema_ray.functions.text import LangId, add_fingerprint, add_quality_score, add_token_counts

    t = pa.table({"doc_id": [1, 2, 3], "text": ["the cat and the dog", "der Hund ist nicht da und", None]})
    out = add_token_counts(t)
    assert out["n_tokens"].to_pylist() == [5, 6, None]
    out = add_quality_score(t)
    assert 0 <= out["quality_score"][0].as_py() <= 1
    out = LangId()(t)
    assert out["lang_pred"].to_pylist()[:2] == ["en", "de"]
    f1 = add_fingerprint(pa.table({"text": ["Hello  World"]}))["fingerprint"][0]
    f2 = add_fingerprint(pa.table({"text": ["hello world"]}))["fingerprint"][0]
    assert f1 == f2  # normalization: case + whitespace


def test_exact_dedup(ray_session):
    import ray.data as rd

    from json_schema_ray.functions.dedup import exact_dedup, exact_dup_groups

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["aaa bbb", "AAA  BBB", "ccc", "ddd"]}
    )
    ds = rd.from_pandas(df)
    kept = exact_dedup(ds).to_pandas()
    assert len(kept) == 3
    assert 1 in set(kept["doc_id"]) and 2 not in set(kept["doc_id"])
    groups = exact_dup_groups(ds)
    assert len(groups) == 1 and groups["ids"].iloc[0] == "1,2"


def test_exact_dedup_keep_best(ray_session):
    import ray.data as rd

    from json_schema_ray.functions.dedup import exact_dedup

    # doc 2 is the longer raw variant of the (1,2) dup group → kept under
    # score_col; doc 1 (lower id) wins without it
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["aaa bbb", "AAA   BBB", "ccc", "ddd"],
            "n_raw": [7, 9, 3, 3],
        }
    )
    ds = rd.from_pandas(df)
    best = exact_dedup(ds, score_col="n_raw").to_pandas()
    assert set(best["doc_id"]) == {2, 3, 4}
    # equal scores fall back to id-ascending (deterministic)
    df2 = df.assign(n_raw=[5, 5, 3, 3])
    best2 = exact_dedup(rd.from_pandas(df2), score_col="n_raw").to_pandas()
    assert set(best2["doc_id"]) == {1, 3, 4}


@pytest.fixture()
def neardup_ds(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog while the sun sets "
            "behind distant mountains and rivers flow gently through green valleys")
    edited = base.replace("lazy dog", "sleepy dog")  # near-dup of doc 1
    other = ("completely different content about database engines columnar "
             "storage vectorized execution and distributed shuffle algorithms")
    rng = np.random.RandomState(0)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
             "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi"]
    fillers = [" ".join(rng.choice(vocab, 25)) for _ in range(20)]
    df = pd.DataFrame(
        {"doc_id": list(range(1, 24)), "text": [base, edited, other] + fillers}
    )
    return rd.from_pandas(df)


def test_minhash_lsh(neardup_ds):
    from json_schema_ray.functions.dedup import minhash_lsh_candidates, ngram_jaccard_verify

    pairs = minhash_lsh_candidates(neardup_ds, concurrency=2)
    pset = {tuple(sorted(p)) for p in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist())}
    assert (1, 2) in pset
    verified = ngram_jaccard_verify(neardup_ds, pairs)
    d = {tuple(sorted((a, b))): j for a, b, j in
         zip(verified["id_a"].to_pylist(), verified["id_b"].to_pylist(), verified["jaccard"].to_pylist())}
    assert d[(1, 2)] > 0.6


def test_minhash_lsh_spill_dir_matches_pinned(neardup_ds, tmp_path):
    """The 100-TB spill path (sig/banded tables persisted as parquet and
    re-read per consumer, nothing pinned in the object store) must
    produce the identical candidate set as the default materialize
    path — and must actually write both tables."""
    import os

    from json_schema_ray.functions.dedup import minhash_lsh_candidates

    pinned = minhash_lsh_candidates(neardup_ds, concurrency=2).to_pandas()
    spilled = minhash_lsh_candidates(
        neardup_ds, concurrency=2, spill_dir=str(tmp_path)
    ).to_pandas()
    key = lambda df: df.sort_values(["id_a", "id_b"]).reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(pinned), key(spilled))
    for sub in ("sigs", "banded"):  # namespaced: never touches user dirs
        files = os.listdir(tmp_path / "minhash_lsh" / sub)
        assert any(f.endswith(".parquet") for f in files)


def test_simhash(neardup_ds):
    from json_schema_ray.functions.dedup import simhash_candidates

    pairs = simhash_candidates(neardup_ds, max_hamming=8, concurrency=2)
    pset = {tuple(sorted(p)) for p in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist())}
    assert (1, 2) in pset


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    base = rng.normal(size=(30, 16))
    # vec 31 = near-copy of vec 0
    emb = np.vstack([base, base[0] + rng.normal(scale=0.01, size=16)])
    df = pd.DataFrame({"vec_id": np.arange(31), "embedding": [list(map(float, e)) for e in emb]})
    from json_schema_ray.functions.dedup import embedding_near_dup

    pairs = embedding_near_dup(rd.from_pandas(df), threshold=0.98)
    pset = {tuple(sorted(p)) for p in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist())}
    assert (0, 30) in pset


def test_brute_force_topk_exact(ray_session, sf_dir):
    import ray.data as rd

    from json_schema_ray.functions.similarity import _normalize, brute_force_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    full = ds.to_pandas()
    E = _normalize(np.asarray(list(full["embedding"]), dtype=np.float64))
    ids = full["vec_id"].to_numpy()
    q_idx = [0, 1]
    got = brute_force_topk(ds, E[q_idx], ids[q_idx], k=5, concurrency=2).to_pandas()

    for qi in q_idx:
        scores = E @ E[qi]
        order = np.lexsort((ids, -scores))[:5]
        expect = ids[order]
        mine = got[got["query_id"] == ids[qi]].sort_values("rank")["vec_id"].to_numpy()
        assert list(mine) == list(expect)


def test_ivf_topk_recall(ray_session, sf_dir):
    import ray.data as rd

    from json_schema_ray.functions.similarity import _normalize, brute_force_topk, ivf_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    full = ds.to_pandas()
    E = _normalize(np.asarray(list(full["embedding"]), dtype=np.float64))
    ids = full["vec_id"].to_numpy()
    exact = brute_force_topk(ds, E[:2], ids[:2], k=10, concurrency=2).to_pandas()
    approx = ivf_topk(ds, E[:2], ids[:2], k=10, n_clusters=8, nprobe=4, concurrency=2).to_pandas()
    recalls = []
    for qid in ids[:2]:
        a = set(exact[exact["query_id"] == qid]["vec_id"])
        b = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(a & b) / len(a))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 clusters: decent recall


def test_media_stub_pipeline(ray_session, tmp_path):
    import ray.data as rd

    from json_schema_ray.functions.media import ImageDecoder, decode_media_spans
    from json_schema_ray.sources.interleaved import generate, write_dataset

    data = generate(n_docs=100, seed=9, n_parts=2)
    paths = write_dataset(str(tmp_path), data)
    docs = rd.read_parquet(paths["documents"])
    decoded = decode_media_spans(docs, batch_size=64, concurrency=2).to_pandas()
    assert set(decoded.columns) == {"media_ref", "width", "height", "n_channels", "feature", "decode_path"}
    assert (decoded["n_channels"] == 3).all()
    assert all(len(f) == 64 for f in decoded["feature"])
    # deterministic fake: same ref -> same dims
    one = decoded.iloc[0]
    again = ImageDecoder()(pa.table({"media_ref": [one["media_ref"]]})).to_pandas().iloc[0]
    assert (again["width"], again["height"]) == (one["width"], one["height"])
    # strict mode raises the documented NotImplementedError
    with pytest.raises(NotImplementedError):
        ImageDecoder(strict=True)(pa.table({"media_ref": ["x"]}))


def test_lsh_skewed_bucket_cap(ray_session):
    """Adversarial skew: many identical docs melt into ONE LSH bucket;
    max_bucket_size bounds the quadratic pairing instead of exploding."""
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.dedup import minhash_lsh_candidates, simhash_candidates

    n = 60
    tbl = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "text": ["the same boilerplate text repeated everywhere forever"] * n,
        }
    )
    ds = rd.from_arrow(tbl)
    # cap = 10 → at most C(10,2)=45 pairs per bucket (not C(60,2)=1770)
    pairs = minhash_lsh_candidates(ds, concurrency=1, max_bucket_size=10)
    assert 0 < len(pairs) <= 45
    assert pairs["est_jaccard"].to_pandas().min() == 1.0  # identical docs

    sp = simhash_candidates(ds, concurrency=1, max_bucket_size=10)
    assert 0 < len(sp) <= 45
    assert sp["hamming"].to_pandas().max() == 0


def test_embedding_near_dup_finds_planted_pair(ray_session):
    """Distributed hyperplane-LSH path finds a planted near-duplicate
    vector pair and verifies exact cosine ≥ threshold."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.dedup import embedding_near_dup

    rng = np.random.RandomState(0)
    base = rng.normal(size=(50, 16))
    base[7] = base[3] + rng.normal(scale=0.01, size=16)  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(base.reshape(-1), type=pa.float64()), 16
            ),
        }
    )
    out = embedding_near_dup(rd.from_arrow(tbl), threshold=0.98).to_pandas()
    assert {(3, 7)} <= set(zip(out["id_a"], out["id_b"]))
    assert (out["cosine"] >= 0.98).all()


def test_ivf_indexed_recall_and_pruning(ray_session, tmp_path):
    """Assign-once IVF index: probed search reads only probed cluster
    partitions and its recall@10 vs exact brute force is high."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.similarity import (
        _normalize,
        brute_force_topk,
        build_ivf_index,
        ivf_topk_indexed,
    )

    rng = np.random.RandomState(3)
    # clustered data so IVF has structure to exploit
    centers = rng.normal(size=(8, 24)) * 3
    X = np.vstack([c + rng.normal(size=(100, 24)) * 0.4 for c in centers])
    ids = np.arange(len(X), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1), type=pa.float64()), 24
            ),
        }
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(tbl), idx, n_clusters=8, seed=1)
    # index layout: hive dirs per cluster
    parts = [d for d in os.listdir(os.path.join(idx, "vectors")) if d.startswith("cluster=")]
    assert len(parts) >= 4

    Q = _normalize(X[:3])
    qids = ids[:3]
    got = ivf_topk_indexed(idx, Q, qids, k=10, nprobe=3, concurrency=2).to_pandas()
    exact = brute_force_topk(rd.from_arrow(tbl), Q, qids, k=10, concurrency=1).to_pandas()
    for q in qids:
        g = set(got[got.query_id == q]["vec_id"])
        e = set(exact[exact.query_id == q]["vec_id"])
        assert len(g & e) / 10 >= 0.8, (q, g, e)


def test_media_stdlib_codecs_roundtrip():
    """Real decode path: BMP/PPM bytes → exact pixel recovery, and the
    decoder resolution order (PIL → stdlib → fake) is observable."""
    import numpy as np

    from json_schema_ray.functions.media import (
        ImageDecoder,
        decode_image_bytes,
        encode_bmp,
        synth_bmp_payload,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(13, 10, 3), dtype=np.uint8)
    w, h, c, rgb = decode_image_bytes(encode_bmp(px))
    assert (w, h, c) == (10, 13, 3)
    assert (rgb == px).all()  # exact round-trip incl. row padding + BGR flip

    ppm = b"P6\n# comment\n10 13\n255\n" + px.tobytes()
    w2, h2, c2, rgb2 = decode_image_bytes(ppm)
    assert (rgb2 == px).all()

    import pyarrow as pa

    dec = ImageDecoder(feature_dim=64)
    batch = pa.table(
        {
            "media_ref": ["a", "b", "c"],
            "payload": pa.array(
                [encode_bmp(px), synth_bmp_payload("b"), b"\x89PNG not supported"],
                type=pa.binary(),
            ),
        }
    )
    out = dec(batch)
    assert out["decode_path"].to_pylist() == ["stdlib", "stdlib", "fake"]
    assert out["width"].to_pylist()[0] == 10
    # feature of a real decode is the mean-pool grid, deterministic
    f = np.array(out["feature"].to_pylist()[0])
    assert f.shape == (64,) and 0.0 <= f.min() and f.max() <= 1.0

    # strict mode: undecodable payload raises instead of faking
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ImageDecoder(strict=True)(
            pa.table({"media_ref": ["x"], "payload": pa.array([b"nope"], type=pa.binary())})
        )

    # PIL hook: force-inject a stub PIL and confirm it is preferred
    import sys
    import types

    class _FakeImg:
        width, height = 4, 4

        def convert(self, mode):
            return np.zeros((4, 4, 3), dtype=np.uint8)

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=lambda buf: _FakeImg())
    sys.modules["PIL"] = fake_pil
    try:
        dec2 = ImageDecoder(feature_dim=8)
        out2 = dec2(pa.table({"media_ref": ["p"], "payload": pa.array([b"anything"], type=pa.binary())}))
        assert out2["decode_path"].to_pylist() == ["pil"]
    finally:
        del sys.modules["PIL"]


def test_winnow_fingerprints_and_candidates(ray_session):
    """Winnowing (SIGMOD'03): batch-layout-independent fingerprints,
    guaranteed overlap for long shared substrings, distributed candidates."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.dedup import winnow_candidates
    from json_schema_ray.functions.text import add_winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    near = base.replace("lazy", "hazy")
    other = "completely different content with nothing in common whatsoever here now"
    texts = [base, base, near, other, ""]
    t = pa.table({"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts})

    fp = add_winnow_fingerprints(t, k=5, window=8)
    prints = [set(x) for x in fp["winnow"].to_pylist()]
    assert prints[0] == prints[1]  # identical docs → identical sets
    assert len(prints[0] & prints[2]) >= 3  # near-dup shares long substrings
    assert not (prints[0] & prints[3])  # unrelated docs share nothing
    assert prints[4] == set()  # empty text

    # batch-layout independence: one-row batches give the same sets
    for i, row in enumerate(texts):
        solo = add_winnow_fingerprints(pa.table({"doc_id": ["x"], "text": [row]}), k=5, window=8)
        assert set(solo["winnow"].to_pylist()[0]) == prints[i], i

    pairs = winnow_candidates(rd.from_arrow(t), k=5, window=8, min_shared=3).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert ("d0", "d1") in got and ("d0", "d2") in got and ("d1", "d2") in got
    assert not any("d3" in p for pair in got for p in pair)


def test_dedup_clusters_and_drop(ray_session):
    """Pair resolution: union-find clusters with deterministic canonical
    survivors; drop filter keeps exactly one doc per cluster."""
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.dedup import dedup_clusters, drop_near_dups

    pairs = pa.table(
        {
            "id_a": ["a", "b", "x", "m"],
            "id_b": ["b", "c", "y", "a"],  # {a,b,c,m} chain + {x,y}
        }
    )
    cl = dedup_clusters(pairs).to_pandas().set_index("doc_id")
    assert set(cl.index) == {"a", "b", "c", "m", "x", "y"}
    assert cl.loc[["a", "b", "c", "m"], "cluster_id"].nunique() == 1
    assert cl.loc["a", "keep"] and not cl.loc["b", "keep"]  # smallest id survives
    assert cl.loc["x", "keep"] and not cl.loc["y", "keep"]

    ds = rd.from_arrow(pa.table({"doc_id": list("abcmxyz"), "text": [""] * 7}))
    kept = sorted(drop_near_dups(ds, pairs).to_pandas()["doc_id"])
    assert kept == ["a", "x", "z"]  # one per cluster + untouched z


def test_image_resize_stage(ray_session):
    """Real resize over the stdlib decode path: exact nearest-neighbor
    pixels, re-encoded BMP round-trips; undecodable payloads pass through."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.media import (
        ImageResizer,
        decode_image_bytes,
        encode_bmp,
        resize_rgb,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    small = resize_rgb(px, 6, 8)
    assert small.shape == (8, 6, 3)
    assert (small[0, 0] == px[0, 0]).all()  # corner preserved by NN

    batch = pa.table(
        {
            "media_ref": ["a", "b"],
            "payload": pa.array([encode_bmp(px), b"not an image"], type=pa.binary()),
        }
    )
    out = rd.from_arrow(batch).map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": 6, "out_h": 8},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 1),
    ).to_pandas()
    assert out["resized"].tolist() == [True, False]
    w, h, _, rgb = decode_image_bytes(out["payload"][0])
    assert (w, h) == (6, 8) and (rgb == small).all()
    assert out["payload"][1] == b"not an image"  # pass-through


def test_audio_features_stage(ray_session):
    """Real WAV path: stdlib decode recovers known signal statistics
    (sine RMS ≈ 1/√2, zcr ≈ 2f/sr); undecodable payloads get the
    declared deterministic fake."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_schema_ray.functions.media import AudioFeatures, decode_wav, encode_wav

    sr, f = 16000, 440.0
    t = np.arange(sr) / sr  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * f * t)
    wav = encode_wav(sine, sr)
    sr2, nch, x = decode_wav(wav)
    assert (sr2, nch) == (16000, 1) and abs(len(x) / sr2 - 1.0) < 1e-6

    batch = pa.table(
        {
            "media_ref": ["s", "junk"],
            "payload": pa.array([wav, b"nope"], type=pa.binary()),
        }
    )
    out = rd.from_arrow(batch).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=(1, 1)
    ).to_pandas()
    assert out["decode_path"].tolist() == ["stdlib", "fake"]
    assert abs(out["duration_sec"][0] - 1.0) < 1e-6
    assert abs(out["rms"][0] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(out["zcr"][0] - 2 * f / sr) < 5e-3
