"""Line-level boilerplate dedup (functions/text.frequent_lines + drop_lines)."""

import numpy as np
import pyarrow as pa
import ray.data

from json_schema_ray.functions.text import drop_lines, frequent_lines


def _corpus(n_docs=300, seed=3):
    """Deterministic docs: unique body lines + planted boilerplate."""
    rng = np.random.RandomState(seed)
    boiler = ["COOKIE BANNER", "(c) example footer", "nav home about contact"]
    docs = []
    for i in range(n_docs):
        lines = [f"unique line {i} {j} {rng.randint(1_000_000)}" for j in range(3)]
        # each boilerplate line lands in a known subset of docs
        if i % 2 == 0:
            lines.insert(0, boiler[0])        # 150 docs
        if i % 3 == 0:
            lines.append(boiler[1])           # 100 docs
        if i % 30 == 0:
            lines.insert(1, boiler[2])        # 10 docs
        if i % 5 == 0:
            lines.append(boiler[0])           # within-doc repeat: counts once
        docs.append("\n".join(lines))
    return pa.table({"doc_id": np.arange(n_docs, dtype=np.int64), "text": docs}), boiler


def test_frequent_lines_doc_counts(ray_session):
    tbl, boiler = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(7)
    freq = frequent_lines(ds, min_docs=50).to_pandas().set_index("line")["n_docs"]
    # docs containing boiler[0]: i%2==0 (150) ∪ i%5==0 (60) = 180 distinct;
    # occurrence count would be 210 — 180 proves doc-distinct semantics
    assert freq[boiler[0]] == 180
    assert freq[boiler[1]] == 100
    assert boiler[2] not in freq.index  # 10 docs < threshold
    assert not any(l.startswith("unique") for l in freq.index)


def test_frequent_lines_threshold_and_block_independence(ray_session):
    tbl, boiler = _corpus()
    for parts in (1, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        freq = frequent_lines(ds, min_docs=5).to_pandas()
        got = dict(zip(freq["line"], freq["n_docs"]))
        assert got[boiler[2]] == 10
        assert got[boiler[0]] == 180 and got[boiler[1]] == 100


def test_drop_lines_roundtrip(ray_session):
    tbl, boiler = _corpus(50)
    cleaned = drop_lines(tbl, set(boiler))
    texts = cleaned["text"].to_pylist()
    removed = cleaned["n_lines_removed"].to_pylist()
    for i, (t, r) in enumerate(zip(texts, removed)):
        assert all(not ln in boiler for ln in t.split("\n"))
        # reconstruct expectation from the generator pattern
        exp = (i % 2 == 0) + (i % 3 == 0) + (i % 30 == 0) + (i % 5 == 0)
        assert r == exp
        assert len(t.split("\n")) == 3  # the unique body survives intact


def test_drop_lines_empty_drop_set_is_identity():
    tbl, _ = _corpus(20)
    out = drop_lines(tbl, set())
    assert out["text"].to_pylist() == tbl["text"].to_pylist()
    assert sum(out["n_lines_removed"].to_pylist()) == 0
