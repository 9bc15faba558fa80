"""End-to-end tests for the composed curation funnel
(pipelines/curation.py): every drop reason exercised once, exact/near
dup and contamination planted, PII scrubbed, splits partition the
output, packing respects capacity, and resume skips finished stages.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from json_schema_ray.pipelines.curation import (
    REASONS,
    SignalFilter,
    run_curation,
)

WORDS = [
    "the", "and", "of", "to", "in", "is", "that", "it", "for", "with",
    "data", "model", "training", "pipeline", "quality", "language",
    "document", "system", "large", "scale",
]


def _sent(rng, n=60):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(30):
        rows.append((i, _sent(rng) + f" unique marker {i} alpha beta gamma"))
    rows.append((100, "der die das und ist nicht mit ein zu den " * 8))  # lang
    rows.append((101, "the doc is it"))  # too_short (4 tokens < 5)
    rows.append((102, "the ################### and !!!!!!!!!!!!!!!!!! of ?????????????????? is"))  # quality
    rows.append((103, "the spam and spam of spam " + "spam " * 150))  # repetition
    dup = _sent(rng, 80)
    rows.append((104, dup))
    rows.append((105, dup))  # exact dup of 104
    nd = _sent(rng, 120)
    rows.append((106, nd))
    rows.append((107, nd.replace("the", "zzz", 1)))  # near dup of 106
    bench_grams_text = " ".join(f"bm{j}" for j in range(20))
    rows.append((108, _sent(rng, 40) + " " + bench_grams_text + " the and of to in is"))
    rows.append((109, _sent(rng, 60) + " contact john.doe@example.com the and of"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    d = tmp_path_factory.mktemp("curation")
    pq.write_table(t, str(d / "docs.parquet"))
    bench = pa.table(
        {"text": pa.array([" ".join(f"bm{j}" for j in range(40)) + " tail filler words"])}
    )
    return str(d / "docs.parquet"), bench, str(d / "out")


@pytest.fixture(scope="module")
def report(corpus, ray_session):
    docs, bench, out = corpus
    rep = run_curation(
        docs, out, benchmark_texts=bench, pack_capacity=256, min_quality=0.3
    )
    return rep


def test_funnel_counts(report):
    assert report.n_input == 40
    # dropped in stage 1: 100 (lang), 101 (too_short), 102 (quality), 103 (repetition)
    assert report.drop_reasons["lang"] == 1
    assert report.drop_reasons["too_short"] == 1
    assert report.drop_reasons["quality"] == 1
    assert report.drop_reasons["repetition"] == 1
    assert report.n_filtered == 36
    assert report.n_exact_deduped == 35  # 105 folded into 104
    assert report.n_near_dup_dropped == 1  # 107 folded into 106
    assert report.n_contaminated_dropped == 1  # 108
    assert report.n_final == 33
    assert sum(report.split_counts.values()) == 33


def test_survivors_and_scrub(report):
    import ray.data as rd

    cur = rd.read_parquet(os.path.join(report.out_dir, "curated")).to_pandas()
    ids = set(cur.doc_id)
    assert ids == set(range(30)) | {104, 106, 109}
    assert "[EMAIL]" in cur[cur.doc_id == 109].text.iloc[0]
    assert "@" not in cur[cur.doc_id == 109].text.iloc[0]
    # signal columns ride along
    for col in ("lang_pred", "quality_score", "n_bpe_tokens", "fingerprint", "split", "pack_bin"):
        assert col in cur.columns


def test_packing_capacity(report):
    import ray.data as rd

    cur = rd.read_parquet(os.path.join(report.out_dir, "curated")).to_pandas()
    per_bin = cur.groupby("pack_bin").n_bpe_tokens.agg(["sum", "size"])
    # a bin exceeds capacity only when it holds a single oversized doc
    over = per_bin[per_bin["sum"] > 256]
    assert (over["size"] == 1).all()
    assert report.n_pack_bins == cur.pack_bin.nunique()


def test_resume_skips_stages(corpus, report):
    docs, bench, out = corpus
    rep2 = run_curation(
        docs, out, benchmark_texts=bench, pack_capacity=256, min_quality=0.3
    )
    assert rep2.resumed_stages == ["filtered", "deduped", "drops", "curated"]
    assert rep2.n_final == report.n_final
    assert rep2.split_counts == report.split_counts
    assert rep2.drop_reasons == report.drop_reasons


def test_report_table_invariants(report):
    t = report.to_table()
    assert t.num_rows == 1
    assert t["funnel_ok"][0].as_py() is True
    assert t["n_final"][0].as_py() == report.n_final


def test_funnel_lsh_spill_path(corpus, ray_session, tmp_path):
    """The funnel's near-dup stage is ALWAYS spill-backed (round-5: the
    pinned path is gone); the result is unchanged and the consumed spill
    is removed once drops.parquet is marked done.  (The spill's existence
    DURING the stage + dirty-dir reuse are asserted in
    tests/test_round5_fixes.py.)"""
    docs, bench, _ = corpus
    out = str(tmp_path / "out_spill")
    rep = run_curation(
        docs, out, benchmark_texts=bench, pack_capacity=256, min_quality=0.3
    )
    assert rep.n_near_dup_dropped == 1
    assert rep.n_final == 33
    assert not os.path.isdir(os.path.join(out, "drops", "_lsh_spill"))


def test_signal_filter_empty_batch(ray_session):
    sf = SignalFilter(stats_dir=None)
    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    out = sf(empty)
    assert out.num_rows == 0
    assert "fingerprint" in out.schema.names


def test_reason_precedence_counts_once(ray_session, tmp_path):
    # a doc failing lang AND length counts only under lang (first reason)
    sf = SignalFilter(stats_dir=str(tmp_path / "s"), min_tokens=5)
    b = pa.table(
        {"doc_id": pa.array([1], type=pa.int64()), "text": pa.array(["kurz und"])}
    )
    sf(b)
    parts = [f for f in os.listdir(tmp_path / "s") if f.endswith(".parquet")]
    t = pq.read_table(str(tmp_path / "s" / parts[0])).to_pandas().set_index("reason").n
    assert t["lang"] + t["too_short"] == 1  # exactly one reason charged
    assert t["__in__"] == 1 and t["__kept__"] == 0
