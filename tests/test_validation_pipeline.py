"""End-to-end flagship pipeline tests: golden synthetic interleaved table
with seeded violations → exact violation rows, per-partition verdicts,
uniqueness, sketches, drift, and checkpoint/resume (FIXTURES.md §1/§3/§6)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from json_schema_ray.sources.interleaved import generate, write_dataset


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    data = generate(n_docs=600, seed=42, n_parts=4)
    out = str(tmp_path_factory.mktemp("interleaved"))
    paths = write_dataset(out, data)
    return data, paths, out


def _violations_by_constraint(report):
    import glob

    out = {}
    if report.violations_path and os.path.isdir(report.violations_path):
        files = glob.glob(os.path.join(report.violations_path, "**", "*.parquet"), recursive=True)
        if files:
            import pyarrow.dataset as pads

            tbl = pads.dataset(report.violations_path, partitioning="hive").to_table()
            df = tbl.to_pandas()
            for cid, g in df.groupby("constraint_id"):
                out[cid] = sorted(set(g["doc_id"]))
    return out


def test_generator_shape(gen_dir):
    data, paths, out = gen_dir
    assert data.documents.column_names == ["doc_id", "spans", "partition_id"]
    st = data.documents.schema.field("spans").type
    assert [f.name for f in st.value_type] == ["kind", "text", "media_ref", "offset"]
    # deterministic: same seed → identical table
    again = generate(n_docs=600, seed=42, n_parts=4)
    assert again.documents.equals(data.documents)
    assert again.expected == data.expected


def test_full_pipeline_exact_violations(ray_session, gen_dir, tmp_path):
    from json_schema_ray.pipelines.validation import run_validation

    data, paths, out = gen_dir
    report = run_validation(
        paths["documents"],
        catalog_path=paths["catalog"],
        out_dir=str(tmp_path / "run1"),
        concurrency=2,
    )
    got = _violations_by_constraint(report)
    exp = data.expected

    assert got.get("spans[].kind/enum", []) == exp["bad_kind"]
    assert got.get("spans[].media_ref/format", []) == exp["bad_media_ref_format"]
    assert got.get("spans[].media_ref/referential", []) == exp["dangling_media_ref"]
    assert got.get("spans[].text/required", []) == exp["null_text"]
    assert got.get("spans[].offset/order", []) == exp["offset_disorder"]
    assert got.get("spans/minItems", []) == exp["empty_spans"]

    # uniqueness: dataset-level duplicate count
    vd = report.verdicts.to_pandas()
    assert (vd["n_dup_doc_ids"] > 0).all() == (len(exp["dup_doc_id"]) > 0)
    assert vd["n_dup_doc_ids"].iloc[0] == len(exp["dup_doc_id"])

    # per-partition verdicts: partitions with no expected bad docs pass
    docs = data.documents.to_pandas()
    bad_ids = set().union(*[set(v) for v in exp.values()])
    docs["bad"] = docs["doc_id"].isin(bad_ids - set(exp["dup_doc_id"]))
    per_part_bad = docs.groupby("partition_id")["bad"].sum()
    for _, row in vd.iterrows():
        assert row["n_bad_docs"] == per_part_bad.get(row["partition_id"], 0)
        assert row["n_docs"] == (docs["partition_id"] == row["partition_id"]).sum()

    # HLL cardinality ≈ exact distinct doc_id
    from json_schema_ray.state.hll import HyperLogLog

    kind, blob = report.profile["doc_id"]
    assert kind == "hll"
    est = HyperLogLog.from_bytes(blob).estimate()
    exact = docs["doc_id"].nunique()
    assert abs(est - exact) / exact < 0.05


def test_clean_data_all_pass(ray_session, tmp_path):
    from json_schema_ray.pipelines.validation import run_validation

    rates = {k: 0.0 for k in ("dup_doc_id", "bad_kind", "bad_media_ref_format",
                               "dangling_media_ref", "null_text", "offset_disorder", "empty_spans")}
    data = generate(n_docs=300, seed=7, rates=rates, n_parts=2)
    paths = write_dataset(str(tmp_path / "clean"), data)
    report = run_validation(paths["documents"], catalog_path=paths["catalog"],
                            out_dir=str(tmp_path / "out"), concurrency=2)
    assert report.all_pass
    assert report.n_violations == 0


def test_checkpoint_resume(ray_session, gen_dir, tmp_path):
    """Kill after K partitions (max_partitions), resume, compare to a clean
    uninterrupted run — identical verdicts + violations (FIXTURES.md §6)."""
    from json_schema_ray.pipelines.validation import run_validation

    data, paths, out = gen_dir
    clean_dir = str(tmp_path / "clean_run")
    r_clean = run_validation(paths["documents"], catalog_path=paths["catalog"],
                             out_dir=clean_dir, concurrency=2)

    resumed_dir = str(tmp_path / "resumed_run")
    r1 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=resumed_dir, max_partitions=2, concurrency=2)
    assert len(r1.verdicts) == 2
    r2 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=resumed_dir, concurrency=2)
    assert sorted(r2.skipped_partitions) == sorted(r1.verdicts["partition_id"].to_pylist())

    import pyarrow.dataset as pads

    v_clean = (
        pads.dataset(r_clean.violations_path, partitioning="hive").to_table().to_pandas()
        .sort_values(["partition_id", "doc_id", "span_index", "constraint_id"]).reset_index(drop=True)
    )
    v_res = (
        pads.dataset(r2.violations_path, partitioning="hive").to_table().to_pandas()
        .sort_values(["partition_id", "doc_id", "span_index", "constraint_id"]).reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(v_clean, v_res[v_clean.columns])


def test_drift_detection(ray_session, tmp_path):
    from json_schema_ray.pipelines.validation import load_profile, run_validation

    rates = {k: 0.0 for k in ("dup_doc_id", "bad_kind", "bad_media_ref_format",
                               "dangling_media_ref", "null_text", "offset_disorder", "empty_spans")}
    base = generate(n_docs=400, seed=1, rates=rates, n_parts=2)
    bp = write_dataset(str(tmp_path / "base"), base)
    r_base = run_validation(bp["documents"], catalog_path=bp["catalog"],
                            out_dir=str(tmp_path / "base_out"), concurrency=2)
    baseline = load_profile(os.path.join(str(tmp_path / "base_out"), "profile.json"))

    # same distribution → no drift
    same = generate(n_docs=400, seed=2, rates=rates, n_parts=2)
    sp = write_dataset(str(tmp_path / "same"), same)
    r_same = run_validation(sp["documents"], catalog_path=sp["catalog"],
                            out_dir=str(tmp_path / "same_out"),
                            baseline_profile=baseline, concurrency=2)
    d = r_same.drift.to_pandas().set_index("feature")
    assert not d.loc["n_spans", "drifted"]
    assert not d.loc["text_len", "drifted"]

    # shifted sample: text lengths scaled ×~1.5 (longer spans) → drift fires
    shifted = generate(n_docs=400, seed=3, rates=rates, n_parts=2, words_per_span=(5, 18))
    hp = write_dataset(str(tmp_path / "shifted"), shifted)
    r_shift = run_validation(hp["documents"], catalog_path=hp["catalog"],
                             out_dir=str(tmp_path / "shift_out"),
                             baseline_profile=baseline, concurrency=2)
    ds_ = r_shift.drift.to_pandas().set_index("feature")
    assert ds_.loc["text_len", "drifted"]


def test_resume_verdicts_keep_completed_partitions_and_dup_fail(ray_session, gen_dir, tmp_path):
    """ADVICE r1: a resumed run must (a) keep completed partitions' verdict
    rows in verdicts.parquet, (b) not flip a duplicate-doc_id failure to
    all_pass on a no-op resume (dataset-level dup count is persisted)."""
    from json_schema_ray.pipelines.validation import run_validation

    data, paths, out = gen_dir
    assert len(data.expected["dup_doc_id"]) > 0  # seeded duplicates
    d = str(tmp_path / "resume_verdicts")
    r1 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=d, max_partitions=2, concurrency=2)
    r2 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=d, concurrency=2)
    # all 4 partitions present after resume (not just the pending 2)
    assert sorted(r2.verdicts["partition_id"].to_pylist()) == [0, 1, 2, 3]
    vd = pq.read_table(os.path.join(d, "verdicts.parquet")).to_pandas()
    assert sorted(vd["partition_id"]) == [0, 1, 2, 3]
    assert (vd["n_dup_doc_ids"] == len(data.expected["dup_doc_id"])).all()
    assert not vd["pass"].any()  # duplicates fail every partition verdict

    # no-op resume: everything completed; dup verdict must survive
    r3 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=d, concurrency=2)
    assert sorted(r3.skipped_partitions) == [0, 1, 2, 3]
    assert not r3.all_pass
    assert (r3.verdicts.to_pandas()["n_dup_doc_ids"] > 0).all()


def test_violation_expected_actual_message_golden(ray_session, gen_dir, tmp_path):
    """Golden expected/actual/message per violation class (SURVEY §1.2's
    (…, expected, actual) contract + rendered spec/errors templates)."""
    import pyarrow.dataset as pads

    from json_schema_ray.pipelines.validation import run_validation

    data, paths, out = gen_dir
    report = run_validation(paths["documents"], catalog_path=paths["catalog"],
                            out_dir=str(tmp_path / "msg"), concurrency=2)
    df = pads.dataset(report.violations_path, partitioning="hive").to_table().to_pandas()
    by_cid = {cid: g.iloc[0] for cid, g in df.groupby("constraint_id")}

    r = by_cid["spans[].kind/enum"]
    assert r["expected"] == "['text', 'image', 'audio', 'video']"
    assert r["message"] == f"The value {r['actual']} not declared in enum ['text', 'image', 'audio', 'video']"
    r = by_cid["spans[].media_ref/format"]
    assert r["expected"] == "media-ref"
    assert r["message"].startswith("Value ") and r["message"].endswith(" not conform to format media-ref")
    r = by_cid["spans[].media_ref/referential"]
    assert r["message"] == f"Value {r['actual']} has no match in catalog media"
    r = by_cid["spans[].text/required"]
    assert r["message"] == "Some required properties [text] are missing"
    r = by_cid["spans[].offset/order"]
    assert r["message"].endswith("breaks required ordering (strictly increasing offset)")
    r = by_cid["spans/minItems"]
    assert r["expected"] == "minItems=1"
    assert r["message"] == "Required minimum items amount is 1, Actual size: 0"


def test_incremental_ingestion_new_partition(ray_session, tmp_path):
    """Incremental mode: a new hive partition appearing later is validated
    by a resume run without re-scanning completed partitions — the
    streaming-ingestion pattern for a checkpointed batch validator."""
    import numpy as np
    import pyarrow as pa

    from json_schema_ray.pipelines.validation import run_validation

    rates = {k: 0.0 for k in ("dup_doc_id", "bad_kind", "bad_media_ref_format",
                               "dangling_media_ref", "null_text", "offset_disorder", "empty_spans")}
    data = generate(n_docs=300, seed=21, rates=rates, n_parts=3)
    paths = write_dataset(str(tmp_path / "inc"), data)
    out = str(tmp_path / "out")
    r1 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=out, concurrency=2)
    assert sorted(r1.verdicts["partition_id"].to_pylist()) == [0, 1, 2]

    # a NEW partition arrives (ids disjoint, one seeded bad kind)
    extra = generate(n_docs=80, seed=99, rates=rates, n_parts=1)
    docs = extra.documents
    pid = pa.array(np.full(len(docs), 3, dtype=np.int32))
    docs = docs.set_column(docs.column_names.index("partition_id"), "partition_id", pid)
    part_dir = os.path.join(paths["documents"], "partition_id=3")
    os.makedirs(part_dir)
    import pyarrow.parquet as pq_

    pq_.write_table(docs.drop(["partition_id"]), os.path.join(part_dir, "part.parquet"))

    r2 = run_validation(paths["documents"], catalog_path=paths["catalog"],
                        out_dir=out, concurrency=2)
    assert sorted(r2.skipped_partitions) == [0, 1, 2]  # untouched
    assert sorted(r2.verdicts["partition_id"].to_pylist()) == [0, 1, 2, 3]
    vd = r2.verdicts.to_pandas().set_index("partition_id")
    assert vd.loc[3, "n_docs"] == 80


def test_empty_partition_input(ray_session, tmp_path):
    """Zero-row partitions flow through the whole pipeline: empty blocks
    may carry key-less schemas (regression: the uniqueness mapper raised
    KeyError on them) and the verdict is a clean pass."""
    import pyarrow.parquet as pq_

    from json_schema_ray.pipelines.validation import run_validation

    docs_dir = tmp_path / "documents" / "partition_id=0"
    docs_dir.mkdir(parents=True)
    data = generate(n_docs=10, seed=1, n_parts=1)
    pq_.write_table(data.documents.slice(0, 0).drop(["partition_id"]), str(docs_dir / "part.parquet"))
    r = run_validation(str(tmp_path / "documents"), out_dir=str(tmp_path / "out"), concurrency=1)
    assert len(r.verdicts) == 1
    assert r.all_pass and r.n_violations == 0


@pytest.mark.parametrize("seed,n_docs,n_parts,hot", [
    (101, 400, 2, {"bad_kind": 0.05}),
    (202, 350, 5, {"offset_disorder": 0.04, "empty_spans": 0.03}),
    (303, 500, 1, {"dangling_media_ref": 0.05, "null_text": 0.05}),
    (404, 450, 3, {"dup_doc_id": 0.03, "bad_media_ref_format": 0.04}),
])
def test_flagship_exact_violations_across_configs(ray_session, tmp_path, seed, n_docs, n_parts, hot):
    """Flagship sweep: seeded violation classes at varied rates, seeds and
    partition counts must reproduce EXACTLY in the written violation rows."""
    from json_schema_ray.pipelines.validation import run_validation

    rates = {k: 0.0 for k in ("dup_doc_id", "bad_kind", "bad_media_ref_format",
                               "dangling_media_ref", "null_text", "offset_disorder", "empty_spans")}
    rates.update(hot)
    data = generate(n_docs=n_docs, seed=seed, rates=rates, n_parts=n_parts)
    paths = write_dataset(str(tmp_path / f"cfg{seed}"), data)
    report = run_validation(paths["documents"], catalog_path=paths["catalog"],
                            out_dir=str(tmp_path / f"out{seed}"), concurrency=2)
    got = _violations_by_constraint(report)
    exp = data.expected
    mapping = {
        "bad_kind": "spans[].kind/enum",
        "bad_media_ref_format": "spans[].media_ref/format",
        "dangling_media_ref": "spans[].media_ref/referential",
        "null_text": "spans[].text/required",
        "offset_disorder": "spans[].offset/order",
        "empty_spans": "spans/minItems",
    }
    for key, cid in mapping.items():
        assert got.get(cid, []) == exp[key], (seed, key)
    vd = report.verdicts.to_pandas()
    assert vd["n_dup_doc_ids"].iloc[0] == len(exp["dup_doc_id"])


def test_auto_blocks_byte_clamp(tmp_path, monkeypatch):
    from json_schema_ray.pipelines.validation import _auto_blocks

    small = tmp_path / "small.parquet"
    small.write_bytes(b"x" * (300 * 1024))  # ~1.2 target blocks of 256 KiB
    big = tmp_path / "big.parquet"
    big.write_bytes(b"x" * (600 * 1024 * 1024))  # >> 512 target blocks

    # tiny input: clamped to the 2-waves-per-CPU floor, not 16/CPU
    assert _auto_blocks([str(small)], 32) == 64
    # large input: cap at blocks-per-CPU (the load-balance ceiling)
    assert _auto_blocks([str(big)], 32) == 512
    # never below the file count
    files = [str(small)] * 100
    assert _auto_blocks(files, 4) == 100
    # knob still wins as the ceiling
    monkeypatch.setenv("JSR_BLOCKS_PER_CPU", "4")
    assert _auto_blocks([str(big)], 32) == 128
    monkeypatch.delenv("JSR_BLOCKS_PER_CPU")
    # unreadable path: byte clamp silently disabled, ceiling applies
    assert _auto_blocks(["/nonexistent/zzz.parquet"], 4) == 64
