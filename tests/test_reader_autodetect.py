"""Lance/Parquet format autodetection (`sources/reader.py`).

`BASELINE.json input_hint` names a Lance table as the canonical input.
The `lance` package is absent in this sandbox, so the Lance branch is
exercised through the injectable `_lance_reader` boundary: tests
monkeypatch it with a parquet-backed stand-in whose shape matches
`ray.data.read_lance` (returns a Dataset, honors `columns=`), and the
full validation pipeline runs end-to-end over a fake Lance layout,
asserting verdict/violation equality with the hive-parquet run of the
SAME generated corpus.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from json_schema_ray.sources import reader
from json_schema_ray.sources.interleaved import generate, write_dataset


def test_is_lance_dataset_detection(tmp_path):
    # suffix-based
    d = tmp_path / "tbl.lance"
    d.mkdir()
    assert reader.is_lance_dataset(str(d))
    # layout-based: _versions manifest dir
    d2 = tmp_path / "plain"
    d2.mkdir()
    assert not reader.is_lance_dataset(str(d2))
    (d2 / "_versions").mkdir()
    assert reader.is_lance_dataset(str(d2))
    # parquet file / nonexistent path are not Lance
    assert not reader.is_lance_dataset(str(tmp_path / "x.parquet"))
    assert not reader.is_lance_dataset(str(tmp_path / "missing"))


def test_lance_reader_raises_helpful_import_error(tmp_path):
    d = tmp_path / "tbl.lance"
    d.mkdir()
    try:
        import lance  # noqa: F401

        pytest.skip("lance installed in this environment; branch runs for real")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="lance"):
        reader._lance_reader(str(d))


def test_read_auto_dispatch(tmp_path, monkeypatch, ray_session):
    import pyarrow as pa

    calls = {}

    def fake_lance(path, columns=None, **kw):
        calls["path"], calls["columns"] = path, columns
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": ["a"]}))

    monkeypatch.setattr(reader, "_lance_reader", fake_lance)
    d = tmp_path / "tbl.lance"
    d.mkdir()
    ds = reader.read_auto(str(d), columns=["doc_id"])
    assert ds.count() == 1
    assert calls == {"path": str(d), "columns": ["doc_id"]}

    # parquet path → read_parquet, fake not consulted
    calls.clear()
    f = tmp_path / "t.parquet"
    pq.write_table(pa.table({"doc_id": ["a", "b"]}), f)
    assert reader.read_auto(str(f)).count() == 2
    assert not calls


@pytest.fixture()
def fake_lance_corpus(tmp_path, monkeypatch):
    """A fake Lance dataset: the generated interleaved corpus written as a
    single parquet file (partition_id as a real column, exactly what
    read_lance would yield) inside a `_versions`-bearing directory, with
    `_lance_reader` monkeypatched to read it."""
    data = generate(n_docs=600, seed=42, n_parts=4)
    lance_dir = tmp_path / "docs.lance"
    (lance_dir / "_versions").mkdir(parents=True)
    backing = lance_dir / "_backing.parquet"
    pq.write_table(data.documents, backing)

    def fake_lance(path, columns=None, **kw):
        import ray.data as rd

        assert path == str(lance_dir)
        return rd.read_parquet(str(backing), columns=columns)

    monkeypatch.setattr(reader, "_lance_reader", fake_lance)

    # the parquet-hive twin of the same corpus, for output equality
    hive_dir = tmp_path / "hive"
    paths = write_dataset(str(hive_dir), data)
    return data, str(lance_dir), paths


def test_validation_pipeline_over_lance_input(
    ray_session, fake_lance_corpus, tmp_path
):
    """Full pipeline over Lance input == full pipeline over hive parquet:
    same verdict rows (per-partition counts, pass/fail, constraints JSON)
    and the same violation (doc_id, constraint_id) set."""
    import glob

    import pyarrow.dataset as pads

    from json_schema_ray.pipelines.validation import run_validation

    data, lance_dir, paths = fake_lance_corpus

    rep_lance = run_validation(
        lance_dir,
        catalog_path=paths["catalog"],
        out_dir=str(tmp_path / "out_lance"),
        concurrency=2,
    )
    rep_hive = run_validation(
        paths["documents"],
        catalog_path=paths["catalog"],
        out_dir=str(tmp_path / "out_hive"),
        concurrency=2,
    )

    vl = rep_lance.verdicts.sort_by("partition_id").to_pandas()
    vh = rep_hive.verdicts.sort_by("partition_id").to_pandas()
    for col in ("partition_id", "n_docs", "n_bad_docs", "n_dup_doc_ids", "pass", "constraints"):
        assert list(vl[col]) == list(vh[col]), col

    def viol_set(rep):
        files = glob.glob(os.path.join(rep.violations_path, "**", "*.parquet"), recursive=True)
        if not files:
            return set()
        t = pads.dataset(rep.violations_path, partitioning="hive").to_table()
        return set(zip(t["doc_id"].to_pylist(), t["constraint_id"].to_pylist()))

    assert viol_set(rep_lance) == viol_set(rep_hive)
    assert rep_lance.n_violations == rep_hive.n_violations


def test_lance_rerun_is_idempotent(ray_session, fake_lance_corpus, tmp_path):
    """Lance input has no per-file resume manifest (partition discovery is
    a parquet-layout feature); a re-run must fully redo the work and end
    with the same outputs, not double-write violations."""
    from json_schema_ray.pipelines.validation import run_validation

    data, lance_dir, paths = fake_lance_corpus
    out = str(tmp_path / "out")
    r1 = run_validation(lance_dir, catalog_path=paths["catalog"], out_dir=out, concurrency=2)
    r2 = run_validation(lance_dir, catalog_path=paths["catalog"], out_dir=out, concurrency=2)
    assert r1.n_violations == r2.n_violations
    assert r1.verdicts.sort_by("partition_id").equals(r2.verdicts.sort_by("partition_id"))
