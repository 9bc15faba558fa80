"""JSONL / CSV ingestion through read_auto + the Schema.apply workload.

The reference's native instance format is a JSON string per document
(``Schema.apply(jsonText)``, ``js/Schema.java:51-66``); the distributed
analog is a newline-delimited JSON file read into a Dataset and validated
row-by-row by a compiled schema inside ``map_batches`` — compile once on
the driver, apply many on workers."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from json_schema_ray.builder import ConstraintEngineBuilder
from json_schema_ray.sources.reader import read_auto

SCHEMA = {
    "type": "object",
    "required": ["k", "tag"],
    "properties": {
        "k": {"type": "integer", "minimum": 0, "maximum": 49},
        "tag": {"enum": ["a", "b", "c"]},
    },
}


@pytest.fixture()
def jsonl_file(tmp_path):
    rows = [{"k": i % 60, "tag": ["a", "b", "c", "zz"][i % 4]} for i in range(200)]
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p), rows


def test_jsonl_read_and_validate(ray_session, jsonl_file):
    path, rows = jsonl_file
    cs = ConstraintEngineBuilder().compile(SCHEMA)

    def validate(batch: pa.Table) -> pa.Table:
        # JSONL parses into typed columns; reassemble the row objects the
        # way the reference sees them (row == one JSON document)
        objs = batch.to_pylist()
        return pa.table({"ok": pa.array([cs.is_valid(o) for o in objs])})

    got = read_auto(path).map_batches(validate, batch_format="pyarrow").to_pandas()
    expected = [r["k"] < 50 and r["tag"] in ("a", "b", "c") for r in rows]
    assert got["ok"].sum() == sum(expected)
    assert len(got) == len(rows)


def test_jsonl_column_projection(ray_session, jsonl_file):
    path, _ = jsonl_file
    ds = read_auto(path, columns=["k"])
    assert ds.schema().names == ["k"]


def test_csv_read(ray_session, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n3,z\n")
    ds = read_auto(str(p), columns=["a"])
    assert ds.schema().names == ["a"]
    assert sorted(r["a"] for r in ds.take_all()) == [1, 2, 3]


def test_jsonl_validate_table_path(ray_session, jsonl_file):
    """The generic-table validator accepts the JSONL-born Dataset too —
    same verdict counts as the per-row dynamic path."""
    from json_schema_ray.stages.constraint import validate_table

    path, rows = jsonl_file
    counts, _ = validate_table(read_auto(path), spec={}, row_schema=SCHEMA)
    n_bad_expected = sum(
        not (r["k"] < 50 and r["tag"] in ("a", "b", "c")) for r in rows
    )
    df = counts.to_pandas()
    row = df[df["constraint_id"] == "__row__/schema"].iloc[0]
    assert int(row["n_bad"]) == n_bad_expected
    assert int(row["n_rows"]) == len(rows)
