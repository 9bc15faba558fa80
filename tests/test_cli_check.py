"""`json_schema_ray.cli check` — distributed Schema.apply over JSONL."""

from __future__ import annotations

import json

from json_schema_ray.cli import main


def test_cli_check_jsonl(ray_session, tmp_path, capsys):
    rows = [{"k": i % 60, "tag": ["a", "b", "c", "zz"][i % 4]} for i in range(100)]
    docs = tmp_path / "docs.jsonl"
    with open(docs, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = tmp_path / "schema.json"
    json.dump(
        {
            "type": "object",
            "required": ["k", "tag"],
            "properties": {
                "k": {"type": "integer", "minimum": 0, "maximum": 49},
                "tag": {"enum": ["a", "b", "c"]},
            },
        },
        open(schema, "w"),
    )
    rc = main(["check", "--schema", str(schema), "--input", str(docs)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    expected_invalid = sum(
        not (r["k"] < 50 and r["tag"] in ("a", "b", "c")) for r in rows
    )
    assert out["n_docs"] == 100
    assert out["n_invalid"] == expected_invalid
    assert out["examples"]  # rendered violation rows surface
    assert rc == 3  # invalid docs -> nonzero exit contract


def test_cli_check_all_valid(ray_session, tmp_path, capsys):
    docs = tmp_path / "ok.jsonl"
    with open(docs, "w") as f:
        for i in range(10):
            f.write(json.dumps({"k": i, "tag": "a"}) + "\n")
    schema = tmp_path / "schema.json"
    json.dump({"properties": {"k": {"type": "integer"}}}, open(schema, "w"))
    rc = main(["check", "--schema", str(schema), "--input", str(docs)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_invalid"] == 0


def test_cli_curate(ray_session, tmp_path, capsys):
    """`curate` subcommand: runs the funnel, prints the report row, exits
    by the funnel_ok verdict; --resume skips finished stages."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    words = ["the", "quick", "brown", "fox", "data", "pipeline", "ray", "arrow"]
    texts = [" ".join(rng.choice(words, size=30)) + "." for _ in range(120)]
    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                  "text": pa.array(texts)}),
        docs,
    )
    out_dir = tmp_path / "curated"
    rc = main(["curate", "--input", str(docs), "--out", str(out_dir), "--no-resume"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["funnel_ok"]
    assert rep["n_input"] == 120 and rep["n_final"] <= rep["n_filtered"]

    rc2 = main(["curate", "--input", str(docs), "--out", str(out_dir), "--resume"])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0 and set(rep2["resumed_stages"]) == {"filtered", "deduped", "drops", "curated"}
    assert rep2["n_final"] == rep["n_final"]


def test_cli_check_explain_trees(ray_session, tmp_path, capsys):
    """--explain renders each collected example as a hierarchy tree."""
    docs = tmp_path / "docs.jsonl"
    with open(docs, "w") as f:
        f.write(json.dumps({"payload": {"kind": "zz"}}) + "\n")
        f.write(json.dumps({"payload": 12}) + "\n")
    schema = tmp_path / "schema.json"
    json.dump(
        {
            "properties": {
                "payload": {
                    "oneOf": [
                        {"type": "integer", "minimum": 10},
                        {"type": "object", "required": ["kind"],
                         "properties": {"kind": {"enum": ["a", "b"]}}},
                    ]
                }
            }
        },
        open(schema, "w"),
    )
    rc = main(["check", "--schema", str(schema), "--input", str(docs), "--explain"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3 and out["n_invalid"] == 1
    tree = json.loads(out["examples"][0])["tree"]
    assert "CONT-ERR" in tree and "ONE_OF_EMPTY" in tree and "branch[1]" in tree
