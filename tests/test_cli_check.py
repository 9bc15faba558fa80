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
