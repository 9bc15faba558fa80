"""Round-4 ADVICE regressions: inverted range-join intervals, raw-text
JSONL semantics in `cli check`, stale filter_stats on curation re-run."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from json_schema_ray.cli import main
from json_schema_ray.functions.rangejoin import range_join_counts


def test_rangejoin_inverted_interval_does_not_undercount(ray_session):
    """A same-bucket inverted interval (end < t < start) used to feed the
    counts subtraction a -1 for unrelated points, cancelling valid
    matches."""
    import ray.data as rd

    pts = pa.table({"k": pa.array([0], type=pa.int64()),
                    "t": pa.array([500], type=pa.int64())})
    ivs = pa.table(
        {
            "k": pa.array([0, 0], type=pa.int64()),
            # one genuine covering interval + one inverted one in the same
            # (key, bucket) group with end < t < start
            "s": pa.array([400, 800], type=pa.int64()),
            "e": pa.array([600, 100], type=pa.int64()),
        }
    )
    got = range_join_counts(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        bucket_width_us=1000,
    ).to_pandas()
    assert len(got) == 1
    assert int(got["n_matches"].iloc[0]) == 1


def test_cli_check_jsonl_raw_text_semantics(ray_session, tmp_path, capsys):
    """Heterogeneous JSONL: Arrow schema unification would inject keys
    seen only in other documents (flipping additionalProperties:false)
    and materialize missing keys as explicit nulls (flipping required).
    The raw-text path validates each line as its own document."""
    docs = tmp_path / "docs.jsonl"
    with open(docs, "w") as f:
        f.write(json.dumps({"a": 1}) + "\n")   # valid
        f.write(json.dumps({"b": 2}) + "\n")   # invalid: missing a, extra b
    schema = tmp_path / "schema.json"
    json.dump(
        {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"type": "integer"}},
            "additionalProperties": False,
        },
        open(schema, "w"),
    )
    rc = main(["check", "--schema", str(schema), "--input", str(docs)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # unified-schema path reported n_invalid == 2 ({"a":1} rejected for the
    # injected b:null) — the raw-text path must report exactly 1
    assert out["n_docs"] == 2
    assert out["n_valid"] == 1
    assert out["n_invalid"] == 1
    assert rc == 3


def test_curation_rerun_clears_stale_filter_stats(ray_session, tmp_path):
    """resume=False into an existing out_dir re-runs stage 1; stale
    side-output partials must not be summed with the new ones."""
    from json_schema_ray.pipelines.curation import run_curation

    rng = np.random.default_rng(7)
    words = ["the", "quick", "brown", "fox", "data", "pipeline", "ray", "arrow"]
    texts = [" ".join(rng.choice(words, size=30)) + "." for _ in range(60)]
    texts += ["x y"] * 10  # below min_tokens -> dropped, nonzero reason count
    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)}),
        docs,
    )
    out_dir = str(tmp_path / "curated")
    rep1 = run_curation(str(docs), out_dir, resume=False, concurrency=2)
    rep2 = run_curation(str(docs), out_dir, resume=False, concurrency=2)
    assert rep1.n_input == rep2.n_input == len(texts)
    assert rep2.n_filtered == rep1.n_filtered
    assert rep2.drop_reasons == rep1.drop_reasons
    assert sum(rep1.drop_reasons.values()) == rep1.n_input - rep1.n_filtered > 0
