"""Constraint inference round-trip: profile → suggested schema → compile →
validate the SAME data → zero violations (the inferred schema is closed
over the profiled table by construction); planted outliers get caught."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from json_schema_ray.stages.constraint import validate_table
from json_schema_ray.stages.infer import infer_table_schema


def _events_like(n=500):
    import numpy as np

    rng = np.random.RandomState(3)
    return pa.table(
        {
            "event_type": pa.array(np.array(["click", "view", "purchase"])[rng.randint(0, 3, n)]),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
            "k": pa.array(rng.randint(0, 50, n).astype("int64")),
            "note": pa.array([f"note-{i:04d}" for i in range(n)]),  # high cardinality
        }
    )


def test_infer_roundtrip_zero_violations(ray_session):
    t = _events_like()
    ds = rd.from_arrow(t)
    schema = infer_table_schema(ds)
    # shape checks
    p = schema["properties"]
    assert p["event_type"]["enum"] == ["click", "purchase", "view"]
    assert p["k"]["type"] == "integer" and p["k"]["minimum"] >= 0 and p["k"]["maximum"] <= 49
    assert p["value"]["type"] == "number"
    assert "enum" not in p["note"] and p["note"]["maxLength"] == 9  # cardinality > threshold
    assert sorted(schema["required"]) == ["event_type", "k", "note", "value"]

    counts, _ = validate_table(rd.from_arrow(t), spec={}, row_schema=schema)
    df = counts.to_pandas()
    assert int(df[df["constraint_id"] == "__row__/schema"]["n_bad"].iloc[0]) == 0


def test_infer_catches_planted_outliers(ray_session):
    t = _events_like()
    ds = rd.from_arrow(t)
    schema = infer_table_schema(ds)
    bad = pa.table(
        {
            "event_type": pa.array(["bogus", "click"]),
            "value": pa.array([1e9, 5.0]),
            "k": pa.array([-1, 3], type=pa.int64()),
            "note": pa.array(["x", "note-0001"]),
        }
    )
    both = pa.concat_tables([t, bad])
    counts, _ = validate_table(rd.from_arrow(both), spec={}, row_schema=schema)
    df = counts.to_pandas()
    # row 1 violates enum+range+length, row 2 only k=3/value ok -> 1 bad row...
    # actually row 2 is fully valid; exactly the planted bad row fails
    assert int(df[df["constraint_id"] == "__row__/schema"]["n_bad"].iloc[0]) == 1


def test_infer_nullable_column_not_required(ray_session):
    t = pa.table({"a": pa.array([1, None, 3], type=pa.int64()), "b": pa.array(["x", "y", "z"])})
    schema = infer_table_schema(rd.from_arrow(t))
    assert schema["required"] == ["b"]
    assert schema["properties"]["a"]["minimum"] == 1 and schema["properties"]["a"]["maximum"] == 3
