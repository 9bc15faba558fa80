"""Constraint inference: profile a Dataset → suggested JSON Schema.

The reverse direction of the engine (data → constraints instead of
constraints → verdicts): a single streaming pass of per-batch partials
(null counts, numeric min/max, integrality, string length bounds, a
capped distinct-value sample per column) merges driver-side into a
draft 2020-12 schema a user can review, tighten, and feed straight back
into ``compile``/``validate_table``.  The inferred schema is CLOSED over
the profiled data by construction: validating the profiled table against
it yields zero violations (tested).

Scale shape: one partial row per column per batch — the merge is
O(columns × batches), never O(rows).  The distinct sample is capped at
``cap`` values per column per batch and ``enum_threshold + 1`` overall,
so a high-cardinality column costs a bounded set union, not a shuffle;
columns that stay under ``enum_threshold`` distinct values become
``enum`` constraints, the rest keep type/range/length bounds only.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def _partial_profile(batch: pa.Table, columns: list[str], cap: int) -> pa.Table:
    rows = []
    for col in columns:
        arr = batch[col]
        dt = arr.type
        n, n_null = len(arr), arr.null_count
        vmin = vmax = None
        all_int = None
        len_min = len_max = None
        sample: list[str] | None = None
        kind = "other"
        if pa.types.is_integer(dt) or pa.types.is_floating(dt):
            kind = "number"
            if n - n_null > 0:
                mm = pc.min_max(arr)
                vmin, vmax = float(mm["min"].as_py()), float(mm["max"].as_py())
                if pa.types.is_integer(dt):
                    all_int = True
                else:
                    vv = pc.drop_null(arr)
                    all_int = bool(pc.all(pc.equal(pc.floor(vv), vv)).as_py())
        elif pa.types.is_string(dt) or pa.types.is_large_string(dt):
            kind = "string"
            if n - n_null > 0:
                lens = pc.utf8_length(pc.drop_null(arr))
                mm = pc.min_max(lens)
                len_min, len_max = int(mm["min"].as_py()), int(mm["max"].as_py())
            uniq = pc.unique(pc.drop_null(arr))
            if len(uniq) <= cap:
                sample = uniq.to_pylist()
            else:
                sample = uniq.slice(0, cap + 1).to_pylist()  # > cap ⇒ poisons enum
        elif pa.types.is_boolean(dt):
            kind = "boolean"
        elif pa.types.is_timestamp(dt) or pa.types.is_date(dt):
            kind = "timestamp"
        rows.append(
            {
                "column": col,
                "kind": kind,
                "n": n,
                "n_null": n_null,
                "vmin": vmin,
                "vmax": vmax,
                "all_int": all_int,
                "len_min": len_min,
                "len_max": len_max,
                "sample": sample,
            }
        )
    return pa.Table.from_pylist(rows)


def profile_columns(ds, columns: list[str] | None = None, enum_threshold: int = 16) -> dict[str, dict]:
    """One streaming pass → merged per-column profile dict."""
    schema = ds.schema()
    columns = list(columns or schema.names)
    cap = enum_threshold + 1
    parts = ds.map_batches(
        lambda b: _partial_profile(b, columns, cap), batch_format="pyarrow"
    ).take_all()

    prof: dict[str, dict] = {}
    for r in parts:
        p = prof.setdefault(
            r["column"],
            {
                "kind": r["kind"], "n": 0, "n_null": 0, "vmin": None, "vmax": None,
                "all_int": None, "len_min": None, "len_max": None, "values": set(),
                "enum_ok": True,
            },
        )
        p["n"] += r["n"]
        p["n_null"] += r["n_null"]
        for k, fn in (("vmin", min), ("vmax", max), ("len_min", min), ("len_max", max)):
            if r[k] is not None:
                p[k] = r[k] if p[k] is None else fn(p[k], r[k])
        if r["all_int"] is not None:
            p["all_int"] = r["all_int"] if p["all_int"] is None else (p["all_int"] and r["all_int"])
        if r["kind"] == "string" and p["enum_ok"]:
            p["values"] |= set(r["sample"] or [])
            if len(p["values"]) > enum_threshold:
                p["enum_ok"] = False
                p["values"] = set()  # bounded union: stop accumulating
    return prof


def infer_table_schema(ds, columns: list[str] | None = None, enum_threshold: int = 16) -> dict[str, Any]:
    """Suggested draft 2020-12 row schema (each row = one JSON object whose
    properties are the columns; ``validate_table(row_schema=...)`` shape)."""
    prof = profile_columns(ds, columns, enum_threshold)
    props: dict[str, Any] = {}
    required: list[str] = []
    for col, p in prof.items():
        sub: dict[str, Any] = {}
        if p["kind"] == "number":
            sub["type"] = "integer" if p["all_int"] else "number"
            if p["vmin"] is not None:
                sub["minimum"] = int(p["vmin"]) if p["all_int"] else p["vmin"]
                sub["maximum"] = int(p["vmax"]) if p["all_int"] else p["vmax"]
        elif p["kind"] == "string":
            sub["type"] = "string"
            if p["enum_ok"] and p["values"]:
                sub["enum"] = sorted(p["values"])
            elif p["len_max"] is not None:
                sub["minLength"], sub["maxLength"] = p["len_min"], p["len_max"]
        elif p["kind"] == "boolean":
            sub["type"] = "boolean"
        else:  # timestamp / nested: presence only
            sub = True
        props[col] = sub
        if p["n_null"] == 0:
            required.append(col)
    out: dict[str, Any] = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": props,
    }
    if required:
        out["required"] = sorted(required)
    return out
