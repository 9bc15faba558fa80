"""Generic table-constraint stage: auto vector/dynamic column validation.

The user-facing engine surface for arbitrary tables (not just the
interleaved flagship): a ``{column: json-schema}`` spec compiles ONCE —
each column gets the **vectorized** kernel when its Arrow type supports
every keyword (``kernels/vector.py``), else falls back to the
**dynamic** evaluator (full JSON semantics; for string columns marked
``json_columns`` the value is parsed per row first — the
``events.props`` pattern).  Both paths produce identical verdicts
(enforced by the corpus parity test).

The Ray stage emits the same narrow combiner output as the flagship
scan: per-constraint violation counts per batch + optional violation
rows, so the shuffle stays O(constraints × batches).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.dynamic import DynamicCompiler
from ..kernels.vector import Kernel, UnsupportedVector, compile_vector


def compile_auto(
    schema: Any,
    dtype: pa.DataType,
    formats_assert: bool = True,
    json_column: bool = False,
    dialect: str = "2020-12",
) -> tuple[Kernel, str]:
    """Compile for a column → (kernel, path) where path ∈ {vector, dynamic,
    dynamic-json}.  The kernel maps ``pa.Array -> np.ndarray[bool]``."""
    if not json_column:
        try:
            return compile_vector(schema, dtype, formats_assert), "vector"
        except UnsupportedVector:
            pass
    compiled = DynamicCompiler(dialect=dialect, formats_assert=formats_assert).compile(schema)

    if json_column:

        def k_dynamic_json(arr: pa.Array) -> np.ndarray:
            vals = arr.to_pylist()
            out = np.zeros(len(vals), dtype=bool)
            for i, s in enumerate(vals):
                if s is None:
                    out[i] = compiled.is_valid(None)
                    continue
                try:
                    out[i] = compiled.is_valid(json.loads(s))
                except ValueError:
                    out[i] = False
            return out

        return k_dynamic_json, "dynamic-json"

    from ..kernels.vector import _strip_absent

    strip = pa.types.is_struct(dtype) or pa.types.is_map(dtype)

    def k_dynamic(arr: pa.Array) -> np.ndarray:
        # struct columns follow the field-presence convention (property
        # present iff non-null) on BOTH paths — strip before evaluating
        vals = arr.to_pylist()
        if strip:
            vals = [None if v is None else _strip_absent(v) for v in vals]
        return np.fromiter((compiled.is_valid(v) for v in vals), dtype=bool, count=len(vals))

    return k_dynamic, "dynamic"


class TableConstraintPlan:
    """Compiled plan over a table schema; immutable, worker-shippable."""

    def __init__(
        self,
        spec: dict[str, Any],
        table_schema: pa.Schema,
        json_columns: set[str] | None = None,
        formats_assert: bool = True,
        dialect: str = "2020-12",
    ):
        json_columns = json_columns or set()
        self.kernels: list[tuple[str, str, Kernel, str]] = []  # (constraint_id, col, kernel, path)
        for col, sch in spec.items():
            idx = table_schema.get_field_index(col)
            if idx < 0:
                raise KeyError(f"constraint column {col!r} not in table schema")
            kern, path = compile_auto(
                sch, table_schema.field(idx).type, formats_assert,
                json_column=col in json_columns, dialect=dialect,
            )
            self.kernels.append((f"{col}/schema", col, kern, path))

    @property
    def paths(self) -> dict[str, str]:
        return {cid: path for cid, _, _, path in self.kernels}

    def masks(self, batch: pa.Table) -> dict[str, np.ndarray]:
        return {cid: kern(batch[col]) for cid, col, kern, _ in self.kernels}

    def row_ok(self, batch: pa.Table) -> np.ndarray:
        ok = np.ones(len(batch), dtype=bool)
        for _, col, kern, _ in self.kernels:
            ok &= kern(batch[col])
        return ok


def check_dataset(
    ds,
    spec: dict[str, Any],
    json_columns: set[str] | None = None,
    formats_assert: bool = True,
    dialect: str = "2020-12",
) -> pa.Table:
    """Distributed constraint check → (constraint_id, n_rows, n_bad).
    Combiner emits one row per constraint per batch; tiny final groupby."""
    import pyarrow.parquet  # noqa: F401
    from ray.data.aggregate import Sum

    schema = ds.schema()
    arrow_schema = pa.schema(
        [(n, t) for n, t in zip(schema.names, schema.types)]
    )
    plan = TableConstraintPlan(spec, arrow_schema, json_columns, formats_assert, dialect)

    def partial(batch: pa.Table) -> pa.Table:
        masks = plan.masks(batch)
        return pa.table(
            {
                "constraint_id": pa.array(list(masks)),
                "n_rows": pa.array([len(batch)] * len(masks), type=pa.int64()),
                "n_bad": pa.array([int((~m).sum()) for m in masks.values()], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("constraint_id")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_bad", alias_name="n_bad"))
    )


def _to_string_col(arr: pa.Array) -> pa.Array:
    """Render values as strings for the ``actual`` column; nested types
    (no Arrow cast to string) render as compact JSON.  Only ever runs on
    the capped violation subset."""
    import pyarrow.compute as pc_

    try:
        return pc_.cast(arr, pa.string())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array(
            [None if v is None else json.dumps(v, default=str) for v in arr.to_pylist()],
            type=pa.string(),
        )


VIOLATION_SCHEMA = pa.schema(
    [
        ("row_id", pa.string()),  # id_col value, else "<batch-uuid>:<ordinal>"
        ("constraint_id", pa.string()),
        ("error_type", pa.string()),
        ("expected", pa.string()),
        ("actual", pa.string()),
    ]
)


def validate_table(
    ds,
    spec: dict[str, Any],
    id_col: str | None = None,
    json_columns: set[str] | None = None,
    formats_assert: bool = True,
    dialect: str = "2020-12",
    violation_cap: int | None = 10_000,
    row_schema: Any = None,
):
    """Full generic-table validation (the reference's validate-any-instance
    surface over a Dataset): per-constraint counts PLUS row-level
    violation rows carrying (row_id, constraint_id, error_type, expected,
    actual) — the SURVEY §1.2 contract for arbitrary tables, not just the
    interleaved flagship.

    Returns ``(counts: Dataset, violations: Dataset)``.  Violations are
    capped per (constraint × batch) like the flagship; counts stay exact.
    ``expected`` is the compact JSON of the violated column schema;
    ``error_type`` is SCHEMA at this granularity (the dynamic path's
    per-keyword taxonomy is available via ``CompiledSchema.violations``
    on the failing values when callers need it).

    ``row_schema`` validates each ROW as one JSON object whose properties
    are the table's columns (present iff non-null) — the reference's
    object semantics applied across columns, which is how cross-column
    constraints (``required``, ``dependentRequired``, ``if/then`` between
    columns) express on a table.  Compiled once against the synthesized
    struct type: vectorized when possible, dynamic otherwise.
    """
    import pyarrow.compute as pc_

    schema = ds.schema()
    arrow_schema = pa.schema([(n, t) for n, t in zip(schema.names, schema.types)])
    plan = TableConstraintPlan(spec, arrow_schema, json_columns, formats_assert, dialect)
    expected_json = {
        f"{col}/schema": json.dumps(spec[col], sort_keys=True)[:200] for col in spec
    }
    row_kernel = None
    if row_schema is not None:
        struct_type = pa.struct(list(zip(arrow_schema.names, arrow_schema.types)))
        row_kernel, _ = compile_auto(row_schema, struct_type, formats_assert, dialect=dialect)
        expected_json["__row__/schema"] = json.dumps(row_schema, sort_keys=True)[:200]

    def split(batch: pa.Table) -> pa.Table:
        masks = plan.masks(batch)
        if row_kernel is not None:
            cols = [
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in batch.columns
            ]
            row_struct = pa.StructArray.from_arrays(cols, names=batch.column_names)
            masks["__row__/schema"] = row_kernel(row_struct)
        counts = pa.table(
            {
                "record_type": pa.array(["count"] * len(masks)),
                "constraint_id": pa.array(list(masks)),
                "n_rows": pa.array([len(batch)] * len(masks), type=pa.int64()),
                "n_bad": pa.array([int((~m).sum()) for m in masks.values()], type=pa.int64()),
                "row_id": pa.array([None] * len(masks), type=pa.string()),
                "error_type": pa.array([None] * len(masks), type=pa.string()),
                "expected": pa.array([None] * len(masks), type=pa.string()),
                "actual": pa.array([None] * len(masks), type=pa.string()),
            }
        )
        chunks = [counts]
        if id_col is not None:
            rid = pc_.cast(batch[id_col], pa.string())
        else:
            import uuid as _uuid

            tag = _uuid.uuid4().hex[:8]
            rid = pa.array([f"{tag}:{i}" for i in range(len(batch))])
        col_of = {cid: col for cid, col, _, _ in plan.kernels}
        for cid, mask in masks.items():
            bad = np.where(~mask)[0]
            if not len(bad):
                continue
            capped = bad[:violation_cap] if violation_cap else bad
            take = pa.array(capped)
            k = len(capped)
            col = col_of.get(cid)
            if col is None:  # whole-row constraint: render the row itself
                actual = _to_string_col(row_struct.take(take))
            else:
                actual = _to_string_col(
                    (batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray) else batch[col]).take(take)
                )
            chunks.append(
                pa.table(
                    {
                        "record_type": pa.array(["violation"] * k),
                        "constraint_id": pa.array([cid] * k),
                        "n_rows": pa.array(np.zeros(k, dtype=np.int64)),
                        "n_bad": pa.array(np.zeros(k, dtype=np.int64)),
                        "row_id": rid.take(take) if not isinstance(rid, pa.ChunkedArray) else rid.combine_chunks().take(take),
                        "error_type": pa.array(["SCHEMA"] * k),
                        "expected": pa.array([expected_json[cid]] * k),
                        "actual": actual,
                    }
                )
            )
        return pa.concat_tables(chunks)

    from ray.data.aggregate import Sum

    res = ds.map_batches(split, batch_format="pyarrow").materialize()
    counts = (
        res.map_batches(
            lambda b: b.filter(pc_.equal(b["record_type"], "count")).select(
                ["constraint_id", "n_rows", "n_bad"]
            ),
            batch_format="pyarrow",
        )
        .groupby("constraint_id")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_bad", alias_name="n_bad"))
    )
    violations = res.map_batches(
        lambda b: b.filter(pc_.equal(b["record_type"], "violation")).select(
            ["row_id", "constraint_id", "error_type", "expected", "actual"]
        ),
        batch_format="pyarrow",
    )
    if counts.count() == 0:  # zero-row input: still report every constraint
        import ray.data as _rd

        cids = list(expected_json)
        counts = _rd.from_arrow(
            pa.table(
                {
                    "constraint_id": pa.array(cids),
                    "n_rows": pa.array([0] * len(cids), type=pa.int64()),
                    "n_bad": pa.array([0] * len(cids), type=pa.int64()),
                }
            )
        )
    return counts, violations
