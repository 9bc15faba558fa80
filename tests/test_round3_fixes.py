"""Round-3 regression tests for the judge/advisor findings:

- violation side-output filenames hash the FULL batch content (no
  silent overwrite of same-leading-row batches);
- dialect auto-detect is per-compile (no sticky state on a reused
  compiler) and honors embedded resources' own ``$schema``;
- network loaders are opt-in; ``classpath:`` loader completes the
  reference's loader trio (``js/loaders/ClasspathLoader.java:186-203``);
- ZWNJ CONTEXTJ Joining_Type regexp branch (RFC 5892 Appendix A.1).
"""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_ray.builder import ConstraintEngineBuilder
from json_schema_ray.kernels.dynamic import DynamicCompiler
from json_schema_ray.kernels.idna2008 import is_idna2008_hostname
from json_schema_ray.spec.schema import (
    DEFAULT_LOADERS,
    NETWORK_LOADERS,
    SchemaRegistry,
    classpath_loader,
)
from json_schema_ray.stages.validate import RESULT_SCHEMA, SpanValidator


# ------------------------------------------------ violation filenames


def _viol_table(pid, rows):
    n = len(rows)
    return pa.table(
        {
            "record_type": pa.array(["violation"] * n),
            "partition_id": pa.array([pid] * n, type=pa.int32()),
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "span_index": pa.array([r[1] for r in rows], type=pa.int32()),
            "constraint_id": pa.array([r[2] for r in rows], type=pa.string()),
            "error_type": pa.array(["ENUM"] * n),
            "expected": pa.array([None] * n, type=pa.string()),
            "actual": pa.array([None] * n, type=pa.string()),
            "message": pa.array([None] * n, type=pa.string()),
            "n_docs": pa.array(np.zeros(n, dtype=np.int64)),
            "n_bad": pa.array(np.zeros(n, dtype=np.int64)),
            "feature": pa.array([None] * n, type=pa.string()),
            "sketch_kind": pa.array([None] * n, type=pa.string()),
            "blob": pa.array([None] * n, type=pa.binary()),
        }
    ).cast(RESULT_SCHEMA)


def test_violation_filenames_hash_full_batch(tmp_path):
    """Two batches sharing (partition, first row, row count) must land in
    DISTINCT files; a re-run of the identical batch must reuse its file."""
    v = SpanValidator(viol_dir=str(tmp_path))
    t1 = _viol_table(0, [("d1", 0, "c"), ("d2", 0, "c")])
    t2 = _viol_table(0, [("d1", 0, "c"), ("d3", 0, "c")])  # same head+len
    v._write_violations(t1, [])
    v._write_violations(t2, [])
    v._write_violations(t1, [])  # idempotent retry
    files = list((tmp_path / "partition_id=0").glob("*.parquet"))
    assert len(files) == 2

    import pyarrow.parquet as pq

    docs = sorted(
        d for f in files for d in pq.read_table(f)["doc_id"].to_pylist()
    )
    assert docs == ["d1", "d1", "d2", "d3"]


# ------------------------------------------------ dialect lifecycle


def test_dialect_not_sticky_across_compiles():
    c = DynamicCompiler()
    c.compile({"$schema": "http://json-schema.org/draft-07/schema#", "type": "integer"})
    assert c.dialect == "draft7"
    c.compile({"type": "integer"})  # no $schema → documented 2020-12 fallback
    assert c.dialect == "2020-12"


def test_embedded_resource_dialect_switch():
    # The embedded child resource declares draft-07, where $ref supersedes
    # its siblings — `minimum: 100` must be IGNORED inside the child even
    # though the root compiles under 2020-12 (where siblings apply).
    child = {
        "$id": "https://t.example/child",
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$ref": "#/definitions/x",
        "minimum": 100,
        "definitions": {"x": {"type": "integer"}},
    }
    root = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$defs": {"c": child},
        "$ref": "https://t.example/child",
    }
    cs = DynamicCompiler().compile(root)
    assert cs.evaluate(5).ok  # draft7 semantics: minimum sibling dropped
    # sanity: same shape compiled AS 2020-12 end-to-end enforces minimum
    flat = {
        "$ref": "#/$defs/x",
        "minimum": 100,
        "$defs": {"x": {"type": "integer"}},
    }
    assert not DynamicCompiler().compile(flat).evaluate(5).ok


# ------------------------------------------------ loaders


def test_network_loaders_opt_in():
    assert "http" not in DEFAULT_LOADERS and "https" not in DEFAULT_LOADERS
    assert set(NETWORK_LOADERS) == {"http", "https"}
    assert "http" not in SchemaRegistry().loaders
    assert "https" in SchemaRegistry(allow_network=True).loaders

    b = ConstraintEngineBuilder().allow_network_loaders()
    assert "https" in b._registry.loaders
    b.allow_network_loaders(False)
    assert "https" not in b._registry.loaders


def test_classpath_loader_roundtrip():
    schema = classpath_loader(
        "classpath:json_schema_ray/resources/example_schema.json"
    )
    assert schema["type"] == "object"
    # end-to-end through a $ref
    cs = (
        ConstraintEngineBuilder()
        .compile({"$ref": "classpath:json_schema_ray/resources/example_schema.json"})
    )
    assert cs.evaluate({"doc_id": "a", "spans": []}).ok
    assert not cs.evaluate({"spans": []}).ok  # doc_id required

    with pytest.raises(ValueError):
        classpath_loader("classpath:no_resource_part")


# ------------------------------------------------ ZWNJ CONTEXTJ


def test_zwnj_joining_type_regexp_branch():
    # BEH (D) ZWNJ JEEM (D): the Appendix A.1 regexp branch accepts
    assert is_idna2008_hostname("ب‌ج")
    # ALEF (R) before ZWNJ: left side must be L or D → reject
    assert not is_idna2008_hostname("ا‌ب")
    # transparent (Mn) chars between: BEH FATHA(T) ZWNJ JEEM still accepts
    assert is_idna2008_hostname("بَ‌ج")
    # virama branch still works (Devanagari KA + VIRAMA + ZWNJ + KA)
    assert is_idna2008_hostname("क्‌क")
    # bare ZWNJ with no context stays rejected
    assert not is_idna2008_hostname("a‌b")


# ---- numeric fast-path semantics (round 3: native compare fast path) -------


def test_numeric_fastpath_decimal_literal_semantics():
    """The native int/float comparison fast path must fall back to exact
    decimal-literal (BigDecimal) semantics in the one corner where they
    diverge: non-round-tripping floats (|x| >= 2^53) against int/Fraction
    operands at the equality boundary."""
    from fractions import Fraction

    from json_schema_ray.kernels.dynamic import DynamicCompiler

    def C(s):
        return DynamicCompiler().compile(s)

    # decimal repr of 1e23 is exactly 10^23 (binary is ...91611392)
    assert C({"minimum": 10**23}).is_valid(1e23)
    assert C({"maximum": 10**23}).is_valid(1e23)
    assert not C({"exclusiveMinimum": 10**23}).is_valid(1e23)
    assert not C({"exclusiveMaximum": 10**23}).is_valid(1e23)
    # Fraction bound vs float value: decimal(0.1) == 1/10 exactly
    assert C({"maximum": Fraction(1, 10)}).is_valid(0.1)
    assert C({"minimum": Fraction(1, 10)}).is_valid(0.1)
    assert not C({"exclusiveMinimum": Fraction(1, 10)}).is_valid(0.1)
    # bool is not a number (fast path must not treat it as int)
    assert C({"minimum": 5}).is_valid(True)
    # plain fast paths at both boundaries
    cc = C({"minimum": 0, "maximum": 49})
    assert cc.is_valid(0) and cc.is_valid(49)
    assert not cc.is_valid(50) and not cc.is_valid(-1)
    assert cc.is_valid(49.0) and not cc.is_valid(49.5)
    # integer type via the fast dispatch: 1.0 is an integer, 1.5 is not
    ci = C({"type": "integer"})
    assert ci.is_valid(1) and ci.is_valid(1.0) and ci.is_valid(1e23)
    assert not ci.is_valid(1.5) and not ci.is_valid(True) and not ci.is_valid("1")
    assert ci.is_valid(Fraction(4, 2)) and not ci.is_valid(Fraction(1, 2))
