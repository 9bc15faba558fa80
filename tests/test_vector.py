"""Vectorized-kernel tests: direct unit checks + automatic parity of the
vector path against the dynamic evaluator over the conformance corpus
(every group whose instances fit a typed Arrow column must produce
identical verdicts on both paths)."""

from __future__ import annotations

import glob
import json
import os
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from json_schema_ray.kernels.dynamic import DynamicCompiler
from json_schema_ray.kernels.vector import UnsupportedVector, compile_vector

HERE = os.path.dirname(__file__)


def _defrac(v):
    if isinstance(v, Fraction):
        return int(v) if v.denominator == 1 else float(v)
    if isinstance(v, list):
        return [_defrac(x) for x in v]
    if isinstance(v, dict):
        return {k: _defrac(x) for k, x in v.items()}
    return v


# --------------------------------------------------------------- unit tests


def test_scalar_kernels():
    sch = {"type": "integer", "minimum": 3, "maximum": 10, "multipleOf": 2}
    k = compile_vector(sch, pa.int64())
    arr = pa.array([4, 8, 2, 11, 5, None])
    assert k(arr).tolist() == [True, True, False, False, False, False]


def test_string_kernels():
    sch = {"type": "string", "minLength": 2, "pattern": "^a"}
    k = compile_vector(sch, pa.string())
    arr = pa.array(["ab", "a", "bb", None])
    assert k(arr).tolist() == [True, False, False, False]


def test_enum_numeric_insensitive():
    k = compile_vector({"enum": [1, 2, 3]}, pa.float64())
    assert k(pa.array([1.0, 2.5])).tolist() == [True, False]
    k = compile_vector({"enum": [1, "x"]}, pa.string())
    assert k(pa.array(["x", "1"])).tolist() == [True, False]
    # bool/number firewall
    k = compile_vector({"enum": [1]}, pa.bool_())
    assert k(pa.array([True])).tolist() == [False]


def test_format_kernels():
    k = compile_vector({"format": "uuid"}, pa.string())
    arr = pa.array(["2eb8aa08-aa98-11ea-b4aa-73b441d16380", "nope", None])
    assert k(arr).tolist() == [True, False, True]  # null: format doesn't apply
    k = compile_vector({"format": "date"}, pa.string())
    assert k(pa.array(["2020-02-29", "2021-02-29", "x"])).tolist() == [True, False, False]
    # python-fallback format (no regex/strptime kernel)
    k = compile_vector({"format": "email"}, pa.string())
    assert k(pa.array(["a@b.com", "nope"])).tolist() == [True, False]


def test_list_kernels():
    t = pa.list_(pa.int64())
    k = compile_vector({"type": "array", "minItems": 1, "items": {"minimum": 0}}, t)
    arr = pa.array([[1, 2], [], [-1], None], type=t)
    assert k(arr).tolist() == [True, False, False, False]

    k = compile_vector({"contains": {"minimum": 5}, "minContains": 2}, t)
    arr = pa.array([[5, 6], [5], [1, 2]], type=t)
    assert k(arr).tolist() == [True, False, False]

    k = compile_vector({"uniqueItems": True}, t)
    arr = pa.array([[1, 2], [1, 1], []], type=t)
    assert k(arr).tolist() == [True, False, True]


def test_struct_kernels():
    t = pa.struct([("kind", pa.string()), ("n", pa.int64())])
    sch = {"type": "object", "required": ["kind"], "properties": {"kind": {"enum": ["a", "b"]}, "n": {"minimum": 0}}}
    k = compile_vector(sch, t)
    arr = pa.array(
        [{"kind": "a", "n": 1}, {"kind": "z", "n": 1}, {"kind": None, "n": 1}, {"kind": "b", "n": -1}],
        type=t,
    )
    assert k(arr).tolist() == [True, False, False, False]


def test_combinators():
    k = compile_vector({"oneOf": [{"type": "integer"}, {"minimum": 2}]}, pa.float64())
    # 1 -> float but integral... both int & >=2? 1.0: integer only; 2.5: minimum only; 3.0: both
    assert k(pa.array([1.0, 2.5, 3.0, 1.5])).tolist() == [True, True, False, False]
    k = compile_vector({"if": {"minimum": 0}, "then": {"multipleOf": 2}, "else": {"maximum": -5}}, pa.int64())
    assert k(pa.array([4, 3, -7, -2])).tolist() == [True, False, True, False]


def test_list_of_struct_spans_shape():
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    t = pa.list_(span_t)
    sch = {"type": "array", "minItems": 1, "items": {"properties": {"kind": {"enum": ["text", "image", "audio", "video"]}}}}
    k = compile_vector(sch, t)
    rows = [
        [{"kind": "text", "text": "hi", "media_ref": None, "offset": 0}],
        [{"kind": "bogus", "text": None, "media_ref": None, "offset": 0}],
        [],
    ]
    arr = pa.array(rows, type=t)
    assert k(arr).tolist() == [True, False, False]


# ------------------------------------------------- corpus parity (vector vs dynamic)


def _corpus_groups():
    out = []
    for path in sorted(glob.glob(os.path.join(HERE, "conformance", "*.json"))):
        with open(path) as f:
            groups = json.load(f, parse_float=Fraction)
        for grp in groups:
            if grp.get("dialect", "2020-12") != "2020-12" or grp.get("content"):
                continue
            out.append(pytest.param(grp, id=f"{os.path.basename(path)}::{grp['description']}"))
    return out


@pytest.mark.parametrize("group", _corpus_groups())
def test_vector_parity_with_dynamic(group):
    """Wherever the instances of a conformance group fit a typed Arrow
    column, the vector kernel must agree with the dynamic evaluator."""
    compiler = DynamicCompiler(formats_assert=group.get("formats_assert", False))
    for uri, ext in group.get("externals", {}).items():
        compiler.registry.register(ext, uri)
    dyn = compiler.compile(group["schema"])

    # bucket instances by inferable Arrow type
    buckets: dict[str, tuple[pa.DataType, list, list]] = {}
    for case in group["tests"]:
        data = _defrac(case["data"])
        try:
            t = pa.array([data]).type
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            continue
        if pa.types.is_null(t):
            continue
        key = str(t)
        buckets.setdefault(key, (t, [], []))
        buckets[key][1].append(data)
        buckets[key][2].append(dyn.is_valid(case["data"]))

    checked = 0
    sch = _defrac(group["schema"])
    for t, vals, expect in buckets.values():
        try:
            kern = compile_vector(sch, t, formats_assert=group.get("formats_assert", False))
            arr = pa.array(vals, type=t)
        except (UnsupportedVector, pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            continue
        got = kern(arr)
        assert got.tolist() == expect, f"type {t}: vector {got.tolist()} != dynamic {expect} for {vals}"
        checked += 1
    # (groups where nothing fits a typed column are fine — dynamic-only)


def test_advice_r1_fixes():
    """Regression tests for round-1 ADVICE findings."""
    import pyarrow as pa

    from json_schema_ray.kernels.dynamic import compile_schema
    from json_schema_ray.kernels.vector import compile_vector
    from json_schema_ray.spec.equality import canonical_key, deep_equal
    from json_schema_ray.spec.schema import pointer_get

    # high: decimal-Fraction semantics — parsed-exact 1.1 equals float 1.1
    assert compile_schema({"const": 1.1}).apply("1.1").ok
    assert compile_schema({"enum": [1.1, 2.5]}).apply("1.1").ok
    assert not compile_schema({"const": 1.1}).apply("1").ok
    assert compile_schema({"const": 1}).apply("1.0").ok
    assert canonical_key(1.1) == canonical_key(__import__("fractions").Fraction("11/10"))
    assert deep_equal([1.1], [__import__("fractions").Fraction("11/10")])

    # medium: struct const/enum must strip absent (null) fields
    dt = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array([{"a": 1, "b": None}, {"a": 2, "b": "x"}, {"a": 1, "b": "y"}], type=dt)
    assert list(compile_vector({"const": {"a": 1}}, dt)(arr)) == [True, False, False]
    assert list(compile_vector({"enum": [{"a": 1}, {"a": 2, "b": "x"}]}, dt)(arr)) == [True, True, False]

    # low: RFC 6901 pointer "/" = member with key ""
    assert pointer_get({"": 42}, "/") == 42
    assert pointer_get({"a": {"b": 1}}, "/a/b") == 1

    # low: uniqueItems must not collapse int64 values above 2^53
    lt = pa.list_(pa.int64())
    la = pa.array(
        [[9007199254740992, 9007199254740993], [1, 1], [None, None], [None], [2, 3]],
        type=lt,
    )
    assert list(compile_vector({"uniqueItems": True}, lt)(la)) == [True, False, False, True, True]


def test_positional_items_vectorized():
    """prefixItems / positional items / additionalItems now run on the
    vector path (ordinal gather over the flattened child array) —
    vector↔dynamic parity on spans-shaped list columns."""
    import json as _json

    lt = pa.list_(pa.string())
    rows = [
        ["text", "image", "x"],
        ["text", "bogus", "y"],
        ["text"],
        [],
        ["image"],
        ["text", "image"],
        None,
        ["text", "image", "text", "audio"],
    ]
    arr = pa.array(rows, type=lt)

    cases = [
        # 2020-12: prefixItems + items tail
        {"prefixItems": [{"const": "text"}, {"enum": ["image", "audio"]}],
         "items": {"minLength": 1}},
        # prefixItems only
        {"prefixItems": [{"const": "text"}]},
        # tail forbidden
        {"prefixItems": [{"const": "text"}, {"const": "image"}], "items": False},
        # draft7/2019 positional items + additionalItems
        {"items": [{"const": "text"}, {"enum": ["image", "audio"]}],
         "additionalItems": {"maxLength": 1}},
        {"items": [{"const": "text"}], "additionalItems": False},
    ]
    for sch in cases:
        kern = compile_vector(sch, lt)
        got = kern(arr)
        dialect = "draft7" if isinstance(sch.get("items"), list) else "2020-12"
        cs = DynamicCompiler(dialect=dialect).compile(sch)
        for i, row in enumerate(rows):
            if row is None:
                continue  # vector: null row passes (keyword doesn't apply)
            want = cs.apply(_json.dumps(row)).ok
            assert got[i] == want, (sch, row, got[i], want)


def test_unevaluated_static_vectorized():
    """unevaluated* vectorize when no in-place applicator can contribute
    annotations (static evaluated set); applicator presence falls back."""
    import json as _json

    # unevaluatedProperties == additionalProperties complement on structs
    dt = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array([{"a": 1}, {"a": 1, "b": "x"}, {"b": "x"}], type=dt)
    k = compile_vector({"properties": {"a": {"type": "integer"}},
                        "unevaluatedProperties": False}, dt)
    assert list(k(arr)) == [True, False, False]
    k2 = compile_vector({"properties": {"a": True},
                         "unevaluatedProperties": {"maxLength": 0}}, dt)
    assert list(k2(pa.array([{"a": 1, "b": ""}, {"a": 1, "b": "x"}], type=dt))) == [True, False]

    # unevaluatedItems as the positional tail / full coverage
    lt = pa.list_(pa.string())
    rows = [["x"], ["x", "y"], []]
    arr2 = pa.array(rows, type=lt)
    k3 = compile_vector({"prefixItems": [{"const": "x"}], "unevaluatedItems": False}, lt)
    assert list(k3(arr2)) == [True, False, True]
    k4 = compile_vector({"unevaluatedItems": {"const": "x"}}, lt)
    assert list(k4(arr2)) == [True, False, True]

    # dynamic parity for the vectorized cases
    for sch, data_rows in [
        ({"prefixItems": [{"const": "x"}], "unevaluatedItems": False}, rows),
        ({"unevaluatedItems": {"const": "x"}}, rows),
    ]:
        cs = DynamicCompiler(dialect="2020-12").compile(sch)
        kk = compile_vector(sch, lt)
        got = kk(arr2)
        for i, r in enumerate(data_rows):
            assert bool(got[i]) == cs.apply(_json.dumps(r)).ok, (sch, r)

    # applicators present → declared fallback
    with pytest.raises(UnsupportedVector):
        compile_vector({"allOf": [{}], "unevaluatedProperties": False}, dt)
    with pytest.raises(UnsupportedVector):
        compile_vector({"contains": {"const": "x"}, "unevaluatedItems": False}, lt)


def test_segment_reduction_trailing_empty_and_slices():
    """Regression (round-1 latent bug): a trailing/interior EMPTY list row
    must not truncate its neighbor's segment reduction, and kernels on a
    SLICED array must evaluate only the slice's own children."""
    lt = pa.list_(pa.int64())
    sch = {"items": {"minimum": 5}}
    k = compile_vector(sch, lt)

    arr = pa.array([[9, 1], []], type=lt)  # bad element then empty row
    assert list(k(arr)) == [False, True]
    arr2 = pa.array([[9], [], [1, 9], [], []], type=lt)
    assert list(k(arr2)) == [True, True, False, True, True]

    # contains counting with empty rows interleaved
    kc = compile_vector({"contains": {"minimum": 5}, "maxContains": 1}, lt)
    arr3 = pa.array([[5, 6], [], [5]], type=lt)
    assert list(kc(arr3)) == [False, False, True]

    # sliced array: only the slice's rows evaluated, offsets rebased
    big = pa.array([[1], [9, 9], [1], []], type=lt)
    assert list(k(big.slice(1, 3))) == [True, False, True]
    assert list(k(big.slice(3, 1))) == [True]


def test_draft7_dependencies_vectorized():
    """draft7 dependencies (array → dependentRequired, schema →
    dependentSchemas) compile to struct kernels; parity vs dynamic."""
    import json as _json

    dt = pa.struct([("credit_card", pa.int64()), ("billing_address", pa.string()), ("name", pa.string())])
    rows = [
        {"credit_card": 1, "billing_address": "x"},
        {"credit_card": 1},
        {"name": "n"},
        {"credit_card": 1, "name": "ok"},
    ]
    arr = pa.array(rows, type=dt)
    for sch in (
        {"dependencies": {"credit_card": ["billing_address"]}},
        {"dependencies": {"credit_card": {"required": ["name"]}}},
        {"dependencies": {"credit_card": ["billing_address"], "name": {"minProperties": 2}}},
    ):
        kern = compile_vector(sch, dt)
        cs = DynamicCompiler(dialect="draft7").compile(sch)
        got = kern(arr)
        for i, row in enumerate(rows):
            want = cs.is_valid(row)
            assert bool(got[i]) == want, (sch, row)
