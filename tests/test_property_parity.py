"""Property-based vector↔dynamic parity: hypothesis generates random
scalar schemas + random typed columns; the vectorized Arrow kernel and
the dynamic evaluator must agree on every row.  This is the fuzzing
layer on top of the fixed conformance corpus (the reference has no
property-based tests at all — SURVEY.md §5 item 4)."""

from __future__ import annotations

import json
from fractions import Fraction

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from json_schema_ray.kernels.dynamic import DynamicCompiler
from json_schema_ray.kernels.vector import UnsupportedVector, compile_vector

# bounded numeric pool keeps Fraction math fast and avoids float-overflow
NUMS = st.one_of(
    st.integers(min_value=-50, max_value=50),
    st.sampled_from([0.5, 1.5, -2.5, 0.1, 10.0, -0.0, 2.0]),
)
STRINGS = st.sampled_from(["", "a", "ab", "abc", "xyz", "a b", "Z", "𝄞", "日本"])


def num_schema() -> st.SearchStrategy:
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.sampled_from(["number", "integer", ["integer", "null"]]),
            "minimum": NUMS,
            "maximum": NUMS,
            "exclusiveMinimum": NUMS,
            "exclusiveMaximum": NUMS,
            "multipleOf": st.sampled_from([1, 2, 0.5, 3, 0.1]),
            "enum": st.lists(NUMS, min_size=1, max_size=4),
            "const": NUMS,
        },
    )


def str_schema() -> st.SearchStrategy:
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.just("string"),
            "minLength": st.integers(min_value=0, max_value=4),
            "maxLength": st.integers(min_value=0, max_value=4),
            "pattern": st.sampled_from(["^a", "b$", "a.c", "[xyz]", "^$"]),
            "enum": st.lists(STRINGS, min_size=1, max_size=3),
            "const": STRINGS,
        },
    )


def combod(base: st.SearchStrategy) -> st.SearchStrategy:
    """Wrap a base schema in combinators sometimes."""
    return st.one_of(
        base,
        st.builds(lambda a, b: {"allOf": [a, b]}, base, base),
        st.builds(lambda a, b: {"anyOf": [a, b]}, base, base),
        st.builds(lambda a, b: {"oneOf": [a, b]}, base, base),
        st.builds(lambda a: {"not": a}, base),
        st.builds(lambda c, t, e: {"if": c, "then": t, "else": e}, base, base, base),
    )


def _assert_parity(schema, arr: pa.Array, values: list) -> None:
    try:
        kern = compile_vector(schema, arr.type)
    except UnsupportedVector:
        return  # declared fallback — the auto path would use dynamic
    got = kern(arr)
    # exact-number semantics: feed the dynamic path the SAME literal the
    # column holds (decimal Fraction of its repr)
    cs = DynamicCompiler(dialect="2020-12").compile(schema)
    for i, v in enumerate(values):
        if v is None:
            want = cs.is_valid(None)
        elif isinstance(v, float):
            want = cs.is_valid(json.loads(repr(v), parse_float=Fraction))
        else:
            want = cs.is_valid(v)
        assert bool(got[i]) == want, (schema, v, bool(got[i]), want)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    schema=combod(num_schema()),
    values=st.lists(st.one_of(NUMS, st.none()), min_size=1, max_size=8),
    as_float=st.booleans(),
)
def test_numeric_parity(schema, values, as_float):
    typ = pa.float64() if as_float else pa.int64()
    if not as_float and any(isinstance(v, float) for v in values):
        values = [int(v) if isinstance(v, float) else v for v in values]
    arr = pa.array(values, type=typ)
    vals = arr.to_pylist()  # post-cast ground truth values
    _assert_parity(schema, arr, vals)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    schema=combod(str_schema()),
    values=st.lists(st.one_of(STRINGS, st.none()), min_size=1, max_size=8),
)
def test_string_parity(schema, values):
    arr = pa.array(values, type=pa.string())
    _assert_parity(schema, arr, values)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    item=num_schema(),
    prefix=st.one_of(st.none(), st.lists(num_schema(), min_size=1, max_size=2)),
    lens=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
    lo=st.integers(min_value=0, max_value=3),
    hi=st.integers(min_value=0, max_value=5),
    slice_off=st.integers(min_value=0, max_value=2),
    data=st.data(),
)
def test_list_parity(item, prefix, lens, lo, hi, slice_off, data):
    schema = {"items": item, "minItems": lo, "maxItems": max(lo, hi), "uniqueItems": True}
    if prefix is not None:
        schema["prefixItems"] = prefix
    rows = [
        data.draw(st.lists(st.integers(min_value=-9, max_value=9), min_size=n, max_size=n))
        for n in lens
    ]
    arr = pa.array(rows, type=pa.list_(pa.int64()))
    # exercise the zero-copy slice path too (offsets not starting at 0)
    k = min(slice_off, len(rows) - 1)
    _assert_parity(schema, arr.slice(k), rows[k:])


def struct_schema() -> st.SearchStrategy:
    sub = st.one_of(num_schema(), str_schema())
    return st.fixed_dictionaries(
        {},
        optional={
            "required": st.lists(st.sampled_from(["a", "b", "zz"]), max_size=2, unique=True),
            "properties": st.dictionaries(
                st.sampled_from(["a", "b"]), sub, max_size=2
            ),
            "additionalProperties": st.one_of(st.booleans(), str_schema()),
            "minProperties": st.integers(min_value=0, max_value=3),
            "maxProperties": st.integers(min_value=0, max_value=3),
            "dependentRequired": st.fixed_dictionaries({"a": st.just(["b"])}),
        },
    )


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    schema=struct_schema(),
    rows=st.lists(
        st.fixed_dictionaries(
            {},
            optional={
                "a": st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),
                "b": st.one_of(st.none(), STRINGS),
            },
        ),
        min_size=1,
        max_size=6,
    ),
)
def test_struct_parity(schema, rows):
    """Struct-column parity: the vector path's presence convention is
    'field non-null'; feed the dynamic path the equivalent JSON object
    (None-valued keys dropped)."""
    dt = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array(rows, type=dt)
    try:
        kern = compile_vector(schema, dt)
    except UnsupportedVector:
        return
    got = kern(arr)
    cs = DynamicCompiler(dialect="2020-12").compile(schema)
    for i, row in enumerate(rows):
        doc = {k: v for k, v in row.items() if v is not None}
        want = cs.is_valid(doc)
        assert bool(got[i]) == want, (schema, row, bool(got[i]), want)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    a=st.text(alphabet="abcdefg h", min_size=0, max_size=60),
    b=st.text(alphabet="abcdefg h", min_size=0, max_size=60),
    shared=st.text(alphabet="xyz w", min_size=14, max_size=30),
)
def test_winnowing_shared_substring_guarantee(a, b, shared):
    """Winnowing guarantee (SIGMOD'03): two documents sharing a substring
    of length ≥ window + k - 1 share at least one selected fingerprint
    (k=5, window=8 → 12 chars after whitespace normalization; generate 14
    to survive it)."""
    from json_schema_ray.functions.text import add_winnow_fingerprints

    d1, d2 = a + shared + b, b + shared + a
    t = pa.table({"doc_id": ["x", "y"], "text": [d1, d2]})
    fp = add_winnow_fingerprints(t, k=5, window=8)
    s1, s2 = (set(x) for x in fp["winnow"].to_pylist())
    # normalized shared run: lowercased, whitespace collapsed
    norm = " ".join(shared.lower().split())
    if len(norm) >= 5 + 8 - 1:
        assert s1 & s2, (d1, d2)
