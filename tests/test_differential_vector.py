"""Differential conformance for the VECTOR path vs ``jsonschema``.

`test_differential_jsonschema.py` checks the dynamic compiler against an
independent implementation; the vector path was covered only
transitively (vector↔dynamic hypothesis parity).  This battery closes
the loop DIRECTLY: derandomized schema generation per Arrow dtype →
`compile_vector` row mask vs per-element `jsonschema` verdicts on the
same column values.

Null conventions under test (kernels/vector.py): a null top-level array
element is JSON null; a null struct field means the property is ABSENT;
a null list element is JSON null.  Divergence zones avoided by
construction: float `multipleOf` (the vector path's epsilon deviation is
documented), regex flavor (safe pattern list), `format` (annotation-only
both sides).
"""

from __future__ import annotations

import json
import random

import numpy as np
import pyarrow as pa
import pytest

jsonschema = pytest.importorskip("jsonschema")

from json_schema_ray.kernels.vector import UnsupportedVector, compile_vector  # noqa: E402

V = jsonschema.Draft202012Validator

PATTERNS = [r"^a", r"b$", r"^a+b$", r"[0-9]{2}", r"^[a-z ]*$", r"l+o"]
STRINGS = ["", "a", "ab", "abc", "hello world", "Ab1", "a b", "42", "aab"]
INTS = [-5, -1, 0, 1, 2, 3, 7, 10, 100]
FLOATS = [-2.5, -0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 10.0]


def _num_schema(rng, integer_col):
    sch = {}
    if rng.random() < 0.6:
        sch["type"] = rng.choice(
            ["integer", "number", ["integer", "null"], ["number", "null"]]
            if rng.random() < 0.8
            else ["string", ["string", "null"]]  # type mismatch branch
        )
    pool = INTS if integer_col else INTS + FLOATS
    if rng.random() < 0.7:
        lo, hi = sorted(rng.sample(pool, 2))
        sch["minimum" if rng.random() < 0.5 else "exclusiveMinimum"] = lo
        sch["maximum" if rng.random() < 0.5 else "exclusiveMaximum"] = hi
    if integer_col and rng.random() < 0.4:
        sch["multipleOf"] = rng.choice([1, 2, 3, 5])  # int divisors only
    if rng.random() < 0.3:
        sch["enum"] = rng.sample(pool, rng.randint(1, 4))
    if rng.random() < 0.2:
        sch["const"] = rng.choice(pool)
    return sch


def _str_schema(rng):
    sch = {}
    if rng.random() < 0.6:
        sch["type"] = rng.choice(["string", ["string", "null"], "integer"])
    if rng.random() < 0.6:
        sch["minLength"] = rng.randint(0, 4)
    if rng.random() < 0.5:
        sch["maxLength"] = rng.randint(1, 8)
    if rng.random() < 0.5:
        sch["pattern"] = rng.choice(PATTERNS)
    if rng.random() < 0.25:
        sch["enum"] = rng.sample(STRINGS, rng.randint(1, 3))
    if rng.random() < 0.15:
        sch["format"] = rng.choice(["email", "uuid", "ipv4"])  # annotation-only
    return sch


def _list_schema(rng):
    sch = {}
    if rng.random() < 0.5:
        sch["type"] = rng.choice(["array", ["array", "null"]])
    if rng.random() < 0.6:
        sch["items"] = _num_schema(rng, True)
    if rng.random() < 0.4:
        sch["prefixItems"] = [_num_schema(rng, True) for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.5:
        sch["minItems"] = rng.randint(0, 3)
    if rng.random() < 0.4:
        sch["maxItems"] = rng.randint(1, 5)
    if rng.random() < 0.3:
        sch["uniqueItems"] = True
    if rng.random() < 0.3:
        sch["contains"] = _num_schema(rng, True)
        if rng.random() < 0.5:
            sch["minContains"] = rng.randint(0, 2)
        if rng.random() < 0.4:
            sch["maxContains"] = rng.randint(1, 3)
    return sch


def _struct_schema(rng):
    sch = {}
    if rng.random() < 0.5:
        sch["type"] = "object"
    if rng.random() < 0.8:
        props = {}
        if rng.random() < 0.8:
            props["p"] = _num_schema(rng, True)
        if rng.random() < 0.8:
            props["q"] = _str_schema(rng)
        if props:
            sch["properties"] = props
    if rng.random() < 0.5:
        sch["required"] = rng.sample(["p", "q"], rng.randint(1, 2))
    if rng.random() < 0.3:
        r = rng.random()
        if r < 0.5:
            sch["additionalProperties"] = rng.choice([True, False])
        else:
            sch["additionalProperties"] = _num_schema(rng, True)  # schema form
    if rng.random() < 0.25:
        sch["patternProperties"] = {
            rng.choice([r"^p", r"^[pq]$", r"q$"]): rng.choice(
                [_num_schema(rng, True), _str_schema(rng)]
            )
        }
    if rng.random() < 0.3:
        sch["minProperties"] = rng.randint(0, 2)
    if rng.random() < 0.25:
        sch["maxProperties"] = rng.randint(0, 2)
    if rng.random() < 0.25:
        sch["dependentRequired"] = {"p": ["q"]}
    if rng.random() < 0.2:
        sch["propertyNames"] = {"pattern": rng.choice([r"^[pq]$", r"^p"])}
    return sch


def _combo(rng, base_gen):
    """Wrap a base schema in combinators / if-then-else half the time."""
    sch = base_gen(rng)
    r = rng.random()
    if r < 0.15:
        return {"allOf": [sch, base_gen(rng)]}
    if r < 0.25:
        return {"anyOf": [sch, base_gen(rng)]}
    if r < 0.32:
        return {"oneOf": [sch, base_gen(rng)]}
    if r < 0.38:
        return {"not": sch}
    if r < 0.46:
        out = {"if": base_gen(rng), "then": sch}
        if rng.random() < 0.5:
            out["else"] = base_gen(rng)
        return out
    return sch


def _values_int(rng, n):
    return [rng.choice(INTS + [None]) for _ in range(n)]


def _values_float(rng, n):
    return [rng.choice(FLOATS + INTS + [None]) for _ in range(n)]


def _values_str(rng, n):
    return [rng.choice(STRINGS + [None]) for _ in range(n)]


def _values_list(rng, n):
    out = []
    for _ in range(n):
        if rng.random() < 0.15:
            out.append(None)
        else:
            out.append([rng.choice(INTS + [None]) for _ in range(rng.randint(0, 4))])
    return out


def _values_struct(rng, n):
    out = []
    for _ in range(n):
        if rng.random() < 0.15:
            out.append(None)
        else:
            out.append(
                {
                    "p": rng.choice(INTS + [None]),
                    "q": rng.choice(STRINGS + [None]),
                }
            )
    return out


def _jsonify(v, dtype):
    """Arrow value → the JSON value the vector conventions define."""
    if v is None:
        return None
    if pa.types.is_struct(dtype):
        return {k: x for k, x in v.items() if x is not None}  # null field = absent
    if pa.types.is_floating(dtype):
        return float(v)
    return v


CONFIGS = [
    ("int64", pa.int64(), lambda rng: _combo(rng, lambda r: _num_schema(r, True)), _values_int),
    ("float64", pa.float64(), lambda rng: _combo(rng, lambda r: _num_schema(r, False)), _values_float),
    ("string", pa.string(), lambda rng: _combo(rng, _str_schema), _values_str),
    ("list", pa.list_(pa.int64()), lambda rng: _combo(rng, _list_schema), _values_list),
    ("struct", pa.struct([("p", pa.int64()), ("q", pa.string())]),
     lambda rng: _combo(rng, _struct_schema), _values_struct),
]

N_SCHEMAS = 250


@pytest.mark.parametrize("name,dtype,gen,vals", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_vector_vs_jsonschema(name, dtype, gen, vals):
    rng = random.Random({"int64": 1, "float64": 2, "string": 3, "list": 4, "struct": 5}[name] * 7919)
    checked = skipped = 0
    failures = []
    for s in range(N_SCHEMAS):
        sch = json.loads(json.dumps(gen(rng)))
        values = vals(rng, 12)
        arr = pa.array(values, type=dtype)
        try:
            # formats_assert=False matches jsonschema's (and the spec's)
            # annotation-only default; assert-mode formats are covered by
            # the conformance format batteries
            kern = compile_vector(sch, dtype, formats_assert=False)
        except UnsupportedVector:
            skipped += 1  # declared fallback — auto path would go dynamic
            continue
        got = kern(arr)
        ref = V(sch)
        for i in range(len(arr)):
            jv = _jsonify(arr[i].as_py(), dtype)
            want = ref.is_valid(jv)
            if bool(got[i]) != want:
                failures.append(
                    f"{name} seed#{s}\n  schema={json.dumps(sch)}"
                    f"\n  value={jv!r}\n  jsonschema={want} vector={bool(got[i])}"
                )
            checked += 1
    assert checked > N_SCHEMAS, f"only {checked} verdicts checked ({skipped} schemas skipped)"
    assert not failures, f"{len(failures)} disagreements:\n" + "\n\n".join(failures[:5])
