"""Deep equality, total ordering and canonical keys for JSON values.

Reference semantics: ``js/common/JsonNodeComparator.java:12-69`` defines a
total order over JSON values (by node type, then numeric / lexicographic /
structural recursion) used by ``enum`` / ``const`` / ``uniqueItems``;
``js/compilers/Utils.java:21-32`` (checkEquality) makes numeric equality
representation-insensitive (``1.0 == 1``) via BigDecimal.

Python port notes:
- ``bool`` is a subclass of ``int``; JSON ``true`` must NOT equal ``1``,
  so booleans are ordered/keyed as their own type before numerics.
- Numeric exactness uses ``fractions.Fraction`` with **decimal** semantics
  for floats (``Fraction(str(v))`` — the shortest-repr decimal the float
  prints as), matching ``kernels/dynamic._frac`` /
  ``CompiledSchema.apply(parse_float=Fraction)``: the literal ``1.1``
  parsed exactly (11/10) and the float ``1.1`` yield the SAME key, so
  ``const``/``enum``/``uniqueItems`` treat both representations of one
  JSON literal as equal.  ``1.0 == 1`` and ``1e2 == 100`` still hold.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Any

_TYPE_ORDER = {"null": 0, "bool": 1, "num": 2, "str": 3, "arr": 4, "obj": 5}


def _frac(v) -> Fraction:
    """Numeric → Fraction under decimal semantics for floats (see module
    docstring); ints / Fractions pass through exactly."""
    if isinstance(v, float):
        return Fraction(str(v))  # raises on inf/nan, which are not JSON
    return Fraction(v)


def json_type_tag(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float, Fraction)):
        return "num"
    if isinstance(v, str):
        return "str"
    if isinstance(v, list):
        return "arr"
    if isinstance(v, dict):
        return "obj"
    raise TypeError(f"not a JSON value: {type(v)}")


def canonical_key(v: Any):
    """Hashable canonical form; equal (per deep/numeric equality) JSON
    values map to equal keys.  Used for enum sets and uniqueItems."""
    t = json_type_tag(v)
    if t == "null":
        return ("null",)
    if t == "bool":
        return ("bool", v)
    if t == "num":
        return ("num", _frac(v))
    if t == "str":
        return ("str", v)
    if t == "arr":
        return ("arr", tuple(canonical_key(x) for x in v))
    return ("obj", frozenset((k, canonical_key(x)) for k, x in v.items()))


def deep_equal(a: Any, b: Any) -> bool:
    ta, tb = json_type_tag(a), json_type_tag(b)
    if ta != tb:
        return False
    if ta == "num":
        return _frac(a) == _frac(b)
    if ta == "arr":
        return len(a) == len(b) and all(deep_equal(x, y) for x, y in zip(a, b))
    if ta == "obj":
        return a.keys() == b.keys() and all(deep_equal(a[k], b[k]) for k in a)
    return a == b


def compare(a: Any, b: Any) -> int:
    """Total order: by type rank, then value (JsonNodeComparator analog:
    arrays by size then elementwise, objects by size then per sorted key)."""
    ta, tb = json_type_tag(a), json_type_tag(b)
    if ta != tb:
        return _TYPE_ORDER[ta] - _TYPE_ORDER[tb]
    if ta == "null":
        return 0
    if ta == "bool":
        return int(a) - int(b)
    if ta == "num":
        fa, fb = _frac(a), _frac(b)
        return -1 if fa < fb else (1 if fa > fb else 0)
    if ta == "str":
        return -1 if a < b else (1 if a > b else 0)
    if ta == "arr":
        if len(a) != len(b):
            return len(a) - len(b)
        for x, y in zip(a, b):
            c = compare(x, y)
            if c:
                return c
        return 0
    # obj
    if len(a) != len(b):
        return len(a) - len(b)
    ka, kb = sorted(a.keys()), sorted(b.keys())
    for x, y in zip(ka, kb):
        if x != y:
            return -1 if x < y else 1
    for k in ka:
        c = compare(a[k], b[k])
        if c:
            return c
    return 0
