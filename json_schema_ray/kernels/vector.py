"""Vectorized Arrow predicate kernels: JSON-Schema subset → batch masks.

This is the hot path the engine ships to Ray workers: a schema compiled
against a *typed* Arrow column becomes a pure function
``pa.Array -> np.ndarray[bool]`` (True = row valid) built from
``pyarrow.compute`` / numpy kernels — no per-row Python in the loop.
It reproduces the semantics of the reference's keyword compilers
(SURVEY.md §2.1-2.4 mapping table) with these documented mappings:

- array-element validation (the reference's virtual-thread hot path,
  ``js/compilers/v2020/Items2020CompilerFactory.java:57-68``) becomes
  kernels over the **flattened child array** + segmented reduction over
  list offsets (``np.logical_and.reduceat`` / ``np.add.reduceat``) —
  the unit of parallelism is the Ray Data block, not the element.
- ``pattern`` uses RE2 via ``pc.match_substring_regex`` (search
  semantics, like the reference's ``Matcher.find``); RE2 vs java.util
  dialect differences are documented the same way the reference
  documents its ECMA-262 deviation (``README.md:309-311``).
- ``multipleOf`` on floats uses a relative-epsilon near-integer check
  (exact decimal arithmetic is the dynamic path's job); on integers it
  is exact.

Keywords that cannot be vectorized for a given Arrow type raise
``UnsupportedVector`` at **compile time** — callers fall back to the
dynamic evaluator (kernels/dynamic.py).
"""

from __future__ import annotations

import json
from fractions import Fraction
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .formats import ANCHORED_REGEX, FORMAT_PREDICATES

Mask = np.ndarray  # bool ndarray, True = valid
Kernel = Callable[[pa.Array], Mask]


class UnsupportedVector(Exception):
    """Keyword/type combination has no vectorized kernel — use dynamic path."""


# ------------------------------------------------------------------ helpers


def _combine(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _np_bool(arr: pa.Array | pa.ChunkedArray) -> Mask:
    """Arrow boolean (possibly with nulls) -> numpy bool with null=False."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.fill_null(False).to_numpy(zero_copy_only=False)


def _valid_mask(arr: pa.Array) -> Mask:
    return pc.is_valid(arr).to_numpy(zero_copy_only=False)


def _list_segments(arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """(flattened child values SLICED to this array's rows, offsets
    REBASED to 0).  Slicing up front matters twice: kernels never redo a
    parent block's work for each of its slices, and the segment
    reductions below can assume child index space == offsets space."""
    arr = _combine(arr)
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = off[0]
    return arr.values.slice(lo, off[-1] - lo), off - lo


def _segment_all(child_ok: Mask, offsets: np.ndarray) -> Mask:
    """AND-reduce child mask per list row; empty segment -> True.

    reduceat boundaries must be the starts of NON-empty segments only: a
    clamped start for an empty trailing row would silently truncate the
    previous row's segment (round-1 bug, caught by the unevaluatedItems
    vectorization tests)."""
    n = len(offsets) - 1
    out = np.ones(n, dtype=bool)
    if len(child_ok) == 0:
        return out
    starts = offsets[:-1]
    valid = starts < offsets[1:]
    if valid.any():
        # rows are contiguous (end_i == start_{i+1}), so the non-empty
        # starts are exact reduceat boundaries; cap the tail at offsets[-1]
        out[valid] = np.logical_and.reduceat(child_ok[: offsets[-1]], starts[valid])
    return out


def _segment_sum(child_vals: Mask, offsets: np.ndarray) -> np.ndarray:
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    x = child_vals.astype(np.int64)
    if len(x) == 0:
        return out
    starts = offsets[:-1]
    valid = starts < offsets[1:]
    if valid.any():
        out[valid] = np.add.reduceat(x[: offsets[-1]], starts[valid])
    return out


def _strip_absent(v):
    """Normalize a ``to_pylist`` value to the module's presence convention
    (property present iff struct field non-null): drop None-valued dict
    entries recursively.  List elements keep None (a null array element is
    a genuine JSON null; structs have a fixed field set, so a null field
    can only mean "absent")."""
    if isinstance(v, dict):
        return {k: _strip_absent(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_strip_absent(x) for x in v]
    return v


def _arrow_json_type(dtype: pa.DataType) -> str:
    if pa.types.is_boolean(dtype):
        return "boolean"
    if pa.types.is_integer(dtype) or pa.types.is_floating(dtype) or pa.types.is_decimal(dtype):
        return "number"
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "string"
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype) or pa.types.is_fixed_size_list(dtype):
        return "array"
    if pa.types.is_struct(dtype) or pa.types.is_map(dtype):
        return "object"
    if pa.types.is_null(dtype):
        return "null"
    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        return "string"  # temporal columns validate as formatted strings
    raise UnsupportedVector(f"no JSON type mapping for Arrow type {dtype}")


# ------------------------------------------------------------------ compile


def compile_vector(schema: Any, dtype: pa.DataType, formats_assert: bool = True) -> Kernel:
    """Compile ``schema`` against a column of Arrow type ``dtype`` →
    row-validity kernel.  Raises UnsupportedVector when any keyword can't
    be vectorized for this type (plan-time, never at runtime)."""
    if isinstance(schema, bool):
        if schema:
            return lambda arr: np.ones(len(arr), dtype=bool)
        return lambda arr: np.zeros(len(arr), dtype=bool)
    if not isinstance(schema, dict):
        raise UnsupportedVector(f"schema must be bool or object, got {type(schema)}")

    parts: list[Kernel] = []
    jt = _arrow_json_type(dtype)

    # draft7 "dependencies" splits by value shape into the two modern
    # keywords (js/compilers/DependenciesCompiler.java:69-76) — rewrite at
    # plan time so the struct kernels below handle both halves
    if "dependencies" in schema and isinstance(schema["dependencies"], dict):
        dep_req = dict(schema.get("dependentRequired", {}))
        dep_sch = dict(schema.get("dependentSchemas", {}))
        for name, dep in schema["dependencies"].items():
            if isinstance(dep, list):
                dep_req[name] = dep
            else:
                dep_sch[name] = dep
        schema = {k: v for k, v in schema.items() if k != "dependencies"}
        if dep_req:
            schema["dependentRequired"] = dep_req
        if dep_sch:
            schema["dependentSchemas"] = dep_sch

    unsupported = set(schema) & {
        "$ref", "$dynamicRef", "$recursiveRef", "contentSchema",
    }
    if unsupported:
        raise UnsupportedVector(f"keywords {sorted(unsupported)} need the dynamic path")
    # $vocabulary-driven dialect semantics (DialectResolver.resolveDialect,
    # js/dialects/DialectResolver.java:31-73) need the registry to load the
    # meta-schema — not statically resolvable here, so: a custom (unknown)
    # $schema URI, or an inline $vocabulary map, routes to the dynamic path.
    if "$vocabulary" in schema:
        raise UnsupportedVector("$vocabulary meta-schemas need the dynamic path")
    s_uri = schema.get("$schema")
    from .dynamic import detect_dialect as _detect_dialect  # lazy: avoids import cycle
    if isinstance(s_uri, str) and _detect_dialect(s_uri.rstrip("#")) is None:
        raise UnsupportedVector(
            f"custom meta-schema {s_uri!r} ($vocabulary resolution) needs the dynamic path"
        )
    # unevaluated* consume annotations from in-place applicators at runtime;
    # on a FIXED Arrow schema they vectorize only when no applicator can
    # contribute annotations — then the evaluated set is static and they
    # reduce to complement checks (additionalProperties / tail-items form)
    _APPLICATORS = {"$ref", "$dynamicRef", "$recursiveRef", "allOf", "anyOf", "oneOf",
                    "if", "then", "else", "not", "dependentSchemas", "dependencies"}
    if "unevaluatedProperties" in schema and (set(schema) & _APPLICATORS):
        raise UnsupportedVector("unevaluatedProperties with in-place applicators needs the dynamic path")
    if "unevaluatedItems" in schema and (set(schema) & (_APPLICATORS | {"contains"})):
        raise UnsupportedVector("unevaluatedItems with applicators/contains needs the dynamic path")

    # ---- type: resolved at plan time against the Arrow schema ----------
    if "type" in schema:
        ts = schema["type"] if isinstance(schema["type"], list) else [schema["type"]]
        allow_null = "null" in ts or jt == "null"
        base_ok = jt in ts or (jt == "number" and "integer" in ts)
        if not base_ok and not allow_null:
            return lambda arr: np.zeros(len(arr), dtype=bool)
        if jt == "number" and "integer" in ts and "number" not in ts and pa.types.is_floating(dtype):

            def k_int(arr):
                a = _combine(arr)
                ok = _np_bool(pc.equal(pc.floor(a), a))
                nulls = ~_valid_mask(a)
                return (ok & ~nulls) | (nulls if allow_null else False)

            parts.append(k_int)
        elif base_ok and not allow_null:
            parts.append(lambda arr: _valid_mask(_combine(arr)))
        elif not base_ok and allow_null:
            parts.append(lambda arr: ~_valid_mask(_combine(arr)))

    # ---- enum / const --------------------------------------------------
    nested = jt in ("array", "object")
    if "enum" in schema:
        vals = [_defrac_value(v) for v in schema["enum"]]
        if nested:
            from ..spec.equality import canonical_key

            keys = frozenset(canonical_key(v) for v in vals if v is not None)
            null_ok = any(v is None for v in vals)

            def k_enum_nested(arr, _keys=keys, _null_ok=null_ok):
                from ..spec.equality import canonical_key as ck

                a = _combine(arr)
                return np.fromiter(
                    ((_null_ok if v is None else ck(_strip_absent(v)) in _keys) for v in a.to_pylist()),
                    dtype=bool, count=len(a),
                )

            parts.append(k_enum_nested)
        else:
            try:
                in_type = [_coerce_num(v) for v in vals if _scalar_fits(v, dtype)]
                allow_null_v = any(v is None for v in vals)
                # Arrow's is_in hashes bit patterns, so ±0.0 are distinct
                # there while JSON numerics make them equal — cover both
                if pa.types.is_floating(dtype) and any(
                    isinstance(x, (int, float)) and not isinstance(x, bool) and x == 0
                    for x in in_type
                ):
                    in_type = [*in_type, 0.0, -0.0]
                vset = pa.array(in_type, type=dtype) if in_type else pa.array([], type=dtype)
            except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
                raise UnsupportedVector(f"enum values don't fit column type: {e}")

            def k_enum(arr, _vset=vset, _null_ok=allow_null_v):
                a = _combine(arr)
                ok = _np_bool(pc.is_in(a, value_set=_vset))
                if _null_ok:
                    ok |= ~_valid_mask(a)
                return ok

            parts.append(k_enum)
    if "const" in schema:
        cv = _defrac_value(schema["const"])
        if cv is None:
            parts.append(lambda arr: ~_valid_mask(_combine(arr)))
        elif nested:
            from ..spec.equality import canonical_key

            ckey = canonical_key(cv)

            def k_const_nested(arr, _k=ckey):
                from ..spec.equality import canonical_key as ck

                a = _combine(arr)
                return np.fromiter(
                    (v is not None and ck(_strip_absent(v)) == _k for v in a.to_pylist()),
                    dtype=bool, count=len(a),
                )

            parts.append(k_const_nested)
        elif _scalar_fits(cv, dtype):
            sc = pa.scalar(_coerce_num(cv), type=dtype)

            def k_const(arr, _sc=sc):
                return _np_bool(pc.equal(_combine(arr), _sc))

            parts.append(k_const)
        else:
            parts.append(lambda arr: np.zeros(len(arr), dtype=bool))

    # ---- numeric bounds ------------------------------------------------
    if jt == "number":
        for kw, op in (
            ("minimum", pc.greater_equal),
            ("maximum", pc.less_equal),
            ("exclusiveMinimum", pc.greater),
            ("exclusiveMaximum", pc.less),
        ):
            if kw in schema:
                bound = _coerce_num(schema[kw])

                def k_bound(arr, _op=op, _b=bound):
                    a = _combine(arr)
                    ok = _np_bool(_op(a, _b))
                    return ok | ~_valid_mask(a)  # nulls: keyword doesn't apply

                parts.append(k_bound)
        if "multipleOf" in schema:
            m = _coerce_num(schema["multipleOf"])

            def k_mo(arr, _m=m):
                a = _combine(arr)
                x = a.to_numpy(zero_copy_only=False).astype(np.float64)
                nulls = ~_valid_mask(a)
                with np.errstate(invalid="ignore", divide="ignore"):
                    q = x / float(_m)
                    ok = np.isfinite(q) & (np.abs(q - np.round(q)) <= 1e-9 * np.maximum(1.0, np.abs(q)))
                return ok | nulls

            parts.append(k_mo)
    elif any(k in schema for k in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf")) and jt not in ("number",):
        pass  # numeric keywords ignore non-numeric columns entirely

    # ---- strings -------------------------------------------------------
    if jt == "string" and (pa.types.is_string(dtype) or pa.types.is_large_string(dtype)):
        if "minLength" in schema:
            n = schema["minLength"]

            def k_minl(arr, _n=n):
                a = _combine(arr)
                return _np_bool(pc.greater_equal(pc.utf8_length(a), _n)) | ~_valid_mask(a)

            parts.append(k_minl)
        if "maxLength" in schema:
            n = schema["maxLength"]

            def k_maxl(arr, _n=n):
                a = _combine(arr)
                return _np_bool(pc.less_equal(pc.utf8_length(a), _n)) | ~_valid_mask(a)

            parts.append(k_maxl)
        if "pattern" in schema:
            pat = schema["pattern"]

            def k_pat(arr, _p=pat):
                a = _combine(arr)
                return _np_bool(pc.match_substring_regex(a, _p)) | ~_valid_mask(a)

            parts.append(k_pat)
        if "format" in schema and formats_assert:
            parts.append(_format_kernel(schema["format"]))

    # ---- lists ---------------------------------------------------------
    if jt == "array":
        if "minItems" in schema or "maxItems" in schema:
            lo = schema.get("minItems")
            hi = schema.get("maxItems")

            def k_len(arr, _lo=lo, _hi=hi):
                a = _combine(arr)
                ln = pc.list_value_length(a)
                ok = np.ones(len(a), dtype=bool)
                if _lo is not None:
                    ok &= _np_bool(pc.greater_equal(ln, _lo))
                if _hi is not None:
                    ok &= _np_bool(pc.less_equal(ln, _hi))
                return ok | ~_valid_mask(a)

            parts.append(k_len)
        item_schema = schema.get("items")
        prefix = schema.get("prefixItems")
        # statically-resolvable unevaluatedItems (no applicators/contains —
        # enforced above) covers whatever items/additionalItems left
        # unevaluated: the tail when positional, everything otherwise
        unev = schema.get("unevaluatedItems")
        if prefix is None and isinstance(item_schema, list):
            # draft7/2019 positional form: items: [s0, s1, ...] with
            # additionalItems for the tail (js/compilers/v2019/Items2019Compiler.java:33-97)
            prefix, rest = item_schema, schema.get("additionalItems", unev)
        else:
            # 2020-12: prefixItems positional, items for the tail
            # (js/compilers/v2020/PrefixItemsFactory.java:47-80)
            rest = item_schema if item_schema is not None else unev
            if prefix is None and not isinstance(item_schema, (dict, bool)) and isinstance(unev, (dict, bool)):
                item_schema = unev  # no positional coverage: unevaluated = all
        if prefix is not None:
            pre_kernels = tuple(compile_vector(s, dtype.value_type, formats_assert) for s in prefix)
            rest_kernel = (
                compile_vector(rest, dtype.value_type, formats_assert)
                if isinstance(rest, (dict, bool))
                else None
            )

            def k_positional(arr, _pks=pre_kernels, _rk=rest_kernel):
                # ordinal mask over the flattened child array: element index
                # within its parent list = arange - repeated segment starts;
                # each positional kernel runs on the gather of its ordinal
                a = _combine(arr)
                vals, off = _list_segments(a)
                lo, hi = off[0], off[-1]
                m = int(hi - lo)
                child_ok = np.ones(m, dtype=bool)
                if m:
                    sub = vals.slice(lo, m)
                    ordinal = np.arange(m) - np.repeat(off[:-1] - lo, np.diff(off))
                    for p, kern in enumerate(_pks):
                        idx = np.where(ordinal == p)[0]
                        if len(idx):
                            child_ok[idx] = kern(sub.take(pa.array(idx)))
                    if _rk is not None:
                        idx = np.where(ordinal >= len(_pks))[0]
                        if len(idx):
                            child_ok[idx] = _rk(sub.take(pa.array(idx)))
                ok = _segment_all(child_ok, off - lo)
                return ok | ~_valid_mask(a)

            parts.append(k_positional)
        elif isinstance(item_schema, (dict, bool)):
            child_kernel = compile_vector(item_schema, dtype.value_type, formats_assert)

            def k_items(arr, _ck=child_kernel):
                a = _combine(arr)
                vals, off = _list_segments(a)
                child_ok = _ck(vals) if len(vals) else np.zeros(0, dtype=bool)
                ok = _segment_all(child_ok, off)
                return ok | ~_valid_mask(a)

            parts.append(k_items)
        if "contains" in schema or "minContains" in schema or "maxContains" in schema:
            csub = compile_vector(schema.get("contains", True), dtype.value_type, formats_assert)
            cmin = schema.get("minContains", 1)
            cmax = schema.get("maxContains")

            def k_contains(arr, _ck=csub, _lo=cmin, _hi=cmax):
                a = _combine(arr)
                vals, off = _list_segments(a)
                hits = _ck(vals) if len(vals) else np.zeros(0, dtype=bool)
                cnt = _segment_sum(hits, off)
                ok = cnt >= _lo
                if _hi is not None:
                    ok &= cnt <= _hi
                return ok | ~_valid_mask(a)

            parts.append(k_contains)
        if schema.get("uniqueItems") is True:

            child_nested = _arrow_json_type(dtype.value_type) in ("array", "object")

            def k_unique(arr, _nested=child_nested):
                import pandas as pd

                a = _combine(arr)
                vals, off = _list_segments(a)
                n = len(off) - 1
                if len(vals) == 0:
                    return np.ones(n, dtype=bool)
                # element identity = (h, isnull): exact int64 bits for integer
                # children (a float64 cast would collapse distinct int64 above
                # 2^53 — one Arrow child type means no 1.0-vs-1 cross-repr
                # concern), float64 value (+0.0 normalizes -0.0) for floats,
                # canonical-key hash for nested, pandas hash otherwise
                isnull = ~pc.is_valid(vals).to_numpy(zero_copy_only=False)
                if _nested:
                    from ..spec.equality import canonical_key as ck

                    hv = np.fromiter(
                        (hash(ck(_strip_absent(v))) for v in vals.to_pylist()),
                        dtype=np.int64, count=len(vals),
                    )
                elif pa.types.is_integer(dtype.value_type):
                    hv = _combine(vals.fill_null(0)).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                elif pa.types.is_floating(dtype.value_type):
                    hv = vals.to_numpy(zero_copy_only=False).astype(np.float64) + 0.0
                else:
                    hv = pd.util.hash_pandas_object(vals.to_pandas(), index=False).to_numpy()
                hv = hv[off[0] : off[-1]]
                isnull = isnull[off[0] : off[-1]]
                parent = np.repeat(np.arange(n), np.diff(off))
                df = pd.DataFrame({"p": parent, "h": hv, "z": isnull})
                sizes = np.bincount(parent, minlength=n)
                distinct = df.drop_duplicates().groupby("p").size()
                ok = np.ones(n, dtype=bool)
                idx = distinct.index.to_numpy()
                ok[idx] = distinct.to_numpy() == sizes[idx]
                return ok | ~_valid_mask(a)

            parts.append(k_unique)

    # ---- structs -------------------------------------------------------
    # A JSON object maps to an Arrow struct with a FIXED field set; a
    # property is "present" iff its field is non-null.  All name-level
    # keywords (patternProperties matches, additionalProperties complement,
    # propertyNames) resolve at PLAN time against the static field names —
    # the tabular analog of the reference's annotation machinery
    # (``js/compilers/AdditionalPropertiesCompiler.java:65-95``).
    if jt == "object" and pa.types.is_struct(dtype):
        names = {f.name: f.type for f in dtype}

        def _present(a, name):  # noqa: ANN001
            return _valid_mask(pc.struct_field(a, name)) if name in names else None

        if "required" in schema:
            req = [r for r in schema["required"]]
            missing_fields = [r for r in req if r not in names]

            def k_req(arr, _req=tuple(r for r in req if r in names), _miss=bool(missing_fields)):
                a = _combine(arr)
                if _miss:  # plan-time: field absent from Arrow schema → always fails
                    return ~_valid_mask(a)
                ok = np.ones(len(a), dtype=bool)
                for r in _req:
                    ok &= _valid_mask(pc.struct_field(a, r))
                return ok | ~_valid_mask(a)

            parts.append(k_req)
        if "properties" in schema or "patternProperties" in schema:
            import re as _re

            subs: list[tuple[str, Kernel]] = []
            for name, sub in schema.get("properties", {}).items():
                if name in names:
                    subs.append((name, compile_vector(sub, names[name], formats_assert)))
            for pat, sub in schema.get("patternProperties", {}).items():
                rx = _re.compile(pat)
                for name, ftype in names.items():
                    if rx.search(name):
                        subs.append((name, compile_vector(sub, ftype, formats_assert)))

            def k_props(arr, _subs=tuple(subs)):
                a = _combine(arr)
                ok = np.ones(len(a), dtype=bool)
                for name, kern in _subs:
                    fld = pc.struct_field(a, name)
                    # absent (null) field => property not present => passes
                    ok &= kern(fld) | ~_valid_mask(fld)
                return ok | ~_valid_mask(a)

            parts.append(k_props)
        # unevaluatedProperties without in-place applicators (enforced
        # above) reduces to the additionalProperties complement; when
        # additionalProperties is also present it evaluates everything it
        # applies to, making unevaluatedProperties vacuous
        ap_key = (
            "additionalProperties"
            if "additionalProperties" in schema
            else ("unevaluatedProperties" if "unevaluatedProperties" in schema else None)
        )
        if ap_key is not None:
            import re as _re

            matched = set(schema.get("properties", {}))
            for pat in schema.get("patternProperties", {}):
                rx = _re.compile(pat)
                matched |= {n for n in names if rx.search(n)}
            extra = [n for n in names if n not in matched]
            ap = schema[ap_key]
            if ap is False:

                def k_ap_false(arr, _extra=tuple(extra)):
                    a = _combine(arr)
                    ok = np.ones(len(a), dtype=bool)
                    for n in _extra:
                        ok &= ~_valid_mask(pc.struct_field(a, n))
                    return ok | ~_valid_mask(a)

                parts.append(k_ap_false)
            elif ap is not True:
                ap_subs = [(n, compile_vector(ap, names[n], formats_assert)) for n in extra]

                def k_ap(arr, _subs=tuple(ap_subs)):
                    a = _combine(arr)
                    ok = np.ones(len(a), dtype=bool)
                    for n, kern in _subs:
                        fld = pc.struct_field(a, n)
                        ok &= kern(fld) | ~_valid_mask(fld)
                    return ok | ~_valid_mask(a)

                parts.append(k_ap)
        if "propertyNames" in schema:
            # field names are static → evaluate the name schema at plan time
            from .dynamic import compile_schema as _dyn_compile

            name_eval = _dyn_compile(schema["propertyNames"], formats_assert=formats_assert)
            bad_names = [n for n in names if not name_eval.is_valid(n)]

            def k_pnames(arr, _bad=tuple(bad_names)):
                a = _combine(arr)
                ok = np.ones(len(a), dtype=bool)
                for n in _bad:  # a bad-named property must be absent
                    ok &= ~_valid_mask(pc.struct_field(a, n))
                return ok | ~_valid_mask(a)

            parts.append(k_pnames)
        if "minProperties" in schema or "maxProperties" in schema:
            lo, hi = schema.get("minProperties"), schema.get("maxProperties")

            def k_propcount(arr, _lo=lo, _hi=hi, _names=tuple(names)):
                a = _combine(arr)
                cnt = np.zeros(len(a), dtype=np.int64)
                for n in _names:
                    cnt += _valid_mask(pc.struct_field(a, n)).astype(np.int64)
                ok = np.ones(len(a), dtype=bool)
                if _lo is not None:
                    ok &= cnt >= _lo
                if _hi is not None:
                    ok &= cnt <= _hi
                return ok | ~_valid_mask(a)

            parts.append(k_propcount)
        if "dependentRequired" in schema:
            deps = {k2: tuple(v) for k2, v in schema["dependentRequired"].items()}

            def k_depreq(arr, _deps=deps):
                a = _combine(arr)
                ok = np.ones(len(a), dtype=bool)
                for trig, needs in _deps.items():
                    if trig not in names:
                        continue  # trigger can never be present
                    present = _valid_mask(pc.struct_field(a, trig))
                    have = np.ones(len(a), dtype=bool)
                    for n in needs:
                        have &= _valid_mask(pc.struct_field(a, n)) if n in names else False
                    ok &= ~present | have
                return ok | ~_valid_mask(a)

            parts.append(k_depreq)
        if "dependentSchemas" in schema:
            dsubs = []
            for trig, sub in schema["dependentSchemas"].items():
                if trig in names:
                    dsubs.append((trig, compile_vector(sub, dtype, formats_assert)))

            def k_depsch(arr, _subs=tuple(dsubs)):
                a = _combine(arr)
                ok = np.ones(len(a), dtype=bool)
                for trig, kern in _subs:
                    present = _valid_mask(pc.struct_field(a, trig))
                    ok &= ~present | kern(a)
                return ok | ~_valid_mask(a)

            parts.append(k_depsch)
    elif jt == "object":
        obj_kw = set(schema) & {
            "properties", "patternProperties", "additionalProperties", "propertyNames",
            "minProperties", "maxProperties", "dependentRequired", "dependentSchemas",
        }
        if obj_kw:
            raise UnsupportedVector(f"object keywords {sorted(obj_kw)} on non-struct type {dtype}")

    # ---- combinators ---------------------------------------------------
    if "allOf" in schema:
        subs = [compile_vector(s, dtype, formats_assert) for s in schema["allOf"]]

        def k_allof(arr, _subs=tuple(subs)):
            ok = np.ones(len(arr), dtype=bool)
            for s in _subs:
                ok &= s(arr)
            return ok

        parts.append(k_allof)
    if "anyOf" in schema:
        subs = [compile_vector(s, dtype, formats_assert) for s in schema["anyOf"]]

        def k_anyof(arr, _subs=tuple(subs)):
            ok = np.zeros(len(arr), dtype=bool)
            for s in _subs:
                ok |= s(arr)
            return ok

        parts.append(k_anyof)
    if "oneOf" in schema:
        subs = [compile_vector(s, dtype, formats_assert) for s in schema["oneOf"]]

        def k_oneof(arr, _subs=tuple(subs)):
            cnt = np.zeros(len(arr), dtype=np.int32)
            for s in _subs:
                cnt += s(arr).astype(np.int32)
            return cnt == 1

        parts.append(k_oneof)
    if "not" in schema:
        sub = compile_vector(schema["not"], dtype, formats_assert)
        parts.append(lambda arr, _s=sub: ~_s(arr))
    if "if" in schema:
        f_if = compile_vector(schema["if"], dtype, formats_assert)
        f_then = compile_vector(schema["then"], dtype, formats_assert) if "then" in schema else None
        f_else = compile_vector(schema["else"], dtype, formats_assert) if "else" in schema else None

        def k_ite(arr, _i=f_if, _t=f_then, _e=f_else):
            cond = _i(arr)
            ok = np.ones(len(arr), dtype=bool)
            if _t is not None:
                ok &= ~cond | _t(arr)
            if _e is not None:
                ok &= cond | _e(arr)
            return ok

        parts.append(k_ite)

    if not parts:
        return lambda arr: np.ones(len(arr), dtype=bool)
    if len(parts) == 1:
        return parts[0]

    def combined(arr, _parts=tuple(parts)):
        ok = _parts[0](arr)
        for p in _parts[1:]:
            ok &= p(arr)
        return ok

    return combined


def _coerce_num(v):
    if isinstance(v, Fraction):
        return int(v) if v.denominator == 1 else float(v)
    return v


def _defrac_value(v):
    """Recursively convert Fractions (exact-JSON parse) to int/float so the
    value can live in an Arrow array / canonical key."""
    if isinstance(v, Fraction):
        return _coerce_num(v)
    if isinstance(v, list):
        return [_defrac_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _defrac_value(x) for k, x in v.items()}
    return v


def _scalar_fits(v, dtype: pa.DataType) -> bool:
    v = _coerce_num(v)
    # JSON booleans are NOT numbers (and vice versa) — don't let Arrow coerce
    if isinstance(v, bool) != pa.types.is_boolean(dtype):
        if isinstance(v, bool) or pa.types.is_boolean(dtype):
            return False
    try:
        # round-trip guard: pa.scalar silently TRUNCATES (0.5 → int 0), so a
        # value only "fits" if the stored scalar equals the original —
        # otherwise enum/const would match values they must not
        return pa.scalar(v, type=dtype).as_py() == v
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return False


def _format_kernel(fmt: str) -> Kernel:
    """Vector kernel for one format: RE2 regex where possible, pc.strptime
    for temporal formats, per-distinct-value Python fallback otherwise
    (fallback hashes distinct values once per batch — bounded cost)."""
    rx = ANCHORED_REGEX.get(fmt)
    if rx is not None:

        def k_rx(arr, _rx=rx):
            a = _combine(arr)
            return _np_bool(pc.match_substring_regex(a, _rx)) | ~_valid_mask(a)

        return k_rx
    if fmt == "date":
        # exact calendar check, fully vectorized (strptime is too lenient)
        _dim = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], dtype=np.int64)

        def k_date(arr):
            a = _combine(arr)
            shape_ok = _np_bool(pc.match_substring_regex(a, r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"))
            n = len(a)
            ok = np.zeros(n, dtype=bool)
            if shape_ok.any():
                sub = a.filter(pa.array(shape_ok))
                y = pc.utf8_slice_codeunits(sub, 0, 4).cast(pa.int64()).to_numpy(zero_copy_only=False)
                m = pc.utf8_slice_codeunits(sub, 5, 7).cast(pa.int64()).to_numpy(zero_copy_only=False)
                d = pc.utf8_slice_codeunits(sub, 8, 10).cast(pa.int64()).to_numpy(zero_copy_only=False)
                m_ok = (m >= 1) & (m <= 12)
                dim = _dim[np.where(m_ok, m, 1)]
                leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
                dim = np.where(m_ok & (m == 2) & leap, 29, dim)
                ok[shape_ok] = m_ok & (d >= 1) & (d <= dim)
            return ok | ~_valid_mask(a)

        return k_date
    pred = FORMAT_PREDICATES.get(fmt)
    if pred is None:
        return lambda arr: np.ones(len(arr), dtype=bool)

    def k_py(arr, _pred=pred):
        a = _combine(arr)
        vals = a.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(vals[_valid_mask(a)], return_inverse=True) if len(a) else (np.array([]), np.array([]))
        ok = np.ones(len(a), dtype=bool)
        if len(uniq):
            uok = np.fromiter((_pred(u) for u in uniq), dtype=bool, count=len(uniq))
            ok[_valid_mask(a)] = uok[inv]
        return ok

    return k_py


# ------------------------------------------------------ table-level plans


class ColumnConstraint:
    """One compiled per-column constraint: id, error type, kernel."""

    __slots__ = ("constraint_id", "column", "kernel", "schema")

    def __init__(self, constraint_id: str, column: str, kernel: Kernel, schema: Any):
        self.constraint_id = constraint_id
        self.column = column
        self.kernel = kernel
        self.schema = schema


def compile_table_plan(column_schemas: dict[str, Any], table_schema: pa.Schema) -> list[ColumnConstraint]:
    """Compile a {column: json-schema} spec against an Arrow table schema.
    The compiled plan is pure/stateless — ship once via closure capture or
    ``ray.put`` and reuse in every map_batches task (the reference's
    compile-once/validate-many contract, ``README.md:301-303``)."""
    plan: list[ColumnConstraint] = []
    for col, sch in column_schemas.items():
        idx = table_schema.get_field_index(col)
        if idx < 0:
            raise KeyError(f"constraint column {col!r} not in table schema")
        kern = compile_vector(sch, table_schema.field(idx).type)
        plan.append(ColumnConstraint(f"{col}/schema", col, kern, sch))
    return plan


def apply_table_plan(plan: list[ColumnConstraint], batch: pa.Table) -> dict[str, Mask]:
    """Evaluate every constraint → {constraint_id: row mask}."""
    return {c.constraint_id: c.kernel(batch[c.column]) for c in plan}
