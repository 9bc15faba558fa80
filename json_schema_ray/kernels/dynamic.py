"""Compile-once dynamic evaluator for JSON-Schema-subset constraints.

This is the semantic core: a schema (Draft 2020-12 / 2019-09 / Draft-07
subset) is compiled ONCE into a tree of Python closures, then applied to
any number of JSON values — the analog of the reference's
``SchemaBuilder.compile`` → immutable ``Schema`` reused concurrently
(``js/compilers/Compiler.java:29-89``, ``README.md:31-35``).  Where the
reference fans each array element / subschema branch onto a virtual
thread (``js/compilers/v2020/Items2020CompilerFactory.java:57-68``), here
the unit of parallelism is the Ray Data *block*: this evaluator runs
inside ``map_batches`` over JSON-typed columns (e.g. ``events.props``),
while typed Arrow columns take the fully vectorized path in
``kernels/vector.py``.

Semantics mirrored from the reference:
- 4-kind result algebra (``js/results/IValidationResult.java:15-20``) →
  ``Outcome(ok, props, items, errors)``: ``ok`` = OK/ERROR, ``props`` /
  ``items`` = ANNOTATION (evaluated sets feeding ``unevaluated*``),
  container AND-fold implicit in keyword aggregation.
- numeric checks in exact decimal arithmetic
  (``js/compilers/base/BaseNumberCompiler.java:21-32``,
  ``MultipleOfCompiler.java:34-51``) → ``fractions.Fraction``.
- string length in code points (``BaseLengthCompiler.java:296-301``) →
  Python ``len`` (already code points).
- ``pattern`` is a regex *search*, not full match
  (``js/compilers/PatternCompiler.java:33-50``); engine = Python ``re``
  (the reference likewise deviates from ECMA-262, ``README.md:309-311``).
"""

from __future__ import annotations

import base64
import binascii
import json
import re
from fractions import Fraction
from typing import Any, Callable

from ..spec.equality import canonical_key, deep_equal
from ..spec.errors import Violation
from ..spec.schema import DEFAULT_BASE, SchemaRegistry
from .formats import FORMAT_PREDICATES

ALL = True  # marker: "all items evaluated"

_NUM = (int, float, Fraction)


def _is_num(v: Any) -> bool:
    return isinstance(v, _NUM) and not isinstance(v, bool)


def _frac(v: Any) -> Fraction:
    if isinstance(v, Fraction):
        return v
    if isinstance(v, float):
        # shortest round-tripping decimal == the JSON literal the user wrote;
        # matches the reference's BigDecimal-from-literal semantics
        return Fraction(str(v))
    return Fraction(v)


def _type_of(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if _is_num(v):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


# exact-builtin fast dispatch (JSON-parsed values are always these types);
# subclasses / Decimal etc. fall back to the isinstance chain above
_PYTYPE_NAME = {
    type(None): "null",
    bool: "boolean",
    int: "number",
    float: "number",
    Fraction: "number",
    str: "string",
    list: "array",
    dict: "object",
}


def _check_type(v: Any, t: str) -> bool:
    tv = _type_of(v)
    if t == "integer":
        # integer = number with zero fractional part (TypeCompiler.java:87-94)
        return tv == "number" and _frac(v).denominator == 1
    if t == "number":
        return tv == "number"
    return tv == t


class Outcome:
    __slots__ = ("ok", "props", "items", "errors")

    def __init__(self, ok: bool, props=None, items=None, errors=None):
        self.ok = ok
        self.props: set | None = props  # evaluated property names here
        self.items = items  # ALL or set[int] of evaluated indices here
        self.errors: list[Violation] | None = errors


_OK = Outcome(True)


def _fail(err_type: str, iptr: str, sptr: str, *args) -> Outcome:
    return Outcome(False, errors=[Violation(err_type, iptr, sptr, tuple(args))])


def _merge_ann(base: Outcome, outs: list[Outcome]) -> None:
    """Union evaluated-sets of successful outcomes into ``base`` (annotations
    from failed schemas are dropped, per spec & reference transformer chain)."""
    for o in outs:
        if not o.ok:
            continue
        if o.props:
            base.props = (base.props or set()) | o.props
        if o.items is ALL:
            base.items = ALL
        elif o.items and base.items is not ALL:
            base.items = (base.items or set()) | o.items


def _esc(tok: str) -> str:
    return tok.replace("~", "~0").replace("/", "~1")


# evaluator signature: (value, scope: tuple[str,...], iptr: str) -> Outcome
Evaluator = Callable[[Any, tuple, str], Outcome]


class CompiledSchema:
    """Immutable compiled schema — thread-safe, reusable, shippable to Ray
    workers by pickling (closure tree is pure Python)."""

    def __init__(self, fn: Evaluator, resource_uri: str):
        self._fn = fn
        self.resource_uri = resource_uri

    def evaluate(self, value: Any) -> Outcome:
        return self._fn(value, (), "")

    def is_valid(self, value: Any) -> bool:
        return self._fn(value, (), "").ok

    def apply(self, json_text: str, exact_numbers: bool = True) -> Outcome:
        """Parse-and-validate, like ``Schema.apply`` (``js/Schema.java:51-66``).
        ``exact_numbers`` parses decimals as Fractions (BigDecimal analog)."""
        v = json.loads(json_text, parse_float=Fraction) if exact_numbers else json.loads(json_text)
        return self.evaluate(v)

    def violations(self, value: Any) -> list[Violation]:
        out = self.evaluate(value)
        return [] if out.ok else (out.errors or [])

    def explain(self, value: Any) -> str:
        """Hierarchical result dump for debugging nested failures — the
        ``ValidationResultFactory.hierarchyFormat`` analog
        (``js/results/ValidationResultFactory.java:240-262``)."""
        from ..spec.errors import hierarchy_format

        return hierarchy_format(self.evaluate(value))


# "$schema" URI → dialect name; the analog of the reference's embedded
# dialect registry (js/dialects/DialectRegistry.java:26-60 + dialects.zip)
DIALECT_URIS = {
    "https://json-schema.org/draft/2020-12/schema": "2020-12",
    "http://json-schema.org/draft/2020-12/schema": "2020-12",
    "https://json-schema.org/draft/2019-09/schema": "2019-09",
    "http://json-schema.org/draft/2019-09/schema": "2019-09",
    "https://json-schema.org/draft-07/schema": "draft7",
    "http://json-schema.org/draft-07/schema": "draft7",
}


def detect_dialect(schema_uri: Any) -> str | None:
    """Dialect from a ``$schema`` URI (trailing ``#`` tolerated), or None."""
    if not isinstance(schema_uri, str):
        return None
    return DIALECT_URIS.get(schema_uri.rstrip("#"))


# ---- $vocabulary-driven dialect construction --------------------------------
# The reference builds a dialect as a SET of vocabularies, each owning its
# keyword compilers (js/dialects/Dialect.java:103-109 optCompiler,
# js/dialects/DialectRegistry.java:26-60, VocabularyCompilersRegistry.java:16-60);
# a meta-schema's $vocabulary replaces the default set
# (DialectResolver.tryApplyVocabularies, js/dialects/DialectResolver.java:53-73):
# listed+known vocabularies stay active, unknown+required raises, unknown+
# optional is dropped, and keywords of vocabularies NOT listed are ignored.
_V2020 = "https://json-schema.org/draft/2020-12/vocab/"
_V2019 = "https://json-schema.org/draft/2019-09/vocab/"
VOCAB_URI_KEYS = {
    _V2020 + "core": "core",
    _V2020 + "applicator": "applicator",
    _V2020 + "unevaluated": "unevaluated",
    _V2020 + "validation": "validation",
    _V2020 + "meta-data": "metadata",
    _V2020 + "format-annotation": "format-annotation",
    _V2020 + "format-assertion": "format-assertion",
    _V2020 + "content": "content",
    _V2019 + "core": "core",
    _V2019 + "applicator": "applicator",
    _V2019 + "validation": "validation",
    _V2019 + "meta-data": "metadata",
    _V2019 + "format": "format",
    _V2019 + "content": "content",
}
KEYWORD_VOCAB = {
    **{kw: "applicator" for kw in (
        "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
        "items", "prefixItems", "additionalItems", "contains",
        "properties", "patternProperties", "additionalProperties",
        "dependentSchemas", "propertyNames",
    )},
    **{kw: "unevaluated" for kw in ("unevaluatedItems", "unevaluatedProperties")},
    **{kw: "validation" for kw in (
        "type", "enum", "const", "multipleOf",
        "maximum", "exclusiveMaximum", "minimum", "exclusiveMinimum",
        "maxLength", "minLength", "pattern",
        "maxItems", "minItems", "uniqueItems", "maxContains", "minContains",
        "maxProperties", "minProperties", "required", "dependentRequired",
    )},
    "format": "format",
    **{kw: "content" for kw in ("contentEncoding", "contentMediaType", "contentSchema")},
}


class DynamicCompiler:
    """One compiler instance per (registry, dialect, options) — the analog of
    ``SchemaBuilder`` fold → ``Compiler.compileSchema``
    (``js/SchemaBuilder.java:356-375``)."""

    def __init__(
        self,
        registry: SchemaRegistry | None = None,
        dialect: str | None = None,
        formats_assert: bool = False,
        content_processing: str = "default",  # disable|default|encoding|encoding_and_schema
        format_predicates: dict | None = None,
        regex_flavor: Callable[[str], Any] | None = None,
        content_encodings: dict | None = None,
        content_media_types: list | None = None,
    ):
        self.registry = registry or SchemaRegistry()
        # dialect=None → auto-detect from the root "$schema" at compile time
        # (DialectRegistry analog, js/dialects/DialectRegistry.java:26-60),
        # falling back to 2020-12; an explicit dialect always wins.
        self._dialect_explicit = dialect is not None
        self.dialect = dialect or "2020-12"
        self.formats_assert = formats_assert
        self.content_processing = content_processing
        self.formats = dict(FORMAT_PREDICATES)
        if format_predicates:
            self.formats.update(format_predicates)
        self._re_compile = regex_flavor or (lambda p: re.compile(p))
        # custom content codecs / media-type checks (SchemaBuilder
        # addContentEncodingValidator / addContentMediaTypeValidator,
        # js/SchemaBuilder.java:189-208): encoding names are
        # case-insensitive and OVERRIDE the built-in decoders; media-type
        # entries are (predicate(mime)->bool, check(decoded)->None-or-raise)
        self.content_encodings = {
            k.lower(): f for k, f in (content_encodings or {}).items()
        }
        self.content_media_types = list(content_media_types or [])
        self._memo: dict[tuple, list] = {}  # key -> [evaluator or None]
        # experimental object→array coercion for `items`
        # (SchemaBuilder.treatObjectAsArray, Items2020CompilerFactory:101-117)
        self.treat_object_as_array = False
        # $vocabulary state (set per compile() by _apply_vocabularies)
        self._active_vocabs: set | None = None
        self._format_assertion_vocab = False

    # ------------------------------------------------------------- entry

    def compile(self, schema: Any, uri: str | None = None) -> CompiledSchema:
        if not self._dialect_explicit:
            # Resolve the dialect PER compile() call: detect from this root's
            # "$schema", else RESET to the documented 2020-12 fallback — a
            # reused compiler must not leak a previous root's detected
            # dialect into a $schema-less schema.
            d = detect_dialect(schema.get("$schema")) if isinstance(schema, dict) else None
            self.dialect = d or "2020-12"
        # $vocabulary resolution — reset per compile() like the dialect
        self._active_vocabs: set | None = None
        self._format_assertion_vocab = False
        if isinstance(schema, dict) and isinstance(schema.get("$schema"), str):
            self._apply_vocabularies(schema)
        base = self.registry.register(schema, uri or DEFAULT_BASE)
        fn = self._compile(schema, base)
        return CompiledSchema(fn, base)

    # ----------------------------------------------------------- $vocabulary

    def _apply_vocabularies(self, schema: dict) -> None:
        """Mirror ``DialectResolver.resolveDialect``
        (``js/dialects/DialectResolver.java:31-73``): a known ``$schema``
        applies the schema's OWN ``$vocabulary`` if present (the
        compile-a-meta-schema case); an unknown ``$schema`` loads the
        meta-schema through the registry and applies *its* ``$vocabulary``
        (base dialect = the meta-schema's own ``$schema``).  Deviation
        (documented): an unresolvable unknown ``$schema`` falls back to the
        2020-12 default instead of raising "Unsupported dialect" — lenient
        by design so $schema-less-equivalent corpora keep compiling."""
        s_uri = schema["$schema"].rstrip("#")
        meta = None
        if detect_dialect(s_uri) is not None:
            meta = schema if isinstance(schema.get("$vocabulary"), dict) else None
        else:
            try:
                meta, _mbase = self.registry.resolve(s_uri, DEFAULT_BASE)
            except Exception:
                return
            if not isinstance(meta, dict):
                return
            d = detect_dialect(meta.get("$schema"))
            if d is not None and not self._dialect_explicit:
                self.dialect = d
        if meta is None:
            return
        vocabs = meta.get("$vocabulary")
        if not isinstance(vocabs, dict):
            return
        active: set = set()
        for vuri, state in vocabs.items():
            key = VOCAB_URI_KEYS.get(str(vuri).rstrip("#"))
            if key is None:
                if state:
                    # DialectResolver.checkVocabulary: required-but-unknown
                    raise ValueError(f"unknown required vocabulary {vuri!r}")
                continue  # optional unknown vocabulary: dropped
            # known vocabularies stay active regardless of the boolean
            # (Dialect.create keeps every resolvable vocabulary; the boolean
            # only means required-to-understand — Dialect.java:28-44)
            active.add(key)
            if key == "format-assertion" and state:
                # Dialect.isAssertionRequired (Dialect.java:45-49)
                self._format_assertion_vocab = True
        self._active_vocabs = active

    def _kw_enabled(self, kw: str) -> bool:
        av = self._active_vocabs
        if av is None:
            return True
        voc = KEYWORD_VOCAB.get(kw)
        if voc is None:
            return True  # core/$ref machinery and metadata no-ops unaffected
        if voc == "unevaluated":
            # 2019-09 folds unevaluated* into the applicator vocabulary
            return "unevaluated" in av or (
                self.dialect == "2019-09" and "applicator" in av
            )
        if voc == "format":
            return bool(av & {"format-annotation", "format-assertion", "format"})
        return voc in av

    # ------------------------------------------------------- recursion-safe

    def _compile(self, node: Any, base: str) -> Evaluator:
        """Memoized compile with lazy trampoline for recursive $refs — the
        analog of ``CompileContext`` memoization + ``Invoke``
        (``js/compilers/CompileContext.java:102-122``,
        ``js/compilers/Compiler.java:158-165``)."""
        if isinstance(node, bool):
            if node:
                return lambda v, sc, ip: _OK
            return lambda v, sc, ip: _fail("FALSE_SCHEMA", ip, "")
        key = (id(node), base)
        if key in self._memo:
            cell = self._memo[key]

            def trampoline(v, sc, ip, _cell=cell):
                return _cell[0](v, sc, ip)

            return trampoline
        cell = [None]
        self._memo[key] = cell
        fn = self._compile_object(node, base)
        cell[0] = fn
        return fn

    # --------------------------------------------------------- schema object

    def _compile_object(self, sch: dict, base: str) -> Evaluator:
        # Embedded resource with its own "$schema": compile that subtree under
        # ITS dialect (DialectRegistry per-resource semantics), not the root's.
        # Only resource roots ($id present) may switch; an explicit
        # constructor dialect still wins everywhere.
        if (
            not self._dialect_explicit
            and isinstance(sch, dict)
            and "$schema" in sch
            and "$id" in sch
        ):
            d = detect_dialect(sch.get("$schema"))
            if d is not None and d != self.dialect:
                prev, self.dialect = self.dialect, d
                try:
                    return self._compile_object_body(sch, base)
                finally:
                    self.dialect = prev
        return self._compile_object_body(sch, base)

    def _compile_object_body(self, sch: dict, base: str) -> Evaluator:
        reg = self.registry
        base = reg.base_of(sch, base)
        dialect = self.dialect
        if self._active_vocabs is not None:
            # keywords owned by vocabularies absent from the meta-schema's
            # $vocabulary get no compiler → ignored (Dialect.optCompiler
            # over the active set only, Dialect.java:103-109)
            sch = {kk: vv for kk, vv in sch.items() if self._kw_enabled(kk)}

        # draft-07: $ref replaces all siblings (RefCompiler.java:50-66)
        if dialect == "draft7" and "$ref" in sch:
            target, tbase = reg.resolve(sch["$ref"], base)
            sub = self._compile(target, tbase)
            return self._wrap_scope(sub, base)

        validators: list[Evaluator] = []
        k = validators.append

        # ---- in-place applicators ------------------------------------
        if "$ref" in sch:
            target, tbase = reg.resolve(sch["$ref"], base)
            k(self._compile(target, tbase))
        if "$dynamicRef" in sch and dialect == "2020-12":
            ref = sch["$dynamicRef"]

            def dyn_ref(v, sc, ip, _ref=ref, _base=base, _dial=dialect):
                # lazy compile runs at evaluate time — pin the dialect this
                # closure was authored under, not whatever a later compile()
                # left on the instance
                node, rbase = reg.resolve_dynamic(_ref, _base, sc)
                prev, self.dialect = self.dialect, _dial
                try:
                    fn = self._compile(node, rbase)
                finally:
                    self.dialect = prev
                return fn(v, sc, ip)

            k(dyn_ref)
        if "$recursiveRef" in sch and dialect == "2019-09":

            def rec_ref(v, sc, ip, _base=base, _dial=dialect):
                node, rbase = reg.resolve_recursive(_base, sc)
                prev, self.dialect = self.dialect, _dial
                try:
                    fn = self._compile(node, rbase)
                finally:
                    self.dialect = prev
                return fn(v, sc, ip)

            k(rec_ref)

        # ---- type / const / enum -------------------------------------
        if "type" in sch:
            ts = sch["type"] if isinstance(sch["type"], list) else [sch["type"]]
            ts_set = frozenset(ts)
            has_num = "number" in ts_set
            has_int = "integer" in ts_set

            def v_type(v, sc, ip, _ts=tuple(ts), _set=ts_set, _hn=has_num, _hi=has_int):
                tv = _PYTYPE_NAME.get(type(v))
                if tv is None:  # subclass / Decimal: exact slow path
                    if any(_check_type(v, t) for t in _ts):
                        return _OK
                elif tv == "number":
                    if _hn:
                        return _OK
                    # integer = number with zero fractional part; float
                    # repr-integrality == binary is_integer (non-integer
                    # floats always repr with a fraction/neg exponent)
                    if _hi:
                        tvv = type(v)
                        if tvv is int:
                            return _OK
                        if tvv is float:
                            if v.is_integer():
                                return _OK
                        elif v.denominator == 1:  # Fraction
                            return _OK
                elif tv in _set:
                    return _OK
                return _fail("TYPE", ip, "/type", json.dumps(v, default=str), "/".join(_ts))

            k(v_type)
        if "const" in sch:
            cval = sch["const"]

            def v_const(v, sc, ip, _c=cval):
                if deep_equal(v, _c):
                    return _OK
                return _fail("CONST", ip, "/const", json.dumps(v, default=str), str(_c))

            k(v_const)
        if "enum" in sch:
            keys = frozenset(canonical_key(x) for x in sch["enum"])

            def v_enum(v, sc, ip, _keys=keys, _vals=sch["enum"]):
                if canonical_key(v) in _keys:
                    return _OK
                return _fail("ENUM", ip, "/enum", json.dumps(v, default=str), str(_vals))

            k(v_enum)

        # ---- numbers --------------------------------------------------
        for kw, err, op in (
            ("minimum", "MINIMUM", lambda a, b: a >= b),
            ("maximum", "MAXIMUM", lambda a, b: a <= b),
            ("exclusiveMinimum", "EXCLUSIVE_MINIMUM", lambda a, b: a > b),
            ("exclusiveMaximum", "EXCLUSIVE_MAXIMUM", lambda a, b: a < b),
        ):
            if kw in sch and _is_num(sch[kw]):
                bound = _frac(sch[kw])
                raw = sch[kw]
                # Fast path: native int/float comparisons are mathematically
                # exact in CPython; they only diverge from the decimal-literal
                # (BigDecimal) semantics of _frac when a float that does not
                # round-trip decimally (|x| ≥ 2^53) meets an int/Fraction
                # operand at the equality boundary (e.g. 1e23 vs 10^23).
                # float-vs-float is always order-identical (repr is monotone),
                # so: float value → native if bound is float or |v| < 2^53;
                # int value → native if bound is int or a float < 2^53
                # (decided at compile time).  Everything else (Fraction
                # values from exact-number parse, huge mixed cases) takes the
                # exact Fraction path.  ~25% of dynamic-path time was _frac.
                _bound_is_float = type(raw) is float
                _bound_is_int = type(raw) is int
                _int_native_ok = _bound_is_int or (
                    _bound_is_float and -9.007199254740992e15 < raw < 9.007199254740992e15
                )

                def v_num(v, sc, ip, _b=bound, _op=op, _e=err, _kw=kw, _raw=raw,
                          _bf=_bound_is_float, _bi=_bound_is_int, _iok=_int_native_ok):
                    tv = type(v)
                    if tv is float:
                        if _bf or (_bi and -9.007199254740992e15 < v < 9.007199254740992e15):
                            if _op(v, _raw):
                                return _OK
                        elif _op(_frac(v), _b):
                            return _OK
                    elif tv is int:
                        if _iok:
                            if _op(v, _raw):
                                return _OK
                        elif _op(_frac(v), _b):
                            return _OK
                    elif not _is_num(v) or _op(_frac(v), _b):
                        return _OK
                    return _fail(_e, ip, "/" + _kw, str(v), str(_raw))

                k(v_num)
        if "multipleOf" in sch and _is_num(sch["multipleOf"]):
            mo = _frac(sch["multipleOf"])

            def v_mo(v, sc, ip, _m=mo, _raw=sch["multipleOf"]):
                if not _is_num(v):
                    return _OK
                if _m != 0 and (_frac(v) / _m).denominator == 1:
                    return _OK
                return _fail("MULTIPLE_OF", ip, "/multipleOf", str(v), str(_raw))

            k(v_mo)

        # ---- strings --------------------------------------------------
        if "minLength" in sch:
            n = sch["minLength"]

            def v_minlen(v, sc, ip, _n=n):
                if not isinstance(v, str) or len(v) >= _n:
                    return _OK
                return _fail("MIN_LENGTH", ip, "/minLength", v, _n, len(v))

            k(v_minlen)
        if "maxLength" in sch:
            n = sch["maxLength"]

            def v_maxlen(v, sc, ip, _n=n):
                if not isinstance(v, str) or len(v) <= _n:
                    return _OK
                return _fail("MAX_LENGTH", ip, "/maxLength", v, _n, len(v))

            k(v_maxlen)
        if "pattern" in sch and isinstance(sch["pattern"], str):
            rx = self._re_compile(sch["pattern"])

            def v_pat(v, sc, ip, _rx=rx, _p=sch["pattern"]):
                if not isinstance(v, str) or _rx.search(v):
                    return _OK
                return _fail("PATTERN", ip, "/pattern", v, _p)

            k(v_pat)
        if (
            "format" in sch
            and (self.formats_assert or self._format_assertion_vocab)
            and isinstance(sch["format"], str)
        ):
            fmt = sch["format"]
            pred = self.formats.get(fmt)
            if pred is not None:

                def v_fmt(v, sc, ip, _p=pred, _f=fmt):
                    if not isinstance(v, str) or _p(v):
                        return _OK
                    return _fail("FORMAT", ip, "/format", v, _f)

                k(v_fmt)

        # ---- content (ContentTypesCompilerFactory.java:55-127) --------
        assert_content = self.content_processing in ("encoding", "encoding_and_schema") or (
            self.content_processing == "default" and dialect == "draft7"
        )
        # fires on contentEncoding OR contentMediaType (the reference chain
        # starts from either link; contentSchema alone resolves no
        # validator — ContentUtils.java:62-64,81)
        if assert_content and ("contentEncoding" in sch or "contentMediaType" in sch):
            k(self._content_validator(sch, base))

        # ---- objects --------------------------------------------------
        if "required" in sch:
            req = tuple(sch["required"])

            def v_req(v, sc, ip, _r=req):
                if not isinstance(v, dict):
                    return _OK
                missing = [p for p in _r if p not in v]
                if not missing:
                    return _OK
                return _fail("REQUIRED", ip, "/required", missing)

            k(v_req)
        if "minProperties" in sch:
            n = sch["minProperties"]

            def v_minp(v, sc, ip, _n=n):
                if not isinstance(v, dict) or len(v) >= _n:
                    return _OK
                return _fail("MIN_PROPERTIES", ip, "/minProperties", _n, len(v))

            k(v_minp)
        if "maxProperties" in sch:
            n = sch["maxProperties"]

            def v_maxp(v, sc, ip, _n=n):
                if not isinstance(v, dict) or len(v) <= _n:
                    return _OK
                return _fail("MAX_PROPERTIES", ip, "/maxProperties", _n, len(v))

            k(v_maxp)

        dep_req = {}
        if "dependentRequired" in sch:
            dep_req.update(sch["dependentRequired"])
        dep_sch = {}
        if "dependentSchemas" in sch:
            dep_sch.update(sch["dependentSchemas"])
        if "dependencies" in sch:  # draft-07 split by value type
            for name, dep in sch["dependencies"].items():
                if isinstance(dep, list):
                    dep_req[name] = dep
                else:
                    dep_sch[name] = dep
        if dep_req:
            dr = {n: tuple(v) for n, v in dep_req.items()}

            def v_depreq(v, sc, ip, _d=dr):
                if not isinstance(v, dict):
                    return _OK
                for name, needs in _d.items():
                    if name in v and any(p not in v for p in needs):
                        return _fail("DEPENDENT_REQUIRED", ip, "/dependentRequired", name)
                return _OK

            k(v_depreq)
        if dep_sch:
            ds = {n: self._compile(s, base) for n, s in dep_sch.items()}

            def v_depsch(v, sc, ip, _d=ds):
                if not isinstance(v, dict):
                    return _OK
                out = Outcome(True)
                subs = []
                for name, sub in _d.items():
                    if name in v:
                        r = sub(v, sc, ip)
                        subs.append(r)
                        if not r.ok:
                            out.ok = False
                            out.errors = (out.errors or []) + (r.errors or [])
                _merge_ann(out, subs)
                return out

            k(v_depsch)

        # properties / patternProperties / additionalProperties / propertyNames
        if any(x in sch for x in ("properties", "patternProperties", "additionalProperties", "propertyNames")):
            k(self._props_validator(sch, base))

        # ---- arrays ---------------------------------------------------
        if "minItems" in sch:
            n = sch["minItems"]

            def v_mini(v, sc, ip, _n=n):
                if not isinstance(v, list) or len(v) >= _n:
                    return _OK
                return _fail("MIN_ITEMS", ip, "/minItems", _n, len(v))

            k(v_mini)
        if "maxItems" in sch:
            n = sch["maxItems"]

            def v_maxi(v, sc, ip, _n=n):
                if not isinstance(v, list) or len(v) <= _n:
                    return _OK
                return _fail("MAX_ITEMS", ip, "/maxItems", _n, len(v))

            k(v_maxi)
        if sch.get("uniqueItems") is True:

            def v_uni(v, sc, ip):
                if not isinstance(v, list):
                    return _OK
                seen = set()
                for x in v:
                    ck = canonical_key(x)
                    if ck in seen:
                        return _fail("UNIQUE_ITEMS", ip, "/uniqueItems", json.dumps(x, default=str))
                    seen.add(ck)
                return _OK

            k(v_uni)
        if any(x in sch for x in ("items", "prefixItems", "additionalItems")):
            k(self._items_validator(sch, base))
        if "contains" in sch:
            k(self._contains_validator(sch, base))

        # ---- combinators ---------------------------------------------
        if "allOf" in sch:
            subs = [self._compile(s, base) for s in sch["allOf"]]

            def v_allof(v, sc, ip, _subs=subs):
                out = Outcome(True)
                rs = [s(v, sc, ip) for s in _subs]
                for r in rs:
                    if not r.ok:
                        out.ok = False
                        out.errors = (out.errors or []) + (r.errors or [])
                _merge_ann(out, rs)
                return out

            k(v_allof)
        if "anyOf" in sch:
            subs = [self._compile(s, base) for s in sch["anyOf"]]

            def v_anyof(v, sc, ip, _subs=subs):
                rs = [s(v, sc, ip) for s in _subs]
                if not any(r.ok for r in rs):
                    # branch failures ride along as CONTAINER children for
                    # the hierarchy formatter; flat rendering ignores them
                    return Outcome(False, errors=[Violation(
                        "ANY_OF", ip, "/anyOf",
                        children=tuple(tuple(r.errors or ()) for r in rs),
                    )])
                out = Outcome(True)
                _merge_ann(out, rs)
                return out

            k(v_anyof)
        if "oneOf" in sch:
            subs = [self._compile(s, base) for s in sch["oneOf"]]

            def v_oneof(v, sc, ip, _subs=subs):
                rs = [s(v, sc, ip) for s in _subs]
                n_ok = sum(r.ok for r in rs)
                if n_ok == 0:
                    return Outcome(False, errors=[Violation(
                        "ONE_OF_EMPTY", ip, "/oneOf",
                        children=tuple(tuple(r.errors or ()) for r in rs),
                    )])
                if n_ok > 1:
                    return _fail("ONE_OF_MORE_THAN_ONE", ip, "/oneOf")
                out = Outcome(True)
                _merge_ann(out, rs)
                return out

            k(v_oneof)
        if "not" in sch:
            sub = self._compile(sch["not"], base)

            def v_not(v, sc, ip, _s=sub):
                if _s(v, sc, ip).ok:
                    return _fail("NOT", ip, "/not")
                return _OK

            k(v_not)
        if "if" in sch:
            # if/then/else merged into one conditional validator, the analog
            # of IfThenElseCompilerFactory's transformer (…:40-68)
            f_if = self._compile(sch["if"], base)
            f_then = self._compile(sch["then"], base) if "then" in sch else None
            f_else = self._compile(sch["else"], base) if "else" in sch else None

            def v_ite(v, sc, ip, _i=f_if, _t=f_then, _e=f_else):
                ri = _i(v, sc, ip)
                out = Outcome(True)
                if ri.ok:
                    _merge_ann(out, [ri])
                    if _t is not None:
                        rt = _t(v, sc, ip)
                        if not rt.ok:
                            return rt
                        _merge_ann(out, [rt])
                else:
                    if _e is not None:
                        re_ = _e(v, sc, ip)
                        if not re_.ok:
                            return re_
                        _merge_ann(out, [re_])
                return out

            k(v_ite)

        # ---- unevaluated* (run LAST, consume sibling annotations) -----
        unev_p = self._compile(sch["unevaluatedProperties"], base) if "unevaluatedProperties" in sch else None
        unev_i = self._compile(sch["unevaluatedItems"], base) if "unevaluatedItems" in sch else None

        # --------------------------------------------------------------
        def schema_eval(
            v,
            sc,
            ip,
            _vals=tuple(validators),
            _up=unev_p,
            _ui=unev_i,
            _base=base,
        ):
            if not sc or sc[-1] != _base:
                sc = sc + (_base,)
            # fast path: every keyword returned the _OK singleton (no
            # errors, no annotations) and there is no unevaluated* to run —
            # skip the Outcome allocation + merge entirely (the common
            # scalar case; leaf validators all return _OK on success)
            rs = None
            for fn in _vals:
                r = fn(v, sc, ip)
                if r is not _OK:
                    if rs is None:
                        rs = []
                    rs.append(r)
            if rs is None:
                if _up is None and _ui is None:
                    return _OK
                rs = []
            out = Outcome(True)
            for r in rs:
                if not r.ok:
                    out.ok = False
                    out.errors = (out.errors or []) + (r.errors or [])
            _merge_ann(out, rs)
            if _up is not None and isinstance(v, dict):
                ev = out.props or set()
                subs = []
                for name, item in v.items():
                    if name not in ev:
                        r = _up(item, sc, f"{ip}/{_esc(name)}")
                        subs.append(r)
                        if not r.ok:
                            out.ok = False
                            out.errors = (out.errors or []) + (r.errors or [])
                if subs:
                    out.props = set(v.keys()) if all(s.ok for s in subs) else out.props
            if _ui is not None and isinstance(v, list) and out.items is not ALL:
                ev_i = out.items or set()
                bad = False
                for i, item in enumerate(v):
                    if i not in ev_i:
                        r = _ui(item, sc, f"{ip}/{i}")
                        if not r.ok:
                            bad = True
                            out.ok = False
                            out.errors = (out.errors or []) + (r.errors or [])
                if not bad:
                    out.items = ALL
            return out

        return schema_eval

    def _wrap_scope(self, fn: Evaluator, base: str) -> Evaluator:
        def wrapped(v, sc, ip, _fn=fn, _b=base):
            if not sc or sc[-1] != _b:
                sc = sc + (_b,)
            return _fn(v, sc, ip)

        return wrapped

    # ----------------------------------------------------- object sub-eval

    def _props_validator(self, sch: dict, base: str) -> Evaluator:
        props = {n: self._compile(s, base) for n, s in sch.get("properties", {}).items()}
        pats = [
            (self._re_compile(p), self._compile(s, base))
            for p, s in sch.get("patternProperties", {}).items()
        ]
        addl = self._compile(sch["additionalProperties"], base) if "additionalProperties" in sch else None
        pnames = self._compile(sch["propertyNames"], base) if "propertyNames" in sch else None

        def v_props(v, sc, ip, _props=props, _pats=pats, _addl=addl, _pn=pnames):
            if not isinstance(v, dict):
                return _OK
            out = Outcome(True, props=set())
            for name, item in v.items():
                iptr = f"{ip}/{_esc(name)}"
                matched = False
                if _pn is not None:
                    r = _pn(name, sc, iptr)
                    if not r.ok:
                        out.ok = False
                        out.errors = (out.errors or []) + (r.errors or [])
                sub = _props.get(name)
                if sub is not None:
                    matched = True
                    r = sub(item, sc, iptr)
                    if not r.ok:
                        out.ok = False
                        out.errors = (out.errors or []) + (r.errors or [])
                for rx, pfn in _pats:
                    if rx.search(name):
                        matched = True
                        r = pfn(item, sc, iptr)
                        if not r.ok:
                            out.ok = False
                            out.errors = (out.errors or []) + (r.errors or [])
                if matched:
                    out.props.add(name)
                elif _addl is not None:
                    r = _addl(item, sc, iptr)
                    out.props.add(name)
                    if not r.ok:
                        out.ok = False
                        out.errors = (out.errors or []) + (r.errors or [])
            return out

        return v_props

    # ------------------------------------------------------ array sub-eval

    def _items_validator(self, sch: dict, base: str) -> Evaluator:
        dialect = self.dialect
        prefix: list[Evaluator] = []
        rest: Evaluator | None = None
        if dialect == "2020-12":
            prefix = [self._compile(s, base) for s in sch.get("prefixItems", [])]
            if "items" in sch:
                rest = self._compile(sch["items"], base)
        else:  # 2019-09 / draft-07: items schema-or-array + additionalItems
            items = sch.get("items")
            if isinstance(items, list):
                prefix = [self._compile(s, base) for s in items]
                if "additionalItems" in sch:
                    rest = self._compile(sch["additionalItems"], base)
            elif items is not None:
                rest = self._compile(items, base)

        coerce_obj = self.treat_object_as_array

        def v_items(v, sc, ip, _pre=tuple(prefix), _rest=rest, _co=coerce_obj):
            if _co and isinstance(v, dict):
                v = list(v.values())
            if not isinstance(v, list):
                return _OK
            out = Outcome(True, items=set())
            for i, item in enumerate(v):
                iptr = f"{ip}/{i}"
                if i < len(_pre):
                    r = _pre[i](item, sc, iptr)
                elif _rest is not None:
                    r = _rest(item, sc, iptr)
                else:
                    continue
                out.items.add(i)
                if not r.ok:
                    out.ok = False
                    out.errors = (out.errors or []) + (r.errors or [])
            if _rest is not None and len(v) >= len(_pre):
                out.items = ALL
            return out

        return v_items

    def _contains_validator(self, sch: dict, base: str) -> Evaluator:
        sub = self._compile(sch["contains"], base)
        cmin = sch.get("minContains", 1)
        cmax = sch.get("maxContains")
        if self.dialect == "draft7":
            cmin, cmax = 1, None  # draft-07 has no min/maxContains

        def v_contains(v, sc, ip, _s=sub, _min=cmin, _max=cmax):
            if not isinstance(v, list):
                return _OK
            hits = {i for i, item in enumerate(v) if _s(item, sc, f"{ip}/{i}").ok}
            n = len(hits)
            if n < _min:
                return _fail("CONTAINS_MIN", ip, "/contains", _min, n)
            if _max is not None and n > _max:
                return _fail("CONTAINS_MAX", ip, "/contains", _max, n)
            return Outcome(True, items=hits)

        return v_contains

    # -------------------------------------------------------- content chain

    def _content_validator(self, sch: dict, base: str) -> Evaluator:
        enc = sch.get("contentEncoding")
        mtype = sch.get("contentMediaType")
        csub = (
            self._compile(sch["contentSchema"], base)
            if "contentSchema" in sch and self.content_processing == "encoding_and_schema"
            else None
        )

        custom_decode = (
            self.content_encodings.get(enc.lower()) if isinstance(enc, str) else None
        )
        custom_check = None
        if mtype is not None:
            for pred, check in self.content_media_types:
                try:
                    matches = pred(mtype)
                except Exception:
                    matches = False
                if matches:
                    custom_check = check
                    break

        def decode(s: str):
            # custom codec overrides the built-in decoder for its name
            # (SchemaBuilder.addContentEncodingValidator: "Add custom or
            # replace default", js/SchemaBuilder.java:180-194); the fn
            # returns the decoded value or raises on invalid input,
            # mirroring ExceptionableOp
            if custom_decode is not None:
                out = custom_decode(s)
                return out if isinstance(out, (bytes, bytearray)) else str(out).encode()
            if enc == "base64":
                return base64.b64decode(s, validate=True)
            if enc in (None, "7bit", "8bit", "binary"):
                return s.encode()
            if enc == "quoted-printable":
                import quopri

                return quopri.decodestring(s.encode())
            # unknown encoding with no registered codec: identity
            # (ContentUtils.IDENTITY fallback, ContentUtils.java:24,35-41)
            return s.encode()

        def v_content(v, sc, ip, _m=mtype, _cs=csub):
            if not isinstance(v, str):
                return _OK
            try:
                raw = decode(v)
            except Exception:
                return _fail("CONTENT_ENCODING", ip, "/contentEncoding", enc)
            # chain order: encoding -> media type -> contentSchema
            # (ContentUtils.prepareValidation, ContentUtils.java:27-87)
            if custom_check is not None:
                try:
                    custom_check(raw)
                except Exception:
                    return _fail("CONTENT_TYPE", ip, "/contentMediaType", _m)
            if (_m == "application/json" and custom_check is None) or _cs is not None:
                try:
                    parsed = json.loads(raw.decode("utf-8"), parse_float=Fraction)
                except (ValueError, UnicodeDecodeError):
                    if _m is not None and custom_check is None:
                        return _fail("CONTENT_TYPE", ip, "/contentMediaType", _m)
                    if _cs is not None and custom_check is not None:
                        # media type vouched for by the custom check but the
                        # payload is not JSON -> the contentSchema step fails
                        return _fail("CONTENT_SCHEMA", ip, "/contentSchema")
                    return _OK
                if _cs is not None and not _cs(parsed, sc, ip).ok:
                    return _fail("CONTENT_SCHEMA", ip, "/contentSchema")
            return _OK

        return v_content


def compile_schema(
    schema: Any,
    dialect: str | None = None,
    formats_assert: bool = False,
    registry: SchemaRegistry | None = None,
    **opts,
) -> CompiledSchema:
    """Convenience one-shot compile (``SchemaBuilder`` default path).
    ``dialect=None`` auto-detects from the root ``$schema`` (2020-12
    fallback); pass a dialect to force one."""
    return DynamicCompiler(
        registry=registry, dialect=dialect, formats_assert=formats_assert, **opts
    ).compile(schema)
