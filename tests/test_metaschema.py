"""Validate *schemas themselves* against the embedded official meta-schemas.

The reference ships the json-schema.org meta-schemas inside its jar and
resolves spec URIs against that copy
(``js/loaders/OriginalSpecResolver.java:229-296``,
``src/main/resources/dialects.zip``; test:
``loaders/OriginalSpecResolverTest.java``).  This battery compiles the
vendored 2020-12 / 2019-09 / draft-07 meta-schemas with the in-repo
dynamic compiler and checks schema-document verdicts against the
independent ``jsonschema`` implementation.

Why this matters beyond parity: the 2020-12 meta-schema is the heaviest
public exercise of ``$dynamicRef``/``$dynamicAnchor`` (every subschema
position recurses through ``{"$dynamicRef": "#meta"}`` across seven
vocabulary resources, each a separate ``$id`` with its own
``$dynamicAnchor: "meta"``), and 2019-09's of ``$recursiveRef`` — the two
zones the generative differential battery excludes by construction
(tests/test_differential_jsonschema.py docstring).
"""

from __future__ import annotations

import random

import pytest

jsonschema = pytest.importorskip("jsonschema")

from json_schema_ray.builder import ConstraintEngineBuilder  # noqa: E402
from json_schema_ray.kernels.dynamic import DynamicCompiler  # noqa: E402
from json_schema_ray.spec.official import (  # noqa: E402
    METASCHEMA_URIS,
    official_metaschemas,
    register_official_metaschemas,
)
from json_schema_ray.spec.schema import SchemaRegistry  # noqa: E402

VALIDATORS = {
    "draft7": jsonschema.Draft7Validator,
    "2019-09": jsonschema.Draft201909Validator,
    "2020-12": jsonschema.Draft202012Validator,
}


def _compiled_metaschema(dialect: str):
    reg = SchemaRegistry()
    register_official_metaschemas(reg)
    uri = METASCHEMA_URIS[dialect]
    comp = DynamicCompiler(registry=reg, dialect=dialect)
    return comp.compile(official_metaschemas()[uri], uri=uri)


# schema documents whose validity differs across keywords/drafts on purpose
HAND_CASES = [
    {"type": "string"},
    {"type": ["integer", "null"]},
    {"type": 12},
    {"type": ["integer", 5]},
    {"type": "everything"},
    {"properties": []},
    {"properties": {"a": {"type": "object"}}},
    {"required": "x"},
    {"required": ["x", "x"]},  # uniqueItems on required
    {"multipleOf": 0},  # exclusiveMinimum: 0
    {"multipleOf": -3},
    {"maxLength": -1},
    {"minLength": 0.5},
    {"enum": "nope"},
    {"enum": []},
    {"const": None},
    {"$defs": {"a": {"type": 3}}},  # invalid only via $dynamicRef/$recursiveRef recursion
    {"definitions": {"a": {"type": 3}}},
    {"allOf": [{"properties": {"x": {"prefixItems": [{"type": "bananas"}]}}}]},
    {"allOf": []},  # minItems: 1 on the applicator lists
    {"anyOf": [True, False]},
    {"items": [{"type": "string"}]},  # array form: valid <2020-12, invalid at 2020-12
    {"items": {"type": "string"}},
    {"prefixItems": [{"type": "string"}]},  # unknown keyword below 2020-12 → annotation, valid
    True,
    False,
    {"if": {"pattern": 5}},
    {"exclusiveMinimum": True},  # boolean form: valid draft-04 only
    {"exclusiveMaximum": 3.5},
    {"$ref": 7},
    {"$ref": "#/$defs/x"},  # format uri-reference is annotation-only: valid
    {"oneOf": []},
    {"not": {"not": {"not": 42}}},
    {"unevaluatedProperties": {"minProperties": -2}},
    {"dependencies": {"a": ["b"], "c": {"type": "null"}}},
    {"dependentRequired": {"a": "b"}},
    {"dependentSchemas": {"a": {"minProperties": "x"}}},
    {"patternProperties": {"^a": {"maximum": "high"}}},
    {"additionalProperties": {"contains": {"contains": {"minContains": -1}}}},
    {"propertyNames": {"maxLength": "long"}},
    {"uniqueItems": "yes"},
    {"default": {"anything": ["goes", 1, None]}},  # meta-data values are unconstrained
    {"title": 42},
    {"examples": {"not": "an array"}},
    {"$comment": ["not", "a", "string"]},
    {"format": 12},
    {"contentEncoding": ["base64"]},
    {"contentSchema": {"type": []}},  # type array minItems 1
    {"$anchor": "0bad-anchor!"},  # pattern-constrained in 2019+/2020
    {"$anchor": "good-anchor"},
    {"$vocabulary": {"https://example.com/vocab": "yes"}},  # values must be boolean
    {"$defs": {"": {"type": "string"}}},  # empty key is legal
    {"then": {"else": {"if": {"then": 3}}}},
    {"minProperties": -1},
    {"maxContains": 2.0},  # nonNegativeInteger: 2.0 is an integer per JSON rules
    {"maxContains": 2.5},
]


@pytest.mark.parametrize("dialect", list(VALIDATORS))
def test_metaschema_hand_battery(dialect):
    cs = _compiled_metaschema(dialect)
    jv = VALIDATORS[dialect]
    mismatches = []
    for case in HAND_CASES:
        ours = cs.is_valid(case)
        theirs = jv(jv.META_SCHEMA).is_valid(case)
        if ours != theirs:
            mismatches.append((case, ours, theirs))
    assert not mismatches, mismatches


@pytest.mark.parametrize("dialect", list(VALIDATORS))
def test_metaschema_generative_battery(dialect):
    """Schemas from the differential generator are valid schema documents;
    seeded mutations (wrong-typed keyword values spliced at random paths)
    are usually not.  Both kinds are judged by our compiled meta-schema and
    by jsonschema's, and the verdicts must agree on every document."""
    from tests.test_differential_jsonschema import _schema

    cs = _compiled_metaschema(dialect)
    jv = VALIDATORS[dialect]
    meta = jv(jv.META_SCHEMA)
    rng = random.Random(20260817)
    bad_values = [12, "nope", [5], {"type": 9}, -1, None, True]
    n_checked = n_invalid = 0
    mismatches = []
    for _ in range(120):
        doc = _schema(rng, dialect)
        docs = [doc]
        if isinstance(doc, dict) and doc:
            # mutate: replace one keyword's value with a junk value
            mut = dict(doc)
            k = rng.choice(sorted(mut))
            mut[k] = rng.choice(bad_values)
            docs.append(mut)
        for d in docs:
            ours, theirs = cs.is_valid(d), meta.is_valid(d)
            n_checked += 1
            n_invalid += not theirs
            if ours != theirs:
                mismatches.append((d, ours, theirs))
    assert not mismatches, mismatches[:5]
    # the battery must actually exercise both verdict classes
    assert n_invalid > 10
    assert n_checked - n_invalid > 10


def test_ref_to_spec_uri_resolves_embedded():
    """The OriginalSpecResolver use case: a user schema $ref-ing the public
    2020-12 meta-schema URI compiles offline via the embedded copy."""
    b = ConstraintEngineBuilder().use_official_metaschemas()
    cs = b.compile(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "type": "object",
            "properties": {"schema": {"$ref": "https://json-schema.org/draft/2020-12/schema"}},
            "required": ["schema"],
        }
    )
    assert cs.is_valid({"schema": {"type": "string"}})
    assert not cs.is_valid({"schema": {"type": 12}})
    # recursion through the embedded metaschema's $dynamicRef
    assert not cs.is_valid({"schema": {"$defs": {"x": {"enum": "scalar"}}}})


def test_draft7_uri_with_fragment():
    """draft-07's canonical $id carries a trailing '#'; both spellings of
    the URI must resolve."""
    b = ConstraintEngineBuilder().use_official_metaschemas().dialect("draft7")
    for uri in ("http://json-schema.org/draft-07/schema", "http://json-schema.org/draft-07/schema#"):
        cs = b.compile({"$ref": uri})
        assert cs.is_valid({"type": "string"})
        assert not cs.is_valid({"type": 12})


# ---- $vocabulary-driven dialect construction --------------------------------
# DialectResolver.tryApplyVocabularies (js/dialects/DialectResolver.java:53-73)
# + Dialect.isAssertionRequired (js/dialects/Dialect.java:45-49).

_V2020 = "https://json-schema.org/draft/2020-12/vocab/"


def _meta(vocabs: dict, uri: str = "https://example.com/meta/custom") -> dict:
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": uri,
        "$vocabulary": vocabs,
    }


def test_vocabulary_format_assertion_flips_verdict():
    """A custom meta-schema that turns ON the format-assertion vocabulary
    makes `format` assert — same schema, different meta, different verdict."""
    from json_schema_ray.builder import ConstraintEngineBuilder

    uri = "https://example.com/meta/format-strict"
    meta = _meta(
        {
            _V2020 + "core": True,
            _V2020 + "applicator": True,
            _V2020 + "validation": True,
            _V2020 + "format-assertion": True,
        },
        uri,
    )
    sch = {"$schema": uri, "format": "ipv4"}
    strict = ConstraintEngineBuilder().register_schema(uri, meta).compile(sch)
    assert strict.is_valid("127.0.0.1")
    assert not strict.is_valid("999.1.1.1")

    # default 2020-12 (format-annotation): same schema, annotation only
    lax = ConstraintEngineBuilder().compile({"format": "ipv4"})
    assert lax.is_valid("999.1.1.1")


def test_vocabulary_disabled_validation_ignores_keywords():
    """Keywords of vocabularies absent from $vocabulary are not compiled:
    a meta-schema without the validation vocabulary ignores `minimum`
    but still applies applicator subschemas' structure."""
    from json_schema_ray.builder import ConstraintEngineBuilder

    uri = "https://example.com/meta/no-validation"
    meta = _meta(
        {_V2020 + "core": True, _V2020 + "applicator": True},
        uri,
    )
    b = ConstraintEngineBuilder().register_schema(uri, meta)
    cs = b.compile({"$schema": uri, "minimum": 10})
    assert cs.is_valid(5)  # minimum ignored (validation vocab absent)
    # `not` (applicator) still active; its inner `const` (validation) is
    # ignored -> the inner schema matches everything -> `not` fails all
    cs2 = b.compile({"$schema": uri, "not": {"const": 1}})
    assert not cs2.is_valid(99) and not cs2.is_valid(1)
    # sanity: same schemas under the stock dialect behave normally
    assert not ConstraintEngineBuilder().compile({"minimum": 10}).is_valid(5)
    assert ConstraintEngineBuilder().compile({"not": {"const": 1}}).is_valid(99)


def test_vocabulary_unknown_required_raises_optional_dropped():
    from json_schema_ray.builder import ConstraintEngineBuilder

    import pytest

    uri_req = "https://example.com/meta/unknown-required"
    meta_req = _meta(
        {_V2020 + "core": True, "https://example.com/vocab/made-up": True}, uri_req
    )
    b = ConstraintEngineBuilder().register_schema(uri_req, meta_req)
    with pytest.raises(ValueError, match="unknown required vocabulary"):
        b.compile({"$schema": uri_req, "type": "integer"})

    uri_opt = "https://example.com/meta/unknown-optional"
    meta_opt = _meta(
        {
            _V2020 + "core": True,
            _V2020 + "validation": True,
            "https://example.com/vocab/made-up": False,
        },
        uri_opt,
    )
    cs = (
        ConstraintEngineBuilder()
        .register_schema(uri_opt, meta_opt)
        .compile({"$schema": uri_opt, "type": "integer"})
    )
    assert cs.is_valid(3) and not cs.is_valid("x")


def test_vocabulary_unresolvable_schema_uri_falls_back():
    """Documented deviation: unknown unresolvable $schema keeps compiling
    under the 2020-12 default instead of raising (reference throws
    'Unsupported dialect', DialectResolver.java:46)."""
    from json_schema_ray.kernels.dynamic import compile_schema

    cs = compile_schema({"$schema": "https://nowhere.invalid/meta", "minimum": 3})
    assert cs.is_valid(5) and not cs.is_valid(1)
