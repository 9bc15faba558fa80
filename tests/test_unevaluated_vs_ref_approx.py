"""Spec-pinned verdicts where `jsonschema` 4.x's LEGACY 2019-09
`unevaluatedProperties` diverges from the specification.

Found by an extended fuzz session (tools/fuzz_differential.py, seeds
300000+): jsonschema's `_legacy_keywords.find_evaluated_property_keys_by_schema`
marks an instance property as evaluated by a schema-valued
`additionalProperties` only when the property NAME appears among the
subschema's keyword keys (`for property in schema_value: if property in
instance`) — a static approximation.  Per 2019-09 §9.3.2.3 + §11,
`additionalProperties` annotates every property it successfully applies
to, so such properties are NOT "unevaluated".

Evidence that the engine is right and the reference library is the
outlier: `unevaluatedProperties` semantics are identical in 2020-12, and
jsonschema's MODERN (2020-12) implementation agrees with this engine on
the same schema/instance pairs — asserted below for every case whose
keywords mean the same in both drafts.

These pins keep the divergence zone visible: if a refactor of the
annotation flow (kernels/dynamic.py props validator) regresses, these
flip before any fuzz session does.
"""

from __future__ import annotations

import pytest

jsonschema = pytest.importorskip("jsonschema")

from json_schema_ray.kernels.dynamic import DynamicCompiler  # noqa: E402

URI_2019 = "https://json-schema.org/draft/2019-09/schema"

# (schema, instance) — all VALID per spec: every instance property is
# evaluated by a passing schema-valued additionalProperties, so
# unevaluatedProperties applies to nothing.
CASES = [
    # fuzz seed 306747: additionalProperties evaluates r and q
    (
        {
            "allOf": [{"properties": {"p": True}}],
            "unevaluatedProperties": {"type": "integer"},
            "required": ["r", "q"],
            "additionalProperties": {
                "not": {"type": "number", "if": {"type": "integer"}},
                "minimum": 2.5,
                "exclusiveMaximum": 7,
            },
        },
        {"r": [2, 1, 0, "Ab1"], "q": {"r": -0.25, "q": None, "s": 3}},
    ),
    # fuzz seed 310127: "s" matches neither patternProperties nor any
    # properties, passes additionalProperties (non-string: minLength and
    # annotation-only format vacuous) -> evaluated
    (
        {
            "allOf": [{"properties": {"q": True}}],
            "unevaluatedProperties": {"type": "string"},
            "minLength": 1,
            "maxLength": 4,
            "pattern": "[0-9]{2}",
            "required": ["s"],
            "additionalProperties": {"minLength": 3, "format": "date-time"},
            "patternProperties": {
                "b$": {"format": "email", "type": "boolean", "minItems": 1}
            },
            "dependentRequired": {"p": ["q"]},
        },
        {"s": True},
    ),
    # fuzz seed 305082: "s" passes additionalProperties (object: numeric
    # bounds and annotation-only format vacuous) -> evaluated
    (
        {
            "properties": {
                "r": {
                    "enum": [False, "a b"],
                    "minLength": 3,
                    "allOf": [
                        {
                            "minLength": 3,
                            "maxLength": 8,
                            "pattern": "l+o",
                            "anyOf": [{"type": "string"}, True, True],
                        }
                    ],
                },
                "q": {
                    "format": "ipv4",
                    "enum": [-5, 1, {"r": 2}, False],
                    "const": 1,
                },
            },
            "required": ["s"],
            "additionalProperties": {
                "format": "email",
                "exclusiveMinimum": -5,
                "maximum": 2,
            },
            "patternProperties": {
                "^a": {
                    "not": {"format": "uuid", "minItems": 3, "maxItems": 2},
                    "properties": {
                        "p": {
                            "maxItems": 2,
                            "minimum": -1,
                            "exclusiveMaximum": 10,
                            "multipleOf": 1,
                            "enum": ["hello world", "ab"],
                        }
                    },
                    "required": ["q", "r"],
                }
            },
            "propertyNames": {"pattern": "^[a-z ]*$"},
            "allOf": [{"properties": {"q": True}}],
            "unevaluatedProperties": {"type": "string"},
        },
        {"s": {"r": -0.25}},
    ),
]


@pytest.mark.parametrize("case_i", range(len(CASES)))
def test_additional_properties_annotations_feed_unevaluated(case_i):
    sch, inst = CASES[case_i]
    cs = DynamicCompiler(dialect="2019-09").compile({**sch, "$schema": URI_2019})
    assert cs.is_valid(inst), (
        "spec: properties evaluated by a passing schema-valued "
        "additionalProperties are not 'unevaluated'"
    )
    # the reference library's legacy path disagrees (the documented
    # approximation this file pins) ...
    assert not jsonschema.Draft201909Validator(sch).is_valid(inst)


@pytest.mark.parametrize("case_i", [0, 1])
def test_modern_reference_implementation_agrees(case_i):
    """Cases 0 and 1 use only keywords whose meaning is identical in
    2020-12 (no positional items etc.), so jsonschema's modern
    annotation-correct path is a valid second opinion: it returns VALID,
    matching this engine against its own legacy path."""
    sch, inst = CASES[case_i]
    assert jsonschema.Draft202012Validator(sch).is_valid(inst)
    cs = DynamicCompiler(dialect="2020-12").compile(
        {**sch, "$schema": "https://json-schema.org/draft/2020-12/schema"}
    )
    assert cs.is_valid(inst)
