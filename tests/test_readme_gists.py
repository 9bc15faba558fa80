"""README-gist parity: every usage example the reference's README
documents (``/root/reference/README.md:79-288``, mirrored by its
``compilers/ReadmeGistsTest.java``) re-expressed through this engine's
builder API — same schemas, same instances, same verdicts."""

from __future__ import annotations

from json_schema_ray.builder import ConstraintEngineBuilder

ARRAY_OF_INT = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "array",
    "items": {"type": "integer"},
}
JSON_OK = "[1,2,3,4,5,6,7,8]"


def test_compile_once_apply():
    compiled = ConstraintEngineBuilder().compile(ARRAY_OF_INT)
    assert compiled.apply(JSON_OK).ok
    # fluent one-shot
    assert ConstraintEngineBuilder().compile(ARRAY_OF_INT).apply(JSON_OK).ok
    assert not ConstraintEngineBuilder().compile(ARRAY_OF_INT).apply('[1, "x"]').ok


def test_own_resource_loader():
    """addResourceLoader("urn", ...) analog: a custom scheme loader feeds
    lazy $ref resolution at compile time."""
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "array",
        "items": {"$ref": "urn:uuid:fd823a01-2ef5-4091-b36a-a117ecfa8827"},
    }
    cs = (
        ConstraintEngineBuilder()
        .register_loader("urn", lambda uri: {"type": "integer"})
        .compile(schema)
    )
    assert cs.apply(JSON_OK).ok
    assert not cs.apply('["x"]').ok


def test_mapping_id_to_schema():
    """addMappingIdToSchema analog: identifier resolves straight to a
    pre-registered schema."""
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "array",
        "items": {"$ref": "someIdentifier"},
    }
    cs = (
        ConstraintEngineBuilder()
        .register_schema("someIdentifier", {"type": "integer"})
        .compile(schema)
    )
    assert cs.apply(JSON_OK).ok


def test_mapping_id_to_uri_with_loader():
    """addMappingIdToURI + loader analog: opaque ref → aliased URI →
    custom scheme loader."""
    middle = "urn:uuid:fd823a01-2ef5-4091-b36a-a117ecfa8827"
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "array",
        "items": {"$ref": "someRef"},
    }
    cs = (
        ConstraintEngineBuilder()
        .map_ref("someRef", middle)
        .register_loader("urn", lambda uri: {"type": "integer"} if uri == middle else None)
        .compile(schema)
    )
    assert cs.apply(JSON_OK).ok
    assert not cs.apply('[1.5]').ok


def test_custom_format_validator():
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "format": "thousandNumber",
    }
    cs = (
        ConstraintEngineBuilder()
        .dialect("2020-12")
        .assert_formats(True)
        .add_format("thousandNumber", lambda s: s == "1000")
        .compile(schema)
    )
    assert cs.apply('"1000"').ok
    assert not cs.apply('"1001"').ok


def test_content_vocabulary_levels():
    """The four content-processing levels, exactly the README walkthrough:
    MQ!== invalid base64, MQ== encodes 1 (not a JSON string), IjEi
    encodes \"1\"."""
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "contentEncoding": "base64",
        "contentMediaType": "application/json",
        "contentSchema": {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "type": "string",
        },
    }
    invalid_encoding = '"MQ!=="'
    valid_encoding = '"MQ=="'
    valid_encoding_and_schema = '"IjEi"'

    disabled = ConstraintEngineBuilder().set_content_processing("disable").compile(schema)
    assert disabled.apply(invalid_encoding).ok  # validations do not apply

    # 2020-12 DEFAULT: content keywords are annotation-only
    default = ConstraintEngineBuilder().compile(schema)
    assert default.apply(invalid_encoding).ok

    enc = ConstraintEngineBuilder().set_content_processing("encoding").compile(schema)
    assert not enc.apply(invalid_encoding).ok
    assert enc.apply(valid_encoding).ok  # contentSchema not checked

    full = ConstraintEngineBuilder().set_content_processing("encoding_and_schema").compile(schema)
    assert not full.apply(valid_encoding).ok  # 1 is not a JSON string
    assert full.apply(valid_encoding_and_schema).ok


def test_explain_hierarchy_for_nested_oneof_failure():
    """README gist: CompiledSchema.explain pretty-prints the failure tree
    for a nested oneOf (hierarchyFormat analog,
    ValidationResultFactory.java:240-262) — containers per instance
    pointer, branch alternatives nested, rendered messages on leaves."""
    from json_schema_ray.kernels.dynamic import compile_schema

    cs = compile_schema(
        {
            "type": "object",
            "required": ["payload"],
            "properties": {
                "payload": {
                    "oneOf": [
                        {"type": "integer", "minimum": 10},
                        {"type": "object", "required": ["kind"],
                         "properties": {"kind": {"enum": ["a", "b"]}}},
                    ]
                }
            },
        }
    )
    assert cs.explain({"payload": {"kind": "zz"}}).splitlines()[0].startswith("CONT-ERR")
    tree = cs.explain({"payload": {"kind": "zz"}})
    # container for the instance pointer of the failing member
    assert "CONT-ERR /payload" in tree
    # the oneOf leaf with both branch containers and their inner errors
    assert "ONE_OF_EMPTY" in tree
    assert "branch[0]" in tree and "branch[1]" in tree
    assert "MINIMUM" in tree or "TYPE" in tree  # branch-0 detail
    assert "ENUM" in tree  # branch-1 detail
    # indentation really nests (tabs per level, reference format)
    lines = tree.splitlines()
    assert any(l.startswith("\t\t") for l in lines)
    # valid instances print OK
    assert cs.explain({"payload": 12}) == "OK\n"
