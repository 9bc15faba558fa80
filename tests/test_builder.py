"""Extension-surface tests (SURVEY.md §2.8): custom formats, regex
flavor, external schema registration, dialects, object-as-array."""

from __future__ import annotations

from json_schema_ray import ConstraintEngineBuilder, compile_schema


def test_custom_format():
    cs = (
        ConstraintEngineBuilder()
        .assert_formats()
        .add_format("even-digits", lambda s: s.isdigit() and int(s) % 2 == 0)
        .compile({"format": "even-digits"})
    )
    assert cs.is_valid("42") and not cs.is_valid("41") and cs.is_valid(7)  # non-string passes


def test_custom_regex_flavor():
    calls = []

    class Rx:
        def __init__(self, p):
            calls.append(p)
            self.p = p

        def search(self, s):
            return s.startswith(self.p)  # silly flavor: literal prefix

    cs = ConstraintEngineBuilder().set_regex_flavor(Rx).compile({"pattern": "ab"})
    assert calls == ["ab"]
    assert cs.is_valid("abc") and not cs.is_valid("zab")


def test_external_schema_registration():
    cs = (
        ConstraintEngineBuilder()
        .register_schema("https://ext.test/positive", {"type": "integer", "minimum": 1})
        .compile({"$ref": "https://ext.test/positive"})
    )
    assert cs.is_valid(5) and not cs.is_valid(0) and not cs.is_valid("x")


def test_unresolvable_ref_raises_at_compile():
    import pytest

    with pytest.raises(KeyError):
        ConstraintEngineBuilder().compile({"$ref": "https://nowhere.test/x"})


def test_dialect_draft7_ref_supersedes():
    cs = (
        ConstraintEngineBuilder()
        .dialect("draft7")
        .compile({"$ref": "#/definitions/t", "maximum": 1, "definitions": {"t": {"type": "integer"}}})
    )
    assert cs.is_valid(100)  # sibling maximum ignored under draft7


def test_treat_object_as_array():
    cs = (
        ConstraintEngineBuilder()
        .treat_object_as_array()
        .compile({"items": {"type": "integer"}})
    )
    assert cs.is_valid({"a": 1, "b": 2})
    assert not cs.is_valid({"a": 1, "b": "x"})
    # default behavior: objects are not arrays → items ignores them
    assert compile_schema({"items": {"type": "integer"}}).is_valid({"a": "x"})


def test_content_processing_modes():
    b64 = {"contentEncoding": "base64"}
    assert ConstraintEngineBuilder().compile(b64).is_valid("!!!")  # 2020-12 default: annotation
    strict = ConstraintEngineBuilder().set_content_processing("encoding").compile(b64)
    assert not strict.is_valid("!!!") and strict.is_valid("aGk=")


def test_file_loader_and_dialect_detection(tmp_path):
    """ReadmeGists-style: $ref hits a file: resource (lazy compile-time
    loader) and $schema selects draft7 behavior ($ref supersedes
    siblings) without an explicit dialect= (VERDICT r1 item 6)."""
    import json

    from json_schema_ray.builder import ConstraintEngineBuilder
    from json_schema_ray.kernels.dynamic import compile_schema, detect_dialect

    ext = tmp_path / "positive_int.json"
    ext.write_text(json.dumps({"type": "integer", "minimum": 1}))

    cs = ConstraintEngineBuilder().compile(
        {"properties": {"n": {"$ref": ext.as_uri()}}, "required": ["n"]}
    )
    assert cs.apply('{"n": 5}').ok
    assert not cs.apply('{"n": 0}').ok
    assert not cs.apply('{}').ok

    # $schema auto-detection: draft7 → $ref supersedes sibling keywords
    d7 = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "definitions": {"anyint": {"type": "integer"}},
        "$ref": "#/definitions/anyint",
        "minimum": 100,  # ignored: draft7 $ref supersedes siblings
    }
    cs7 = compile_schema(d7)
    assert cs7.apply("5").ok  # sibling minimum ignored under draft7
    # same schema under 2020-12 semantics: siblings apply
    cs20 = compile_schema({**d7, "$schema": "https://json-schema.org/draft/2020-12/schema",
                           "$defs": d7["definitions"]})
    assert not cs20.apply("5").ok
    assert cs20.apply("150").ok

    assert detect_dialect("https://json-schema.org/draft/2019-09/schema") == "2019-09"
    assert detect_dialect("urn:whatever") is None

    # unknown scheme without loader still fails loudly
    import pytest as _pytest

    with _pytest.raises(KeyError):
        ConstraintEngineBuilder().compile({"$ref": "classpath://nope/x.json"})


def test_custom_content_encoding_base32():
    """add_content_encoding: base32 codec plugs into the chain
    (encoding -> media type -> contentSchema, ContentUtils.java:27-87) —
    both the decode-validity path and the decoded-value flow into
    contentSchema."""
    import base64 as b64mod
    import json as jsonmod

    def base32_decode(s: str) -> bytes:
        return b64mod.b32decode(s, casefold=False)

    eng = (
        ConstraintEngineBuilder()
        .add_content_encoding("base32", base32_decode)
        .set_content_processing("encoding_and_schema")
    )
    enc_only = eng.compile({"contentEncoding": "base32"})
    payload = b64mod.b32encode(b"hello").decode()
    assert enc_only.is_valid(payload)
    assert not enc_only.is_valid("not-base32!!!")
    assert enc_only.is_valid(123)  # non-strings pass

    # decoded bytes feed contentSchema (JSON parse of the decoded value)
    doc = b64mod.b32encode(jsonmod.dumps({"n": 5}).encode()).decode()
    chained = eng.compile(
        {
            "contentEncoding": "base32",
            "contentMediaType": "application/json",
            "contentSchema": {"required": ["n"], "properties": {"n": {"minimum": 3}}},
        }
    )
    assert chained.is_valid(doc)
    bad = b64mod.b32encode(jsonmod.dumps({"n": 1}).encode()).decode()
    out = chained.evaluate(bad)
    assert not out.ok and any("contentSchema" in str(v) or "CONTENT_SCHEMA" in str(v) for v in out.errors)


def test_custom_content_media_type_and_override():
    """add_content_media_type: exact-name (case-insensitive) and predicate
    registration; check_fn raising fails CONTENT_TYPE.  Registering a
    built-in encoding name replaces the default decoder."""

    def require_magic(raw: bytes) -> None:
        if not raw.startswith(b"MAGIC"):
            raise ValueError("bad payload")

    eng = (
        ConstraintEngineBuilder()
        .add_content_media_type("application/x-magic", require_magic)
        .set_content_processing("encoding")
    )
    cs = eng.compile({"contentMediaType": "application/X-Magic"})
    assert cs.is_valid("MAGIC payload")
    assert not cs.is_valid("no magic here")

    # predicate form: any vendor subtype
    eng2 = (
        ConstraintEngineBuilder()
        .add_content_media_type(lambda m: m.startswith("application/vnd."), require_magic)
        .set_content_processing("encoding")
    )
    cs2 = eng2.compile({"contentMediaType": "application/vnd.acme+blob"})
    assert cs2.is_valid("MAGICstuff") and not cs2.is_valid("nope")
    # unmatched media types keep default behavior (no validator -> pass)
    cs3 = eng2.compile({"contentMediaType": "text/unknown-thing"})
    assert cs3.is_valid("anything")

    # replacing a BUILT-IN codec: base64 that only accepts urlsafe alphabet
    import base64 as b64mod

    eng4 = (
        ConstraintEngineBuilder()
        .add_content_encoding("BASE64", lambda s: b64mod.urlsafe_b64decode(s))
        .set_content_processing("encoding")
    )
    cs4 = eng4.compile({"contentEncoding": "base64"})
    assert cs4.is_valid(b64mod.urlsafe_b64encode(b"\xfb\xff").decode())
