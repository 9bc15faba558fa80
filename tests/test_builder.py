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
