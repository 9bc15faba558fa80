"""Generate the conformance corpus under tests/conformance/.

Cases are adapted from the public JSON-Schema-Test-Suite layout consumed
by the reference's harness
(``/root/reference/src/test/java/.../compilers/JsonSchemaTestDataProvider.java:26-47``):
one file per keyword, each file a list of groups
``{description, schema, tests: [{description, data, valid}]}``.
Optional per-group extensions: ``dialect`` ("2020-12" default, "2019-09",
"draft7"), ``formats_assert`` (bool), ``content`` (content-processing mode).

Run: ``python tools/gen_conformance.py`` (idempotent; rewrites files).
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "conformance")


def g(desc, schema, *tests, **kw):
    return {
        "description": desc,
        "schema": schema,
        "tests": [{"description": d, "data": v, "valid": ok} for d, v, ok in tests],
        **kw,
    }


FILES: dict[str, list] = {}

FILES["type"] = [
    g("integer type", {"type": "integer"},
      ("an integer", 1, True), ("a float with zero frac is an integer", 1.0, True),
      ("a float", 1.1, False), ("a string", "foo", False), ("a string int", "1", False),
      ("an object", {}, False), ("an array", [], False), ("a bool", True, False), ("null", None, False)),
    g("number type", {"type": "number"},
      ("an integer", 1, True), ("a float", 1.1, True), ("a string", "x", False), ("a bool", True, False)),
    g("string type", {"type": "string"},
      ("a string", "foo", True), ("an empty string", "", True), ("a number", 1, False), ("null", None, False)),
    g("object type", {"type": "object"},
      ("an object", {"a": 1}, True), ("an array", [1], False), ("null", None, False), ("a string", "{}", False)),
    g("array type", {"type": "array"},
      ("an array", [1, 2], True), ("an object", {}, False), ("a string", "[]", False)),
    g("boolean type", {"type": "boolean"},
      ("true", True, True), ("false", False, True), ("zero", 0, False), ("one", 1, False), ("empty string", "", False)),
    g("null type", {"type": "null"},
      ("null", None, True), ("zero", 0, False), ("false", False, False), ("empty string", "", False)),
    g("multiple types", {"type": ["integer", "string"]},
      ("an integer", 1, True), ("a string", "foo", True), ("a float", 1.1, False), ("an array", [], False)),
]

FILES["enum"] = [
    g("simple enum", {"enum": [1, 2, 3]},
      ("member", 1, True), ("nonmember", 4, False), ("float member", 1.0, True), ("bool is not 1", True, False)),
    g("heterogeneous enum", {"enum": [6, "foo", [], True, {"foo": 12}]},
      ("int member", 6, True), ("string member", "foo", True), ("empty array member", [], True),
      ("object member", {"foo": 12}, True), ("object non-member", {"foo": 13}, False),
      ("deep numeric-insensitive object", {"foo": 12.0}, True), ("non-member", None, False)),
    g("enum with escaped characters", {"enum": ["foo\nbar", "foo\rbar"]},
      ("member 1", "foo\nbar", True), ("member 2", "foo\rbar", True), ("another string", "abc", False)),
    g("enum with false", {"enum": [False]},
      ("false is valid", False, True), ("float zero is invalid", 0.0, False), ("int zero is invalid", 0, False)),
    g("enum with 0", {"enum": [0]},
      ("false is invalid", False, False), ("int zero ok", 0, True), ("float zero ok", 0.0, True)),
    g("nested enum arrays", {"enum": [["foo", "bar"]]},
      ("exact", ["foo", "bar"], True), ("reordered", ["bar", "foo"], False), ("prefix", ["foo"], False)),
]

FILES["const"] = [
    g("const int", {"const": 2},
      ("same value", 2, True), ("float same value", 2.0, True), ("other value", 5, False), ("string", "2", False)),
    g("const object", {"const": {"foo": "bar", "baz": "bax"}},
      ("same object", {"foo": "bar", "baz": "bax"}, True),
      ("key order irrelevant", {"baz": "bax", "foo": "bar"}, True),
      ("another object", {"foo": "bar"}, False), ("another type", [1, 2], False)),
    g("const array", {"const": [{"foo": "bar"}]},
      ("same array", [{"foo": "bar"}], True), ("other array", [2], False)),
    g("const null", {"const": None},
      ("null", None, True), ("zero", 0, False), ("false", False, False)),
    g("const false does not match 0", {"const": False},
      ("false ok", False, True), ("0 no", 0, False), ("0.0 no", 0.0, False)),
    g("const 1 does not match true", {"const": 1},
      ("true no", True, False), ("1 ok", 1, True), ("1.0 ok", 1.0, True)),
]

FILES["minimum"] = [
    g("minimum", {"minimum": 1.1},
      ("above", 2.6, True), ("boundary", 1.1, True), ("below", 0.6, False),
      ("ignores strings", "x", True), ("ignores non-numbers", None, True)),
    g("minimum with signed integer", {"minimum": -2},
      ("-1 ok", -1, True), ("-2 boundary ok", -2, True), ("-2.0 ok", -2.0, True),
      ("-2.0001 below", -2.0001, False), ("-3 below", -3, False), ("ignores string", "x", True)),
]

FILES["maximum"] = [
    g("maximum", {"maximum": 3.0},
      ("below", 2.6, True), ("boundary", 3.0, True), ("boundary int", 3, True),
      ("above", 3.5, False), ("ignores strings", "x", True)),
    g("maximum with unsigned integer", {"maximum": 300},
      ("299.97 ok", 299.97, True), ("300 ok", 300, True), ("300.5 no", 300.5, False)),
]

FILES["exclusiveMinimum"] = [
    g("exclusiveMinimum", {"exclusiveMinimum": 1.1},
      ("above", 1.2, True), ("boundary", 1.1, False), ("below", 0.6, False), ("ignores strings", "x", True)),
]

FILES["exclusiveMaximum"] = [
    g("exclusiveMaximum", {"exclusiveMaximum": 3.0},
      ("below", 2.2, True), ("boundary", 3.0, False), ("above", 3.5, False), ("ignores strings", "x", True)),
]

FILES["multipleOf"] = [
    g("by int", {"multipleOf": 2},
      ("int multiple", 10, True), ("not multiple", 7, False), ("ignores strings", "foo", True), ("float multiple", 4.0, True)),
    g("by number", {"multipleOf": 1.5},
      ("zero", 0, True), ("4.5", 4.5, True), ("35", 35, False)),
    g("by small number", {"multipleOf": 0.0001},
      ("0.0075", 0.0075, True), ("0.00751", 0.00751, False)),
    g("float division = inf guard", {"type": "integer", "multipleOf": 0.123456789},
      ("big int", 1000000000000000000000000000, False)),
]

FILES["minLength"] = [
    g("minLength", {"minLength": 2},
      ("longer", "foo", True), ("exact", "fo", True), ("too short", "f", False),
      ("ignores non-strings", 1, True), ("counts code points not bytes", "éé", True),
      ("one supplementary code point is length 1", "\U0001F4A9", False)),
]

FILES["maxLength"] = [
    g("maxLength", {"maxLength": 2},
      ("shorter", "f", True), ("exact", "fo", True), ("too long", "foo", False),
      ("ignores non-strings", 100, True), ("two supplementary code points", "\U0001F4A9\U0001F4A9", True)),
]

FILES["pattern"] = [
    g("pattern", {"pattern": "^a*$"},
      ("matches", "aaa", True), ("mismatch", "abc", False), ("ignores non-strings", True, True)),
    g("pattern is a search not full match", {"pattern": "a+"},
      ("contains", "xxaayy", True), ("absent", "xxyy", False)),
    g("pattern with escapes", {"pattern": "^\\d{3}-\\d{2}$"},
      ("matches", "123-45", True), ("no", "12-345", False)),
]

FILES["required"] = [
    g("required", {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
      ("present", {"foo": 1}, True), ("absent", {"bar": 1}, False),
      ("ignores arrays", [], True), ("ignores strings", "", True), ("ignores non-objects", 12, True)),
    g("required with empty array", {"required": []},
      ("anything", {}, True)),
    g("required with escaped characters", {"required": ["foo\nbar", "foo\"bar"]},
      ("both present", {"foo\nbar": 1, "foo\"bar": 2}, True), ("one missing", {"foo\nbar": 1}, False)),
]

FILES["properties"] = [
    g("object properties", {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
      ("both valid", {"foo": 1, "bar": "baz"}, True),
      ("one invalid", {"foo": 1, "bar": {}}, False),
      ("both invalid", {"foo": [], "bar": {}}, False),
      ("doesn't invalidate other props", {"quux": []}, True),
      ("ignores arrays", [], True), ("ignores other non-objects", 12, True)),
    g("properties+patternProperties+additionalProperties interaction",
      {"properties": {"foo": {"type": "array", "maxItems": 3}, "bar": {"type": "array"}},
       "patternProperties": {"f.o": {"minItems": 2}},
       "additionalProperties": {"type": "integer"}},
      ("property validates property", {"foo": [1, 2]}, True),
      ("property invalidates property", {"foo": [1, 2, 3, 4]}, False),
      ("patternProperty invalidates property", {"foo": []}, False),
      ("patternProperty validates nonproperty", {"fxo": [1, 2]}, True),
      ("patternProperty invalidates nonproperty", {"fxo": []}, False),
      ("additionalProperty ignores property", {"bar": []}, True),
      ("additionalProperty validates others", {"quux": 3}, True),
      ("additionalProperty invalidates others", {"quux": "foo"}, False)),
    g("properties with boolean schema", {"properties": {"foo": True, "bar": False}},
      ("no property present", {}, True),
      ("only 'true' property", {"foo": 1}, True),
      ("'false' property present", {"bar": 2}, False)),
]

FILES["patternProperties"] = [
    g("patternProperties matches keys", {"patternProperties": {"f.*o": {"type": "integer"}}},
      ("single match", {"foo": 1}, True),
      ("multiple matches", {"foo": 1, "foooooo": 2}, True),
      ("single invalid", {"foo": "bar", "fother": ""}, False),
      ("ignores non-objects", 12, True)),
    g("multiple simultaneous patternProperties",
      {"patternProperties": {"a*": {"type": "integer"}, "aaa*": {"maximum": 20}}},
      ("single valid", {"a": 21}, True),
      ("simultaneous valid", {"aaaa": 18}, True),
      ("one invalid", {"a": "bar"}, False),
      ("simultaneous invalid", {"aaaa": 31}, False)),
]

FILES["additionalProperties"] = [
    g("additionalProperties false", {"properties": {"foo": {}, "bar": {}}, "additionalProperties": False},
      ("no additional", {"foo": 1}, True),
      ("an additional", {"foo": 1, "quux": "boom"}, False),
      ("ignores arrays", [1, 2, 3], True), ("ignores strings", "foobar", True)),
    g("additionalProperties schema", {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}},
      ("valid additional", {"foo": 1, "bar": True}, True),
      ("invalid additional", {"foo": 1, "bar": 12}, False)),
    g("additionalProperties alone", {"additionalProperties": {"type": "boolean"}},
      ("valid", {"foo": True}, True), ("invalid", {"foo": 1}, False)),
    g("additionalProperties + patternProperties",
      {"properties": {"foo": {}}, "patternProperties": {"^v": {}}, "additionalProperties": False},
      ("pattern-matched not additional", {"vroom": 2}, True),
      ("plain additional fails", {"quux": 2}, False)),
]

FILES["propertyNames"] = [
    g("propertyNames", {"propertyNames": {"maxLength": 3}},
      ("all short", {"f": {}, "foo": {}}, True),
      ("one long", {"foo": {}, "foobar": {}}, False),
      ("empty object", {}, True),
      ("ignores arrays", [1, 2], True), ("ignores strings", "foobar", True)),
    g("propertyNames with boolean false", {"propertyNames": False},
      ("empty ok", {}, True), ("any property fails", {"foo": 1}, False)),
]

FILES["minProperties"] = [
    g("minProperties", {"minProperties": 1},
      ("more", {"foo": 1, "bar": 2}, True), ("exact", {"foo": 1}, True),
      ("too few", {}, False), ("ignores arrays", [], True), ("ignores strings", "", True)),
]

FILES["maxProperties"] = [
    g("maxProperties", {"maxProperties": 2},
      ("fewer", {"foo": 1}, True), ("exact", {"foo": 1, "bar": 2}, True),
      ("too many", {"foo": 1, "bar": 2, "baz": 3}, False), ("ignores arrays", [1, 2, 3], True)),
]

FILES["dependentRequired"] = [
    g("single dependency", {"dependentRequired": {"bar": ["foo"]}},
      ("neither", {}, True), ("nondependant", {"foo": 1}, True),
      ("with dependency", {"foo": 1, "bar": 2}, True),
      ("missing dependency", {"bar": 2}, False),
      ("ignores arrays", ["bar"], True), ("ignores strings", "foobar", True)),
    g("multiple dependents", {"dependentRequired": {"quux": ["foo", "bar"]}},
      ("neither", {}, True), ("nondependants", {"foo": 1, "bar": 2}, True),
      ("with dependencies", {"foo": 1, "bar": 2, "quux": 3}, True),
      ("missing one", {"foo": 1, "quux": 2}, False),
      ("missing both", {"quux": 1}, False)),
]

FILES["dependentSchemas"] = [
    g("single schema dependency",
      {"dependentSchemas": {"bar": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}}}}},
      ("valid", {"foo": 1, "bar": 2}, True),
      ("no dependency", {"foo": "quux"}, True),
      ("wrong type", {"foo": "quux", "bar": 2}, False),
      ("wrong type both", {"foo": "quux", "bar": "quux"}, False),
      ("ignores arrays", ["bar"], True)),
    g("boolean subschemas", {"dependentSchemas": {"foo": True, "bar": False}},
      ("object with property having schema true", {"foo": 1}, True),
      ("object with property having schema false", {"bar": 2}, False),
      ("empty object", {}, True)),
]

FILES["dependencies_draft7"] = [
    g("dependencies array form (draft7)", {"dependencies": {"bar": ["foo"]}},
      ("neither", {}, True), ("with dependency", {"foo": 1, "bar": 2}, True),
      ("missing dependency", {"bar": 2}, False), dialect="draft7"),
    g("dependencies schema form (draft7)",
      {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"}}}}},
      ("valid", {"foo": 1, "bar": 2}, True), ("invalid", {"foo": "x", "bar": 2}, False),
      dialect="draft7"),
]

FILES["minItems"] = [
    g("minItems", {"minItems": 1},
      ("longer", [1, 2], True), ("exact", [1], True), ("too short", [], False), ("ignores non-arrays", "", True)),
]

FILES["maxItems"] = [
    g("maxItems", {"maxItems": 2},
      ("shorter", [1], True), ("exact", [1, 2], True), ("too long", [1, 2, 3], False), ("ignores non-arrays", "aaa", True)),
]

FILES["uniqueItems"] = [
    g("uniqueItems", {"uniqueItems": True},
      ("unique", [1, 2], True), ("non-unique", [1, 1], False),
      ("numeric-insensitive duplicates", [1.0, 1], False),
      ("false is not 0", [0, False], True), ("true is not 1", [1, True], True),
      ("unique objects", [{"foo": "bar"}, {"foo": "baz"}], True),
      ("duplicate objects", [{"foo": "bar"}, {"foo": "bar"}], False),
      ("duplicate nested", [["foo"], ["foo"]], False),
      ("different types", [{}, [1], True, None, 1, "{}"], True),
      ("ignores non-arrays", "aaa", True)),
    g("uniqueItems false", {"uniqueItems": False},
      ("dupes allowed", [1, 1], True)),
]

FILES["items"] = [
    g("items schema (2020-12)", {"items": {"type": "integer"}},
      ("valid items", [1, 2, 3], True), ("one wrong", [1, "x"], False),
      ("ignores non-arrays", {"foo": "bar"}, True), ("empty array", [], True)),
    g("items with boolean false", {"items": False},
      ("empty ok", [], True), ("nonempty fails", [1], False)),
    g("nested items", {"items": {"items": {"type": "integer"}}},
      ("valid nested", [[1], [2, 3]], True), ("invalid nested", [[1], ["x"]], False)),
]

FILES["prefixItems"] = [
    g("prefixItems", {"prefixItems": [{"type": "integer"}, {"type": "string"}]},
      ("correct types", [1, "foo"], True),
      ("wrong types", ["foo", 1], False),
      ("incomplete is valid", [1], True),
      ("extra items unchecked", [1, "foo", True], True),
      ("ignores non-arrays", {"0": "x"}, True)),
    g("prefixItems with items", {"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
      ("prefix + rest ok", [1, "a", "b"], True),
      ("rest wrong", [1, "a", 2], False),
      ("prefix wrong", ["x", "a"], False),
      ("only prefix", [1], True)),
    g("items false with prefixItems", {"prefixItems": [{"type": "integer"}], "items": False},
      ("only prefix ok", [1], True), ("extra fails", [1, 2], False), ("empty ok", [], True)),
]

FILES["items_2019"] = [
    g("items array form (2019-09)", {"items": [{"type": "integer"}, {"type": "string"}]},
      ("correct types", [1, "foo"], True), ("wrong types", ["foo", 1], False),
      ("incomplete ok", [1], True), ("extra unchecked", [1, "foo", True], True),
      dialect="2019-09"),
    g("additionalItems (2019-09)", {"items": [{"type": "integer"}], "additionalItems": {"type": "string"}},
      ("rest ok", [1, "a"], True), ("rest wrong", [1, 2], False), dialect="2019-09"),
    g("additionalItems false (2019-09)", {"items": [{}], "additionalItems": False},
      ("one item ok", [1], True), ("two items no", [1, 2], False), dialect="2019-09"),
    g("items single schema (draft7)", {"items": {"type": "integer"}},
      ("ok", [1, 2], True), ("no", [1, "x"], False), dialect="draft7"),
]

FILES["contains"] = [
    g("contains", {"contains": {"minimum": 5}},
      ("one match", [3, 4, 5], True), ("two matches", [3, 4, 5, 6], True),
      ("no match", [2, 3, 4], False), ("empty array", [], False),
      ("ignores non-arrays", {}, True)),
    g("minContains=2", {"contains": {"const": 1}, "minContains": 2},
      ("two", [1, 1], True), ("three", [1, 1, 1], True), ("one", [1, 2], False), ("none", [2], False)),
    g("maxContains=1", {"contains": {"const": 1}, "maxContains": 1},
      ("one", [1, 2], True), ("two", [1, 1], False)),
    g("minContains=0", {"contains": {"const": 1}, "minContains": 0},
      ("empty", [], True), ("none", [2], True)),
    g("contains false schema", {"contains": False},
      ("any array fails", [1], False), ("empty fails", [], False)),
]

FILES["allOf"] = [
    g("allOf", {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                           {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
      ("both", {"foo": "baz", "bar": 2}, True),
      ("mismatch second", {"foo": "baz"}, False),
      ("mismatch first", {"bar": 2}, False),
      ("wrong type", {"foo": "baz", "bar": "quux"}, False)),
    g("allOf simple types", {"allOf": [{"maximum": 30}, {"minimum": 20}]},
      ("ok", 25, True), ("mismatch one", 35, False)),
    g("allOf with boolean schemas", {"allOf": [True, False]},
      ("any value", "foo", False)),
]

FILES["anyOf"] = [
    g("anyOf", {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
      ("first", 1, True), ("second", 2.5, True), ("both", 3, True), ("neither", 1.5, False)),
    g("anyOf with base schema", {"type": "string", "anyOf": [{"maxLength": 2}, {"minLength": 4}]},
      ("mismatch base", 3, False), ("first", "fo", True), ("second", "foobar", True), ("neither", "foo", False)),
    g("anyOf all false", {"anyOf": [False, False]}, ("any value", "foo", False)),
]

FILES["oneOf"] = [
    g("oneOf", {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
      ("first", 1, True), ("second", 2.5, True), ("both → fail", 3, False), ("neither", 1.5, False)),
    g("oneOf complex", {"oneOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                                   {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
      ("first", {"bar": 2}, True), ("second", {"foo": "baz"}, True),
      ("both", {"foo": "baz", "bar": 2}, False), ("neither", {"baz": 2}, False)),
    g("oneOf with empty schema", {"oneOf": [{"type": "number"}, {}]},
      ("string matches one", "foo", True), ("number matches both", 123, False)),
]

FILES["not"] = [
    g("not", {"not": {"type": "integer"}},
      ("allowed", "foo", True), ("disallowed", 1, False)),
    g("not multiple types", {"not": {"type": ["integer", "boolean"]}},
      ("valid", "foo", True), ("int no", 1, False), ("bool no", True, False)),
    g("forbidden property", {"properties": {"foo": {"not": {}}}},
      ("present", {"foo": 1}, False), ("absent", {"bar": 1}, True)),
    g("not true", {"not": True}, ("any value", "foo", False)),
    g("not false", {"not": False}, ("any value", "foo", True)),
]

FILES["if_then_else"] = [
    g("if+then w/o else", {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
      ("then ok", -1, True), ("then fail", -100, False), ("if fails, no else", 3, True)),
    g("if+else w/o then", {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
      ("if ok no then", -1, True), ("else ok", 4, True), ("else fail", 3, False)),
    g("if then else all", {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}, "else": {"multipleOf": 2}},
      ("then ok", -1, True), ("then fail", -100, False), ("else ok", 4, True), ("else fail", 3, False)),
    g("then/else alone are no-ops", {"then": {"const": 1}, "else": {"const": 2}},
      ("anything", 0, True)),
    g("if alone is a no-op", {"if": {"const": 0}},
      ("match", 0, True), ("no match", "hello", True)),
]

FILES["boolean_schema"] = [
    g("boolean schema true", True,
      ("number", 1, True), ("string", "foo", True), ("null", None, True), ("object", {}, True)),
    g("boolean schema false", False,
      ("number", 1, False), ("string", "foo", False), ("null", None, False), ("object", {}, False)),
]

FILES["ref"] = [
    g("root pointer ref", {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False},
      ("match", {"foo": False}, True),
      ("recursive match", {"foo": {"foo": False}}, True),
      ("mismatch", {"bar": False}, False),
      ("recursive mismatch", {"foo": {"bar": False}}, False)),
    g("relative pointer ref to object",
      {"properties": {"foo": {"type": "integer"}, "bar": {"$ref": "#/properties/foo"}}},
      ("match", {"bar": 3}, True), ("mismatch", {"bar": True}, False)),
    g("$defs ref", {"$ref": "#/$defs/pos", "$defs": {"pos": {"type": "integer", "minimum": 0}}},
      ("ok", 5, True), ("negative", -5, False), ("string", "x", False)),
    g("ref with sibling keywords (2020-12: both apply)",
      {"$ref": "#/$defs/reffed", "maximum": 5, "$defs": {"reffed": {"type": "integer"}}},
      ("both ok", 3, True), ("ref ok sibling fail", 7, False), ("ref fail", "x", False)),
    g("escaped pointer ref",
      {"$defs": {"tilde~field": {"type": "integer"}, "slash/field": {"type": "integer"},
                  "percent%field": {"type": "integer"}},
       "properties": {"tilde": {"$ref": "#/$defs/tilde~0field"},
                       "slash": {"$ref": "#/$defs/slash~1field"},
                       "percent": {"$ref": "#/$defs/percent%25field"}}},
      ("slash valid", {"slash": 123}, True), ("tilde valid", {"tilde": 123}, True),
      ("percent valid", {"percent": 123}, True),
      ("slash invalid", {"slash": "aoeu"}, False), ("tilde invalid", {"tilde": "aoeu"}, False)),
    g("$anchor ref", {"$ref": "#thing", "$defs": {"x": {"$anchor": "thing", "type": "string"}}},
      ("string ok", "a", True), ("int no", 1, False)),
    g("$id-based absolute ref",
      {"$id": "https://ex.test/root.json",
       "$ref": "https://ex.test/nested.json#/$defs/B",
       "$defs": {"A": {"$id": "nested.json", "$defs": {"B": {"type": "integer"}}}}},
      ("int ok", 1, True), ("string no", "a", False)),
    g("recursive tree",
      {"$defs": {"node": {"type": "object", "properties": {
          "val": {"type": "integer"}, "next": {"$ref": "#/$defs/node"}}, "required": ["val"]}},
       "$ref": "#/$defs/node"},
      ("depth 3", {"val": 1, "next": {"val": 2, "next": {"val": 3}}}, True),
      ("bad leaf", {"val": 1, "next": {"next": {"val": 3}}}, False)),
    g("draft7 $ref ignores siblings",
      {"$ref": "#/definitions/reffed", "maximum": 5, "definitions": {"reffed": {"type": "integer"}}},
      ("sibling maximum ignored", 7, True), ("ref still applies", "x", False), dialect="draft7"),
]

FILES["dynamicRef"] = [
    g("$dynamicRef rebinds to outer dynamic anchor",
      {"$id": "https://dyn.test/root",
       "$ref": "list",
       "$defs": {
           "foo": {"$dynamicAnchor": "itemType", "type": "string"},
           "list": {"$id": "list", "type": "array",
                     "items": {"$dynamicRef": "#itemType"},
                     "$defs": {"items": {"$dynamicAnchor": "itemType"}}}}},
      ("strings ok", ["a", "b"], True), ("ints rejected by outer anchor", [1], False)),
    g("$dynamicRef without matching dynamic anchor behaves like $ref",
      {"$id": "https://dyn2.test/root",
       "$ref": "list2",
       "$defs": {
           "foo": {"$anchor": "itemTypes", "type": "string"},
           "list": {"$id": "list2", "type": "array",
                     "items": {"$dynamicRef": "#itemType"},
                     "$defs": {"items": {"$dynamicAnchor": "itemType", "type": "number"}}}}},
      ("numbers ok (static target)", [1, 2], True), ("strings no", ["a"], False)),
    g("$recursiveRef (2019-09)",
      {"$id": "https://rec.test/outer", "$recursiveAnchor": True,
       "anyOf": [{"type": "string"}, {"type": "object",
                  "additionalProperties": {"$recursiveRef": "#"}}]},
      ("string", "x", True), ("nested", {"a": {"b": "x"}}, True), ("bad leaf", {"a": 1}, False),
      dialect="2019-09"),
]

FILES["unevaluatedProperties"] = [
    g("unevaluatedProperties false with properties",
      {"properties": {"foo": {"type": "string"}}, "unevaluatedProperties": False},
      ("only evaluated", {"foo": "a"}, True), ("unevaluated", {"foo": "a", "bar": 1}, False),
      ("empty", {}, True)),
    g("unevaluatedProperties schema",
      {"properties": {"foo": {}}, "unevaluatedProperties": {"type": "string", "minLength": 3}},
      ("valid unevaluated", {"foo": 1, "bar": "long"}, True),
      ("invalid unevaluated", {"foo": 1, "bar": "no"}, False)),
    g("unevaluatedProperties sees allOf annotations",
      {"allOf": [{"properties": {"foo": {"type": "string"}}}], "unevaluatedProperties": False},
      ("evaluated via allOf", {"foo": "a"}, True), ("extra", {"foo": "a", "bar": 1}, False)),
    g("unevaluatedProperties with anyOf: only successful branch evaluates",
      {"anyOf": [{"properties": {"foo": {"const": 1}}, "required": ["foo"]},
                  {"properties": {"bar": {"const": 2}}, "required": ["bar"]}],
       "unevaluatedProperties": False},
      ("first branch", {"foo": 1}, True),
      ("failed branch's property unevaluated", {"foo": 1, "bar": 3}, False),
      ("both branches", {"foo": 1, "bar": 2}, True)),
    g("unevaluatedProperties with patternProperties",
      {"patternProperties": {"^f": {}}, "unevaluatedProperties": False},
      ("matched", {"foo": 1}, True), ("unmatched", {"goo": 1}, False)),
    g("unevaluatedProperties with if/then/else (if false drops annotations)",
      {"if": {"properties": {"foo": {"const": "then"}}, "required": ["foo"]},
       "then": {"properties": {"bar": {}}},
       "else": {"properties": {"baz": {}}},
       "unevaluatedProperties": False},
      ("then branch props", {"foo": "then", "bar": 1}, True),
      ("if-props in else branch unevaluated", {"foo": "else", "baz": 1}, False),
      ("else-only props", {"baz": 1}, True)),
    g("nested unevaluatedProperties outer false",
      {"allOf": [{"properties": {"foo": {}}, "unevaluatedProperties": True}],
       "unevaluatedProperties": False},
      ("inner true evaluates all", {"foo": 1, "bar": 2}, True)),
]

FILES["unevaluatedItems"] = [
    g("unevaluatedItems false with prefixItems",
      {"prefixItems": [{"type": "string"}], "unevaluatedItems": False},
      ("only prefix", ["a"], True), ("extra", ["a", "b"], False), ("empty", [], True)),
    g("unevaluatedItems schema",
      {"prefixItems": [{"type": "string"}], "unevaluatedItems": {"type": "integer"}},
      ("int extras ok", ["a", 1, 2], True), ("string extra no", ["a", "b"], False)),
    g("unevaluatedItems sees items annotation",
      {"items": {"type": "number"}, "unevaluatedItems": False},
      ("all evaluated by items", [1, 2], True)),
    g("unevaluatedItems with contains hits",
      {"contains": {"const": "yes"}, "unevaluatedItems": False},
      ("only hits", ["yes", "yes"], True), ("non-hit unevaluated", ["yes", "no"], False)),
    g("unevaluatedItems via allOf",
      {"allOf": [{"prefixItems": [{"type": "string"}, {"type": "number"}]}],
       "unevaluatedItems": False},
      ("covered", ["a", 1], True), ("extra", ["a", 1, 2], False)),
]

FILES["format"] = [
    g("uuid", {"format": "uuid"},
      ("valid", "2eb8aa08-aa98-11ea-b4aa-73b441d16380", True),
      ("uppercase", "2EB8AA08-AA98-11EA-B4AA-73B441D16380", True),
      ("bad char", "2eb8aa08-aa98-11ea-b4aa-73b441d1638x", False),
      ("missing group", "2eb8aa08-aa98-11ea-73b441d16380", False),
      ("non-string passes", 12, True), ("too long", "2eb8aa08-aa98-11ea-b4aa-73b441d163800", False),
      formats_assert=True),
    g("date", {"format": "date"},
      ("valid", "1963-06-19", True), ("leap day ok", "2020-02-29", True),
      ("non-leap feb 29", "2021-02-29", False), ("month 13", "2020-13-01", False),
      ("day 0", "2020-01-00", False), ("day 32", "2020-01-32", False),
      ("non-padded", "2020-1-01", False), ("iso week date", "2020-W01-1", False),
      formats_assert=True),
    g("time", {"format": "time"},
      ("valid z", "08:30:06Z", True), ("valid offset", "08:30:06+08:00", True),
      ("fraction", "08:30:06.283185Z", True),
      ("leap second utc", "23:59:60Z", True), ("leap second offset valid", "15:59:60-08:00", True),
      ("leap second wrong time", "22:59:60Z", False),
      ("no offset", "08:30:06", False), ("hour 24", "24:00:00Z", False),
      ("minute 60", "08:60:06Z", False),
      formats_assert=True),
    g("date-time", {"format": "date-time"},
      ("valid", "1963-06-19T08:30:06.283185Z", True),
      ("valid offset", "1937-01-01T12:00:27.87+00:20", True),
      ("lowercase t z", "1963-06-19t08:30:06z", True),
      ("invalid day", "1990-02-31T15:59:59.123-08:00", False),
      ("missing time", "1963-06-19", False),
      ("invalid offset minute", "1963-06-19T08:30:06+08:60", False),
      formats_assert=True),
    g("duration", {"format": "duration"},
      ("days", "P4D", True), ("time part", "PT2H30M", True), ("weeks", "P1W", True),
      ("full", "P1Y2M3DT4H5M6S", True),
      ("bare P", "P", False), ("trailing T", "P1DT", False),
      ("weeks mixed", "P1W2D", False), ("no units", "4D", False),
      formats_assert=True),
    g("ipv4", {"format": "ipv4"},
      ("valid", "192.168.0.1", True), ("octet too big", "256.0.0.1", False),
      ("leading zero", "087.10.10.10", False), ("three octets", "127.0.0", False),
      ("with port", "192.168.0.1:80", False), ("non-string passes", None, True),
      formats_assert=True),
    g("ipv6", {"format": "ipv6"},
      ("valid full", "2001:0db8:85a3:0000:0000:8a2e:0370:7334", True),
      ("compressed", "::1", True), ("all zeros", "::", True),
      ("embedded ipv4", "::ffff:192.168.0.1", True),
      ("too many groups", "1:2:3:4:5:6:7:8:9", False),
      ("double compression", "1::2::3", False),
      ("zone id invalid", "fe80::1%eth0", False),
      formats_assert=True),
    g("hostname", {"format": "hostname"},
      ("valid", "www.example.com", True), ("single label", "localhost", True),
      ("starts with hyphen", "-hostname", False), ("ends with hyphen", "hostname-", False),
      ("underscore", "host_name", False),
      ("label too long", "a" * 64 + ".example.com", False),
      ("max label ok", "a" * 63 + ".example.com", True),
      formats_assert=True),
    g("email", {"format": "email"},
      ("valid", "joe.bloggs@example.com", True),
      ("quoted local", "\"joe bloggs\"@example.com", True),
      ("ipv4 literal", "joe@[127.0.0.1]", True),
      ("no @", "joebloggs.example.com", False),
      ("two dots", "joe..bloggs@example.com", False),
      ("leading dot", ".joe@example.com", False),
      formats_assert=True),
    g("uri", {"format": "uri"},
      ("valid http", "http://foo.bar/?baz=qux#quux", True),
      ("urn", "urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66", True),
      ("mailto", "mailto:joe@example.com", True),
      ("relative no", "/abc", False), ("backslash", "\\\\WINDOWS\\share", False),
      ("spaces", "http:// should fail", False), ("no scheme", "//foo.bar", False),
      formats_assert=True),
    g("uri-reference", {"format": "uri-reference"},
      ("absolute", "http://foo.bar", True), ("relative", "/abc", True),
      ("fragment only", "#frag", True), ("empty", "", True),
      ("backslash invalid", "\\\\WINDOWS\\share", False),
      formats_assert=True),
    g("json-pointer", {"format": "json-pointer"},
      ("valid", "/foo/bar~0/baz~1/%a", True), ("empty", "", True),
      ("no leading slash", "foo", False), ("bad escape", "/~2", False),
      ("tilde at end", "/~", False),
      formats_assert=True),
    g("relative-json-pointer", {"format": "relative-json-pointer"},
      ("number only", "1", True), ("with pointer", "0/foo/bar", True),
      ("hash form", "2#", True), ("negative", "-1/foo", False),
      ("leading zero", "01/a", False),
      formats_assert=True),
    g("regex", {"format": "regex"},
      ("valid", "([abc])+\\s+$", True), ("unclosed", "^(abc]", False),
      formats_assert=True),
    g("uri-template", {"format": "uri-template"},
      ("valid", "http://example.com/dictionary/{term:1}/{term}", True),
      ("unclosed", "http://example.com/dictionary/{term:1}/{term", False),
      ("empty braces", "http://example.com/{}", False),
      ("plain uri ok", "http://example.com/literal", True),
      formats_assert=True),
    g("format as annotation only (assertions off)", {"format": "ipv4"},
      ("garbage passes", "not-an-ip", True), formats_assert=False),
]

FILES["content"] = [
    g("contentEncoding base64 (draft7 asserts)", {"contentEncoding": "base64"},
      ("valid b64", "eyJmb28iOiAiYmFyIn0=", True),
      ("invalid b64", "eyJmb28iOi%iYmFyIn0K", False),
      ("non-string passes", 100, True),
      dialect="draft7", content="encoding"),
    g("contentMediaType json", {"contentEncoding": "base64", "contentMediaType": "application/json"},
      ("valid json payload", "eyJmb28iOiAiYmFyIn0=", True),
      ("invalid json payload", "aGVsbG8=", False),
      dialect="draft7", content="encoding"),
    g("contentSchema", {"contentEncoding": "base64", "contentMediaType": "application/json",
                         "contentSchema": {"required": ["foo"]}},
      ("payload satisfies schema", "eyJmb28iOiAiYmFyIn0=", True),
      ("payload violates schema", "eyJiYXIiOiAxfQ==", False),
      dialect="draft7", content="encoding_and_schema"),
    g("2019+ content is annotation only", {"contentEncoding": "base64"},
      ("invalid b64 passes", "not%%base64", True), content="default"),
]

FILES["unevaluated_advanced"] = [
    g("unevaluatedProperties sees $ref annotations",
      {"$ref": "#/$defs/base", "unevaluatedProperties": False,
       "$defs": {"base": {"properties": {"foo": {"type": "string"}}}}},
      ("ref-evaluated prop ok", {"foo": "a"}, True),
      ("extra prop fails", {"foo": "a", "bar": 1}, False)),
    g("unevaluatedProperties with dependentSchemas annotations",
      {"dependentSchemas": {"foo": {"properties": {"bar": {"type": "integer"}}}},
       "properties": {"foo": {}},
       "unevaluatedProperties": False},
      ("dependent-evaluated ok", {"foo": 1, "bar": 2}, True),
      ("bar unevaluated when foo absent", {"bar": 2}, False)),
    g("unevaluatedItems sees $ref annotations",
      {"$ref": "#/$defs/pre", "unevaluatedItems": False,
       "$defs": {"pre": {"prefixItems": [{"type": "string"}]}}},
      ("covered", ["a"], True), ("extra", ["a", "b"], False)),
    g("nested oneOf in allOf with unevaluatedProperties",
      {"allOf": [{"oneOf": [{"properties": {"a": {"const": 1}}, "required": ["a"]},
                             {"properties": {"b": {"const": 2}}, "required": ["b"]}]}],
       "unevaluatedProperties": False},
      ("branch a", {"a": 1}, True), ("branch b", {"b": 2}, True),
      ("extra prop", {"a": 1, "c": 3}, False)),
    g("contains annotations via allOf feed unevaluatedItems",
      {"allOf": [{"contains": {"type": "string"}}], "unevaluatedItems": {"type": "integer"}},
      ("strings evaluated, ints allowed", ["x", 1, "y"], True),
      ("float neither contained nor integer", ["x", 1.5], False)),
]

FILES["format_idn"] = [
    g("idn-hostname", {"format": "idn-hostname"},
      ("ascii ok", "example.com", True),
      ("unicode label", "bücher.example", True),
      ("empty", "", False),
      ("underscore invalid", "ex_ample.com", False),
      formats_assert=True),
    g("idn-email", {"format": "idn-email"},
      ("ascii ok", "joe@example.com", True),
      ("unicode domain", "joe@bücher.example", True),
      ("no at", "joeexample.com", False),
      formats_assert=True),
    g("iri", {"format": "iri"},
      ("unicode path ok", "https://example.com/ö/path?q=1", True),
      ("relative no", "/nur/pfad", False),
      formats_assert=True),
    g("iri-reference", {"format": "iri-reference"},
      ("relative ok", "/nur/pfad/ö", True),
      ("backslash no", "\\\\share", False),
      formats_assert=True),
]

FILES["combinator_nesting"] = [
    g("anyOf inside allOf", {"allOf": [{"anyOf": [{"type": "integer"}, {"minLength": 3}]},
                                        {"anyOf": [{"maximum": 10}, {"type": "string"}]}]},
      ("int in both", 5, True), ("big int fails second", 50, False),
      ("long string", "abcd", True), ("short string", "ab", False)),
    g("not of anyOf", {"not": {"anyOf": [{"type": "integer"}, {"type": "boolean"}]}},
      ("string ok", "x", True), ("int no", 3, False), ("bool no", True, False)),
    g("if over object with nested ref",
      {"$defs": {"has_a": {"required": ["a"]}},
       "if": {"$ref": "#/$defs/has_a"}, "then": {"properties": {"a": {"type": "integer"}}},
       "else": {"required": ["b"]}},
      ("a int", {"a": 1}, True), ("a string", {"a": "x"}, False),
      ("no a with b", {"b": 1}, True), ("neither", {}, False)),
]

FILES["defs"] = [
    g("$defs only shapes, never validates", {"$defs": {"foo": {"type": "integer"}}},
      ("anything", "string", True)),
    g("definitions (draft7)", {"definitions": {"foo": {"type": "integer"}},
                                "$ref": "#/definitions/foo"},
      ("int ok", 1, True), ("string no", "x", False), dialect="draft7"),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    n_groups = n_cases = 0
    for name, groups in FILES.items():
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(groups, f, indent=1)
        n_groups += len(groups)
        n_cases += sum(len(grp["tests"]) for grp in groups)
    print(f"wrote {len(FILES)} files, {n_groups} groups, {n_cases} cases to {OUT}")


if __name__ == "__main__":
    main()
