"""Conformance harness: the analog of the reference's JsonSchemaOrgTests
(``src/test/java/.../compilers/JsonSchemaOrgTests.java:67-154``) — each
fixture file holds {description, schema, tests:[{description, data,
valid}]} groups; the schema compiles ONCE per group, then every case's
``data`` is validated and the boolean verdict compared.

Numbers are parsed with Fraction (exact decimal) to mirror the
reference's BigDecimal semantics.
"""

from __future__ import annotations

import glob
import json
import os
from fractions import Fraction

import pytest

from json_schema_ray.kernels.dynamic import DynamicCompiler

HERE = os.path.dirname(__file__)
FIXTURE_FILES = sorted(glob.glob(os.path.join(HERE, "conformance", "*.json")))


def _load_cases():
    cases = []
    for path in FIXTURE_FILES:
        with open(path) as f:
            groups = json.load(f, parse_float=Fraction)
        fname = os.path.basename(path)
        for gi, grp in enumerate(groups):
            cases.append(pytest.param(grp, id=f"{fname}::{grp['description']}"))
    return cases


@pytest.mark.parametrize("group", _load_cases())
def test_conformance_group(group):
    compiler = DynamicCompiler(
        dialect=group.get("dialect", "2020-12"),
        formats_assert=group.get("formats_assert", False),
        content_processing=group.get("content", "default"),
    )
    # "externals": {uri: schema} — pre-registered external resources, the
    # analog of the reference's remote-ref test server (TestServer.java:16-20
    # serving test_sources/remotes) without network I/O
    for uri, ext in group.get("externals", {}).items():
        compiler.registry.register(ext, uri)
    compiled = compiler.compile(group["schema"])
    failures = []
    for case in group["tests"]:
        got = compiled.is_valid(case["data"])
        if got != case["valid"]:
            failures.append(f"  {case['description']}: expected {case['valid']}, got {got}")
    assert not failures, f"{group['description']}:\n" + "\n".join(failures)


def test_violation_rows_carry_reference_taxonomy():
    from json_schema_ray.kernels.dynamic import compile_schema

    cs = compile_schema(
        {"type": "object", "required": ["a"], "properties": {"a": {"minimum": 3}}}
    )
    errs = cs.violations({"a": 1})
    assert [e.error_type for e in errs] == ["MINIMUM"]
    assert errs[0].instance_ptr == "/a"
    assert "less than" in errs[0].message()
    errs = cs.violations({})
    assert [e.error_type for e in errs] == ["REQUIRED"]


def test_compile_once_reuse():
    from json_schema_ray.kernels.dynamic import compile_schema

    cs = compile_schema({"type": "integer"})
    assert cs.apply("3").ok and not cs.apply("3.5").ok and cs.apply("3.0").ok
