"""Violation / error taxonomy.

Mirrors the reference's 31-entry error enum and message templates
(``/root/reference/src/main/java/io/github/georgeakulov/json_schema/results/EErrorType.java:3-34``)
so violation rows produced by this engine carry the same error-type
vocabulary the reference emits.  Messages are ``str.format`` templates
with positional args, matching the reference's ``MessageFormat`` usage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# error_type -> message template ({0}, {1}, ... positional)
ERROR_MESSAGES: dict[str, str] = {
    "CONST": "Value {0} not equals to const {1}",
    "CONTAINS_MIN": "The array must contains at least {0} valid items. Actual: {1}",
    "CONTAINS_MAX": "The array can contains no more than {0} valid items. Actual: {1}",
    "DEPENDENCIES": "The dependencies for [{0}] are not satisfied",
    "DEPENDENT_REQUIRED": "The required dependencies for [{0}] are not satisfied",
    "ENUM": "The value {0} not declared in enum {1}",
    "EXCLUSIVE_MAXIMUM": "Value {0} greater than {1}",
    "EXCLUSIVE_MINIMUM": "Value {0} less or equal than {1}",
    "FORMAT": "Value {0} not conform to format {1}",
    "MAXIMUM": "Value {0} greater than {1}",
    "MINIMUM": "Value {0} less than {1}",
    "MAX_ITEMS": "Required max array size {0}, Actual size: {1}",
    "MIN_ITEMS": "Required minimum items amount is {0}, Actual size: {1}",
    "MAX_PROPERTIES": "Maximum allowed properties count {0}. Actual: {1}",
    "MIN_PROPERTIES": "Require min properties count {0}. Actual: {1}",
    "MULTIPLE_OF": "The node value of {0} not conform to multipleOf value {1}",
    "NOT": "The subschema validation was successfully. Result will be inverter",
    "ONE_OF_EMPTY": "None of the results were successful.",
    "ONE_OF_MORE_THAN_ONE": "More than one successful results.",
    "ANY_OF": "None of the variants were successful.",
    "PATTERN": "The value {0} not conform to pattern: {1}",
    "REQUIRED": "Some required properties {0} are missing",
    "FALSE_SCHEMA": "Because schema is false",
    "TYPE": "The node value {0} not conform to type {1}",
    "UNIQUE_ITEMS": "At least one item {0} not unique",
    "MAX_LENGTH": "The length of {0} must be less than or equal to {1}. Actual: {2}",
    "MIN_LENGTH": "The length of {0} must be greater or equal than  {1}. Actual: {2}",
    "CONTENT_ENCODING": "Invalid content encoding {0}.",
    "CONTENT_TYPE": "Not conform to content type {0}",
    "CONTENT_SCHEMA": "Not conform to content schema",
    # Engine-level error types with no reference analog (distributed checks,
    # SURVEY.md §2.9): these arise from cross-row semantics the reference
    # cannot express.
    "UNIQUE_KEY": "Key {0} appears {1} times; must be unique",
    "REFERENTIAL": "Value {0} has no match in catalog {1}",
    "DRIFT": "Feature {0} drifted vs baseline: {1}={2} exceeds {3}",
    "ORDER": "Value {0} breaks required ordering ({1})",
}


@dataclass(frozen=True)
class Violation:
    """One violation row.

    ``instance_ptr`` is a JSON Pointer into the validated instance
    (reference: ``IValidationResult.getInstancePointer``,
    ``js/results/IValidationResult.java:26-73``); ``schema_ptr`` is the
    JSON Pointer of the violated constraint inside the constraint spec
    (the reference's schema locator).  In tabular output these become the
    ``(doc_id, span_index, constraint_id, error_type, expected, actual)``
    columns of the violations table.
    """

    error_type: str
    instance_ptr: str = ""
    schema_ptr: str = ""
    args: tuple = field(default=())
    # combinator branch detail (oneOf/anyOf): tuple of per-branch violation
    # tuples — the CONTAINER nested-results analog
    # (js/results/IValidationResult.java:15-20); empty for leaf violations
    # and absent from tabular output (flat rendering unchanged)
    children: tuple = field(default=())

    def message(self) -> str:
        tmpl = ERROR_MESSAGES.get(self.error_type, self.error_type)
        out = tmpl
        for i, a in enumerate(self.args):
            out = out.replace("{%d}" % i, str(a))
        return out


def hierarchy_format(outcome) -> str:
    """Indent-per-level dump of a failed ``Outcome`` — the
    ``ValidationResultFactory.hierarchyFormat`` analog
    (``js/results/ValidationResultFactory.java:240-262``): instance-pointer
    prefixes render as ``CONT-ERR`` container lines (valid = AND of
    children), leaf violations as ``ERROR`` lines with the rendered
    message, and combinator branches (oneOf/anyOf alternatives captured in
    ``Violation.children``) as nested ``CONT-ERR branch[i]`` containers."""
    ok = getattr(outcome, "ok", None)
    errs = list(getattr(outcome, "errors", None) or [])
    if ok or not errs:
        return "OK\n"
    lines: list[str] = []

    def emit(v: Violation, level: int) -> None:
        ind = "\t" * level
        lines.append(
            f"{ind}ERROR {v.error_type} at {v.instance_ptr or '/'} "
            f"by {v.schema_ptr or '/'}: {v.message()}"
        )
        for bi, branch in enumerate(getattr(v, "children", ()) or ()):
            lines.append(f"{ind}\tCONT-ERR branch[{bi}]")
            for c in branch:
                emit(c, level + 2)

    # group leaves under their instance-pointer containers (a trie over
    # pointer segments, printed depth-first)
    root: dict = {"errs": [], "kids": {}}
    for v in errs:
        node = root
        ptr = v.instance_ptr or ""
        if ptr:
            for seg in ptr.lstrip("/").split("/"):
                node = node["kids"].setdefault(seg, {"errs": [], "kids": {}})
        node["errs"].append(v)

    def walk(name: str, node: dict, level: int) -> None:
        lines.append("\t" * level + f"CONT-ERR {name or '/'}")
        for v in node["errs"]:
            emit(v, level + 1)
        for seg in sorted(node["kids"]):
            walk(f"{name}/{seg}", node["kids"][seg], level + 1)

    walk("", root, 0)
    return "\n".join(lines) + "\n"
