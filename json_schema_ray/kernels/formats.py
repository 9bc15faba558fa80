"""``format`` keyword predicates.

Semantics follow the reference's built-in format set
(``js/compilers/FormatCompiler.java:63-90``) and its hand-rolled
validators (``js/common/DateTimeFormatValidation.java``,
``js/common/CommonFormatValidations.java``, ``js/common/email/*``,
``js/common/Ipv6Validator.java``, ``js/common/uritemplate/*``), re-derived
from the public RFCs (3339, 3986, 4291, 1123, 5321, 6570, 6901) rather
than ported.  Each format is a plain ``str -> bool`` predicate; formats
expressible as a single RE2-safe regex also appear in ``ANCHORED_REGEX``
for the vectorized Arrow path (``pc.match_substring_regex``).

Like the reference (and the spec), a format applies only to strings;
non-string values pass.  Unknown formats pass (annotation-only).
"""

from __future__ import annotations

import ipaddress
import re
from typing import Callable

# ---------------------------------------------------------------- date/time

_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")
_TIME_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?(?:[zZ]|([+-])(\d{2}):(\d{2}))$"
)
_DAYS = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def is_date(s: str) -> bool:
    m = _DATE_RE.match(s)
    if not m:
        return False
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12) or d < 1:
        return False
    dim = 29 if (mo == 2 and _leap(y)) else _DAYS[mo - 1]
    return d <= dim


def is_time(s: str) -> bool:
    m = _TIME_RE.match(s)
    if not m:
        return False
    h, mi, sec = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if h > 23 or mi > 59 or sec > 60:
        return False
    if m.group(5):  # explicit offset
        oh, om = int(m.group(6)), int(m.group(7))
        if oh > 23 or om > 59:
            return False
        sign = -1 if m.group(5) == "-" else 1
        off = sign * (oh * 60 + om)
    else:
        off = 0
    if sec == 60:
        # leap second: only valid when the UTC-normalized time is 23:59:60
        utc_min = (h * 60 + mi - off) % (24 * 60)
        return utc_min == 23 * 60 + 59
    return True


def is_datetime(s: str) -> bool:
    for sep in ("T", "t"):
        if sep in s:
            d, _, t = s.partition(sep)
            return is_date(d) and is_time(t)
    return False


_DURATION_RE = re.compile(
    r"^P(?:(?:\d+Y)?(?:\d+M)?(?:\d+D)?(?:T(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?|\d+W)$"
)


def is_duration(s: str) -> bool:
    if not _DURATION_RE.match(s) or s in ("P", "PT"):
        return False
    if s.endswith("T"):
        return False
    return True


# ---------------------------------------------------------------- network

_IPV4_RE = re.compile(
    r"^(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
)


def is_ipv4(s: str) -> bool:
    return bool(_IPV4_RE.match(s))


def is_ipv6(s: str) -> bool:
    if "%" in s:  # zone ids are not part of the format
        return False
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


_HOST_LABEL_RE = re.compile(r"^[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?$")


def is_hostname(s: str) -> bool:
    if not s or len(s) > 253:
        return False
    return all(_HOST_LABEL_RE.match(lbl) for lbl in s.split("."))


def is_idn_hostname(s: str) -> bool:
    """IDNA2008 hostname: RFC 5892 derived properties (evaluated against
    unicodedata — the same UCD the reference's precompiled tables encode,
    ``js/common/unicode/*``), RFC 5891 label rules, CONTEXTJ/CONTEXTO,
    and the RFC 5893 Bidi rule.  Remaining approximations are documented
    in ``kernels/idna2008.py`` (ZWNJ joining-type branch, DI ranges)."""
    from .idna2008 import is_idna2008_hostname

    return is_idna2008_hostname(s)


# ---------------------------------------------------------------- email

_ATOM = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
_DOT_ATOM_RE = re.compile(rf"^{_ATOM}(?:\.{_ATOM})*$")
_QUOTED_RE = re.compile(r'^"(?:[^"\\\r\n]|\\.)*"$')


def _email_domain_ok(dom: str) -> bool:
    if dom.startswith("[") and dom.endswith("]"):
        lit = dom[1:-1]
        if lit.lower().startswith("ipv6:"):
            return is_ipv6(lit[5:])
        return is_ipv4(lit)
    return is_hostname(dom)


def is_email(s: str) -> bool:
    at = s.rfind("@")
    if at <= 0 or at == len(s) - 1:
        return False
    local, dom = s[:at], s[at + 1 :]
    if len(local) > 64:
        return False
    if not (_DOT_ATOM_RE.match(local) or _QUOTED_RE.match(local)):
        return False
    return _email_domain_ok(dom)


def is_idn_email(s: str) -> bool:
    at = s.rfind("@")
    if at <= 0 or at == len(s) - 1:
        return False
    local, dom = s[:at], s[at + 1 :]
    if not local:
        return False
    if local.isascii() and not (_DOT_ATOM_RE.match(local) or _QUOTED_RE.match(local)):
        return False
    if dom.isascii():
        return _email_domain_ok(dom)
    return is_idn_hostname(dom)


# ---------------------------------------------------------------- uri family

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*$")
_URI_CHARS_RE = re.compile(r"^[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*$")
_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


def _split_fragment(s: str):
    i = s.find("#")
    return (s, None) if i < 0 else (s[:i], s[i + 1 :])


def _uri_common(s: str, ascii_only: bool) -> bool:
    if ascii_only and not _URI_CHARS_RE.match(s):
        return False
    if _PCT_RE.search(s):
        return False
    if any(c in s for c in " <>\\^`{}|\"\n\r\t"):
        return False
    return True


def is_uri(s: str) -> bool:
    if not _uri_common(s, ascii_only=True):
        return False
    body, _frag = _split_fragment(s)
    i = body.find(":")
    if i <= 0 or not _SCHEME_RE.match(body[:i]):
        return False
    rest = body[i + 1 :]
    if rest.startswith("//"):
        auth = rest[2:].split("/", 1)[0].split("?", 1)[0]
        host = auth.rsplit("@", 1)[-1]
        if host.startswith("["):
            if not host.endswith("]") and "]:" not in host:
                return False
    return True


def is_uri_reference(s: str) -> bool:
    if not _uri_common(s, ascii_only=True):
        return False
    body, _frag = _split_fragment(s)
    i = body.find(":")
    first_seg = body.split("/", 1)[0]
    if i > 0 and ":" in first_seg:
        return bool(_SCHEME_RE.match(body[:i]))
    return True


def is_iri(s: str) -> bool:
    return _uri_common(s, ascii_only=False) and is_uri(
        "".join(c if c.isascii() else "x" for c in s)
    )


def is_iri_reference(s: str) -> bool:
    return _uri_common(s, ascii_only=False) and is_uri_reference(
        "".join(c if c.isascii() else "x" for c in s)
    )


_UUID_RE = re.compile(
    r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
)


def is_uuid(s: str) -> bool:
    return bool(_UUID_RE.match(s))


_TPL_VARCHAR = r"(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})"
_TPL_VARSPEC = rf"{_TPL_VARCHAR}+(?:\.{_TPL_VARCHAR}+)*(?::[1-9]\d{{0,3}}|\*)?"
_TPL_EXPR_RE = re.compile(rf"^[+#./;?&=,!@|]?{_TPL_VARSPEC}(?:,{_TPL_VARSPEC})*$")


def is_uri_template(s: str) -> bool:
    depth, start = 0, 0
    for i, c in enumerate(s):
        if c == "{":
            if depth:
                return False
            depth, start = 1, i + 1
        elif c == "}":
            if not depth:
                return False
            if not _TPL_EXPR_RE.match(s[start:i]):
                return False
            depth = 0
    return depth == 0


_JSON_POINTER_RE = re.compile(r"^(?:/(?:[^~]|~[01])*)*$")


def is_json_pointer(s: str) -> bool:
    return bool(_JSON_POINTER_RE.match(s))


_REL_PTR_RE = re.compile(r"^(?:0|[1-9]\d*)(?:#|(?:/(?:[^~]|~[01])*)*)$")


def is_relative_json_pointer(s: str) -> bool:
    return bool(_REL_PTR_RE.match(s))


def is_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


FORMAT_PREDICATES: dict[str, Callable[[str], bool]] = {
    "date": is_date,
    "time": is_time,
    "date-time": is_datetime,
    "duration": is_duration,
    "email": is_email,
    "idn-email": is_idn_email,
    "hostname": is_hostname,
    "idn-hostname": is_idn_hostname,
    "ipv4": is_ipv4,
    "ipv6": is_ipv6,
    "uri": is_uri,
    "uri-reference": is_uri_reference,
    "iri": is_iri,
    "iri-reference": is_iri_reference,
    "uuid": is_uuid,
    "uri-template": is_uri_template,
    "json-pointer": is_json_pointer,
    "relative-json-pointer": is_relative_json_pointer,
    "regex": is_regex,
}

# RE2-safe anchored regexes for the vectorized Arrow path
# (pc.match_substring_regex).  Formats needing calendar / semantic checks
# (date, time, ...) get dedicated vector kernels in kernels/vector.py.
ANCHORED_REGEX: dict[str, str] = {
    "uuid": r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$",
    "ipv4": r"^(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$",
    "json-pointer": r"^(?:/(?:[^~]|~[01])*)*$",
    # RE2 has no lookahead: enumerate "at least one component" explicitly
    "duration": (
        r"^P(?:[0-9]+W"
        r"|(?:[0-9]+Y(?:[0-9]+M)?(?:[0-9]+D)?|[0-9]+M(?:[0-9]+D)?|[0-9]+D)"
        r"(?:T(?:[0-9]+H(?:[0-9]+M)?(?:[0-9]+(?:\.[0-9]+)?S)?|[0-9]+M(?:[0-9]+(?:\.[0-9]+)?S)?|[0-9]+(?:\.[0-9]+)?S))?"
        r"|T(?:[0-9]+H(?:[0-9]+M)?(?:[0-9]+(?:\.[0-9]+)?S)?|[0-9]+M(?:[0-9]+(?:\.[0-9]+)?S)?|[0-9]+(?:\.[0-9]+)?S))$"
    ),
    "media-ref": r"^media://[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
}


def check_format(fmt: str, value) -> bool:
    """Assertion entry point: non-strings pass; unknown formats pass."""
    if not isinstance(value, str):
        return True
    pred = FORMAT_PREDICATES.get(fmt)
    return True if pred is None else pred(value)
