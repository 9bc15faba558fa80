"""IDNA2008 U-label / domain validation (RFC 5890-5893) via unicodedata.

The reference ships precompiled Unicode tables
(``js/common/unicode/{IDNA,Punycode,Scripts}.java`` + ``*.zz`` resources)
for this; here the RFC 5892 derived-property algorithm is evaluated
directly against Python's ``unicodedata`` (same underlying UCD):

    Exceptions → BackwardCompatible (empty) → Unassigned → LDH →
    JoinControl → Unstable (NFKC∘casefold∘NFKC fixpoint) →
    IgnorableProperties → IgnorableBlocks → OldHangulJamo → LetterDigits

plus the RFC 5891 §4.2.3 label rules (NFC form, hyphen-3-4, leading
combining mark), the CONTEXTJ/CONTEXTO rules of RFC 5892 Appendix A,
and the RFC 5893 Bidi rule.

Documented approximations (conservative, each strictly narrower than
the spec):
- the ZWNJ CONTEXTJ regular-expression branch (RFC 5892 A.1) uses
  Joining_Type from the public ``idna`` package's bundled UCD tables
  when importable, else an embedded core Arabic/Syriac table — unknown
  code points default to non-joining (rejected, never accepted);
- Default_Ignorable_Code_Point is approximated as general-category Cf
  plus the explicit non-Cf ranges (variation selectors etc.).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# ---------------------------------------------------------------- tables

# RFC 5892 Appendix B.1 — Exceptions
_EXC_PVALID = {0x00DF, 0x03C2, 0x06FD, 0x06FE, 0x0F0B, 0x3007}
_EXC_CONTEXTO = (
    {0x00B7, 0x0375, 0x05F3, 0x05F4, 0x30FB}
    | set(range(0x0660, 0x066A))
    | set(range(0x06F0, 0x06FA))
)
_EXC_DISALLOWED = {0x0640, 0x07FA, 0x302E, 0x302F, 0x3031, 0x3032, 0x3033, 0x3034, 0x3035, 0x303B}

_JOIN_CONTROL = {0x200C, 0x200D}

# explicit Default_Ignorable ranges whose general category is NOT Cf
_DI_EXTRA = [
    (0x034F, 0x034F), (0x115F, 0x1160), (0x17B4, 0x17B5), (0x180B, 0x180D),
    (0x3164, 0x3164), (0xFE00, 0xFE0F), (0xFFA0, 0xFFA0), (0xE0100, 0xE01EF),
]
_IGNORABLE_BLOCKS = [
    (0x20D0, 0x20FF),  # Combining Diacritical Marks for Symbols
    (0x1D100, 0x1D1FF),  # Musical Symbols
    (0x1D200, 0x1D24F),  # Ancient Greek Musical Notation
]
_OLD_HANGUL_JAMO = [(0x1100, 0x11FF), (0xA960, 0xA97F), (0xD7B0, 0xD7FF)]

_LETTER_DIGIT_CATS = {"Ll", "Lu", "Lo", "Nd", "Lm", "Mn", "Mc"}


def _in_ranges(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


def _is_noncharacter(cp: int) -> bool:
    return 0xFDD0 <= cp <= 0xFDEF or (cp & 0xFFFE) == 0xFFFE


@lru_cache(maxsize=4096)
def derived_property(cp: int) -> str:
    """RFC 5892 §2 derived property: PVALID | CONTEXTJ | CONTEXTO |
    DISALLOWED | UNASSIGNED."""
    ch = chr(cp)
    if cp in _EXC_PVALID:
        return "PVALID"
    if cp in _EXC_CONTEXTO:
        return "CONTEXTO"
    if cp in _EXC_DISALLOWED:
        return "DISALLOWED"
    cat = unicodedata.category(ch)
    if cat == "Cn" and not _is_noncharacter(cp):
        return "UNASSIGNED"
    if cp == 0x2D or 0x30 <= cp <= 0x39 or 0x61 <= cp <= 0x7A:  # LDH
        return "PVALID"
    if cp in _JOIN_CONTROL:
        return "CONTEXTJ"
    # Unstable: cp != NFKC(casefold(NFKC(cp)))
    if unicodedata.normalize("NFKC", unicodedata.normalize("NFKC", ch).casefold()) != ch:
        return "DISALLOWED"
    # IgnorableProperties: Default_Ignorable / White_Space / Noncharacter
    if cat == "Cf" or _in_ranges(cp, _DI_EXTRA) or ch.isspace() or _is_noncharacter(cp):
        return "DISALLOWED"
    if _in_ranges(cp, _IGNORABLE_BLOCKS):
        return "DISALLOWED"
    if _in_ranges(cp, _OLD_HANGUL_JAMO):
        return "DISALLOWED"
    if cat in _LETTER_DIGIT_CATS:
        return "PVALID"
    return "DISALLOWED"


# ------------------------------------------------------- context rules


def _is_virama(ch: str) -> bool:
    return unicodedata.combining(ch) == 9


# Joining_Type (UCD ArabicShaping.txt) for the RFC 5892 Appendix A.1 ZWNJ
# regular-expression branch.  Primary source: the public `idna` package's
# bundled UCD tables; fallback: a small embedded table of the core
# Arabic/Syriac letters (the ranges ZWNJ legitimately appears in), with
# Mn/Me/Cf defaulting to Transparent per UAX #44 and everything else to
# non-joining — strictly narrower than the spec, never wider.
_JT_FALLBACK: dict[int, str] = {0x0640: "C", 0x0671: "R", 0x0710: "R"}
for _lo, _hi, _v in (
    (0x0622, 0x0625, "R"), (0x0627, 0x0627, "R"), (0x0629, 0x0629, "R"),
    (0x062F, 0x0632, "R"), (0x0648, 0x0648, "R"),
    (0x0626, 0x0626, "D"), (0x0628, 0x0628, "D"), (0x062A, 0x062E, "D"),
    (0x0633, 0x063A, "D"), (0x0641, 0x0647, "D"), (0x0649, 0x064A, "D"),
    (0x0712, 0x0714, "D"), (0x0715, 0x0719, "R"), (0x071A, 0x071D, "D"),
    (0x071E, 0x071E, "R"), (0x071F, 0x0727, "D"), (0x0728, 0x0728, "R"),
    (0x0729, 0x0729, "D"), (0x072A, 0x072A, "R"), (0x072B, 0x072B, "D"),
    (0x072C, 0x072C, "R"),
):
    for _cp in range(_lo, _hi + 1):
        _JT_FALLBACK[_cp] = _v


@lru_cache(maxsize=1)
def _joining_table() -> dict:
    try:
        from idna.idnadata import joining_types

        t = joining_types() if callable(joining_types) else joining_types
        # older idna versions store ord values; normalize to str
        return {cp: (chr(v) if isinstance(v, int) else v) for cp, v in t.items()}
    except Exception:
        return _JT_FALLBACK


def _joining_type(ch: str) -> str:
    v = _joining_table().get(ord(ch))
    if v:
        return v
    if unicodedata.category(ch) in ("Mn", "Me", "Cf"):
        return "T"
    return "U"


def _zwnj_regexp_ok(label: str, i: int) -> bool:
    """RFC 5892 Appendix A.1 second branch:
    (Joining_Type:{L,D}) (T)* ZWNJ (T)* (Joining_Type:{R,D})."""
    j = i - 1
    while j >= 0 and _joining_type(label[j]) == "T":
        j -= 1
    if j < 0 or _joining_type(label[j]) not in ("L", "D"):
        return False
    j = i + 1
    while j < len(label) and _joining_type(label[j]) == "T":
        j += 1
    return j < len(label) and _joining_type(label[j]) in ("R", "D")


def _greek(ch: str) -> bool:
    cp = ord(ch)
    return 0x0370 <= cp <= 0x03FF or 0x1F00 <= cp <= 0x1FFF


def _hebrew(ch: str) -> bool:
    return 0x0590 <= ord(ch) <= 0x05FF


def _han_kana(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x3040 <= cp <= 0x30FF and cp != 0x30FB  # Hiragana/Katakana
        or 0x3400 <= cp <= 0x9FFF  # Han
        or 0xF900 <= cp <= 0xFAFF
        or 0x31F0 <= cp <= 0x31FF
    )


def _context_ok(label: str, i: int) -> bool:
    """CONTEXTJ/CONTEXTO rule for label[i] (RFC 5892 Appendix A)."""
    cp = ord(label[i])
    prev = label[i - 1] if i > 0 else ""
    nxt = label[i + 1] if i + 1 < len(label) else ""
    if cp == 0x200D:  # ZWJ: virama branch only (Appendix A.2)
        return bool(prev) and _is_virama(prev)
    if cp == 0x200C:  # ZWNJ: virama branch OR Joining_Type regexp (A.1)
        if prev and _is_virama(prev):
            return True
        return _zwnj_regexp_ok(label, i)
    if cp == 0x00B7:  # middle dot: between two 'l'
        return prev == "l" and nxt == "l"
    if cp == 0x0375:  # Greek lower numeral sign: before Greek
        return bool(nxt) and _greek(nxt)
    if cp in (0x05F3, 0x05F4):  # Hebrew punctuation: after Hebrew
        return bool(prev) and _hebrew(prev)
    if cp == 0x30FB:  # katakana middle dot: label has Han/Kana
        return any(_han_kana(c) for c in label)
    if 0x0660 <= cp <= 0x0669:  # Arabic-Indic: no Extended mix
        return not any(0x06F0 <= ord(c) <= 0x06F9 for c in label)
    if 0x06F0 <= cp <= 0x06F9:
        return not any(0x0660 <= ord(c) <= 0x0669 for c in label)
    return False


# ------------------------------------------------------------ bidi rule

_RTL = {"R", "AL", "AN"}


def _bidi_label_ok(label: str) -> bool:
    """RFC 5893 §2 per-label rule (applied when the domain is a bidi
    domain name)."""
    if not label:
        return True
    classes = [unicodedata.bidirectional(c) or "L" for c in label]
    first = classes[0]
    if first in ("R", "AL"):
        allowed = {"R", "AL", "AN", "EN", "ES", "CS", "ET", "ON", "BN", "NSM"}
        if any(c not in allowed for c in classes):
            return False
        if "AN" in classes and "EN" in classes:
            return False
        last = next((c for c in reversed(classes) if c != "NSM"), None)
        return last in ("R", "AL", "AN", "EN")
    if first == "L":
        allowed = {"L", "EN", "ES", "CS", "ET", "ON", "BN", "NSM"}
        if any(c not in allowed for c in classes):
            return False
        last = next((c for c in reversed(classes) if c != "NSM"), None)
        return last in ("L", "EN")
    return False


# ------------------------------------------------------------- labels


def _ulabel_ok(label: str) -> bool:
    """RFC 5891 §4.2.3 + RFC 5892 checks for one (already lowercase)
    U-label or LDH label."""
    if not label or len(label.encode("utf-8")) > 63 * 4:
        return False
    if unicodedata.normalize("NFC", label) != label:
        return False
    if label.startswith("-") or label.endswith("-"):
        return False
    if len(label) >= 4 and label[2] == "-" and label[3] == "-":
        # hyphen-3-4 reserved for A-labels; handled by caller for xn--
        return False
    if unicodedata.category(label[0]) in ("Mn", "Mc", "Me"):
        return False
    for i, ch in enumerate(label):
        prop = derived_property(ord(ch))
        if prop == "PVALID":
            continue
        if prop in ("CONTEXTJ", "CONTEXTO"):
            if not _context_ok(label, i):
                return False
            continue
        return False
    # A-label length bound on the wire form
    try:
        if label.isascii():
            return len(label) <= 63
        return len("xn--" + label.encode("punycode").decode("ascii")) <= 63
    except UnicodeError:
        return False


def _alabel_ok(label: str) -> bool:
    """xn-- label: decode punycode, validate the U-label, round-trip."""
    if len(label) > 63:
        return False
    try:
        u = label[4:].encode("ascii").decode("punycode")
    except (UnicodeError, UnicodeDecodeError):
        return False
    if u.isascii():  # A-label must encode actual non-ASCII
        return False
    if not _ulabel_ok(u):
        return False
    try:
        return ("xn--" + u.encode("punycode").decode("ascii")).lower() == label.lower()
    except UnicodeError:
        return False


def is_idna2008_hostname(s: str) -> bool:
    """Validate a (possibly internationalized) hostname under IDNA2008.
    ASCII uppercase is case-mapped first (standard lookup pre-mapping);
    non-ASCII must already be in canonical (lowercase, NFC) U-label form.
    """
    if not s or len(s) > 253 * 4:
        return False
    # standard pre-mapping for the ASCII range only
    s = "".join(c.lower() if c.isascii() else c for c in s)
    if s.endswith("."):  # trailing root dot: not part of the format
        return False
    labels = s.split(".")
    total = 0
    for lbl in labels:
        if lbl.lower().startswith("xn--"):
            if not _alabel_ok(lbl):
                return False
            total += len(lbl) + 1
        else:
            if not _ulabel_ok(lbl):
                return False
            total += (len(lbl) if lbl.isascii() else len("xn--" + lbl.encode("punycode").decode("ascii"))) + 1
    if total - 1 > 253:
        return False
    # bidi domain: any RTL char anywhere triggers the rule for EVERY label
    def decoded(lbl: str) -> str:
        if lbl.lower().startswith("xn--"):
            try:
                return lbl[4:].encode("ascii").decode("punycode")
            except (UnicodeError, UnicodeDecodeError):
                return lbl
        return lbl

    dlabels = [decoded(lbl) for lbl in labels]
    if any(unicodedata.bidirectional(c) in _RTL for lbl in dlabels for c in lbl):
        return all(_bidi_label_ok(lbl) for lbl in dlabels)
    return True
