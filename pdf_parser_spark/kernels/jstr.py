"""JavaScript string/regex semantics helpers.

The reference clause engine is JavaScript (reference:
server/src/services/pdfService.js). Its behavior depends on JS-specific
string semantics that differ from Python's defaults:

- JS ``\\s`` / ``String.prototype.trim()`` whitespace class is
  ``[\\t\\n\\v\\f\\r \\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff]``
  — it INCLUDES U+FEFF (BOM) and EXCLUDES U+0085 (NEL) and U+001C-001F,
  which Python's ``\\s`` treats oppositely (SURVEY.md §7.4.2).
- JS ``\\d`` is ASCII ``[0-9]`` only; Python ``\\d`` matches Unicode digits.
- JS ``$`` without the ``m`` flag matches ONLY at end-of-string (Python's
  ``$`` also matches before a trailing newline) -> we translate to ``\\Z``.

Every regex from the reference is translated here once, with the original
cited, so the state machine code reads 1:1 against pdfService.js.
"""

from __future__ import annotations

import re

# Exact JS WhiteSpace + LineTerminator class (ECMA-262 12.2, 12.3):
# TAB LF VT FF CR SP NBSP OGHAM U+2000-200A LS PS NNBSP MMSP IDSP BOM.
JS_WS = (
    "\t\n\x0b\x0c\r \xa0 "
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "    　﻿"
)
_JS_WS_CLASS = "[" + re.escape(JS_WS) + "]"
_JS_WS_RUN = re.compile(_JS_WS_CLASS + "+")


def js_trim(s: str) -> str:
    """``String.prototype.trim()`` — strips the JS whitespace class."""
    return s.strip(JS_WS)


def js_collapse_ws(s: str) -> str:
    """``.replace(/\\s+/g, " ")`` with JS ``\\s`` semantics
    (pdfService.js:214)."""
    return _JS_WS_RUN.sub(" ", s)


# pdfService.js:148 — /^(?:\d+(\.\d+)*\.$|\*\*End of Clauses\*\*)$/
# Matches a whole token that is a dotted point header ("1.", "2.3.", ...)
# or the literal end marker. JS `$` == \Z (no trailing-newline grace).
POINT_HEADER = re.compile(
    r"^(?:[0-9]+(?:\.[0-9]+)*\.\Z|\*\*End of Clauses\*\*\Z)"
)

# pdfService.js:179 — /^\d+(\.\d+)+(\.)+$|\\End of Clauses\\$/
# First alternative: NESTED points only ("1.1.", "2.3.4."; plain "1."
# does not match). Second alternative is unanchored-at-start and requires
# a literal backslash-delimited marker at end-of-string — in practice it
# never fires; preserved for parity (SURVEY.md §7.4, quirk X2).
NESTED_POINT = re.compile(
    r"^[0-9]+(?:\.[0-9]+)+\.+\Z|\\End of Clauses\\\Z"
)

# pdfService.js:38 — /^(?:(?:[aA]|[iI])\.|[aAiI]\))/
# Lettered list markers are validation errors.
INVALID_POINT = re.compile(r"^(?:(?:[aA]|[iI])\.|[aAiI]\))")


def match_prefix(rx: re.Pattern, s: str) -> str | None:
    """JS ``str.match(rx)[0]`` for a non-global regex: first match's text,
    or None. Uses ``search`` because JS regexes are not implicitly
    anchored (NESTED_POINT's 2nd alternative is start-unanchored)."""
    m = rx.search(s)
    return m.group(0) if m else None
