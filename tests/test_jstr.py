"""JS string-semantics helpers (kernels/jstr.py) vs transcribed
pdfService.js behavior (reference: server/src/services/pdfService.js)."""

from pdf_parser_spark.kernels.jstr import (
    INVALID_POINT,
    JS_WS,
    NESTED_POINT,
    POINT_HEADER,
    js_collapse_ws,
    js_trim,
    match_prefix,
)

EXPECTED_WS = (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000, 0xFEFF]
)


def test_js_ws_class_exact():
    assert sorted(ord(c) for c in set(JS_WS)) == sorted(EXPECTED_WS)
    # NEL and the ASCII separators are Python-\s but NOT JS-\s
    assert "\x85" not in JS_WS and "\x1c" not in JS_WS


def test_collapse_and_trim():
    assert js_collapse_ws("a \t\n b") == "a b"
    bom = "﻿"
    assert js_collapse_ws(f"a{bom}{bom}b") == "a b"  # BOM is JS-ws
    assert js_collapse_ws("a\x85b") == "a\x85b"  # NEL is not
    assert js_trim(f"{bom} x {bom}") == "x"


def test_point_header():
    assert match_prefix(POINT_HEADER, "1.") == "1."
    assert match_prefix(POINT_HEADER, "2.3.") == "2.3."
    assert match_prefix(POINT_HEADER, "10.2.4.") == "10.2.4."
    assert match_prefix(POINT_HEADER, "**End of Clauses**") == "**End of Clauses**"
    # JS $ has no trailing-newline grace (unlike Python $)
    assert match_prefix(POINT_HEADER, "1.\n") is None
    assert match_prefix(POINT_HEADER, "1") is None
    assert match_prefix(POINT_HEADER, "1. ") is None
    assert match_prefix(POINT_HEADER, "x 1.") is None


def test_nested_point():
    assert match_prefix(NESTED_POINT, "1.") is None  # top-level excluded
    assert match_prefix(NESTED_POINT, "1.1.") == "1.1."
    assert match_prefix(NESTED_POINT, "2.3.4.") == "2.3.4."
    assert match_prefix(NESTED_POINT, "2.3.4...") == "2.3.4..."  # (\.)+ greed
    assert match_prefix(NESTED_POINT, "**End of Clauses**") is None
    # the literal backslash alternative (never fires in real text)
    assert match_prefix(NESTED_POINT, "x \\End of Clauses\\") is not None


def test_invalid_point():
    for s in ["a.", "A.", "i.", "I.", "a)", "A)", "i)", "I)"]:
        assert match_prefix(INVALID_POINT, s) is not None, s
    for s in ["b.", "ii.", "1.", "(a)", "aa."]:
        assert match_prefix(INVALID_POINT, s) is None, s
    # prefix match (JS match is a search): trailing text allowed
    assert match_prefix(INVALID_POINT, "a. lorem") == "a."
