"""Clause state machine vs hand-computed transcripts of
server/src/services/pdfService.js:106-238 (every branch of SURVEY.md §2.8
X1-X13 and the §7.4.3 quirks)."""

from pdf_parser_spark.kernels.clauses import (
    ClauseResult,
    extract_clauses,
    serialize_clauses,
)


def run(*pages: str) -> ClauseResult:
    return extract_clauses(list(pages))


def test_basic_flow():
    r = run("INTRODUCTION.\n1.\nThe supplier shall deliver.\n2.\nPayment is due.")
    # sentences: ["INTRODUCTION.", "1.", "The supplier shall deliver.", ...]
    # "INTRODUCTION." sets clauseStarted; it is not a point header; with no
    # currentPoint nothing accumulates.
    assert r.error is None
    assert r.clauses == {
        "1.": "The supplier shall deliver.",
        "2.": "Payment is due.",
    }


def test_pre_introduction_discard():
    # text before INTRODUCTION: accumulation is deleted per separated token
    # (pdfService.js:219-223)
    r = run("Agreement cover page.\n1.\nIgnored preamble.\nINTRODUCTION.\n2.\nKept.")
    assert "1." not in r.clauses  # started before clauseStarted -> discarded
    assert r.clauses == {"2.": "Kept."}


def test_nested_regime_requires_intro_state():
    # After any clause exists (result not exactly {'x':'INTRODUCTION '}),
    # in-token separated matching uses the NESTED regex: "2." on its own
    # line inside a sentence does NOT open a clause, but "1.1." does.
    r = run("INTRODUCTION.\n1.\nBody one.\ntext with\n1.1.\nnested body.")
    assert r.clauses == {"1.": "Body one. text with", "1.1.": "nested body."}


def test_standalone_token_regime():
    # A token that IS "2." (own sentence) matches X1 regardless of regime.
    r = run("INTRODUCTION.\n1.\nBody. 2. Second body.")
    assert r.clauses == {"1.": "Body.", "2.": "Second body."}


def test_end_marker_stops():
    r = run("INTRODUCTION.\n1.\nKept text.\n**End of Clauses**\nAppendix Z ignored.")
    assert r.clauses == {"1.": "Kept text."}
    # garbled variants too
    r2 = run("INTRODUCTION.\n1.\nKept.\n**¥*% End of clauses ***\nNope.")
    assert r2.clauses == {"1.": "Kept."}


def test_end_marker_as_whole_sentence_token():
    # "**End of Clauses**" as the full token matches X1 -> becomes a
    # "point" with empty body (pdfService.js:147-160 runs before the
    # separated loop that would set stopExtracting). Reference behavior:
    # the marker key appears in result.
    r = run("INTRODUCTION.\n1.\nKept. **End of Clauses** ignored tail")
    # token list: ["INTRODUCTION.", "1.", "Kept.", "**End of Clauses** ignored tail"]
    # last token contains the marker but is not == it, no X1 match; its
    # separated parts accumulate into "1." BUT the part is not exactly an
    # end marker literal, so extraction does not stop.
    assert r.clauses["1."].startswith("Kept. **End of Clauses** ignored tail")


def test_table_trigger_deletes_current_clause_and_records_chunk():
    pages = [
        "INTRODUCTION.\n1.\nDoomed text.\nTABLE 1 follows.\n2.\nAfter table.",
        "Page two body.",
    ]
    r = extract_clauses(pages)
    # TABLE token fires -> current clause "1." deleted; chunk = pages 1-2
    assert "1." not in r.clauses
    assert r.table_pages == [1, 2]
    # per-page trim (pdfService.js:235-237) fuses across the page boundary
    assert r.clauses == {"2.": "After table.Page two body."}


def test_table_chunking_by_five():
    # 7 pages; TABLE on page 6 -> only the second chunk (pages 6,7) recorded
    pages = ["INTRODUCTION.\n1.\nBody."] + ["Filler text."] * 4
    pages += ["TABLE here.", "Tail."]
    r = extract_clauses(pages)
    assert r.table_pages == [6, 7]


def test_table_before_clause_start_sticky_flag():
    # tableEncountered is only reset when a NEW point opens
    # (pdfService.js:156,210): a TABLE seen before INTRODUCTION leaves the
    # flag set, so the first token processed after clauseStarted flips on
    # still records the chunk. Faithful to the reference.
    r = run("TABLE of contents.\nINTRODUCTION.\n1.\nBody.")
    assert r.table_pages == [1]
    assert r.clauses == {"1.": "Body."}


def test_validation_error():
    r = run("INTRODUCTION.\n1.\nSome text.\na.\nlettered point.\ni)\nanother.")
    assert r.error is not None
    assert r.error.startswith("Validation error, we found some points")
    assert "a." in r.error and "i)" in r.error
    assert r.clauses == {}


def test_validation_not_checked_before_intro_or_after_stop():
    r = run("a.\npre-intro is fine.\nINTRODUCTION.\n1.\nBody.\n**End of Clauses**\na.\npost.")
    assert r.error is None


def test_hash_block_ignored():
    r = run("INTRODUCTION.\n1.\nKept.\n## internal note\nhidden stuff\nnote end ##\nAlso kept.")
    # "## internal note" toggles inside_double_hash on (starts with ##);
    # the whole-sentence token path: these are separated tokens of one
    # sentence (no [.!?] inside) - hidden lines skipped, "note end ##"
    # toggles off via endswith ## and is itself ignored.
    assert r.clauses == {"1.": "Kept. Also kept."}


def test_hash_singleline_ignore_token():
    # "##x##" both starts and ends -> ignoreToken, double toggle = no-op
    r = run("INTRODUCTION.\n1.\nKept.\n##secret##\nAlso kept.")
    assert r.clauses == {"1.": "Kept. Also kept."}


def test_unclosed_hash_block_eats_rest_of_page_not_next_page():
    pages = [
        "INTRODUCTION.\n1.\nKept.\n## open block\nhidden. hidden two.",
        "Next page text.",
    ]
    r = extract_clauses(pages)
    # inside_double_hash persists to end of page 1 (later sentence tokens
    # are skipped entirely), resets for page 2
    assert r.clauses == {"1.": "Kept.Next page text."}  # page-end trim fuses


def test_repeated_point_header_appends_header_text():
    # second "1." token: key exists -> result[currentPoint] += "1."
    r = run("INTRODUCTION.\n1.\nBody. 1. More.")
    # tokens: INTRODUCTION. / 1. / Body. / 1. / More.
    # 2nd "1.": exists -> result["1."] += "1." (no trailing space, so the
    # following body token fuses: "Body. " + "1." + "More. ")
    assert r.clauses == {"1.": "Body. 1.More."}


def test_undefined_quirk_after_table_delete():
    # TABLE deletes current clause and clears currentPoint; a repeated
    # header then appends to result[""] producing the JS "undefined" quirk
    r = run("INTRODUCTION.\n1.\nBody.\nTABLE x.\n1.\nSecond.")
    # after TABLE: result {}, currentPoint "". Token "1.": X1 matches, key
    # "1." not in result -> normal open. So to hit the quirk we need the
    # repeated key to survive the delete:
    r2 = run("INTRODUCTION.\n1.\nBody. 2. Two.\nTABLE x.\n2.\nAgain.")
    # after TABLE: "2." deleted, "1." remains, currentPoint "".
    # Token "2.": not in result -> reopens normally. Quirk needs key present:
    r3 = run("INTRODUCTION.\n1.\nBody. 2. Two.\nTABLE x.\n1.\nAgain.")
    # Token "1." IS in result -> result[""] = undefined + "1." — but the
    # NEXT token's still-sticky tableEncountered deletes result[""] again
    # (pdfService.js:134), so the quirk is transient here:
    assert r3.clauses == {"1.": "Body."}
    # ...and observable when the repeated header is the page's LAST token:
    r4 = run("INTRODUCTION.\n1.\nBody. 2. Two.\nTABLE x.\n1.")
    assert r4.clauses.get("") == "undefined1."
    assert r.error is None and r2.error is None


def test_per_page_trim_loses_cross_page_space():
    pages = ["INTRODUCTION.\n1.\nFirst part", "second part."]
    r = extract_clauses(pages)
    # page-end trim removes the trailing space -> concatenation fuses words
    assert r.clauses == {"1.": "First partsecond part."}


def test_whitespace_collapse_in_body():
    r = run("INTRODUCTION.\n1.\nA   lot\tof   space.")
    assert r.clauses == {"1.": "A lot of space."}


def test_serialize_stable():
    r = run("INTRODUCTION.\n1.\nB.\n2.\nC.")
    assert serialize_clauses(r.clauses) == "1. B.\n\n2. C."


def test_empty_doc():
    assert extract_clauses([]).clauses == {}
    assert extract_clauses([""]).clauses == {}
