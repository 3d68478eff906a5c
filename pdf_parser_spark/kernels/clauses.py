"""Clause-extraction state machine — a 1:1 semantic port of the reference's
JS engine (reference: server/src/services/pdfService.js:42-247), including
its quirks (SURVEY.md §7.4.3). Pure per-document function: the oracle calls
it doc-at-a-time, the Spark stage calls it per row inside an Arrow batch.

Faithfully-preserved reference behaviors (each pinned by a test):

- pages are processed in CHUNKS of 5 (pdfService.js:89-94); when a TABLE
  trigger fires mid-page with ``clauseStarted && !stopExtracting``, ALL
  pages of the *current chunk* are recorded as table pages
  (pdfService.js:121-133 iterates ``chunk``, not the current file).
- the recorded "page id" in the reference is the whole file path due to the
  ``match.input`` bug (pdfService.js:124-127, quirk X12); we carry the
  structural ``page_no`` instead (the bug is path-shape-dependent and has
  no analogue when pages never live on a filesystem).
- on a TABLE trigger the CURRENT clause is deleted (pdfService.js:134-136).
- ``result[currentPoint] += ...`` when ``currentPoint`` is absent from the
  dict reproduces JS ``undefined + "x" == "undefinedx"`` (pdfService.js:154).
- the X1/X2 regex regime switch keyed on the dict being exactly
  ``{* : 'INTRODUCTION '}`` (pdfService.js:174-180).
- hash-block toggles: a token inside a double-hash block is skipped
  entirely, INCLUDING the toggles themselves, so an unclosed block eats
  the rest of the page (branch guard at pdfService.js:151,162).
- values are trimmed at the END OF EVERY PAGE (pdfService.js:235-237), so
  text accumulated across a page boundary loses its separating space.
- validation failure (lettered points, pdfService.js:37-39,165-170) raises
  after the offending page (pdfService.js:231-233); in the engine this
  becomes an error ROW, never a job failure.

Deviation from the reference (documented, deliberate): the reference's
``this.ClausePages`` lives on a process-wide singleton and leaks across
requests (pdfService.js:22,128); a stateless engine scopes it per document.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .jstr import (
    INVALID_POINT,
    NESTED_POINT,
    POINT_HEADER,
    js_collapse_ws,
    js_trim,
    match_prefix,
)
from .sbd import split_sentences

CHUNK_SIZE = 5  # pdfService.js:89

# pdfService.js:184-188 — exact end-marker literals incl. OCR-garble variants
END_MARKERS = (
    "**End of Clauses**",
    "**End of Clauses™**",
    "**End of Clauses™*",
    "“*End of clauses™",
    "**¥*% End of clauses ***",
)

VALIDATION_ERROR_PREFIX = (
    "Validation error, we found some points which are not allowed i.e "
)


@dataclass
class ClauseResult:
    clauses: dict[str, str] = field(default_factory=dict)
    table_pages: list[int] = field(default_factory=list)
    error: str | None = None


def extract_clauses(page_texts: list[str]) -> ClauseResult:
    """Run the clause state machine over a document's ordered page texts.

    ``page_texts[i]`` is the decoded text of page ``i+1`` (1-based pages,
    matching the reference's ``page_{n}`` naming, python/app.py:43).
    """
    result: dict[str, str] = {}
    current_point = ""
    table_encountered = False
    clause_started = False
    stop_extracting = False
    non_validated: list[str] = []
    table_pages: list[int] = []

    pages = [(i + 1, t) for i, t in enumerate(page_texts)]
    chunks = [pages[i : i + CHUNK_SIZE] for i in range(0, len(pages), CHUNK_SIZE)]

    for chunk in chunks:
        chunk_page_nos = [p for p, _ in chunk]
        for _page_no, text in chunk:
            tokens = split_sentences(text)
            cleaned_text = ""  # noqa: F841 — mirrors JS var; kept for parity
            inside_double_hash = False
            ignore_token = False

            for token in tokens:
                # pdfService.js:115-119
                if "TABLE" in token:
                    table_encountered = True

                # pdfService.js:121-137
                if table_encountered:
                    if clause_started and not stop_extracting:
                        # reference records every file of the current chunk
                        for p in chunk_page_nos:
                            if p not in table_pages:
                                table_pages.append(p)
                    result.pop(current_point, None)
                    current_point = ""
                    cleaned_text = ""

                # pdfService.js:139-143
                if "INTRODUCTION" in token:
                    clause_started = True

                token_separated = token.split("\n")  # pdfService.js:145

                point_match = match_prefix(POINT_HEADER, token)  # :147-149

                if point_match and not stop_extracting and not inside_double_hash:
                    # pdfService.js:151-160
                    if point_match in result:
                        cleaned_text = point_match
                        # JS: result[currentPoint] += x with possibly-missing
                        # key -> "undefined" + x (quirk, see module docstring)
                        result[current_point] = (
                            result.get(current_point, "undefined") + cleaned_text
                        )
                    else:
                        table_encountered = False
                        current_point = point_match
                        result[current_point] = ""
                elif not inside_double_hash:
                    # pdfService.js:162-224 (tokenSeparated is always truthy)
                    for sep in token_separated:
                        # validation — pdfService.js:165-170
                        if (
                            not stop_extracting
                            and clause_started
                            and not table_encountered
                        ):
                            vp = match_prefix(INVALID_POINT, sep)
                            if vp:
                                non_validated.append(vp)

                        # regime switch — pdfService.js:174-180
                        if (
                            len(result) == 1
                            and next(iter(result.values())) == "INTRODUCTION "
                        ):
                            sep_match = match_prefix(POINT_HEADER, sep)
                        else:
                            sep_match = match_prefix(NESTED_POINT, sep)

                        # end markers — pdfService.js:184-190
                        if sep in END_MARKERS:
                            stop_extracting = True

                        # hash toggles — pdfService.js:192-203
                        if sep.startswith("##") and sep.endswith("#"):
                            ignore_token = True
                        if (
                            sep.startswith("H#")
                            or sep.startswith("#H#")
                            or sep.startswith("##")
                        ):
                            inside_double_hash = not inside_double_hash
                        if (
                            sep.endswith("#i#")
                            or sep.endswith("##")
                            or sep.endswith("#H#")
                        ):
                            inside_double_hash = not inside_double_hash
                            ignore_token = True

                        # accumulate — pdfService.js:205-216
                        if (
                            sep_match
                            and current_point != sep_match
                            and not stop_extracting
                        ):
                            table_encountered = False
                            current_point = sep_match
                            result[current_point] = ""
                        elif (
                            current_point
                            and not stop_extracting
                            and not ignore_token
                            and not inside_double_hash
                        ):
                            cleaned_text = js_collapse_ws(sep)
                            cleaned_text = js_trim(cleaned_text)
                            result[current_point] = (
                                result.get(current_point, "undefined")
                                + cleaned_text
                                + " "
                            )

                        ignore_token = False  # pdfService.js:218
                        # pre-INTRODUCTION suppression — pdfService.js:219-223
                        if not clause_started:
                            result.pop(current_point, None)
                            current_point = ""
                            cleaned_text = ""

            # per-page epilogue — pdfService.js:231-237
            if non_validated:
                return ClauseResult(
                    clauses={},
                    table_pages=table_pages,
                    error=VALIDATION_ERROR_PREFIX + ",".join(non_validated),
                )
            for key in list(result):
                result[key] = js_trim(result[key])

    return ClauseResult(clauses=result, table_pages=table_pages, error=None)


def serialize_clauses(clauses: dict[str, str]) -> str:
    """Canonical byte-stable serialization of the ordered clause map —
    this is the PDF path's ``extracted_text`` (north rule: byte-identical
    text per url)."""
    return "\n\n".join(f"{k} {v}" for k, v in clauses.items())
