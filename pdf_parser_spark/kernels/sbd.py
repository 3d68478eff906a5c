"""Deterministic sentence-boundary detection.

The reference tokenizes each OCR page text with winkNLP's statistical sbd
(pdfService.js:18,44,107-108). winkNLP is not portable or deterministic
across builds, so — per SURVEY.md §5/X13 — this engine defines its own
rule-based splitter; the single-process oracle and the Spark stages share
this exact function, and the synthetic corpus (FIXTURES.md §3) is composed
against it.

Rule: a sentence boundary occurs after a run of ``.!?`` that is followed
by whitespace; the separating whitespace is consumed. Newlines NOT
preceded by sentence punctuation stay inside the sentence (the state
machine's ``token.split("\\n")`` path, pdfService.js:145, depends on
tokens with internal newlines).
"""

from __future__ import annotations

import re

_BOUNDARY = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    return [s for s in _BOUNDARY.split(text) if s != ""]
