"""Extraction stages as Arrow-batched mapInPandas operators.

Design (SURVEY.md §2.11, §3.4): the whole per-document transform is
expressed as vectorized stages over Arrow record batches — never
row-at-a-time Python UDFs. The per-document kernels are irreducibly
sequential *within* a document (the clause fold is order-sensitive,
A1/T6), but documents are independent, so a batch of N documents is
processed in one Python invocation with zero per-row serialization
overhead; Arrow moves the bytes.

Two APIs:

1. ``extract_stage(df)`` — the FUSED production path. One mapInPandas
   pass per document: kind-route -> decode -> OCR -> clauses -> tables ->
   html. No shuffle anywhere between sub-stages, and the multi-MB
   ``html``/page-raster bytes never cross an exchange: the only shuffle
   in the whole job is the salted repartition BEFORE this stage, and only
   result-sized rows flow after it. This is the plan that survives 100 TB.

2. Staged operators (``decode_pages`` -> explode -> ``ocr_pages`` ->
   ``clause_stage`` / ``table_stage`` + join) — the reference's
   process-boundary decomposition (SURVEY.md §3.2) as composable Spark
   operators. Correct but shuffle-heavier (page rasters cross an
   exchange); used for plan inspection, per-stage testing, and as the
   J1-join demonstration. The fused path is what jobs run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..oracle import ExtractedDoc, extract_document


def _doc_to_row(d: ExtractedDoc) -> dict:
    return {
        "url": d.url,
        "doc_sha": d.doc_sha,
        "kind": d.kind,
        "n_pages": d.n_pages,
        "extracted_text": d.extracted_text,
        "title": d.title,
        "clauses": d.clauses,
        "clauses_json": d.clauses_json,
        "table_pages": d.table_pages,
        "tables": (
            [{"page_no": p, "cells": c} for p, c in d.tables]
            if d.tables is not None
            else None
        ),
        "tables_json": d.tables_json,
        "n_chars": (
            len(d.extracted_text) if d.extracted_text is not None else None
        ),
        "error": d.error,
    }


def extract_stage(df: DataFrame) -> DataFrame:
    """Fused per-document extraction: (url, html:binary, ...) ->
    schemas.EXTRACTED. Documents are independent; each Arrow batch is one
    Python invocation (the reference's six process boundaries collapse
    into this single exchange, SURVEY.md §3.4)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _doc_to_row(extract_document(u, bytes(b) if b is not None else b""))
                for u, b in zip(pdf["url"], pdf["html"])
            ]
            yield pd.DataFrame(rows)

    return df.select("url", "html").mapInPandas(run, schema=schemas.EXTRACTED)


# --------------------------------------------------------------- staged API


def decode_pages(df: DataFrame) -> DataFrame:
    """S2/S3/S7 analogue: (url, html) -> one row per page
    (url, page_no, width, height, pixels, images). ``images`` is the
    page's embedded-image list in index order (S4/O4, reference
    python/app.py:44-57 — the reference persists page_{n}_img_{i}.png
    files; here they ride the page row). Undecodable docs yield zero
    pages here; the fused path is authoritative for error rows."""
    from ..kernels import raster

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for u, b in zip(pdf["url"], pdf["html"]):
                blob = bytes(b) if b is not None else b""
                if raster.detect_kind(blob) != "pdf":
                    continue
                try:
                    pages = raster.decode(blob)
                except raster.RasterError:
                    continue
                try:
                    images = raster.decode_images(blob)
                except raster.RasterError:
                    # a corrupt OPTIONAL IMGS section must not drop the
                    # document's valid pages — pages carry empty image
                    # lists instead (round-2 ADVICE)
                    images = {}
                for i, p in enumerate(pages, start=1):
                    h, w = p.shape
                    out.append(
                        {
                            "url": u,
                            "page_no": i,
                            "width": w,
                            "height": h,
                            "pixels": p.tobytes(),
                            "images": [
                                {
                                    "idx": idx,
                                    "width": img.shape[1],
                                    "height": img.shape[0],
                                    "pixels": img.tobytes(),
                                }
                                for idx, img in images.get(i, [])
                            ],
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "page_no", "width", "height", "pixels", "images",
                ],
            )

    return df.select("url", "html").mapInPandas(run, schema=schemas.PAGE)


def ocr_pages(pages: DataFrame) -> DataFrame:
    """Page raster -> page text (the tesseract 'recognize' analogue,
    pdfService.js:98), as a vectorized stage."""
    import numpy as np

    from ..kernels.glyphs import decode_page_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [
                decode_page_text(
                    np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                )
                for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "page_no": pdf["page_no"],
                    "page_text": texts,
                }
            )

    schema = "url string, page_no int, page_text string"
    # prune to the OCR inputs so the embedded-image column (S4) never
    # crosses the Arrow boundary here
    return pages.select("url", "page_no", "width", "height", "pixels").mapInPandas(
        run, schema=schema
    )


def clause_stage(page_texts: DataFrame) -> DataFrame:
    """Per-document clause fold over collected page texts:
    (url, page_no, page_text) -> (url, clauses_json, table_pages, error).

    The cross-row step (collect pages of a doc) is a native Spark agg —
    sort_array(collect_list(struct(page_no, page_text))) — so the only
    Python work is the per-doc fold. groupBy('url') is the one shuffle,
    and it moves page TEXT (KB), not rasters (MB)."""
    import json

    from ..kernels.clauses import extract_clauses, serialize_clauses

    collected = page_texts.groupBy("url").agg(
        F.sort_array(F.collect_list(F.struct("page_no", "page_text"))).alias(
            "pages"
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, pages in zip(pdf["url"], pdf["pages"]):
                texts = [p["page_text"] for p in pages]
                cr = extract_clauses(texts)
                rows.append(
                    {
                        "url": u,
                        "extracted_text": (
                            serialize_clauses(cr.clauses)
                            if cr.error is None
                            else None
                        ),
                        "clauses_json": (
                            json.dumps(cr.clauses, ensure_ascii=False)
                            if cr.error is None
                            else None
                        ),
                        "table_pages": cr.table_pages,
                        "error": cr.error,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "extracted_text", "clauses_json", "table_pages",
                    "error",
                ],
            )

    schema = (
        "url string, extracted_text string, clauses_json string, "
        "table_pages array<int>, error string"
    )
    return collected.mapInPandas(run, schema=schema)


def table_stage(pages: DataFrame, flagged: DataFrame) -> DataFrame:
    """F3 analogue: run table extraction ONLY on clause-flagged pages.
    ``flagged`` is (url, page_no) — the semi-join prunes raster rows
    BEFORE any pixel work."""
    import numpy as np

    from ..kernels.tables import extract_table

    todo = pages.select(
        "url", "page_no", "width", "height", "pixels"
    ).join(flagged, ["url", "page_no"], "left_semi")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cells = [
                extract_table(np.frombuffer(px, dtype=np.uint8).reshape(h, w))
                for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "page_no": pdf["page_no"],
                    "cells": cells,
                }
            )

    schema = "url string, page_no int, cells array<array<string>>"
    return todo.mapInPandas(run, schema=schema)


def html_stage(df: DataFrame) -> DataFrame:
    """North-rule HTML path as its own stage: (url, html) ->
    (url, extracted_text, title, n_blocks, n_content_blocks, error)."""
    from ..kernels.html_extract import extract_html

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, b in zip(pdf["url"], pdf["html"]):
                blob = bytes(b) if b is not None else b""
                try:
                    r = extract_html(blob)
                    rows.append(
                        {
                            "url": u,
                            "extracted_text": r.text,
                            "title": r.title,
                            "n_blocks": r.n_blocks,
                            "n_content_blocks": r.n_content_blocks,
                            "error": None,
                        }
                    )
                except Exception as e:
                    rows.append(
                        {
                            "url": u,
                            "extracted_text": None,
                            "title": None,
                            "n_blocks": None,
                            "n_content_blocks": None,
                            "error": str(e)[:200],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "extracted_text", "title", "n_blocks",
                    "n_content_blocks", "error",
                ],
            )

    schema = (
        "url string, extracted_text string, title string, n_blocks int, "
        "n_content_blocks int, error string"
    )
    return df.select("url", "html").mapInPandas(run, schema=schema)
