"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Everything is a pure function of (seed, index): no wall clock, no network,
no external data. The corpus covers every branch of the extraction engine:
HTML main-content pages with generator-recorded ground truth, PDF-like
RSTR raster documents exercising the clause state machine and the
table-structure kernels, and adversarial rows for the error channel.

Row-kind mix per FIXTURES.md §1: i%20 -> 0-13 html, 14-18 pdf,
19 adversarial.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np

from .kernels import raster
from .kernels.glyphs import (
    CELL_PAD,
    GLYPH_H,
    GLYPH_W,
    LINE_STEP,
    TEXT_MARGIN_X,
    TEXT_MARGIN_Y,
    render_line,
)

SEED = 42
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

WORDS = (
    "supplier buyer delivery payment notice term party agreement service "
    "goods invoice quantity quality warranty liability claim period law "
    "contract schedule amendment clause obligation breach remedy interest "
    "confidential data material work price tax risk title transfer"
).split()

ZH_WORDS = "合同 条款 供应商 买方 交付 付款 质量 数量 责任 保密 期限 法律".split()
FR_WORDS = "le fournisseur doit livrer les marchandises selon accord et délai".split()

CELL_WORDS = (
    "item qty price total net gross unit code ref date due paid open "
    "a1 b2 c3 d4 e5 f6 g7 h8"
).split()

BOILER_LINKS = ["Home", "About", "Products", "Contact", "Careers", "Blog",
                "Privacy", "Terms", "Sitemap", "Login"]


def _rng(i: int, salt: int = 0) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([SEED, salt, i]))


def _sha8(i: int) -> str:
    return hashlib.sha256(str(i).encode()).hexdigest()[:8]


def url_for(i: int) -> str:
    return f"https://site{i % 101}.example/{_sha8(i)}/page{i}"


def ts_for(i: int) -> datetime:
    return EPOCH + timedelta(seconds=137 * i)


def _sentence(rng: np.random.Generator, words: list[str], n: int) -> str:
    picks = [words[int(rng.integers(0, len(words)))] for _ in range(n)]
    s = " ".join(picks)
    return s[0].upper() + s[1:] + "."


# ---------------------------------------------------------------- HTML path


@dataclass
class HtmlDoc:
    html: bytes
    main_text: str  # generator ground truth (normalized blocks, \n\n-joined)
    title: str
    lang: str


def make_html_doc(i: int) -> HtmlDoc:
    rng = _rng(i, salt=1)
    lang = ["en", "fr", "es", "de", "zh"][i % 5]
    words = ZH_WORDS if lang == "zh" else (FR_WORDS if lang == "fr" else WORDS)
    title = f"Document {i} {_sha8(i)}"

    n_paras = int(rng.integers(2, 6))
    paras: list[str] = []
    for p in range(n_paras):
        n_sent = int(rng.integers(2, 5))
        sents = [_sentence(rng, words, int(rng.integers(8, 18))) for _ in range(n_sent)]
        text = " ".join(sents)
        if p == 1 and lang == "en":
            # entities: ground truth carries the decoded characters
            text += " Smith & Sons agree that 1 < 2."
        paras.append(text)

    nav = "".join(
        f'<a href="/{w.lower()}">{w}</a> ' for w in BOILER_LINKS[: int(rng.integers(4, 9))]
    )
    linkfarm = "".join(
        f'<a href="/p/{k}">{WORDS[k % len(WORDS)]} {k}</a> · '
        for k in range(int(rng.integers(6, 14)))
    )
    para_html = []
    for p, text in enumerate(paras):
        body = (
            text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        if p == n_paras - 1 and rng.random() < 0.5:
            para_html.append(f"<p>{body}")  # malformed: unclosed <p>
        else:
            para_html.append(f"<p>{body}</p>")

    html = f"""<!DOCTYPE html>
<html lang="{lang}"><head><title>{title}</title>
<style>p {{ margin: 0 }} .x > a {{ color: red }}</style>
<script>var x = "<p>not content</p>"; if (1 < 2) {{ x += "&amp;"; }}</script>
</head><body>
<header><nav>{nav}</nav><div>Cookie notice: we use cookies. Accept?</div></header>
<div class="promo">{linkfarm}</div>
<!-- layout table boilerplate -->
<table><tr><td><a href="/x">ad one</a></td><td><a href="/y">ad two</a></td></tr></table>
<article>
{chr(10).join(para_html)}
</article>
<footer><p>© example corp <a href="/privacy">Privacy</a> <a href="/terms">Terms</a></p></footer>
</div></body></html>"""

    norm = [" ".join(t.split()) for t in paras]
    return HtmlDoc(
        html=html.encode("utf-8"),
        main_text="\n\n".join(norm),
        title=title,
        lang=lang,
    )


# ------------------------------------------------------------ PDF-like path


@dataclass
class TableSpec:
    x0: int
    y0: int
    col_widths: list[int]
    row_heights: list[int]
    cells: list[list[str]]  # [row][col] intended text; '' = empty cell
    shifted: set[tuple[int, int]] = field(default_factory=set)

    @property
    def width(self) -> int:
        return sum(self.col_widths)

    @property
    def height(self) -> int:
        return sum(self.row_heights)


def render_table(page: np.ndarray, spec: TableSpec) -> None:
    """Draw a ruled grid with glyph-coded cell text.

    Geometry contract with kernels/tables.py: 1-px lines; the grid-image
    erosion (window 3) shrinks each cell's white component by 1 px per
    side, so the discovered interior origin is (line+2, line+2); glyphs
    are placed at discovered-origin + CELL_PAD so the first-pass decode
    (decode_region at fixed CELL_PAD offsets) aligns exactly. Cells in
    ``shifted`` are drawn +4/+5 px off so the first pass reads empty and
    the retry scan (python/app.py:190-191 analogue) must find them.
    """
    xs = np.cumsum([spec.x0] + spec.col_widths)
    ys = np.cumsum([spec.y0] + spec.row_heights)
    page[ys[0] : ys[-1] + 1, xs] = 0
    page[ys[:, None], np.arange(xs[0], xs[-1] + 1)[None, :]] = 0
    for r in range(len(spec.row_heights)):
        for c in range(len(spec.col_widths)):
            text = spec.cells[r][c]
            if not text:
                continue
            dx, dy = (4, 5) if (r, c) in spec.shifted else (0, 0)
            gx = xs[c] + 2 + CELL_PAD + dx
            gy = ys[r] + 2 + CELL_PAD + dy
            render_line(page, gx, gy, text)


def make_table_spec(
    rng: np.random.Generator, page_w: int, y0: int
) -> TableSpec:
    n_rows = int(rng.integers(2, 5))
    n_cols = int(rng.integers(2, 5))
    # total width >= 520 so the crop's morphology kernel (w//100 >= 5)
    # erodes glyph ink (max vertical run 11 < 3*5-2); see kernels/glyphs.py
    min_total = 520
    base = max(min_total // n_cols + 1, 64)
    col_widths = [base + int(rng.integers(0, 24)) for _ in range(n_cols)]
    if sum(col_widths) > page_w - 80:
        col_widths = [(page_w - 80) // n_cols] * n_cols
    row_heights = [26 + int(rng.integers(0, 8)) for _ in range(n_rows)]
    cells: list[list[str]] = []
    shifted: set[tuple[int, int]] = set()
    for r in range(n_rows):
        row = []
        for c in range(n_cols):
            u = rng.random()
            if u < 0.08:
                row.append("")  # deliberately empty cell
            else:
                w1 = CELL_WORDS[int(rng.integers(0, len(CELL_WORDS)))]
                w2 = CELL_WORDS[int(rng.integers(0, len(CELL_WORDS)))]
                txt = f"{w1} {w2}" if rng.random() < 0.4 else w1
                maxchars = (col_widths[c] - 2 * CELL_PAD - 6) // GLYPH_W
                row.append(txt[:maxchars])
                if u > 0.9:
                    shifted.add((r, c))
        cells.append(row)
    return TableSpec(
        x0=40, y0=y0, col_widths=col_widths, row_heights=row_heights,
        cells=cells, shifted=shifted,
    )


@dataclass
class PdfDoc:
    blob: bytes
    page_lines: list[list[str]]  # rendered text lines per page
    table_specs: dict[int, list[TableSpec]]  # page_no (1-based) -> specs


def _point_bodies(rng: np.random.Generator, n: int) -> list[str]:
    return [_sentence(rng, WORDS, int(rng.integers(5, 11))) for _ in range(n)]


def make_pdf_doc(i: int, invalid: bool = False) -> PdfDoc:
    """Compose a clause-grammar document (FIXTURES.md §3) and render it to
    RSTR pages. Every branch class appears with seeded probability."""
    rng = _rng(i, salt=2)
    page_w = int(rng.integers(600, 861))
    page_h = int(rng.integers(760, 1101))
    max_lines = (page_h - TEXT_MARGIN_Y - GLYPH_H) // LINE_STEP
    max_chars = (page_w - 2 * TEXT_MARGIN_X) // GLYPH_W

    lines: list[str] = []
    lines.append("Agreement cover page ref " + _sha8(i) + ".")
    lines.append(_sentence(rng, WORDS, 6))
    lines.append("INTRODUCTION.")
    n_points = int(rng.integers(2, 7))
    want_table = rng.random() < 0.5
    table_after_point = int(rng.integers(1, n_points + 1)) if want_table else -1
    want_hash = rng.random() < 0.4
    want_nested = rng.random() < 0.5
    for p in range(1, n_points + 1):
        lines.append(f"{p}.")
        for body in _point_bodies(rng, int(rng.integers(1, 4))):
            lines.append(body[: max_chars - 1])
        if want_nested and p == 1:
            lines.append(f"{p}.1.")
            lines.append(_sentence(rng, WORDS, 7)[: max_chars - 1])
        if want_hash and p == 2:
            lines.append("## internal annotation")
            lines.append("hidden line one")
            lines.append("hidden closing ##")
        if invalid and p == n_points:
            lines.append("a. lettered item not allowed.")
        if p == table_after_point:
            lines.append("TABLE 1 follows.")
    if rng.random() < 0.85:
        lines.append("**End of Clauses**")
        lines.append("Appendix Z post end noise.")

    # paginate: tables get their own page bottom band
    text_lines_per_page = min(max_lines, 18)
    pages_lines: list[list[str]] = [
        lines[j : j + text_lines_per_page]
        for j in range(0, len(lines), text_lines_per_page)
    ]

    table_specs: dict[int, list[TableSpec]] = {}
    pages: list[np.ndarray] = []
    for pno, plines in enumerate(pages_lines, start=1):
        page = np.full((page_h, page_w), 255, dtype=np.uint8)
        for k, ln in enumerate(plines):
            render_line(page, TEXT_MARGIN_X, TEXT_MARGIN_Y + k * LINE_STEP, ln)
        has_trigger = any("TABLE" in ln for ln in plines)
        if has_trigger:
            y_text_end = TEXT_MARGIN_Y + len(plines) * LINE_STEP + 9
            specs = []
            spec = make_table_spec(rng, page_w, y_text_end + 12)
            if spec.y0 + spec.height < page_h - 40:
                render_table(page, spec)
                specs.append(spec)
                # occasionally a second table (first-table-only quirk F4)
                y2 = spec.y0 + spec.height + 30
                if rng.random() < 0.3:
                    spec2 = make_table_spec(rng, page_w, y2)
                    if spec2.y0 + spec2.height < page_h - 40:
                        render_table(page, spec2)
                        specs.append(spec2)
            if specs:
                table_specs[pno] = specs
        pages.append(page)

    return PdfDoc(
        blob=raster.encode(pages),
        page_lines=pages_lines,
        table_specs=table_specs,
    )


# ------------------------------------------------------------- corpus rows


def kind_for(i: int) -> str:
    m = i % 20
    if m < 14:
        return "html"
    if m < 19:
        return "pdf"
    return "adversarial"


def make_row(i: int, big_adversarial: bool = False) -> dict:
    """One input-table row (url, warc_ts, html, text, lang)."""
    kind = kind_for(i)
    lang = ["en", "fr", "es", "de", "zh"][i % 5]
    if kind == "html":
        doc = make_html_doc(i)
        blob, text, lang = doc.html, doc.main_text, doc.lang
    elif kind == "pdf":
        # every 8th pdf doc is a validation-error doc
        doc = make_pdf_doc(i, invalid=(i % 160 == 14))
        blob, text = doc.blob, ""
    else:
        a = i % 100
        if a == 19 and big_adversarial:
            blob = b"\x00" * 10_000_001  # over the 10 MB cap (multer.js:11)
        elif a == 39:
            blob = b""  # empty
        elif a == 59:
            doc = make_pdf_doc(i)
            blob = doc.blob[: len(doc.blob) // 3]  # truncated container
        elif a == 79:
            blob = b"\xff\xfe\x00RSTRjunk" + bytes(range(256))  # garbage
        else:
            blob = b"<" + b"\xff\xc3\x28" + b"broken utf8 html"  # non-UTF-8
        text = ""
    return {
        "url": url_for(i),
        "warc_ts": ts_for(i),
        "html": blob,
        "text": text,
        "lang": lang,
    }


def gen_rows(n: int, start: int = 0, big_adversarial: bool = False):
    for i in range(start, start + n):
        yield make_row(i, big_adversarial=big_adversarial)
