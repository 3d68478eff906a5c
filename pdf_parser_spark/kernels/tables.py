"""Table-structure detection and cell-grid reconstruction — the engine's
re-expression of the reference's get_table_bounding_box / get_tables_data /
extract_table chain (python/app.py:89-234), in pure numpy via the pixel
kernels. Reference quirks preserved deliberately (SURVEY.md §7.4.3):

- box "sort": the reference's get_boxes claims top-to-bottom but sorts by
  the x coordinate because the computed flag is never used
  (python/app.py:156-175, quirk O2) — we stable-sort by x too;
- rows grouped by EXACT bbox-top equality (python/app.py:196-205, A2);
- the row list is emitted REVERSED (python/app.py:207, O3);
- only the FIRST detected table's grid is kept; cells reduced to text
  (python/app.py:227-230, F4);
- cell filter w < W-30 and h < H-30 drops the page-border component
  (python/app.py:183, F1);
- crop margin of +/-10 px around the detected table bbox, clamped
  (python/app.py:219, P11);
- empty first-pass OCR retries with the offset-scanning pass
  (python/app.py:190-191, F2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .glyphs import decode_region
from .pixel import (
    component_bboxes,
    connected_components,
    erode_rect,
    open_rect_binary,
    threshold_binary_otsu,
)

MIN_TABLE_FRAC = 10  # table bbox must span >= width//10 px in both axes


def _line_masks(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Horizontal/vertical ruling-line masks (python/app.py:119-137):
    Otsu binarize, invert so ink=255, then erode x3 / dilate x3 with a
    (width//100, 1) resp. (1, width//100) rectangular kernel."""
    binary = threshold_binary_otsu(gray)
    ink = 255 - binary
    length = max(2, gray.shape[1] // 100)
    # open_rect_binary == dilate_rect(erode_rect(...)) for binary input
    # (pinned by test_pixel), one bool-domain chain instead of four
    # uint8 passes — the page-kernel hot path
    hor = open_rect_binary(ink, length, 1, 3)
    ver = open_rect_binary(ink, 1, length, 3)
    return hor, ver


def detect_table_bboxes(gray: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Detect table regions on a full page — our from-scratch replacement
    for img2table's extract_tables (python/app.py:89-102, P1): connected
    components of the combined ruling-line mask; keep components that are
    large in both axes and contain both horizontal and vertical lines.
    Returns (left, top, right, bottom) boxes in first-encounter (row-major,
    i.e. top-most first) order."""
    h, w = gray.shape
    hor, ver = _line_masks(gray)
    lines = np.maximum(hor, ver)
    labels, n = connected_components(lines)
    out: list[tuple[int, int, int, int]] = []
    min_span = max(20, w // MIN_TABLE_FRAC)
    for i, (x, y, bw, bh) in enumerate(component_bboxes(labels, n), start=1):
        # height floor is absolute (a single-row grid is ~26 px tall)
        if bw < min_span or bh < 20:
            continue
        comp = labels == i
        if not (hor[comp].any() and ver[comp].any()):
            continue
        out.append((x, y, x + bw, y + bh))
    return out


@dataclass
class Cell:
    box: tuple[int, int, int, int]  # x1, y1, x2, y2 (python/app.py:193)
    text: str


def get_tables_data(gray: np.ndarray) -> list[list[Cell]]:
    """Reconstruct the cell grid of a (cropped) table image — the
    re-expression of get_tables_data (python/app.py:115-207)."""
    image_h, image_w = gray.shape
    hor, ver = _line_masks(gray)

    # combine = addWeighted(ver,.5,hor,.5); erode(~combine,(2,2)) x2; Otsu
    # (python/app.py:142-151). uint16 to avoid overflow; //2 matches the
    # saturate-free case for binary inputs.
    combine = ((ver.astype(np.uint16) + hor.astype(np.uint16)) // 2).astype(np.uint8)
    inv = 255 - combine
    eroded = erode_rect(inv, 2, 2, 2)
    grid = threshold_binary_otsu(eroded)

    # white components = cell interiors + page background
    # (python/app.py:154 findContours on white regions)
    labels, n = connected_components(grid)
    boxes = component_bboxes(labels, n)

    # "top-to-bottom" sort that actually sorts by x (quirk O2); Python's
    # sorted is stable, matching the reference's sorted(zip(...)).
    boxes = sorted(boxes, key=lambda b: b[0])

    final_box: list[Cell] = []
    for x, y, bw, bh in boxes:
        # drop the page-border/background component (python/app.py:183)
        if bw < image_w - 30 and bh < image_h - 30:
            crop = gray[y : y + bh, x : x + bw]
            text = decode_region(crop, scan_offsets=False)
            if not text.strip():
                # empty-OCR retry with the scanning config (app.py:190-191)
                text = decode_region(crop, scan_offsets=True)
            final_box.append(Cell(box=(x, y, x + bw, y + bh), text=text))

    # group rows by EXACT bbox top (python/app.py:196-205), preserving the
    # x-sorted cell order within a row, then reverse the row list (:207)
    table_data: list[list[Cell]] = []
    seen_tops: list[int] = []
    for cell in final_box:
        top = cell.box[1]
        if top not in seen_tops:
            row = [c for c in final_box if c.box[1] == top]
            seen_tops.append(top)
            table_data.append(row)
    return table_data[::-1]


def extract_table(gray: np.ndarray) -> list[list[str]]:
    """Full per-page table extraction — the re-expression of extract_table
    (python/app.py:211-234): detect bboxes, crop the page with a +/-10
    margin, reconstruct each grid, keep only the FIRST table's grid and
    strip cells to text (quirk F4)."""
    h, w = gray.shape
    bounding = detect_table_bboxes(gray)
    prediction_list: list[list[list[Cell]]] = []
    for left, top, right, bottom in bounding:
        x1 = max(0, left - 10)
        y1 = max(0, top - 10)
        x2 = min(w, right + 10)
        y2 = min(h, bottom + 10)
        cropped = gray[y1:y2, x1:x2]
        prediction_list.append(get_tables_data(cropped))
    if prediction_list:
        return [[cell.text for cell in row] for row in prediction_list[0]]
    return []
