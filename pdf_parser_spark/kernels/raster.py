"""RSTR page-raster container (FIXTURES.md §2).

The sandbox has no PDF decoder (no fitz/PyMuPDF — SURVEY.md §7.0); the
reference's algorithmic content starts at the grayscale page raster
(python/app.py:116-120). PDF-like documents therefore carry their
pre-rasterized pages in ``html:binary`` using this trivial deterministic
container; ``decode_pages`` (the engine's analogue of the reference's
``convert_pdf_to_image``, python/app.py:28-81) parses it.

Layout (little-endian):
    magic   4B   b'RSTR'
    npages  u16
    per page:
        width  u16
        height u16
        pixels u8[width*height]   # grayscale, row-major, 0=ink 255=paper
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RSTR"
HTML_MAGICS = (b"<!DO", b"<!do", b"<htm", b"<HTM")


class RasterError(ValueError):
    pass


def encode(pages: list[np.ndarray]) -> bytes:
    out = [MAGIC, struct.pack("<H", len(pages))]
    for p in pages:
        if p.dtype != np.uint8 or p.ndim != 2:
            raise RasterError("page must be 2-D uint8")
        h, w = p.shape
        out.append(struct.pack("<HH", w, h))
        out.append(p.tobytes())
    return b"".join(out)


def decode(blob: bytes) -> list[np.ndarray]:
    """Parse an RSTR blob into page arrays. Raises RasterError on any
    corruption — callers convert this into an error ROW, never a job
    failure (reference analogue: fitz.open failure -> {'type':'error'},
    python/app.py:32-36)."""
    if len(blob) < 6 or blob[:4] != MAGIC:
        raise RasterError("bad magic")
    (npages,) = struct.unpack_from("<H", blob, 4)
    off = 6
    pages: list[np.ndarray] = []
    for _ in range(npages):
        if off + 4 > len(blob):
            raise RasterError("truncated page header")
        w, h = struct.unpack_from("<HH", blob, off)
        off += 4
        n = w * h
        if w == 0 or h == 0 or off + n > len(blob):
            raise RasterError("truncated page pixels")
        pages.append(
            np.frombuffer(blob, dtype=np.uint8, count=n, offset=off)
            .reshape(h, w)
            .copy()
        )
        off += n
    return pages


def detect_kind(blob: bytes) -> str:
    """Route a document by magic bytes: 'pdf' (RSTR container), 'html', or
    'unknown' (-> error row). Mirrors the reference's implicit routing by
    upload type (SURVEY.md §3.4 kind router)."""
    if blob[:4] == MAGIC:
        return "pdf"
    head = blob[:256].lstrip()[:4]
    if head in HTML_MAGICS or blob[:1] == b"<":
        return "html"
    return "unknown"
