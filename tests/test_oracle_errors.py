"""Error-channel coverage for the oracle (S1/S2 analogues): every
failure class becomes a row, never an exception."""

from pdf_parser_spark.kernels import raster
from pdf_parser_spark.oracle import MAX_DOC_BYTES, extract_document


def test_too_large_cap():
    r = extract_document("u", b"x" * (MAX_DOC_BYTES + 1))
    assert r.error == "too_large"
    assert r.extracted_text is None


def test_exactly_at_cap_is_processed():
    blob = b"<html><body><p>" + b"a" * 40 + b"</p></body></html>"
    r = extract_document("u", blob)
    assert r.error is None and r.kind == "html"


def test_empty_and_garbage():
    assert extract_document("u", b"").error == "empty"
    assert extract_document("u", b"\x00\x01\x02").error == "unknown_kind"


def test_truncated_container():
    from pdf_parser_spark.synth import make_pdf_doc

    blob = make_pdf_doc(14).blob
    r = extract_document("u", blob[: len(blob) // 2])
    assert r.error is not None and r.error.startswith("bad_container")


def test_zero_page_container():
    r = extract_document("u", raster.MAGIC + b"\x00\x00")
    assert r.kind == "pdf" and r.error is None
    assert r.n_pages == 0 and r.clauses == {}


def test_bad_utf8_html():
    r = extract_document("u", b"<html>\xff\xc3\x28</html>")
    assert r.error is not None and r.error.startswith("bad_encoding")
