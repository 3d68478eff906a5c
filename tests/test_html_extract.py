"""HTML main-content extraction: kernel rules + generator ground truth
(FIXTURES.md §5: expected output per url is the generator's recorded main
text, so correctness is exact, not heuristic-vs-heuristic)."""

import pytest

from pdf_parser_spark.kernels.html_extract import extract_html
from pdf_parser_spark.synth import make_html_doc


def test_basic_extraction():
    html = b"""<!DOCTYPE html><html><head><title>T</title>
    <script>var hidden = "<p>not text</p>";</script>
    <style>p { color: red }</style></head><body>
    <nav><a href="/">Home</a> <a href="/a">About</a></nav>
    <article><p>This is the main content paragraph with enough words in it.</p>
    <p>Second paragraph of real content, also long enough to keep.</p></article>
    <footer>copyright notice with some length to it here</footer>
    </body></html>"""
    r = extract_html(html)
    assert r.text == (
        "This is the main content paragraph with enough words in it."
        "\n\nSecond paragraph of real content, also long enough to keep."
    )
    assert r.title == "T"


def test_link_density_drops_linkfarm():
    html = b"""<html><body>
    <div><a href="/1">one link</a> <a href="/2">two link</a> <a href="/3">three link</a> x</div>
    <div>An ordinary paragraph of readable text that is long enough.</div>
    </body></html>"""
    r = extract_html(html)
    assert r.text == "An ordinary paragraph of readable text that is long enough."


def test_short_blocks_dropped():
    html = b"<html><body><div>tiny</div><p>A paragraph that clears the minimum block length rule.</p></body></html>"
    r = extract_html(html)
    assert r.text == "A paragraph that clears the minimum block length rule."


def test_entities_decoded():
    html = b"<html><body><p>Smith &amp; Sons agree that 1 &lt; 2 &#8212; settled.</p></body></html>"
    r = extract_html(html)
    assert r.text == "Smith & Sons agree that 1 < 2 — settled."


def test_malformed_unclosed_p_and_stray_close():
    html = b"""<html><body></div><article>
    <p>First paragraph is unclosed but still fully captured here
    <p>Second paragraph also long enough to be kept around.</p></article></body></html>"""
    r = extract_html(html)
    assert r.text == (
        "First paragraph is unclosed but still fully captured here"
        "\n\nSecond paragraph also long enough to be kept around."
    )


def test_non_utf8_raises():
    with pytest.raises(UnicodeDecodeError):
        extract_html(b"<html><body>\xff\xc3\x28</body></html>")


def test_cjk_content():
    para = "合同条款 供应商 买方 交付付款 质量数量 责任保密 期限法律 合同条款"
    html = f"<html><body><p>{para}</p></body></html>".encode()
    assert extract_html(html).text == para


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 20, 41, 62, 83, 104, 1000, 2021])
def test_generator_ground_truth(i):
    doc = make_html_doc(i)
    r = extract_html(doc.html)
    assert r.text == doc.main_text
    assert r.title == doc.title
