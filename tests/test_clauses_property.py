"""Property-based tests for the clause state machine (SURVEY.md §5
layer 5): randomized token streams from the FIXTURES.md grammar; the
invariants must hold for ANY input."""

from hypothesis import given, settings, strategies as st

from pdf_parser_spark.kernels.clauses import END_MARKERS, extract_clauses
from pdf_parser_spark.kernels.jstr import NESTED_POINT, POINT_HEADER

word = st.sampled_from(
    "supplier buyer delivery payment notice term party agreement "
    "goods invoice TABLE INTRODUCTION end clause".split()
)
body_line = st.lists(word, min_size=1, max_size=8).map(" ".join).map(
    lambda s: s + "."
)
point_line = st.from_regex(r"[1-9]\.|[1-9]\.[1-9]\.|[1-9]\.[1-9]\.[1-9]\.", fullmatch=True)
hash_line = st.sampled_from(["## note", "note ##", "##x##", "H# block", "#H#"])
end_line = st.sampled_from(list(END_MARKERS))
invalid_line = st.sampled_from(["a.", "i)", "A.", "I."])

line = st.one_of(body_line, point_line, hash_line, end_line, invalid_line)
page = st.lists(line, min_size=0, max_size=20).map("\n".join)
doc = st.lists(page, min_size=0, max_size=6)


@settings(max_examples=200, deadline=None)
@given(doc)
def test_invariants(pages):
    r = extract_clauses(pages)
    if r.error is not None:
        # errors only ever come from the validation rule
        assert r.error.startswith("Validation error")
        assert r.clauses == {}
        return
    for key, value in r.clauses.items():
        # every key is a point header per X1/X2 (or the transient ""
        # from the JS undefined quirk)
        assert (
            key == ""
            or POINT_HEADER.search(key)
            or NESTED_POINT.search(key)
        ), key
        # values never contain newlines (X8 collapse + X10 split)
        assert "\n" not in value, (key, value)
        # page-end trim: no leading/trailing JS whitespace survives
        assert value == value.strip(), (key, value)
    # table pages are valid, unique, ordered by first record
    assert len(r.table_pages) == len(set(r.table_pages))
    assert all(1 <= p <= len(pages) for p in r.table_pages)


@settings(max_examples=50, deadline=None)
@given(doc)
def test_determinism(pages):
    a = extract_clauses(pages)
    b = extract_clauses(list(pages))
    assert a.clauses == b.clauses
    assert a.table_pages == b.table_pages
    assert a.error == b.error


@settings(max_examples=50, deadline=None)
@given(st.lists(body_line, min_size=1, max_size=10))
def test_no_text_after_end_marker_leaks(tail_lines):
    pages = ["INTRODUCTION.\n1.\nkept body.\n**End of Clauses**"]
    pages.append("\n".join(tail_lines))
    r = extract_clauses(pages)
    assert r.error is None
    assert r.clauses.get("1.") == "kept body."
