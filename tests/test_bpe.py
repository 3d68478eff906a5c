"""Real-BPE tokenizer: kernel invariants + Spark/kernel equivalence
(the shared-derivation guarantee behind the bpe_apply VALUES oracle)."""

import pytest


def test_learn_merges_classic_example():
    from pdf_parser_spark.kernels.bpe import apply_merges, learn_merges

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_merges(freqs, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # the canonical Sennrich behavior: 'est' is learned from
    # newest/widest, so unseen 'lowest' segments as low + est
    assert apply_merges("lowest", ranks) == ("low", "est")
    # training words fuse to single tokens once merges saturate
    assert apply_merges("low", ranks) == ("low",)
    assert apply_merges("newest", ranks) == ("newest",)


def test_learn_merges_deterministic_under_dict_order():
    from pdf_parser_spark.kernels.bpe import learn_merges

    freqs = {"aab": 3, "abb": 3, "bba": 2, "baa": 2}
    items = list(freqs.items())
    a = learn_merges(dict(items), 6)
    b = learn_merges(dict(reversed(items)), 6)
    assert a == b
    # equal-count tie must break to the lexicographically smallest pair
    pair_counts_round1 = {("a", "a"): 5, ("a", "b"): 6, ("b", "b"): 5, ("b", "a"): 4}
    best = max(pair_counts_round1.values())
    expected_first = min(p for p, c in pair_counts_round1.items() if c == best)
    assert a[0] == expected_first


def test_encode_memoizes_and_covers_unknown_chars():
    from pdf_parser_spark.kernels.bpe import encode, learn_merges

    merges = learn_merges({"abc": 4}, 4)
    ranks = {p: i for i, p in enumerate(merges)}
    memo = {}
    toks = encode("abc abc zq!", ranks, memo)
    assert toks == ["abc", "abc", "z", "q", "!"]
    assert "abc" in memo and "zq" in memo


def test_bpe_spark_matches_kernel(spark):
    from pdf_parser_spark.functions import bpe_apply, bpe_fit
    from pdf_parser_spark.kernels.bpe import encode, h60, learn_merges, pretokenize

    rows = [
        (0, "the lowest prices are the newest prices"),
        (1, "lower and lower, the widest margins"),
        (2, "newest widest lowest 1234 tokens!"),
        (3, ""),
        (4, "the the the lowest"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_fit(df, n_merges=30, top_words=100)

    # independent replica: pure-python counts -> same learn -> same encode
    from collections import Counter

    c = Counter()
    for _, t in rows:
        c.update(pretokenize(t))
    expected_merges = learn_merges(dict(c), 30)
    assert merges == expected_merges

    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r for r in bpe_apply(df, merges).collect()}
    for doc_id, t in rows:
        toks = encode(t, ranks)
        assert got[doc_id].n_tokens == len(toks)
        assert got[doc_id].n_token_types == len(set(toks))
        assert got[doc_id].tokens_h == h60("\x1f".join(toks))


def test_bpe_fit_top_words_cut_is_total_ordered(spark):
    """top_words cuts on (cnt desc, word asc) — a tie at the boundary
    must resolve the same way every run."""
    from pdf_parser_spark.functions import bpe_fit
    from pdf_parser_spark.kernels.bpe import learn_merges

    rows = [(i, "zz yy xx ww") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_fit(df, n_merges=4, top_words=2)
    # all four words tie at cnt=4; the asc-word tie-break keeps ww, xx
    assert merges == learn_merges({"ww": 4, "xx": 4}, 4)


def test_chunk_documents_overlap_and_tail(spark):
    from pdf_parser_spark.functions import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "one two"), (3, ""), (4, "   ")],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # starts 0,3,6 -> windows of 4 with 1-token overlap; start 9 is
    # dropped: its window ("w9") is a strict subset of the window at 6
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r.n_tokens for r in c1] == [4, 4, 4]
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    # short doc: one window; empty/whitespace docs emit nothing
    assert [r.chunk_text for r in by_doc[2]] == ["one two"]
    assert 3 not in by_doc and 4 not in by_doc
