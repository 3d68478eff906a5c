"""Real-BPE tokenization operators: fit a corpus-internal merge table,
apply it corpus-wide as an Arrow kernel.

Replaces the regex-only token estimate (``quality.bpe_token_stats``)
with an actual learned subword segmentation, so a token-budget planner
gets counts from a real tokenizer of the corpus it will train on — no
external vocabulary, public algorithm only (Sennrich et al. 2016).

Scale shape (100 TB):
- **fit** is the ivf_fit_centroids pattern: a bounded driver-side learn
  over bounded metadata. The corpus-side cost is ONE pass — an Arrow
  kernel that pre-aggregates word counts PER BATCH (a per-batch
  ``Counter``), so the shuffle moving (word, cnt) rows into the global
  ``groupBy(word)`` carries distinct-words-per-batch rows, not one row
  per token; the driver then collects only the ``top_words`` most
  frequent words (total order: count desc, word asc) and learns merges
  in pure Python. At corpus scale you additionally fit on a
  deterministic md5 doc sample (``sample_pct``) — BPE statistics
  saturate long before 100 TB.
- **apply** is embarrassingly parallel: ``mapInPandas`` with the merge
  ranks captured in the kernel closure (a few KB — broadcast with the
  task like any closure), per-word memoization inside each Python
  worker (corpora repeat words heavily, so the amortized cost per token
  is a dict hit), no shuffle at all.

Correctness: the kernel logic lives in ``kernels/bpe.py`` (Spark-free)
and the VALUES-oracle replica (tools/gen_values_oracles.py) calls the
SAME functions over the same parquet — shared derivation, no forked
logic, no Java-vs-Python regex gap (pre-tokenization runs under Python
``re`` on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import deterministic_sample


def bpe_fit(
    df: DataFrame,
    n_merges: int = 200,
    top_words: int = 4096,
    sample_pct: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus. Returns the ordered
    merge list (rank = position). Deterministic end-to-end: exact
    integer counts from Spark, total-order top-words cut, tie-broken
    merge learning (kernels/bpe.learn_merges)."""

    def count_words(batches):
        from collections import Counter

        import pandas as pd

        from ..kernels.bpe import pretokenize

        for pdf in batches:
            c: Counter = Counter()
            for t in pdf[text_col]:
                c.update(pretokenize(t))
            if c:
                yield pd.DataFrame(
                    {"w": list(c.keys()), "cnt": list(c.values())}
                )

    src = df
    if sample_pct < 100:
        src = deterministic_sample(df, sample_pct, id_col=id_col)
    top = (
        src.select(text_col)
        .mapInPandas(count_words, schema="w string, cnt long")
        .groupBy("w")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(top_words)  # bounded-metadata collect, like the IVF fit
        .collect()
    )
    from ..kernels.bpe import learn_merges

    return learn_merges({r["w"]: r["cnt"] for r in top}, n_merges)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
    cjk: bool = False,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    document -> training-context splitter (stride < chunk_tokens gives
    chunk overlap; the final window may be short). Output one row per
    (doc, window): (doc_id, chunk_idx, n_tokens, chunk_text).

    Scale: pure codegen-adjacent array ops (split / sequence / slice /
    explode) — no shuffle, no Python; output rows are chunk-sized. The
    array functions run in Spark's interpreted HOF path, which is fine
    here because each document is touched once (this is not a pairwise
    hot loop — the CLAUDE.md explode+window rewrite applies to repeated
    per-pair scoring, not a single linear pass)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    from pdf_parser_spark.functions.textseg import seg_tokens

    # cjk=True: unspaced zh/ja text chunks per-codepoint instead of
    # emitting ONE giant "token" chunk (textseg)
    toks = F.array_remove(seg_tokens(F.col(text_col), cjk), "")
    n = F.size(toks)
    # a start s > 0 whose window would end at or before the PREVIOUS
    # window's end (s - stride + chunk >= n) is a strict subset of it —
    # a fully-redundant duplicate context; drop it. Equivalently: keep
    # s == 0 or s < n - chunk + stride.
    starts = F.when(
        n > 0,
        F.filter(
            F.sequence(F.lit(0), n - 1, F.lit(stride)),
            lambda s: (s == 0)
            | (s < n - F.lit(chunk_tokens) + F.lit(stride)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    t = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("start") + 1, chunk_tokens)
    return t.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a learned merge table. Output per
    doc: real token count, distinct-token-type count, and a 60-bit md5
    fingerprint of the exact token stream (unit-separator-joined) so an
    oracle can assert the segmentation itself, not just its length."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def tokenize(batches):
        import pandas as pd

        from ..kernels.bpe import encode, h60

        memo: dict = {}
        for pdf in batches:
            out_id, n_tok, n_dist, tok_h = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = encode(t, ranks, memo)
                out_id.append(i)
                n_tok.append(len(toks))
                n_dist.append(len(set(toks)))
                tok_h.append(h60("\x1f".join(toks)))
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "n_tokens": n_tok,
                    "n_token_types": n_dist,
                    "tokens_h": tok_h,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        tokenize,
        schema=(
            f"doc_id {id_type}, n_tokens int, n_token_types int, "
            "tokens_h long"
        ),
    )
