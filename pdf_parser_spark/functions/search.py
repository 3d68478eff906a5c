"""Ranked keyword retrieval over the corpus: Okapi BM25 (Robertson et
al., public formula) — the "find me the documents about X" query a
corpus analyst runs before and after curation.

Scale shape (100 TB):
- postings are filtered to the QUERY terms inside the token projection
  (an ``isin`` over a handful of literals — codegen, pushed before any
  aggregation), so everything downstream is sized by documents-
  containing-a-query-term, not by the corpus token stream;
- tf is a partial-agg groupBy; the per-term document-frequency relation
  is query-term-sized and broadcast; N and avgdl ride in on a broadcast
  single-row aggregate (the unigram_logprob pattern);
- doc lengths are one extra groupBy over the token pass — at corpus
  scale you precompute dl once per snapshot and reuse it across
  queries.

Determinism: tf/df/dl/N are exact integers on both engines; avgdl is an
exact-integer sum divided once; ln and the float term products can
differ in the last ulp across libm implementations and sum orders, so
scores are rounded to 4 dp BEFORE ranking (the same absorption the
unigram-logprob contract row uses) and ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    cjk: bool = False,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    Returns (doc_id, score, rank); score = sum over matched query terms
    of idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), with
    idf(t) = ln((N - df_t + 0.5)/(df_t + 0.5) + 1), rounded to 4 dp.

    ``cjk=True`` segments CJK codepoints as single-char terms (textseg)
    — query terms can then be individual ideographs and match unspaced
    zh/ja documents.
    """
    from pdf_parser_spark.functions.textseg import seg_tokens

    words = seg_tokens(F.col(text_col), cjk)
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("w")
    ).filter(F.col("w") != "")
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("w").isin(list(query_terms)))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("w").agg(F.count("*").alias("df_t"))
    j = (
        tf.join(F.broadcast(dft), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
        + 1.0
    )
    term_score = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = j.groupBy("doc_id").agg(
        F.round(F.sum(term_score), 4).alias("score")
    )
    # top-k via orderBy+limit (TakeOrderedAndProject — a distributed
    # per-partition top-k then a k-row merge), NOT a global row_number
    # window, which would sort every matching doc in ONE partition; the
    # rank window then runs over k rows only
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def mk_bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    src: str = "documents",
) -> str:
    """DuckDB replica of bm25_search over the same table — independent
    recomputation of tf/df/dl/idf and the rounded ranking."""
    terms = ", ".join("'{}'".format(t.replace("'", "''")) for t in query_terms)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM {src}
),
tk AS (SELECT doc_id, w FROM tok WHERE length(w) > 0),
dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tk
  WHERE w IN ({terms}) GROUP BY doc_id, w
),
dft AS (SELECT w, count(*) AS df_t FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
           * tf * ({k1} + 1.0)
           / (tf + {k1} * (1.0 - {b} + {b} * dl.dl / avgdl))
         ), 4) AS score
  FROM tf
  JOIN dft USING (w)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
         AS rank
FROM scored
QUALIFY rank <= {k}
"""


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    cjk: bool = False,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf (the
    per-doc keyword signal an analyst or a topic-sampler consumes):
    score(d, t) = tf(d, t) * ln(N / df(t)), rounded to 4 dp BEFORE
    ranking (bm25's cross-engine ln absorption), ties to the
    lexicographically smallest term.

    Scale shape: tf is a map-side-combining groupBy over the token
    explode (one row per DISTINCT (doc, term), never raw tokens — the
    unigram pre-agg lesson, so the idf join never sees a stop-word-hot
    token stream); df/N aggregate from tf (no second corpus pass); the
    per-doc top-k window partitions on doc_id — bounded partitions by
    construction.  ``min_df`` can prune hapax noise before the join.

    Output: (doc_id, term, score, rank), rank 1..k per doc.

    ``cjk=True``: CJK codepoints segment as single-char terms (textseg).
    """
    from pdf_parser_spark.functions.textseg import seg_tokens

    words = seg_tokens(F.col(text_col), cjk)
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("w")
    ).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df_"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df_") >= min_df)
    n_docs = df.count()  # scalar job; N = input rows (ids are unique
    # upstream — exact_dedup's business), matching the oracle's count(*)
    scored = tf.join(dfreq, "w").select(
        "doc_id",
        F.col("w").alias("term"),
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_")), 4)
        .alias("score"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )
