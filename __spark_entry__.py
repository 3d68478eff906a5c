"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query: the full HTML main-content
extraction pipeline over Common-Crawl-style pages synthesized from the
``documents`` table, aggregated per language.

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data operators (dedup / similarity /
quality / sampling / multimodal / PII); ``oracle_sql()`` gives every
query an oracle: DuckDB SQL where expressible (including md5-derived
60-bit hashes both engines compute identically), or VALUES literals
produced by independent pure-Python replicas at authoring time
(tools/gen_values_oracles.py) for the LSH / raster / media paths.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

# the driver may import this file with any cwd/session; make the package
# importable on THIS process and on every executor python worker
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import oracle_values as _VALUES  # generated: tools/gen_values_oracles.py


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship pdf_parser_spark to executors (addPyFile) once per session —
    without this, mapInPandas closures fail to unpickle on workers when
    the session wasn't launched from the repo root."""
    sc = spark.sparkContext
    if getattr(sc, "_pps_pkg_added", False):
        return
    zip_path = os.path.join(_REPO, "dist", "pdf_parser_spark.zip")
    from pdf_parser_spark.session import package_zip_stale

    if package_zip_stale(zip_path):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "pps_package_tool", os.path.join(_REPO, "tools", "package.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        zip_path = mod.build()
    sc.addPyFile(zip_path)
    sc._pps_pkg_added = True  # noqa: SLF001


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_pkg(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------------- flagship pipeline


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically wrap each documents.text row into a
    Common-Crawl-style page (url, warc_ts, html:binary, text, lang) —
    boilerplate nav/footer + the doc text as main content. The pipeline
    must strip the boilerplate and recover exactly the normalized text."""
    import pandas as pd

    from pdf_parser_spark import schemas

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datetime import datetime, timedelta, timezone

        epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
        for pdf in batches:
            rows = []
            for doc_id, text, lang, source in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
            ):
                esc = (
                    str(text)
                    .replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
                html = (
                    "<!DOCTYPE html><html><head>"
                    f"<title>doc {doc_id}</title>"
                    "<script>var x = 1;</script></head><body>"
                    '<nav><a href="/">Home</a> <a href="/a">About</a> '
                    '<a href="/b">More</a></nav>'
                    f'<article><p>{esc}</p></article>'
                    '<footer><a href="/p">Privacy</a> '
                    "<span>c example corp</span></footer></body></html>"
                )
                rows.append(
                    {
                        "url": f"https://{source}.example/doc/{doc_id}",
                        "warc_ts": epoch + timedelta(seconds=int(doc_id)),
                        "html": html.encode("utf-8"),
                        "text": str(text),
                        "lang": str(lang),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return docs.mapInPandas(wrap, schema=schemas.INPUT)


def q_flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full HTML path end-to-end: synthesize pages -> extract_stage ->
    per-lang rollup. DuckDB-checkable because extraction of the wrapped
    page provably equals whitespace-normalized documents.text."""
    from pdf_parser_spark.operators import extract_stage

    pages = _pages_from_documents(spark, sf_dir)
    docs = _load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/doc/"),
            F.col("doc_id"),
        ).alias("url"),
        "lang",
    )
    out = extract_stage(pages).join(docs, "url")
    return (
        out.filter(F.col("error").isNull())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


# DuckDB's integer sum() surfaces as DECIMAL128/HUGEINT through Arrow
# while Spark's is BIGINT — the driver's value hash distinguishes them,
# so integer sums are CAST to BIGINT on the oracle side.
FLAGSHIP_ORACLE = r"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(length(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS BIGINT)
         AS total_chars,
       CAST(min(length(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS BIGINT)
         AS min_chars,
       CAST(max(length(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS BIGINT)
         AS max_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_flagship_extract(spark, SF_DEFAULT)


# ----------------------------------------------------- relational operators


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem: broadcast the small dims, aggregate
    revenue, deterministic top-10."""
    c = _load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_window_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


Q_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey ASC
         ) AS rn
  FROM orders
) WHERE rn <= 2
"""


def q_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event matched to the user's most
    recent order at-or-before the event timestamp (asof backward join —
    functions/asof.py, union-window plan with NO join node). The right
    side is deduped to one order per (custkey, orderdate) — max orderkey
    wins — so the match is deterministic in both engines; DuckDB's
    native ASOF JOIN (sort + per-key binary search, a genuinely
    different algorithm) is the oracle."""
    from pyspark.sql import Window

    from pdf_parser_spark.functions import asof_join

    ev = _load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    orders = (
        _load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = asof_join(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("matched_orderkey"),
        F.col("o_orderdate").alias("matched_orderdate"),
        F.col("o_totalprice").alias("matched_totalprice"),
    )


Q_ASOF_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
         ) AS rn
  FROM orders
), rd AS (SELECT * FROM ranked WHERE rn = 1)
SELECT e.event_id, e.user_id, e.ts,
       rd.o_orderkey  AS matched_orderkey,
       rd.o_orderdate AS matched_orderdate,
       rd.o_totalprice AS matched_totalprice
FROM events e
ASOF JOIN rd ON e.user_id = rd.o_custkey AND e.ts >= rd.o_orderdate
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


Q_EVENTS_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_token_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/token-count operator: top-20 tokens by frequency."""
    d = _load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


Q_TOKEN_ORACLE = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents)
WHERE length(token) > 0
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


# --------------------------------------------------- training-data operators


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_parser_spark.functions import exact_dedup

    return exact_dedup(_load(spark, sf_dir, "documents"))


Q_DEDUP_EXACT_ORACLE = """
SELECT sha256(text) AS text_sha, min(doc_id) AS keeper_id,
       count(*) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_parser_spark.functions import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"), n=3, threshold=0.2
    )
    return out.select(
        "id_a", "id_b", "n_inter", F.round("jaccard", 6).alias("jaccard")
    )


Q_NGRAM_JACCARD_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(string_split(trim(text), ' ')) - 3 + 2),
             i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' ')
           )) AS shingle
    FROM documents
  ) WHERE length(shingle) > 0
),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100
),
shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_inter,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
"""


def q_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_parser_spark.functions import quality_metrics

    out = quality_metrics(_load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round("chars_per_token", 6).alias("chars_per_token"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("distinct_token_ratio", 6).alias("distinct_token_ratio"),
    )


Q_QUALITY_ORACLE = """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(trim(text), ' ')) AS n_tokens,
       round(length(text) * 1.0 / len(string_split(trim(text), ' ')), 6)
         AS chars_per_token,
       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
             / greatest(length(text), 1), 6) AS alpha_ratio,
       round(len(list_distinct(string_split(trim(text), ' '))) * 1.0
             / greatest(len(string_split(trim(text), ' ')), 1), 6)
         AS distinct_token_ratio
FROM documents
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors; ids and rank
    only (float scores stay out of the hash compare)."""
    from pdf_parser_spark.functions import brute_force_cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = brute_force_cosine_topk(emb, q, k=5, dim=64)
    return out.select("query_id", "neighbor_id", "rank")


Q_ANN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))))
           AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-5 (the bucketed ANN scale path) for the
    first 10 vectors. Fully seeded (PCG64 hyperplanes) and fold-order
    deterministic, so the oracle is a VALUES literal from an independent
    pure-Python replica (tools/gen_values_oracles.py)."""
    from pdf_parser_spark.functions import lsh_cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = lsh_cosine_topk(emb, q, k=5, n_planes=8, dim=64)
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-ANN-index path (functions/similarity.build_lsh_index /
    query_lsh_index): the SRP code table is materialized ONCE as a
    bucketed table (build-if-absent), then queried with a ZERO-shuffle
    plan — broadcast probes, codegen cosine, partition-local Arrow
    top-k, coalesce(1) merge; no Exchange node, no SRP kernel re-run
    (plan-pinned in tests/test_bucketing.py). Parameters match
    q_lsh_cosine_topk exactly, and the persisted path is row- and
    bit-identical to the direct path, so the SAME independent
    pure-Python VALUES oracle checks it."""
    import re as _re
    import tempfile

    from pdf_parser_spark.functions import build_lsh_index, query_lsh_index

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    tag = _re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").split("/")[-1])
    table = f"pps_ann_idx_{tag}"
    if not spark.catalog.tableExists(table):
        # EXTERNAL table under /tmp: the session warehouse lives in the
        # caller's CWD, which the driver's harness may not let us write.
        # Deliberately NOT scratch-registered: the catalog entry keeps
        # pointing here for the session's lifetime (the bench corpus
        # under /tmp is the same persistence precedent); the next build
        # rmtree-overwrites it.
        idx_dir = os.path.join(tempfile.gettempdir(), f"pps_ann_idx_{tag}")
        build_lsh_index(
            emb, table, n_planes=8, dim=64, n_tables=4, n_buckets=8,
            path=idx_dir,
        )
    out = query_lsh_index(
        spark, table, q, k=5, n_planes=8, dim=64, n_tables=4, hamming=1
    )
    return out.select("query_id", "neighbor_id", "rank")


def q_pq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-PQ-index path (functions/similarity.build_pq_index /
    query_pq_index): 8-byte codes + driver-fit codebooks materialized
    ONCE (build-if-absent, external tables under /tmp), then queried
    with no code-kernel re-run and no codebook re-fit — the
    build-once/query-many shape of the MEMORY-bound ANN path.
    Parameters match q_pq_cosine_topk exactly and the query tail is the
    SAME function, so the persisted path is bit-identical and the same
    independent pure-Python VALUES oracle checks it."""
    import re as _re
    import tempfile

    from pdf_parser_spark.functions import build_pq_index, query_pq_index

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    tag = _re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").split("/")[-1])
    table = f"pps_pq_idx_{tag}"
    if not spark.catalog.tableExists(table):
        idx_dir = os.path.join(tempfile.gettempdir(), f"pps_pq_idx_{tag}")
        build_pq_index(
            emb, table, m=8, ksub=16, max_train=512, n_buckets=8,
            path=idx_dir,
        )
    out = query_pq_index(spark, table, q, k=5, rerank=32, m=8, dim=64)
    return out.select("query_id", "neighbor_id", "rank")


def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (inverted-list ANN scale path) for the
    first 10 vectors: deterministic driver-side Lloyd quantizer
    (bounded training sample), nprobe=3 probing, exact rerank. VALUES
    oracle from the pure-Python replica (tools/gen_values_oracles.py)."""
    from pdf_parser_spark.functions import ivf_cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = ivf_cosine_topk(
        emb, q, k=5, nlist=16, nprobe=3, dim=64, max_train=512
    )
    return out.select("query_id", "neighbor_id", "rank")


def q_pq_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-5 (the 32x memory-cut ANN
    scale path): per-subspace codebooks fit driver-side on a bounded
    normalized sample, 8-byte codes per vector, LUT scoring + exact
    rerank of the top-32. VALUES oracle from the pure-Python replica
    (tools/gen_values_oracles.py) sharing pq_fit_codebooks."""
    from pdf_parser_spark.functions import pq_cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = pq_cosine_topk(
        emb, q, k=5, m=8, ksub=16, rerank=32, dim=64, max_train=512
    )
    return out.select("query_id", "neighbor_id", "rank")


def q_q8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized cosine top-5 (the MEMORY scale path: 4x smaller
    resident vectors; exact integer dots over quantized codes) for the
    first 10 vectors. VALUES oracle from the pure-Python replica —
    quantization, dots and norms are all bit-deterministic."""
    from pdf_parser_spark.functions import q8_cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = q8_cosine_topk(emb, q, k=5, dim=64)
    return out.select("query_id", "neighbor_id", "rank")


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates. The contract variant hashes with
    md5 (hash_fn="md5") so DuckDB reproduces signatures, band buckets and
    the verified Jaccard exactly; production default stays xxhash64."""
    from pdf_parser_spark.functions import minhash_lsh_candidates

    out = minhash_lsh_candidates(
        _load(spark, sf_dir, "documents"),
        num_perm=16,
        bands=4,
        threshold=0.2,
        hash_fn="md5",
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot near-dedup (functions/dedup.incremental_dedup):
    sources src10..src19 play the NEW crawl dump, src0..src9 the
    accumulated reference corpus; candidates come only from
    new-bucket x ref-bucket joins. md5 contract variant."""
    from pdf_parser_spark.functions import incremental_dedup

    docs = _load(spark, sf_dir, "documents")
    src_no = F.substring("source", 4, 10).cast("int")
    out = incremental_dedup(
        docs.filter(src_no >= 10),
        docs.filter(src_no < 10),
        num_perm=16,
        bands=4,
        threshold=0.5,
        hash_fn="md5",
    )
    return out.select(
        "new_id", "ref_id", F.round("jaccard", 6).alias("jaccard")
    )


def _mk_incremental_oracle(num_perm=16, bands=4, n=3, threshold=0.5) -> str:
    """DuckDB replica of q_dedup_incremental: the _mk_minhash_ctes
    chain with a side column carried through, candidates restricted to
    new x ref."""
    rpb = num_perm // bands
    mins = ",\n         ".join(
        f"min(h1 + {i} * h2) AS mh_{i}" for i in range(num_perm)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, side, {b} AS band, {h} AS band_hash FROM sig".format(
            b=b,
            h=_duck_h64(
                "concat_ws(':', "
                + ", ".join(f"mh_{b * rpb + r}" for r in range(rpb))
                + ")"
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  -- TRY_CAST + IS NOT NULL matches the Spark side, which drops
  -- NULL/non-numeric sources from BOTH sides (null comparisons filter)
  -- instead of defaulting them to 'ref' (round-4 ADVICE)
  SELECT doc_id,
         CASE WHEN TRY_CAST(substr(source, 4) AS INT) >= 10
              THEN 'new' ELSE 'ref' END AS side,
         string_split(trim(text), ' ') AS ws
  FROM documents
  WHERE TRY_CAST(substr(source, 4) AS INT) IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id, side,
         array_to_string(ws[i:i+{n - 1}], ' ') AS shingle
  FROM toks, unnest(range(1, len(ws) - {n - 2})) AS u(i)
  WHERE length(array_to_string(ws[i:i+{n - 1}], ' ')) > 0
),
shh AS (
  SELECT doc_id, side,
         CAST('0x' || substr(md5(shingle), 1, 13) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(shingle), 14, 10) AS BIGINT) AS h2
  FROM sh
),
sig AS (
  SELECT doc_id, side,
         {mins}
  FROM shh GROUP BY doc_id, side
),
bandsv AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
  FROM bandsv a JOIN bandsv b
    ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.side = 'new' AND b.side = 'ref'
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.ref_id, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.new_id
  JOIN sh sb ON sb.doc_id = c.ref_id AND sb.shingle = sa.shingle
  GROUP BY c.new_id, c.ref_id
)
SELECT new_id, ref_id,
       round(n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes za ON za.doc_id = new_id
JOIN sizes zb ON zb.doc_id = ref_id
WHERE n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter) >= {threshold}
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per doc (md5 contract variant — DuckDB-reproducible)."""
    from pdf_parser_spark.functions import simhash64

    return simhash64(_load(spark, sf_dir, "documents"), hash_fn="md5")


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (md5 contract variant)."""
    from pdf_parser_spark.functions import winnow_fingerprints

    return winnow_fingerprints(
        _load(spark, sf_dir, "documents"), hash_fn="md5"
    )


def _duck_h64(expr: str) -> str:
    """DuckDB twin of pdf_parser_spark hash64(col, fn='md5'): top 60
    bits of md5 — verified bit-identical to Spark's
    conv(substring(md5(x),1,15),16,10) for ascii/utf-8/empty inputs."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _mk_minhash_ctes(
    num_perm=16, bands=4, n=3, threshold=0.2, src="documents", text="text"
) -> str:
    """DuckDB replica of minhash_lsh_candidates(hash_fn='md5') as a CTE
    chain ending in ``mh_pairs`` — identical shingles,
    Kirsch-Mitzenmacher signatures (one md5 per shingle, perm_i =
    h1 + i*h2 with 52/40-bit slices), band hashes, candidate buckets
    and exact-Jaccard verify (functions/dedup.py:
    minhash_lsh_candidates). ``src``/``text`` parameterize the input so
    the same generation runs standalone (documents.text) and inside the
    composed curation oracle (kept.clean_text)."""
    rpb = num_perm // bands
    mins = ",\n         ".join(
        f"min(h1 + {i} * h2) AS mh_{i}" for i in range(num_perm)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, {h} AS band_hash FROM sig".format(
            b=b,
            h=_duck_h64(
                "concat_ws(':', "
                + ", ".join(f"mh_{b * rpb + r}" for r in range(rpb))
                + ")"
            ),
        )
        for b in range(bands)
    )
    return f"""toks AS (
  SELECT doc_id, string_split(trim({text}), ' ') AS ws FROM {src}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+{n - 1}], ' ') AS shingle
  FROM toks, unnest(range(1, len(ws) - {n - 2})) AS u(i)
  WHERE length(array_to_string(ws[i:i+{n - 1}], ' ')) > 0
),
shh AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(shingle), 1, 13) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(shingle), 14, 10) AS BIGINT) AS h2
  FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM shh GROUP BY doc_id
),
bandsv AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsv a JOIN bandsv b
    ON a.band = b.band AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
),
mh_pairs AS (
  SELECT id_a, id_b,
         round(n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes za ON za.doc_id = id_a
  JOIN sizes zb ON zb.doc_id = id_b
  WHERE n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter) >= {threshold}
)"""


def _mk_minhash_oracle(**kw) -> str:
    return (
        "WITH "
        + _mk_minhash_ctes(**kw)
        + "\nSELECT id_a, id_b, jaccard FROM mh_pairs\n"
    )


def _mk_simhash_cte() -> str:
    """Shared CTE body computing (doc_id, simhash) the way
    functions/dedup.py:simhash64(hash_fn='md5') does: per-token 60-bit
    md5 hash, +/-1 vote per bit, sign word reassembly."""
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(64)
    )
    return f"""tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
    FROM documents
  ) WHERE length(token) > 0
),
hs AS (SELECT doc_id, {_duck_h64('token')} AS h FROM tok),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hs GROUP BY doc_id
),
sims AS (SELECT doc_id, {assemble} AS simhash FROM votes)"""


Q_MINHASH_ORACLE = _mk_minhash_oracle()

Q_DEDUP_INCREMENTAL_ORACLE = _mk_incremental_oracle()

Q_SIMHASH_ORACLE = f"""
WITH {_mk_simhash_cte()}
SELECT doc_id, simhash FROM sims
"""

Q_SIMHASH_NEAR_DUP_ORACLE = f"""
WITH {_mk_simhash_cte()},
bandsv AS (
  SELECT doc_id, simhash, b AS band, (simhash >> (b * 16)) & 65535 AS band_val
  FROM sims, unnest([0, 1, 2, 3]) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bandsv a JOIN bandsv b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 6
"""

def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc clone pairs by shared winnowing fingerprints (md5
    contract variant)."""
    from pdf_parser_spark.functions import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _load(spark, sf_dir, "documents"), min_shared=2, hash_fn="md5"
    )


# winnow k=5, window=4 (functions/quality.py:winnow_fingerprints with
# hash_fn='md5': kgram hash = md5 of the space-joined 5 words, sliding
# 4-window min, windows complete only when lead(h,3) exists)
Q_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
kg AS (
  SELECT doc_id, i AS pos,
         {_duck_h64("array_to_string(ws[i:i+4], ' ')")} AS h
  FROM toks, unnest(range(1, len(ws) - 3)) AS u(i)
),
sel AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
           AS fingerprint,
         lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
           AS full_window
  FROM kg
)
SELECT DISTINCT doc_id, fingerprint FROM sel WHERE full_window
"""


def q_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join coverage (SURVEY.md §2.3): per-nation counts of
    customers with and without orders."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    a = with_orders.groupBy("c_nationkey").agg(
        F.count("*").alias("n_with_orders")
    )
    b = without.groupBy("c_nationkey").agg(
        F.count("*").alias("n_without_orders")
    )
    return (
        a.join(b, "c_nationkey", "full_outer")
        .select(
            "c_nationkey",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("c_nationkey")
    )


Q_SEMI_ANTI_ORACLE = """
WITH w AS (
  SELECT c_nationkey, count(*) AS n_with_orders
  FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
  GROUP BY c_nationkey
),
wo AS (
  SELECT c_nationkey, count(*) AS n_without_orders
  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  GROUP BY c_nationkey
)
SELECT coalesce(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
       coalesce(n_with_orders, 0) AS n_with_orders,
       coalesce(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
ORDER BY 1
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (SURVEY.md §2.4 grouping-sets coverage)."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "sum_price",
        )
    )


Q_ROLLUP_ORACLE = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag(): a new session starts after a >30 min gap
    per user; output session counts/lengths (window-function coverage on
    the event stream, the batch analogue of session windows)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # NTZ -> seconds
    gap = epoch - F.lag(epoch).over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
        )
        .withColumn("session_no", F.sum("new_sess").over(w))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("sum_value"), 4).alias("total_value"),
        )
    )


Q_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, event_id, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess,
         ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
),
per_session AS (
  SELECT user_id, session_no, count(*) AS n_events,
         round(sum(value), 4) AS sum_value
  FROM sess GROUP BY user_id, session_no
)
SELECT user_id, count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       round(sum(sum_value), 4) AS total_value
FROM per_session GROUP BY user_id
"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash band-bucket near-dup pairs (md5 contract variant)."""
    from pdf_parser_spark.functions import simhash_near_dup

    return simhash_near_dup(
        _load(spark, sf_dir, "documents"), max_hamming=6, hash_fn="md5"
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over documents text (hashed-BoW embed +
    SRP-LSH candidates with multi-probe + exact verify). md5 contract
    variant; the oracle is a VALUES literal computed at authoring time
    by an independent pure-Python replica (tools/gen_values_oracles.py)
    over the same sf0.01 parquet — fully deterministic: integer counts,
    fixed-order double folds, seeded planes."""
    from pdf_parser_spark.functions import embedding_near_dup

    return embedding_near_dup(
        _load(spark, sf_dir, "documents"), threshold=0.95, hash_fn="md5"
    )


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/raster path through the fused stage: deterministic RSTR docs
    (glyph-rendered clause documents with ruled tables, FIXTURES.md §2-3)
    keyed by documents.doc_id, extracted distributed, summarized per doc.
    Rows-only for the driver (glyph OCR is not SQL-expressible);
    byte-identity vs the single-process oracle is asserted in
    tests/test_spark_equivalence.py. The driver oracle is a VALUES
    literal precomputed by running the single-process oracle over the
    same 48 deterministic synth docs (tools/gen_values_oracles.py);
    doc_id < 48 (not LIMIT) keeps the selected set scan-order-free."""
    import pandas as pd

    from pdf_parser_spark import schemas
    from pdf_parser_spark.operators import extract_stage

    docs = (
        _load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 48)
    )

    def synth(batches):
        from datetime import datetime, timedelta, timezone

        from pdf_parser_spark.synth import make_pdf_doc

        epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = 14 + 20 * int(doc_id)  # pdf-kind synth indices
                d = make_pdf_doc(i)
                rows.append(
                    {
                        "url": f"rstr://doc/{int(doc_id)}",
                        "warc_ts": epoch + timedelta(seconds=int(doc_id)),
                        "html": d.blob,
                        "text": "",
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    pages = docs.mapInPandas(synth, schema=schemas.INPUT)
    out = extract_stage(pages)
    return out.select(
        "url",
        "n_pages",
        F.size(F.coalesce("clauses", F.create_map())).alias("n_clauses"),
        F.size(F.coalesce("table_pages", F.array())).alias("n_table_pages"),
        F.length(F.coalesce("extracted_text", F.lit(""))).alias("n_chars"),
        "error",
    )


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_parser_spark.functions import bpe_token_stats

    out = bpe_token_stats(_load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_bpe_tokens", "n_ws_tokens", "n_distinct_bpe",
        F.round("bpe_per_word", 6).alias("bpe_per_word"),
    )


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real learned-BPE tokenization (functions/tokenize.py): fit a
    200-merge corpus-internal table (bounded driver-side learn over the
    top-4096 word-frequency rows), then one Arrow-kernel pass emitting
    real token counts plus a 60-bit md5 fingerprint of each doc's exact
    token stream. Oracle: VALUES literal from the pure-Python replica
    (tools/gen_values_oracles.py) sharing kernels/bpe.py."""
    from pdf_parser_spark.functions import bpe_apply, bpe_fit

    docs = _load(spark, sf_dir, "documents")
    merges = bpe_fit(docs, n_merges=200, top_words=4096)
    return bpe_apply(docs, merges)


Q_BPE_ORACLE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
         AS n_bpe_tokens,
       len(string_split(trim(text), ' ')) AS n_ws_tokens,
       len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')))
         AS n_distinct_bpe,
       round(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) * 1.0
             / greatest(len(string_split(trim(text), ' ')), 1), 6)
         AS bpe_per_word
FROM documents
"""


Q_WINNOW_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
kg AS (
  SELECT doc_id, i AS pos,
         {_duck_h64("array_to_string(ws[i:i+4], ' ')")} AS h
  FROM toks, unnest(range(1, len(ws) - 3)) AS u(i)
),
sel AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
           AS fingerprint,
         lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
           AS full_window
  FROM kg
),
fp0 AS (SELECT DISTINCT doc_id, fingerprint FROM sel WHERE full_window),
rare AS (
  SELECT fingerprint FROM fp0 GROUP BY fingerprint HAVING count(*) <= 100
),
fp AS (SELECT fp0.* FROM fp0 JOIN rare USING (fingerprint))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filter + single agg — the pure
    pushdown/codegen scan query."""
    li = _load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2024-01-01"))
        & (F.col("l_shipdate") < F.lit("2025-01-01"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
        ).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2024-01-01'
  AND l_shipdate < TIMESTAMP '2025-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-way star join (region-nation-customer-
    orders-lineitem-supplier) with the local-supplier predicate — every
    dimension table in the schema participates; small dims broadcast."""
    r = _load(spark, sf_dir, "region")
    n = _load(spark, sf_dir, "nation")
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    s = _load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


Q5_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: lineitem x part join with conditional aggregation
    (promo share of revenue)."""
    li = _load(spark, sf_dir, "lineitem")
    p = _load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)),
                4,
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q14_ORACLE = """
SELECT round(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END), 4) AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based language id (functions/quality.py): script-dominant
    tier (SCRIPT_LANGS priority order, codepoint-share thresholds),
    else argmax of per-language stopword-type hits over the 12 Latin
    STOPWORDS inventories, ties to the greatest language code (the
    struct-max tie-break)."""
    from pdf_parser_spark.functions import language_id

    return language_id(_load(spark, sf_dir, "documents"))


def _mk_language_id_oracle() -> str:
    """DuckDB replica of language_id, generated from the SAME
    STOPWORDS/SCRIPT_LANGS constants the Spark side uses — one source
    of truth for the rule set (quality.py:95)."""
    from pdf_parser_spark.functions.quality import SCRIPT_LANGS, STOPWORDS

    def lst(lang):
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    hits = ",\n         ".join(
        f"len(list_intersect(words, {lst(lang)})) AS h_{lang}"
        for lang in sorted(STOPWORDS)
    )
    all_h = ", ".join(f"h_{lang}" for lang in sorted(STOPWORDS))
    # script tier: same priority order and thresholds as SCRIPT_LANGS;
    # ranges re-emitted as \x{...} escapes (RE2 syntax) from the same
    # literal character ranges Spark compiles
    script_whens = "\n            ".join(
        "WHEN CAST(length(regexp_replace(text, "
        f"'[^\\x{{{ord(rng[0]):x}}}-\\x{{{ord(rng[2]):x}}}]', '', 'g')) "
        f"AS DOUBLE) / n_nonspace >= {thresh!r} THEN '{lang}'"
        for lang, rng, thresh in SCRIPT_LANGS
    )
    # stopword argmax: ties go to the lexicographically greatest
    # language code — the Spark side's array_max over (hits, lang)
    # structs — so test langs in DESCENDING code order
    argmax_whens = "\n            ".join(
        f"WHEN h_{lang} = maxh THEN '{lang}'"
        for lang in sorted(STOPWORDS, reverse=True)[:-1]
    )
    last = sorted(STOPWORDS)[0]
    return f"""
WITH w AS (
  SELECT doc_id, text,
         list_distinct(string_split(lower(trim(text)), ' ')) AS words,
         greatest(length(regexp_replace(text, '[ \\t\\r\\n\\f\\x0B]', '', 'g')), 1)
           AS n_nonspace
  FROM documents
),
h AS (
  SELECT doc_id, text, n_nonspace,
         {hits}
  FROM w
),
m AS (
  SELECT *, greatest({all_h}) AS maxh FROM h
)
SELECT doc_id,
       CASE {script_whens}
            WHEN maxh = 0 THEN 'und'
            {argmax_whens}
            ELSE '{last}' END AS lang_pred
FROM m
"""


Q_LANGUAGE_ID_ORACLE = _mk_language_id_oracle()


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: n-gram Jaccard pairs (>=0.2) ->
    connected components -> (doc_id, cluster_id=min reachable id)."""
    from pdf_parser_spark.functions import dedup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"), n=3, threshold=0.2
    )
    return dedup_clusters(pairs)


# transitive closure of the (verified green) ngram pair oracle; min
# reachable node per component = Spark's min-label propagation fixpoint
# (shared CTE prefix — Q_DEDUP_CLUSTERS_ORACLE and Q_KEEP_BEST_ORACLE
# both build on it)
_CLUSTERS_CTES = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(string_split(trim(text), ' ')) - 3 + 2),
             i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' ')
           )) AS shingle
    FROM documents
  ) WHERE length(shingle) > 0
),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100
),
shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
),
und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, lab) AS (
  SELECT src, src FROM und
  UNION
  SELECT und.src, reach.lab FROM und JOIN reach ON und.dst = reach.node
)
"""

Q_DEDUP_CLUSTERS_ORACLE = (
    _CLUSTERS_CTES
    + "SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node"
)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection: near-dup clusters (same chain
    as dedup_clusters) -> keep ONE doc per cluster, longest text
    (n_chars) wins, ties to the smallest id; singletons pass through a
    pure projection and never touch the rank window
    (functions/dedup.py keep_best_per_cluster)."""
    from pdf_parser_spark.functions import (
        dedup_clusters,
        keep_best_per_cluster,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    clusters = dedup_clusters(pairs)
    return keep_best_per_cluster(
        docs.select("doc_id", "n_chars"), clusters, "n_chars"
    )


Q_KEEP_BEST_ORACLE = (
    _CLUSTERS_CTES
    + """
, clus AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
joined AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN clus c USING (doc_id)
)
SELECT doc_id, cluster_id,
       row_number() OVER (
         PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
       ) = 1 AS kept
FROM joined
"""
)


def q_dedup_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free train/val/test split keyed on near-dup clusters (same
    chain as dedup_clusters; functions/sampling.py dedup_aware_split) —
    near-duplicates can never straddle a split boundary."""
    from pdf_parser_spark.functions import (
        dedup_aware_split,
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    clusters = dedup_clusters(pairs)
    return dedup_aware_split(
        docs, clusters, weights=[("train", 60), ("val", 20), ("test", 20)]
    )


Q_DEDUP_SPLIT_ORACLE = (
    _CLUSTERS_CTES
    + """
, clus AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
keyed AS (
  SELECT d.doc_id,
         CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR) AS split_key
  FROM documents d LEFT JOIN clus c USING (doc_id)
),
b AS (
  SELECT doc_id, split_key,
         CAST('0x' || substr(md5('s0:' || split_key), 1, 15) AS BIGINT)
           % 100 AS bucket
  FROM keyed
)
SELECT doc_id, split_key, bucket,
       CASE WHEN bucket < 60 THEN 'train'
            WHEN bucket < 80 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""
)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over a deterministic mixed-container
    media table (FAKE synth + real BMP/WAV/PNG + error rows). Oracle is
    a VALUES literal whose expected values are computed with INDEPENDENT
    stdlib integer arithmetic from the source arrays, never through the
    decode path (tools/gen_values_oracles.py)."""
    from pdf_parser_spark.functions.multimodal import (
        build_demo_media,
        featurize_media,
    )

    _ensure_pkg(spark)  # no _load here — self-ship the pkg explicitly
    media = spark.createDataFrame(
        build_demo_media(), "media_id long, payload binary"
    )
    out = featurize_media(media)
    return out.select(
        "media_id",
        "kind",
        "width",
        "height",
        "channels",
        "n_frames",
        "sample_rate",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.split("error", ":").getItem(0).alias("error_class"),
    )


def q_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-passage detection (maximal shared runs of >= 8
    consecutive tokens, ExactSubstr-style): df-capped gram self-join +
    gaps-and-islands merge. md5 contract variant; the oracle rebuilds
    the same grams, cap, diagonals and islands in DuckDB SQL."""
    from pdf_parser_spark.functions import duplicate_passages

    return duplicate_passages(
        _load(spark, sf_dir, "documents"), min_len=8, hash_fn="md5"
    )


def _mk_gram_ctes() -> str:
    """DuckDB replica of _token_grams(min_len=8, hash_fn='md5') as the
    toks/grams0 CTE pair — the shared front end of the pairwise-span,
    span-removal and global-span oracles."""
    return f"""toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
  FROM documents
),
grams0 AS (
  SELECT doc_id, i - 1 AS pos,
         {_duck_h64("array_to_string(ws[i:i+7], ' ')")} AS h
  FROM toks, unnest(range(1, len(ws) - 6)) AS u(i)
)"""


def _mk_dup_span_ctes() -> str:
    """DuckDB replica of duplicate_passages(min_len=8, hash_fn='md5')
    as a CTE chain ending in ``spans`` — shared by the span-detection
    oracle and the span-removal oracle."""
    return (
        _mk_gram_ctes()
        + """,
rare AS (
  SELECT h FROM grams0 GROUP BY h HAVING count(DISTINCT doc_id) <= 50
),
g AS (SELECT grams0.* FROM grams0 JOIN rare USING (h)),
seeds AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS d
  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
),
isl AS (
  SELECT *, pos_a - row_number()
      OVER (PARTITION BY id_a, id_b, d ORDER BY pos_a) AS grp
  FROM seeds
),
spans AS (
  SELECT id_a, id_b,
         min(pos_a) AS a_start, min(pos_b) AS b_start,
         max(pos_a) - min(pos_a) + 8 AS length
  FROM isl GROUP BY id_a, id_b, d, grp
)"""
    )


Q_DUP_PASSAGES_ORACLE = (
    "WITH "
    + _mk_dup_span_ctes()
    + "\nSELECT id_a, id_b, a_start, b_start, length FROM spans\n"
)


def q_dup_spans_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated spans (count>=2 per 8-gram, within- OR
    cross-document): the ExactSubstr cut unit, un-df-capped — popular
    boilerplate surfaces here because occurrences are counted, never
    joined pairwise (functions/dedup.py global_dup_spans)."""
    from pdf_parser_spark.functions import global_dup_spans

    return global_dup_spans(
        _load(spark, sf_dir, "documents"), min_len=8, hash_fn="md5"
    )


def _mk_global_span_ctes() -> str:
    """DuckDB replica of global_dup_spans(min_len=8, hash_fn='md5') as a
    CTE chain ending in ``isl`` (covered intervals + island ids) —
    shared by the global-span oracle and the coverage oracle so the
    interval-union logic can never drift between them."""
    return (
        _mk_gram_ctes()
        + """,
duph AS (SELECT h FROM grams0 GROUP BY h HAVING count(*) >= 2),
iv AS (
  SELECT doc_id, pos, pos + 7 AS e
  FROM grams0 JOIN duph USING (h)
),
marked AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
         THEN 1 ELSE 0 END AS brk
  FROM iv
),
isl AS (
  SELECT doc_id, pos, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM marked
)"""
    )


Q_DUP_SPANS_GLOBAL_ORACLE = (
    "WITH "
    + _mk_global_span_ctes()
    + """
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(pos) + 1 AS BIGINT) AS n_tokens
FROM isl GROUP BY doc_id, grp
"""
)


def q_cut_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL (the acting half of dup_passages): cut every
    duplicated span from the higher-id document of its pair, rebuild
    the text from the surviving tokens, report kept/cut counts and the
    sha of the rebuilt text. Oracle rebuilds identically in SQL from
    the same spans CTE."""
    from pdf_parser_spark.functions import cut_duplicate_passages

    out = cut_duplicate_passages(
        _load(spark, sf_dir, "documents"), min_len=8, hash_fn="md5"
    )
    return out.select(
        "doc_id", "n_kept", "n_cut",
        F.sha2("clean_text", 256).alias("clean_sha"),
    )


Q_CUT_PASSAGES_ORACLE = (
    "WITH "
    + _mk_dup_span_ctes()
    + """,
cuts AS (
  SELECT DISTINCT id_b AS doc_id, b_start + u.i AS pos
  FROM spans, unnest(range(0, length)) AS u(i)
),
tok AS (
  SELECT doc_id, i - 1 AS pos, ws[i] AS w
  FROM toks, unnest(range(1, len(ws) + 1)) AS u(i)
),
keep AS (
  SELECT t.* FROM tok t
  LEFT JOIN cuts c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
),
orig AS (SELECT doc_id, count(*) AS n_orig FROM tok GROUP BY doc_id),
reb AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(w, ' ' ORDER BY pos) AS clean_text
  FROM keep GROUP BY doc_id
)
SELECT r.doc_id, r.n_kept, o.n_orig - r.n_kept AS n_cut,
       sha256(r.clean_text) AS clean_sha
FROM reb r JOIN orig o ON r.doc_id = o.doc_id
"""
)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal unigram fluency score (CCNet-style LM proxy
    without an external model): per-doc mean corpus frequency of its
    tokens (integer-exact) and mean log-probability (rounded; ln of
    identical doubles on both engines). Rare-token-heavy docs score
    low — the gibberish/OCR-noise signal."""
    from pdf_parser_spark.functions import unigram_logprob_score

    return unigram_logprob_score(_load(spark, sf_dir, "documents"))


Q_UNIGRAM_LOGPROB_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(trim(text), ' '), w -> w <> ''))
           AS w
  FROM documents
),
tokc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
  FROM tok GROUP BY doc_id, w
),
freq AS (SELECT w, CAST(sum(k) AS BIGINT) AS c FROM tokc GROUP BY w),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM freq)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_tok,
       CAST(sum(k * c) AS DOUBLE) / CAST(sum(k) AS BIGINT)
         AS mean_token_df,
       round(sum(k * ln(c * 1.0 / total)) / CAST(sum(k) AS BIGINT), 4)
         AS avg_logprob
FROM tokc JOIN freq USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (train/test overlap spans): the eval
    set is derived deterministically on BOTH engines — for every 17th
    doc, tokens 5..24 of its empty-filtered token list — so the oracle
    checks the cross-table gram match + island merge end to end. The
    benchmark side is broadcast; the corpus never shuffles beyond its
    gram window."""
    from pdf_parser_spark.functions import decontaminate

    d = _load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.col("text")), " "), lambda w: w != ""
    )
    bench = d.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(toks, 5, 20), " ").alias("text"),
    )
    return decontaminate(d, bench, min_len=8, hash_fn="md5")


Q_DECONTAMINATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
  FROM documents
),
bench AS (
  SELECT doc_id AS bench_id, ws[5:24] AS bws
  FROM toks WHERE doc_id % 17 = 0
),
dg AS (
  SELECT doc_id, i - 1 AS pos,
         {_duck_h64("array_to_string(ws[i:i+7], ' ')")} AS h
  FROM toks, unnest(range(1, len(ws) - 6)) AS u(i)
),
bg AS (
  SELECT bench_id, i - 1 AS pos,
         {_duck_h64("array_to_string(bws[i:i+7], ' ')")} AS h
  FROM bench, unnest(range(1, len(bws) - 6)) AS u(i)
),
seeds AS (
  SELECT dg.doc_id, bg.bench_id,
         dg.pos AS pos_a, bg.pos AS pos_b, dg.pos - bg.pos AS d
  FROM dg JOIN bg ON dg.h = bg.h
),
isl AS (
  SELECT *, pos_a - row_number()
      OVER (PARTITION BY doc_id, bench_id, d ORDER BY pos_a) AS grp
  FROM seeds
)
SELECT doc_id, bench_id,
       min(pos_a) AS doc_start, min(pos_b) AS bench_start,
       max(pos_a) - min(pos_a) + 8 AS length
FROM isl GROUP BY doc_id, bench_id, d, grp
"""


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib-compressibility quality signal (gzip-ratio heuristic —
    Dolma/RedPajama class; functions/quality.py compression_ratio).
    Oracle is a VALUES literal from the pure-Python zlib replica."""
    from pdf_parser_spark.functions import compression_ratio

    return compression_ratio(_load(spark, sf_dir, "documents"))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals (top-2gram / top-3gram coverage,
    duplicate-token fraction) + keep flag — the template-spam detector
    the doc-level gopher_filter rules can't see. Explode + window lead
    (JVM codegen) and two partial-agg groupBys; DuckDB oracle rebuilds
    the same grams from the same empty-filtered token list."""
    from pdf_parser_spark.functions import repetition_stats

    return repetition_stats(_load(spark, sf_dir, "documents"))


Q_REPETITION_ORACLE = """
WITH toksf AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
  FROM documents
),
uni AS (
  SELECT doc_id, len(ws) AS n_tok, len(list_distinct(ws)) AS n_distinct
  FROM toksf WHERE len(ws) > 0
),
g2 AS (
  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g
  FROM toksf, unnest(range(1, len(ws))) AS u(i)
),
t2 AS (
  SELECT doc_id, max(cnt) AS top2 FROM (
    SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM toksf, unnest(range(1, len(ws) - 1)) AS u(i)
),
t3 AS (
  SELECT doc_id, max(cnt) AS top3 FROM (
    SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT u.doc_id,
       round(coalesce(top2, 0) * 2.0 / n_tok, 6) AS top_2gram_frac,
       round(coalesce(top3, 0) * 3.0 / n_tok, 6) AS top_3gram_frac,
       round(1.0 - n_distinct * 1.0 / n_tok, 6) AS dup_token_frac,
       (round(coalesce(top2, 0) * 2.0 / n_tok, 6) <= 0.20
        AND round(coalesce(top3, 0) * 3.0 / n_tok, 6) <= 0.18) AS keep
FROM uni u
LEFT JOIN t2 ON u.doc_id = t2.doc_id
LEFT JOIN t3 ON u.doc_id = t3.doc_id
"""


def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style keep/drop filter with per-rule reasons."""
    from pdf_parser_spark.functions import gopher_quality_filter

    return gopher_quality_filter(_load(spark, sf_dir, "documents"))


def q_gopher_filter_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CJK-aware Gopher filter (functions/textseg.py): unspaced zh/ja
    text segments per-codepoint instead of reading as ONE giant token
    (which the latin tokenizer drops as too_few_tokens + low_alpha —
    round-4 VERDICT item 3). Runs over a deterministic unspaced-CJK
    probe corpus (textseg.build_cjk_probe — the driver tables are
    ASCII-only, so they cannot exercise this); the DuckDB oracle
    recomputes the same rows with the RE2 twins of the Java regexes."""
    from pdf_parser_spark.functions import gopher_quality_filter
    from pdf_parser_spark.functions.textseg import build_cjk_probe

    _ensure_pkg(spark)  # no _load here — self-ship the pkg explicitly
    probe = spark.createDataFrame(
        build_cjk_probe(), "doc_id long, text string, lang string"
    )
    out = gopher_quality_filter(probe, full_row=True, cjk=True)
    return out.select("doc_id", "lang", "keep", "reasons")


def _mk_gopher_cjk_oracle() -> str:
    """DuckDB replica of q_gopher_filter_cjk: same probe VALUES, the
    RE2 twins of textseg's CJK padding / alpha classes, and the cjk-mode
    rule set (short_tokens skipped — CJK tokens are 1 char by
    construction)."""
    from pdf_parser_spark.functions.textseg import (
        NON_ALPHA_CJK_CLASS,
        build_cjk_probe,
        duck_seg_tokens,
    )

    vals = ",\n  ".join(
        "({}, '{}', '{}')".format(i, t.replace("'", "''"), lang)
        for i, t, lang in build_cjk_probe()
    )
    tok = duck_seg_tokens("text", cjk=True)
    return f"""
WITH raw(doc_id, text, lang) AS (VALUES
  {vals}
),
m AS (
  SELECT doc_id, lang,
         len({tok}) AS n_tok,
         length(text) AS n_chars,
         length(text) * 1.0 / greatest(len({tok}), 1) AS cpt,
         length(regexp_replace(text, '{NON_ALPHA_CJK_CLASS}', '', 'g'))
           * 1.0 / greatest(length(text), 1) AS alpha,
         len(list_distinct({tok})) * 1.0
           / greatest(len({tok}), 1) AS dr
  FROM raw
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       concat_ws(',',
         CASE WHEN n_tok < 10 THEN 'too_few_tokens' END,
         CASE WHEN n_tok > 100000 THEN 'too_many_tokens' END,
         CASE WHEN cpt > 12.0 THEN 'long_tokens' END,
         CASE WHEN alpha < 0.4 THEN 'low_alpha' END,
         CASE WHEN dr < 0.2 THEN 'repetitive' END
       ) = '' AS keep,
       concat_ws(',',
         CASE WHEN n_tok < 10 THEN 'too_few_tokens' END,
         CASE WHEN n_tok > 100000 THEN 'too_many_tokens' END,
         CASE WHEN cpt > 12.0 THEN 'long_tokens' END,
         CASE WHEN alpha < 0.4 THEN 'low_alpha' END,
         CASE WHEN dr < 0.2 THEN 'repetitive' END
       ) AS reasons
FROM m
"""


Q_GOPHER_CJK_ORACLE = _mk_gopher_cjk_oracle()


def _mk_gopher_ctes(src="documents", text="text") -> str:
    """DuckDB replica of gopher_quality_filter as a CTE chain ending in
    ``gq_r`` (doc_id, reasons) — shared by the standalone oracle and the
    composed curation oracle."""
    return f"""gq_m AS (
  SELECT doc_id,
         len(string_split(trim({text}), ' ')) AS n_tok,
         length({text}) AS n_chars,
         length({text}) * 1.0
           / greatest(len(string_split(trim({text}), ' ')), 1) AS cpt,
         length(regexp_replace({text}, '[^a-zA-Z]', '', 'g')) * 1.0
           / greatest(length({text}), 1) AS alpha,
         len(list_distinct(string_split(trim({text}), ' '))) * 1.0
           / greatest(len(string_split(trim({text}), ' ')), 1) AS dr
  FROM {src}
),
gq_r AS (
  SELECT doc_id,
         concat_ws(',',
           CASE WHEN n_tok < 10 THEN 'too_few_tokens' END,
           CASE WHEN n_tok > 100000 THEN 'too_many_tokens' END,
           CASE WHEN cpt < 2.0 THEN 'short_tokens' END,
           CASE WHEN cpt > 12.0 THEN 'long_tokens' END,
           CASE WHEN alpha < 0.4 THEN 'low_alpha' END,
           CASE WHEN dr < 0.2 THEN 'repetitive' END
         ) AS reasons
  FROM gq_m
)"""


Q_GOPHER_ORACLE = (
    "WITH "
    + _mk_gopher_ctes()
    + "\nSELECT doc_id, reasons = '' AS keep, reasons FROM gq_r\n"
)


# DuckDB twin of functions/quality.py:redact_pii's replacement chain
# (email -> ip -> phone, all-occurrences, lookaround-free patterns)
_PII_SQL = (
    "regexp_replace(regexp_replace(regexp_replace({t},\n"
    r"      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}',"
    " '<EMAIL>', 'g'),\n"
    r"      '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b',"
    " '<IP>', 'g'),\n"
    r"      '\+?[0-9][0-9-]{{7,13}}[0-9]', '<PHONE>', 'g')"
)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline (jobs/curate.py's engine,
    functions/curation.py): gopher filter -> PII redaction -> MinHash
    LSH near-dup -> connected-component dedup -> stratified sample, as
    ONE lazily-composed plan. The oracle recomputes the ENTIRE
    composition in DuckDB — gopher CTEs, the md5 minhash chain over the
    REDACTED text, a recursive-CTE connected components, and the md5
    sample bucket — so every stage boundary is cross-checked, not just
    each stage in isolation."""
    from pdf_parser_spark.functions import curate

    res = curate(
        _load(spark, sf_dir, "documents"),
        rates={"en": 50, "fr": 25, "de": 10},
        default_pct=5,
        threshold=0.2,
        hash_fn="md5",
    )
    return res.curated.select(
        "doc_id", "lang", F.length("clean_text").alias("n_chars_clean")
    )


Q_CURATION_ORACLE = f"""
WITH RECURSIVE {_mk_gopher_ctes()},
kept AS (
  SELECT d.doc_id, d.lang,
         {_PII_SQL.format(t='d.text')} AS clean_text
  FROM documents d JOIN gq_r ON d.doc_id = gq_r.doc_id
  WHERE gq_r.reasons = ''
),
{_mk_minhash_ctes(src="kept", text="clean_text")},
und AS (
  SELECT id_a AS src, id_b AS dst FROM mh_pairs
  UNION
  SELECT id_b, id_a FROM mh_pairs
),
reach(node, lab) AS (
  SELECT src, src FROM und
  UNION
  SELECT und.src, reach.lab FROM und JOIN reach ON und.dst = reach.node
),
clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
dupes AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
surv AS (
  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dupes)
)
SELECT doc_id, lang, length(clean_text) AS n_chars_clean
FROM surv
WHERE CAST('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15)
           AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 25
                  WHEN 'de' THEN 10 ELSE 5 END
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling: per-language rates
    (the multilingual rebalancing move); reproducible across engines,
    partitionings and resumes by construction."""
    from pdf_parser_spark.functions import stratified_sample

    out = stratified_sample(
        _load(spark, sf_dir, "documents"),
        rates={"en": 50, "fr": 25, "de": 10},
        strata_col="lang",
        default_pct=5,
    )
    return out.select("doc_id", "lang")


Q_STRATIFIED_ORACLE = """
WITH b AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 25
                         WHEN 'de' THEN 10 ELSE 5 END
"""


def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget shard packing via the two-phase distributed
    prefix sum (range partition -> per-partition totals -> broadcast
    offsets -> Arrow cumsum) — the doc->shard map a tokenize-and-train
    pipeline writes output files from (functions/sampling.pack_shards).
    The oracle is the naive single-window global running sum."""
    from pdf_parser_spark.functions import pack_shards

    return pack_shards(
        _load(spark, sf_dir, "documents"), shard_tokens=2000
    )


Q_PACK_SHARDS_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(trim(text), ' '),
                              w -> w <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST((sum(n_tokens) OVER (
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) - n_tokens) // 2000 AS BIGINT) AS shard_id
FROM t
"""


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document quota (dominant-site damping): deterministic
    md5-lottery row_number per host, quota 30. Hosts are derived from
    doc_id (5 synthetic sites with skewed membership) identically on
    both engines, so the oracle checks the lottery + ranking rule."""
    from pdf_parser_spark.functions.urlops import domain_quota_sample

    d = _load(spark, sf_dir, "documents")
    # site skew: host h{doc_id % 7 % 5}.example — sites 0/1 get double
    url = F.concat(
        F.lit("https://h"),
        ((F.col("doc_id") % 7) % 5).cast("string"),
        F.lit(".example/p/"),
        F.col("doc_id").cast("string"),
    )
    out = domain_quota_sample(
        d.select(url.alias("url"), "doc_id"), quota=30
    )
    return out.select("doc_id", "host")


Q_DOMAIN_QUOTA_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'h' || CAST((doc_id % 7) % 5 AS VARCHAR) || '.example' AS host,
         CAST('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS lottery
  FROM documents
),
r AS (
  SELECT doc_id, host,
         row_number() OVER (PARTITION BY host ORDER BY lottery, doc_id)
           AS host_rank
  FROM u
)
SELECT doc_id, host FROM r WHERE host_rank <= 30
"""


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filtering with subdomain (dot-suffix) matching
    and port/case canonicalization (functions/urlops.py
    filter_blocked_hosts). URLs are synthesized from doc_id identically
    on both engines (the domain_quota convention) — some with a
    subdomain, some with an explicit port — and the oracle re-runs the
    REAL suffix expansion in SQL, not a structure shortcut."""
    from pdf_parser_spark.functions import filter_blocked_hosts
    from pdf_parser_spark.functions.urlops import url_host

    d = _load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("sub.")).otherwise(F.lit("")),
        F.lit("h"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":8080")).otherwise(
            F.lit("")
        ),
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
    )
    blocked = spark.createDataFrame(
        [("h1.example",), ("h3.example",)], "pattern string"
    )
    out = filter_blocked_hosts(d.select("doc_id", url.alias("url")), blocked)
    return out.select("doc_id", url_host(F.col("url")).alias("host"))


Q_BLOCKLIST_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END
           || 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example'
           || CASE WHEN doc_id % 4 = 0 THEN ':8080' ELSE '' END
           || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
h AS (
  SELECT doc_id,
         regexp_replace(
           lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)',
                                1)),
           ':[0-9]+$', '') AS host
  FROM u
),
sfx AS (
  SELECT doc_id,
         array_to_string(string_split(host, '.')[i:], '.') AS s
  FROM h, unnest(range(1, len(string_split(host, '.')) + 1)) AS t(i)
),
blocked(pattern) AS (VALUES ('h1.example'), ('h3.example')),
bad AS (
  SELECT DISTINCT doc_id FROM sfx JOIN blocked ON sfx.s = blocked.pattern
)
SELECT h.doc_id, h.host
FROM h ANTI JOIN bad ON h.doc_id = bad.doc_id
"""


def q_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup: odd-id docs are the new
    dump, even-id docs the accumulated reference; output = new docs
    whose text content is genuinely unseen. The broadcast-bloom path
    must equal the plain anti-join exactly (functions/dedup.py
    bloom_new_docs); the oracle IS the plain anti-join."""
    from pdf_parser_spark.functions import bloom_new_docs

    d = _load(spark, sf_dir, "documents")
    ref = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(F.sha2("text", 256).alias("doc_sha"))
        .distinct()
    )
    new = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.sha2("text", 256).alias("doc_sha")
    )
    return bloom_new_docs(new, ref).select("doc_id")


Q_BLOOM_INCREMENTAL_ORACLE = """
WITH ref AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
),
n AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
)
SELECT n.doc_id FROM n ANTI JOIN ref ON n.h = ref.h
"""


def q_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-token fraction (the filterable scalar from
    dup_spans_global; functions/dedup.py dup_coverage)."""
    from pdf_parser_spark.functions import dup_coverage

    return dup_coverage(
        _load(spark, sf_dir, "documents"), min_len=8, hash_fn="md5"
    )


Q_DUP_COVERAGE_ORACLE = (
    "WITH "
    + _mk_global_span_ctes()
    + """,
per AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS dup_tokens FROM (
    SELECT doc_id, grp, max(e) - min(pos) + 1 AS n
    FROM isl GROUP BY doc_id, grp
  ) GROUP BY doc_id
),
tot AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM toks
)
SELECT tot.doc_id, tot.n_tokens,
       coalesce(per.dup_tokens, 0) AS dup_tokens,
       CASE WHEN tot.n_tokens > 0
            THEN round(coalesce(per.dup_tokens, 0) * 1.0 / tot.n_tokens, 4)
            ELSE 0.0 END AS dup_frac
FROM tot LEFT JOIN per USING (doc_id)
"""
)


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf-idf; ln absorbed by 4dp
    rounding BEFORE ranking, ties lexicographic (functions/search.py
    tfidf_keywords)."""
    from pdf_parser_spark.functions import tfidf_keywords

    return tfidf_keywords(_load(spark, sf_dir, "documents"), k=3)


Q_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(trim(text), ' '),
                                    w -> w <> '')) AS w
  FROM documents
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df_ FROM tf GROUP BY w),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.w AS term,
         round(tf.tf * ln(n.n_docs * 1.0 / dfreq.df_), 4) AS score
  FROM tf JOIN dfreq USING (w) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, term, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition report over an ordered filter chain (one
    scan, one aggregate, stack-unpivoted — functions/curation.py
    filter_funnel). Stages: min length, known language, source blocklist."""
    from pdf_parser_spark.functions import filter_funnel

    d = _load(spark, sf_dir, "documents")
    return filter_funnel(
        d,
        [
            ("min_len", F.col("n_chars") >= 200),
            ("lang_known", F.col("lang") != "und"),
            ("source_ok", F.col("source") != "src0"),
        ],
    )


Q_FILTER_FUNNEL_ORACLE = """
WITH agg AS (
  SELECT count(*) AS n0,
         CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
              AS BIGINT) AS s0,
         CAST(sum(CASE WHEN n_chars >= 200 AND lang <> 'und'
                       THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN n_chars >= 200 AND lang <> 'und'
                            AND source <> 'src0'
                       THEN 1 ELSE 0 END) AS BIGINT) AS s2
  FROM documents
)
SELECT stage, docs_in, docs_out, docs_in - docs_out AS dropped,
       CASE WHEN docs_in > 0
            THEN round((docs_in - docs_out) * 1.0 / docs_in, 4)
            ELSE 0.0 END AS drop_pct
FROM (
  SELECT 'min_len' AS stage, n0 AS docs_in, s0 AS docs_out FROM agg
  UNION ALL
  SELECT 'lang_known', s0, s1 FROM agg
  UNION ALL
  SELECT 'source_ok', s1, s2 FROM agg
)
"""


def q_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality cutoff: drop the shortest quartile by n_chars —
    the threshold is the corpus's exact p25, learned in a scalar
    pre-pass and applied as a codegen literal (functions/quality.py
    percentile_filter)."""
    from pdf_parser_spark.functions import percentile_filter

    out = percentile_filter(
        _load(spark, sf_dir, "documents"), "n_chars", q=0.25, keep="above"
    )
    return out.select("doc_id", "n_chars", "threshold")


Q_PERCENTILE_FILTER_ORACLE = """
WITH thr AS (
  SELECT round(quantile_cont(n_chars, 0.25), 6) AS t FROM documents
)
SELECT doc_id, n_chars, CAST(thr.t AS DOUBLE) AS threshold
FROM documents, thr
WHERE n_chars >= thr.t
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-level dedup over deterministic crawl
    variants (scheme/port/trailing-slash/fragment/query-order) of
    documents ids — the pre-content dedup step of a CC pipeline. Both
    engines build the SAME input urls from doc_id, so the oracle checks
    the canonicalizer itself."""
    from pdf_parser_spark.functions import url_dedup

    d = _load(spark, sf_dir, "documents")
    three = F.col("doc_id") % 3
    five = F.col("doc_id") % 5
    url = F.concat(
        F.when(three == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(three == 1, F.lit("Crawl.Example.com")).otherwise(
            F.lit("crawl.example.com")
        ),
        F.when(three == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/doc/"),
        (F.floor(F.col("doc_id") / 7)).cast("long").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(five == 0, F.lit("?b=2&a=1#frag"))
        .when(five == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
    )
    return url_dedup(d.select(url.alias("url"), "doc_id"))


Q_URL_DEDUP_ORACLE = r"""
WITH u AS (
  SELECT doc_id,
         concat(
           CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END,
           CASE WHEN doc_id % 3 = 1 THEN 'Crawl.Example.com'
                ELSE 'crawl.example.com' END,
           CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END,
           '/doc/', CAST(doc_id // 7 AS VARCHAR),
           CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
           CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1#frag'
                WHEN doc_id % 5 = 1 THEN '?a=1&b=2' ELSE '' END
         ) AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
         regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM u
),
canon AS (
  SELECT doc_id,
         concat(
           scheme, '://',
           CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                ELSE hostport END,
           CASE WHEN raw_path IN ('', '/') THEN '/'
                ELSE regexp_replace(raw_path, '/+$', '') END,
           CASE WHEN query = '' THEN ''
                ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END
         ) AS canon_url
  FROM parts
)
SELECT canon_url, min(doc_id) AS keeper_id,
       count(*) AS n_variants
FROM canon GROUP BY canon_url
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents text with deterministic injected PII
    (emails / IPv4 / phone runs derived from doc_id in BOTH engines, so
    the oracle checks the redaction itself). Output keeps counts and a
    hash of the cleaned text (full clean_text would bloat the compare)."""
    from pdf_parser_spark.functions import redact_pii

    d = _load(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.org now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" server 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 down"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" call +1-555-01"),
                (F.col("doc_id") % 90 + 10).cast("string"),
                F.lit("-9"),
            ),
        ).otherwise(F.lit("")),
    )
    out = redact_pii(d.select("doc_id", injected.alias("text")))
    return out.select(
        "doc_id",
        F.sha2(F.col("clean_text"), 256).alias("clean_sha"),
        "n_emails",
        "n_ips",
        "n_phones",
    )


Q_REDACT_PII_ORACLE = r"""
WITH inj AS (
  SELECT doc_id,
         concat(
           text,
           CASE WHEN doc_id % 4 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.org now' ELSE '' END,
           CASE WHEN doc_id % 5 = 0
                THEN ' server 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.7 down' ELSE '' END,
           CASE WHEN doc_id % 7 = 0
                THEN ' call +1-555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)
                     || '-9' ELSE '' END
         ) AS text
  FROM documents
)
SELECT doc_id,
       sha256(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
           '\+?[0-9][0-9-]{7,13}[0-9]', '<PHONE>', 'g')
       ) AS clean_sha,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text,
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
       len(regexp_extract_all(text,
           '\+?[0-9][0-9-]{7,13}[0-9]')) AS n_phones
FROM inj
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL STREAMING dedup (applyInPandasWithState) run for real:
    deterministic (url, doc_sha) rows derived from documents — every doc
    once, plus a second crawl variant for doc_id%3==0 — written to one
    parquet file, replayed through a file-source stream with an
    availableNow trigger into a memory sink. One input file => one
    micro-batch => the surviving url per sha is the global min, which is
    what the DuckDB batch oracle computes. The checkpointed state path
    itself (duplicates arriving in LATER batches) is pinned by
    tests/test_streaming.py; the contract row proves the operator
    end-to-end on the driver's gate.

    The feed is capped to doc_id < 60 (60 docs + 20 second-crawl dups)
    and the state shuffle scoped to 4 partitions: the row should
    measure the OPERATOR, not stream-startup + 32 near-empty state
    stores (round-4 VERDICT item 6 — the full-corpus feed made this
    the slowest, noisiest contract row at identical coverage). At
    cluster scale the knobs go the other way: size
    spark.sql.shuffle.partitions to the key cardinality and switch the
    state store to RocksDB (spark.sql.streaming.stateStore.providerClass
    = ...RocksDBStateStoreProvider) so per-key state lives off-heap on
    local SSD instead of the executor heap."""
    import tempfile
    import uuid

    from pdf_parser_spark.streaming import stream_dedup

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    base = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/a/"),
            F.col("doc_id"),
        ).alias("url"),
        F.sha2(F.col("text"), 256).alias("doc_sha"),
    )
    dup = d.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/b/"),
            F.col("doc_id"),
        ).alias("url"),
        F.sha2(F.col("text"), 256).alias("doc_sha"),
    )
    root = tempfile.mkdtemp(prefix="pps_streamdd_")
    from pdf_parser_spark.functions.dedup import _register_scratch

    _register_scratch(root)  # tiny, but don't leak per invocation
    in_dir, ckpt = f"{root}/in", f"{root}/ckpt"
    base.union(dup).coalesce(1).write.mode("overwrite").parquet(in_dir)
    src = spark.readStream.schema("url string, doc_sha string").parquet(
        in_dir
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    # scope the state shuffle to 4 partitions for the 80-row feed (the
    # partition count is baked into the fresh checkpoint per run)
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        q = (
            stream_dedup(src)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old)
    return spark.table(name).select("doc_sha", "url", "dup_index")


# batch twin of the streaming survivor rule: first occurrence per sha
# (min url in the single replay batch), dup_index 0
Q_STREAM_DEDUP_ORACLE = """
WITH feed AS (
  SELECT 'https://' || source || '.example/a/' || CAST(doc_id AS VARCHAR)
           AS url,
         sha256(text) AS doc_sha
  FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT 'https://' || source || '.example/b/' || CAST(doc_id AS VARCHAR),
         sha256(text)
  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 60
)
SELECT doc_sha, min(url) AS url, CAST(0 AS INT) AS dup_index
FROM feed GROUP BY doc_sha
"""


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


Q_LANG_ORACLE = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue lost to returns per
    customer in a quarter; small dims broadcast, one partial-agg
    groupBy, distributed top-20."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = _load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window coverage beyond row_number/lag: ntile deciles
    and percent_rank of customer balance within each nation (integer
    tile ids; percent_rank = (rank-1)/(n-1) — exact small-integer
    division, cross-engine stable)."""
    from pyspark.sql import Window

    c = _load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


Q_DECILES_ORACLE = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(10) OVER w AS INT) AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document -> training-context splitter (functions/tokenize.py):
    32-token windows at stride 24 (8-token overlap) over the documents
    table; shuffle-free array ops, one row per window."""
    from pdf_parser_spark.functions import chunk_documents

    return chunk_documents(
        _load(spark, sf_dir, "documents"), chunk_tokens=32, stride=24
    )


Q_CHUNK_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '),
                     x -> length(x) > 0) AS ws
  FROM documents
),
st AS (
  SELECT doc_id, ws,
         CAST(s AS INT) AS start,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
              AS INT) AS chunk_idx
  FROM toks, unnest(range(0, greatest(len(ws), 0), 24)) AS u(s)
  WHERE len(ws) > 0
    AND (s = 0 OR s < len(ws) - 32 + 24)
)
SELECT doc_id, chunk_idx,
       CAST(len(ws[start + 1 : start + 32]) AS INT) AS n_tokens,
       array_to_string(ws[start + 1 : start + 32], ' ') AS chunk_text
FROM st
"""


BM25_TERMS = ["spark", "table", "hash"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (functions/search.py) for a 3-term
    query over the documents table; postings filtered to the query
    terms before any aggregation, term stats broadcast, scores rounded
    to 4 dp before ranking (cross-engine ln/sum-order absorption, the
    unigram_logprob precedent)."""
    from pdf_parser_spark.functions import bm25_search

    return bm25_search(
        _load(spark, sf_dir, "documents"), BM25_TERMS, k=10
    )


def _mk_bm25_oracle() -> str:
    from pdf_parser_spark.functions.search import mk_bm25_oracle_sql

    return mk_bm25_oracle_sql(BM25_TERMS, k=10)


Q_BM25_ORACLE = _mk_bm25_oracle()


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus length distribution with EXACT percentiles
    (Spark `percentile` <-> DuckDB `quantile_cont`, both the standard
    linear-interpolation estimator) — the sizing numbers a token-budget
    planner reads before a training run. Exact percentile buffers each
    stratum's values on the agg side, so the shuffle carries (stratum,
    value) rows — fine for hundreds of strata; at 100 TB with huge
    strata swap in approx_percentile (t-digest, partial-aggregatable)
    and drop the oracle comparison."""
    d = _load(spark, sf_dir, "documents")
    pct = F.expr("percentile(n_chars, array(0.25D, 0.5D, 0.9D))")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(pct.getItem(0), 6).alias("p25_chars"),
            F.round(pct.getItem(1), 6).alias("p50_chars"),
            F.round(pct.getItem(2), 6).alias("p90_chars"),
        )
        .orderBy("source")
    )


Q_CORPUS_STATS_ORACLE = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(avg(n_chars), 6) AS avg_chars,
       round(quantile_cont(n_chars, 0.25), 6) AS p25_chars,
       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 6) AS p90_chars
FROM documents GROUP BY source ORDER BY source
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (functions/textnorm.py): NFC kernel +
    control/BOM strip + whitespace collapse over a deterministic probe
    corpus exercising every rule (NFD accents, Hangul jamo, combining
    Greek, angstrom sign, BOM, C0 controls, run-on whitespace). The
    DuckDB oracle recomputes the SAME raw inputs with nfc_normalize +
    RE2 regexes — two independent engines agreeing on the bytes."""
    from pdf_parser_spark.functions import normalize_text
    from pdf_parser_spark.functions.textnorm import build_norm_probe

    _ensure_pkg(spark)  # no _load here — self-ship the pkg explicitly
    probe = spark.createDataFrame(
        build_norm_probe(), "doc_id long, text string"
    )
    return normalize_text(probe)


def _mk_norm_oracle() -> str:
    from pdf_parser_spark.functions.textnorm import mk_norm_oracle_sql

    return mk_norm_oracle_sql()


Q_NORMALIZE_ORACLE = _mk_norm_oracle()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_html_extract": q_flagship_extract,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_revenue": q3_top_revenue,
        "window_latest_orders": q_window_latest_orders,
        "asof_orders": q_asof_orders,
        "events_hourly": q_events_hourly,
        "token_top": q_token_top,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "quality_metrics": q_quality_metrics,
        "ann_cosine_topk": q_ann_cosine_topk,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "ann_index_topk": q_ann_index_topk,
        "ivf_cosine_topk": q_ivf_cosine_topk,
        "q8_cosine_topk": q_q8_cosine_topk,
        "pq_cosine_topk": q_pq_cosine_topk,
        "pq_index_topk": q_pq_index_topk,
        "minhash_lsh": q_minhash_lsh,
        "dedup_incremental": q_dedup_incremental,
        "bloom_incremental": q_bloom_incremental,
        "simhash64": q_simhash,
        "winnow_fingerprints": q_winnow_fingerprints,
        "rollup_revenue": q_rollup_revenue,
        "semi_anti_customers": q_semi_anti_customers,
        "sessionize": q_sessionize,
        "embedding_near_dup": q_embedding_near_dup,
        "simhash_near_dup": q_simhash_near_dup,
        "pdf_extract": q_pdf_extract,
        "bpe_tokens": q_bpe_tokens,
        "bpe_apply": q_bpe_apply,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q10_returned_items": q10_returned_items,
        "q14_promo_revenue": q14_promo_revenue,
        "customer_deciles": q_customer_deciles,
        "lang_profile": q_lang_profile,
        "corpus_stats": q_corpus_stats,
        "bm25_search": q_bm25_search,
        "chunk_documents": q_chunk_documents,
        "normalize_text": q_normalize_text,
        "language_id": q_language_id,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_split": q_dedup_split,
        "multimodal_features": q_multimodal_features,
        "gopher_filter": q_gopher_filter,
        "gopher_filter_cjk": q_gopher_filter_cjk,
        "stratified_sample": q_stratified_sample,
        "pack_shards": q_pack_shards,
        "url_dedup": q_url_dedup,
        "blocklist_filter": q_blocklist_filter,
        "domain_quota": q_domain_quota,
        "redact_pii": q_redact_pii,
        "winnow_overlap": q_winnow_overlap,
        "stream_dedup": q_stream_dedup,
        "curation_pipeline": q_curation_pipeline,
        "repetition_stats": q_repetition_stats,
        "compression_ratio": q_compression_ratio,
        "dup_passages": q_dup_passages,
        "dup_spans_global": q_dup_spans_global,
        "dup_coverage": q_dup_coverage,
        "tfidf_keywords": q_tfidf_keywords,
        "percentile_filter": q_percentile_filter,
        "filter_funnel": q_filter_funnel,
        "cut_passages": q_cut_passages,
        "decontaminate": q_decontaminate,
        "unigram_logprob": q_unigram_logprob,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_html_extract": FLAGSHIP_ORACLE,
        "q1_pricing_summary": Q1_ORACLE,
        "q3_top_revenue": Q3_ORACLE,
        "window_latest_orders": Q_WINDOW_ORACLE,
        "asof_orders": Q_ASOF_ORACLE,
        "events_hourly": Q_EVENTS_ORACLE,
        "token_top": Q_TOKEN_ORACLE,
        "dedup_exact": Q_DEDUP_EXACT_ORACLE,
        "ngram_jaccard": Q_NGRAM_JACCARD_ORACLE,
        "quality_metrics": Q_QUALITY_ORACLE,
        "ann_cosine_topk": Q_ANN_ORACLE,
        "lsh_cosine_topk": _VALUES.LSH_TOPK_ORACLE,
        "ann_index_topk": _VALUES.LSH_TOPK_ORACLE,
        "ivf_cosine_topk": _VALUES.IVF_TOPK_ORACLE,
        "q8_cosine_topk": _VALUES.Q8_TOPK_ORACLE,
        "pq_cosine_topk": _VALUES.PQ_TOPK_ORACLE,
        "pq_index_topk": _VALUES.PQ_TOPK_ORACLE,
        "rollup_revenue": Q_ROLLUP_ORACLE,
        "semi_anti_customers": Q_SEMI_ANTI_ORACLE,
        "bpe_tokens": Q_BPE_ORACLE,
        "bpe_apply": _VALUES.BPE_APPLY_ORACLE,
        "q6_forecast_revenue": Q6_ORACLE,
        "q5_local_supplier_volume": Q5_ORACLE,
        "q10_returned_items": Q10_ORACLE,
        "q14_promo_revenue": Q14_ORACLE,
        "customer_deciles": Q_DECILES_ORACLE,
        "sessionize": Q_SESSIONIZE_ORACLE,
        "lang_profile": Q_LANG_ORACLE,
        "corpus_stats": Q_CORPUS_STATS_ORACLE,
        "bm25_search": Q_BM25_ORACLE,
        "chunk_documents": Q_CHUNK_ORACLE,
        "normalize_text": Q_NORMALIZE_ORACLE,
        "minhash_lsh": Q_MINHASH_ORACLE,
        "dedup_incremental": Q_DEDUP_INCREMENTAL_ORACLE,
        "bloom_incremental": Q_BLOOM_INCREMENTAL_ORACLE,
        "simhash64": Q_SIMHASH_ORACLE,
        "simhash_near_dup": Q_SIMHASH_NEAR_DUP_ORACLE,
        "winnow_fingerprints": Q_WINNOW_ORACLE,
        # VALUES-literal oracles computed by independent pure-Python
        # replicas at authoring time (tools/gen_values_oracles.py)
        "pdf_extract": _VALUES.PDF_EXTRACT_ORACLE,
        "embedding_near_dup": _VALUES.EMBEDDING_NEAR_DUP_ORACLE,
        "language_id": Q_LANGUAGE_ID_ORACLE,
        "dedup_clusters": Q_DEDUP_CLUSTERS_ORACLE,
        "dedup_keep_best": Q_KEEP_BEST_ORACLE,
        "dedup_split": Q_DEDUP_SPLIT_ORACLE,
        "multimodal_features": _VALUES.MULTIMODAL_ORACLE,
        "gopher_filter": Q_GOPHER_ORACLE,
        "gopher_filter_cjk": Q_GOPHER_CJK_ORACLE,
        "stratified_sample": Q_STRATIFIED_ORACLE,
        "pack_shards": Q_PACK_SHARDS_ORACLE,
        "url_dedup": Q_URL_DEDUP_ORACLE,
        "blocklist_filter": Q_BLOCKLIST_ORACLE,
        "domain_quota": Q_DOMAIN_QUOTA_ORACLE,
        "redact_pii": Q_REDACT_PII_ORACLE,
        "winnow_overlap": Q_WINNOW_OVERLAP_ORACLE,
        "stream_dedup": Q_STREAM_DEDUP_ORACLE,
        "curation_pipeline": Q_CURATION_ORACLE,
        "repetition_stats": Q_REPETITION_ORACLE,
        "compression_ratio": _VALUES.COMPRESSION_ORACLE,
        "dup_passages": Q_DUP_PASSAGES_ORACLE,
        "dup_spans_global": Q_DUP_SPANS_GLOBAL_ORACLE,
        "dup_coverage": Q_DUP_COVERAGE_ORACLE,
        "tfidf_keywords": Q_TFIDF_ORACLE,
        "percentile_filter": Q_PERCENTILE_FILTER_ORACLE,
        "filter_funnel": Q_FILTER_FUNNEL_ORACLE,
        "cut_passages": Q_CUT_PASSAGES_ORACLE,
        "decontaminate": Q_DECONTAMINATE_ORACLE,
        "unigram_logprob": Q_UNIGRAM_LOGPROB_ORACLE,
    }
