"""Bucketed co-location (sources/io.write_bucketed): joins and
aggregations on the bucket key must run WITHOUT an Exchange — the
shuffle was paid once at write time. This is the plan-shape contract a
100 TB deployment relies on for its hot join keys."""

import re

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from pdf_parser_spark.functions import quality_metrics
    from pdf_parser_spark.sources.io import write_bucketed

    wh = str(tmp_path_factory.mktemp("bucketwh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed(docs, "bkt.docs", "doc_id", n_buckets=8,
                   sorted_by="doc_id")
    write_bucketed(quality_metrics(docs), "bkt.quality", "doc_id",
                   n_buckets=8, sorted_by="doc_id")
    yield "bkt.docs", "bkt.quality"
    spark.sql("DROP DATABASE bkt CASCADE")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    docs_t, quality_t = bucketed_tables
    a = spark.table(docs_t)
    b = spark.table(quality_t)
    joined = a.hint("merge").join(b, "doc_id")
    plan = plan_of(joined)
    assert count_exchanges(plan) == 0, plan[:2000]
    assert joined.count() == a.count()

    # control: the SAME join from plain (non-bucketed) parquet shuffles
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pdf_parser_spark.functions import quality_metrics

    control = raw.hint("merge").join(quality_metrics(raw), "doc_id")
    assert count_exchanges(plan_of(control)) >= 2


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    docs_t, _ = bucketed_tables
    agg = spark.table(docs_t).groupBy("doc_id").agg(
        F.sum("n_chars").alias("c")
    )
    assert count_exchanges(plan_of(agg)) == 0
