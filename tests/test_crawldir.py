"""Custom Python DataSource `crawldir`: raw page-file directory -> input
table shape -> extraction, oracle-identical."""

import os

import pytest

from pdf_parser_spark.operators import extract_stage
from pdf_parser_spark.oracle import extract_document
from pdf_parser_spark.sources.crawldir import CrawlDirDataSource
from pdf_parser_spark.synth import make_html_doc, make_pdf_doc


def test_crawldir_roundtrip(spark, tmp_path):
    d = str(tmp_path / "dump")
    os.makedirs(d)
    blobs = {}
    for i in (0, 1, 2):
        h = make_html_doc(i)
        open(f"{d}/doc{i}.html", "wb").write(h.html)
        blobs[f"doc{i}.html"] = h.html
    p = make_pdf_doc(14)
    open(f"{d}/doc14.rstr", "wb").write(p.blob)
    blobs["doc14.rstr"] = p.blob

    spark.dataSource.register(CrawlDirDataSource)
    df = (
        spark.read.format("crawldir")
        .option("path", d)
        .option("files_per_partition", "2")
        .load()
    )
    assert df.count() == 4
    assert df.rdd.getNumPartitions() == 2
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]

    rows = {
        os.path.basename(r.url.replace("file://", "")): r
        for r in extract_stage(df).collect()
    }
    for name, blob in blobs.items():
        o = extract_document(f"file://{d}/{name}", blob)
        g = rows[name]
        assert g.extracted_text == o.extracted_text, name
        assert g.clauses_json == o.clauses_json, name
        assert g.error == o.error, name


def test_crawldir_empty_dir(spark, tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    spark.dataSource.register(CrawlDirDataSource)
    df = spark.read.format("crawldir").option("path", d).load()
    assert df.count() == 0
