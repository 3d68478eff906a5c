"""`crawldir` — a custom Spark Python DataSource that reads a directory
of raw page files (*.html / *.rstr / anything) straight into the engine's
input-table shape, no pre-built parquet needed:

    spark.dataSource.register(CrawlDirDataSource)
    df = (spark.read.format("crawldir")
          .option("path", "/data/dump")
          .option("files_per_partition", "64")
          .load())
    run_extraction(spark, df, ...)

Schema matches BASELINE.json input_hint: (url, warc_ts, html, text, lang).
url is the file:// URI; warc_ts/text/lang are NULL/''/NULL (a crawl dump
has no sidecar metadata — extraction derives everything from bytes).

Scale notes: file listing happens once on the driver (same as Spark's
own file sources); each InputPartition carries a file-name slice, so
reading parallelizes across the cluster and a directory of millions of
files shards evenly. Binary payloads never touch the driver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@dataclass
class _FilesPartition(InputPartition):
    root: str
    files: list[str]


class CrawlDirReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("crawldir requires .option('path', <dir>)")
        self.files_per_partition = int(options.get("files_per_partition", "64"))

    def partitions(self):
        names = sorted(
            f
            for f in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, f))
            and not f.startswith((".", "_"))
        )
        k = self.files_per_partition
        chunks = [names[i : i + k] for i in range(0, len(names), k)]
        if not chunks:
            chunks = [[]]
        return [_FilesPartition(self.root, c) for c in chunks]

    def read(self, partition: _FilesPartition):
        for name in partition.files:
            path = os.path.join(partition.root, name)
            with open(path, "rb") as f:
                blob = f.read()
            yield (f"file://{path}", None, blob, "", None)


class CrawlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawldir"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CrawlDirReader:
        return CrawlDirReader(self.options)
