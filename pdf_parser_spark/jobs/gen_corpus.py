"""Generate the deterministic synthetic corpus as a parquet input table.

Distributed generation: spark.range(n) -> mapInPandas(synth rows), so a
bench-scale corpus (FIXTURES.md §1: 200k-2M rows) is produced in parallel
without materializing anything on the driver.

    python -m pdf_parser_spark.jobs.gen_corpus --out /tmp/corpus --rows 2000
"""

from __future__ import annotations

import argparse
from collections.abc import Iterator

import pandas as pd


def corpus_df(spark, rows: int, partitions: int | None = None):
    from pdf_parser_spark import schemas
    from pdf_parser_spark.synth import make_row

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [make_row(int(i)) for i in pdf["id"]],
                columns=["url", "warc_ts", "html", "text", "lang"],
            )

    rng = spark.range(rows)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=schemas.INPUT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from pdf_parser_spark.session import get_spark

    spark = get_spark(app_name="gen-corpus")
    (
        corpus_df(spark, args.rows, args.partitions)
        .write.mode("overwrite")
        # small row groups: parquet splits cannot cross row-group
        # boundaries, so MB-scale binary rows in 128 MB row groups would
        # collapse maxPartitionBytes splits back to one-partition-per-file
        .option("parquet.block.size", 16 * 1024 * 1024)
        .parquet(args.out)
    )
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} rows to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
