"""Benchmark harness (driver contract: prints ONE JSON line).

Measures
1. the headline __spark_entry__ queries at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1), and
2. end-to-end extraction throughput (docs/sec) on the deterministic
   synthetic corpus (FIXTURES.md) — the BASELINE.md target metric.

    python bench.py
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_DOCS (default
2000), SPARK_GRAFT_BENCH_SKIP_EXTRACTION=1 to run queries only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_queries(
    spark, sf_dir: str, repeats: int = 3, repeat_cap_sec: float = 20.0
) -> dict[str, float]:
    """Best-of-``repeats`` wall per query: this VM shows up to 2x
    run-to-run variance at >=16 advertised cores (CLAUDE.md), so a
    single sample is noise; the minimum is the stable estimator of the
    plan's true cost. Queries slower than ``repeat_cap_sec`` are not
    repeated (their signal already dwarfs the noise)."""
    import __spark_entry__ as entrymod
    from pdf_parser_spark.functions.dedup import cleanup_embedding_scratch

    out: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        times = []
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            times.append(dt)
            if dt > repeat_cap_sec:
                break
        # each embedding_near_dup repeat materialized a scratch table;
        # the result is consumed (count above), so drop them now
        cleanup_embedding_scratch()
        out[name] = round(min(times), 3)
    return out


def bench_extraction(spark, n_docs: int) -> dict[str, float]:
    from pdf_parser_spark.jobs.gen_corpus import corpus_df
    from pdf_parser_spark.operators import extract_stage
    from pdf_parser_spark.session import tune_for_fat_binary_scan

    tune_for_fat_binary_scan(spark)

    corpus_path = f"/tmp/pps_bench_corpus_{n_docs}"
    marker = os.path.join(corpus_path, "_SUCCESS")
    if not os.path.exists(marker):
        corpus_df(spark, n_docs).write.mode("overwrite").option("parquet.block.size", 16 * 1024 * 1024).parquet(corpus_path)

    df = spark.read.parquet(corpus_path)
    walls = []
    n_ok = 0
    for _ in range(3):  # best-of-3: same variance control as the queries
        t0 = time.time()
        n_ok = extract_stage(df).filter("error IS NULL").count()
        walls.append(time.time() - t0)
    wall = min(walls)
    return {
        "docs": n_docs,
        "docs_ok": n_ok,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
        "runs": [round(w, 3) for w in walls],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from pdf_parser_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = bench_queries(spark, sf_dir)
    extraction = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_EXTRACTION") != "1":
        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000"))
        extraction = bench_extraction(spark, n_docs)
    # headline = sum of per-query best-of-3 + one extraction pass (NOT
    # loop wall, which would triple-count the repeats)
    total = round(
        sum(queries.values()) + float(extraction.get("wall_sec", 0.0)), 3
    )
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extraction": extraction,
            }
        )
    )


if __name__ == "__main__":
    main()
