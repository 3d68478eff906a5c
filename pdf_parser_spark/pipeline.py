"""End-to-end extraction job (SURVEY.md §3.4):

    read input -> anti-join lineage (resume, J2)
    -> salted repartition by url-hash (north rule skew defense)
    -> fused extract stage (html + pdf paths)
    -> dynamic-partition-overwrite write + lineage sidecar rows

Scale design notes (the parts that must survive 1000 executors / 100 TB):

- ``part_id = pmod(xxhash64(url), n_parts)`` is the UNIT OF RESUME — a
  deterministic logical shard, stable across runs and cluster sizes,
  uniform by construction (url hashing is the salt; giant-document skew
  cannot concentrate because neighboring urls scatter).
- the only wide exchange before the write is ``repartition(n, part_id)``;
  everything upstream of it is a narrow scan, and the fat ``html`` bytes
  cross that one exchange exactly once, already column-pruned to
  (url, html, part_id).
- waves: partitions are processed in ``waves`` batches; each wave is
  committed atomically (dynamic partition overwrite) and its lineage rows
  appended AFTER the data commit. A crash mid-wave leaves un-marked
  partitions that the next run fully rewrites — no dup, no loss
  (tests/test_resume.py kills between waves and asserts this).
- lineage aggregates are computed by reading BACK the written parquet
  (column-pruned: part_id + tiny columns), so metrics reflect what was
  actually committed, not what the stage thought it produced.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .operators import extract_stage
from .sources import TableIO

EXTRACTED_TABLE = "extracted"
LINEAGE_TABLE = "lineage"
DEFAULT_N_PARTS = 64


@dataclass
class RunStats:
    run_id: str
    parts_total: int
    parts_done_before: int
    parts_processed: int
    docs_processed: int
    waves_run: int


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    )


def done_parts(io: TableIO, run_id: str) -> list[int]:
    if not io.exists(LINEAGE_TABLE):
        return []
    rows = (
        io.read(LINEAGE_TABLE)
        .filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("part_id")
        .distinct()
        .collect()
    )
    return sorted(r.part_id for r in rows)


def run_extraction(
    spark: SparkSession,
    input_df: DataFrame,
    out_root: str,
    run_id: str,
    n_parts: int = DEFAULT_N_PARTS,
    waves: int = 1,
    max_waves: int | None = None,
    tasks_per_wave: int | None = None,
) -> RunStats:
    """Run (or resume) the extraction job.

    ``waves``: how many commit batches to split the remaining partitions
    into (1 = single atomic job, max throughput; >1 = incremental
    checkpoints). ``max_waves`` stops early after that many waves — the
    test harness uses it to simulate a mid-run kill.
    """
    from .session import tune_for_fat_binary_scan

    tune_for_fat_binary_scan(spark)
    io = TableIO(spark, out_root)
    already = set(done_parts(io, run_id))
    all_parts = list(range(n_parts))
    todo = [p for p in all_parts if p not in already]

    if tasks_per_wave is None:
        tasks_per_wave = int(spark.conf.get("spark.sql.shuffle.partitions"))

    wave_lists = [
        todo[i::waves] for i in range(waves) if todo[i::waves]
    ]
    docs_total = 0
    waves_run = 0
    salted = with_part_id(input_df, n_parts)

    for wave in wave_lists:
        if max_waves is not None and waves_run >= max_waves:
            break
        started = time.time()
        subset = salted.filter(F.col("part_id").isin(wave))
        # the one wide exchange: co-locate each resume-shard, fat bytes
        # cross it exactly once, pruned to (url, html, part_id)
        subset = subset.select("url", "html", "part_id").repartition(
            min(tasks_per_wave, max(1, len(wave))), "part_id"
        )
        # part_id is deterministic from url — recompute on the result side
        # instead of carrying/joining it through the stage (no extra
        # shuffle, and the stage schema stays pure)
        results = with_part_id(extract_stage(subset), n_parts)
        # A4 analogue (SURVEY.md §2.4): df.observe rides the write job —
        # zero extra passes — and lands in the lineage metrics map
        from pyspark.sql import Observation

        obs = Observation(f"wave-{waves_run}")
        results = results.observe(
            obs,
            F.count(F.lit(1)).alias("obs_docs"),
            F.sum(
                F.when(F.col("error").isNotNull(), 1).otherwise(0)
            ).alias("obs_errs"),
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("obs_chars"),
        )
        io.overwrite_partitions(results, EXTRACTED_TABLE, "part_id")
        observed = {k: float(v or 0) for k, v in obs.get.items()}

        # lineage from what was COMMITTED
        committed = (
            io.read(EXTRACTED_TABLE)
            .filter(F.col("part_id").isin(wave))
            .groupBy("part_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("n_bytes"),
                F.sum(
                    F.when(F.col("error").isNull(), 1).otherwise(0)
                ).alias("n_ok"),
                F.sum(
                    F.when(F.col("error").isNotNull(), 1).otherwise(0)
                ).alias("n_err"),
            )
        )
        finished = time.time()
        lineage = committed.select(
            F.lit(run_id).alias("run_id"),
            F.col("part_id"),
            F.col("n_docs").cast("long"),
            F.col("n_bytes").cast("long"),
            F.col("n_ok").cast("long"),
            F.col("n_err").cast("long"),
            F.lit("done").alias("status"),
            F.lit(started).cast("timestamp").alias("started_at"),
            F.lit(finished).cast("timestamp").alias("finished_at"),
            F.create_map(
                F.lit("wall_sec"), F.lit(float(finished - started)),
                F.lit("obs_docs"), F.lit(observed.get("obs_docs", 0.0)),
                F.lit("obs_errs"), F.lit(observed.get("obs_errs", 0.0)),
                F.lit("obs_chars"), F.lit(observed.get("obs_chars", 0.0)),
            ).alias("metrics"),
        )
        # schema-align with schemas.LINEAGE
        lineage = spark.createDataFrame(lineage.collect(), schemas.LINEAGE)
        io.append(lineage, LINEAGE_TABLE)
        docs_total += sum(r.n_docs for r in committed.select("n_docs").collect())
        waves_run += 1

    return RunStats(
        run_id=run_id,
        parts_total=n_parts,
        parts_done_before=len(already),
        parts_processed=sum(len(w) for w in wave_lists[: waves_run]),
        docs_processed=docs_total,
        waves_run=waves_run,
    )
