"""CRUD over the extracted table — the engine's equivalents of the
reference's REST endpoints (SURVEY.md §2.1 S10-S13):

- GET  /api/v1/pdf          -> read_all            (pdf.controller.js:77-91)
- GET  /api/v1/pdf/:id?clause=k -> lookup / lookup_clause (:107-129)
- PATCH /api/v1/pdf/:id     -> update_clause       (:131-171)
- DELETE /api/v1/pdf        -> truncate            (:93-105)

Point ops are keyed by doc_sha (the deterministic stand-in for the
reference's UUIDs, SURVEY.md §1.1). Updates go through dynamic partition
overwrite: only the partition holding the row is rewritten — the parquet
analogue of an Iceberg MERGE (S12's Spark primitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import EXTRACTED_TABLE, with_part_id
from .io import TableIO


def _extracted_schema_with_part():
    from pyspark.sql import types as T

    from .. import schemas

    # StructType.add mutates in place — never call it on the shared schema
    return T.StructType(
        list(schemas.EXTRACTED.fields)
        + [T.StructField("part_id", T.IntegerType(), True)]
    )


def read_all(io: TableIO) -> DataFrame:
    try:
        return io.read(EXTRACTED_TABLE)
    except Exception:
        # truncated table: directory holds no data files -> explicit schema
        return io.spark.createDataFrame([], _extracted_schema_with_part())


def lookup(io: TableIO, doc_sha: str) -> DataFrame:
    """Point lookup: partition pruning happens for free if the caller
    carries part_id; otherwise this is a predicate-pushdown scan on the
    doc_sha column (min/max parquet stats prune most files)."""
    return io.read(EXTRACTED_TABLE).filter(F.col("doc_sha") == doc_sha)


def lookup_clause(io: TableIO, doc_sha: str, clause_key: str) -> DataFrame:
    """Single-clause projection (?clause=k): map access IS the projection
    (pdf.controller.js:114-117 -> F5)."""
    return lookup(io, doc_sha).select(
        "url",
        "doc_sha",
        F.col("clauses")[clause_key].alias("clause_text"),
    )


def update_clause(
    spark: SparkSession,
    io: TableIO,
    doc_sha: str,
    clause_key: str,
    new_text: str,
    n_parts: int,
) -> int:
    """Patch one clause key of one document (S12). The reference
    spread-merges one key into the JSONB blob (pdf.controller.js:146-154)
    and newline-normalizes the edited value (:139; utils.js:78-87 -> X9).

    Implementation: rewrite ONLY the partition(s) containing the row via
    dynamic partition overwrite. Returns the number of rows updated."""
    table = io.read(EXTRACTED_TABLE)
    hit = table.filter(F.col("doc_sha") == doc_sha)
    parts = [r.part_id for r in hit.select("part_id").distinct().collect()]
    if not parts:
        return 0
    n_hit = hit.count()
    cleaned = new_text.replace("\n", "")  # X9 newline strip
    part_rows = table.filter(F.col("part_id").isin(parts))
    updated = part_rows.withColumn(
        "clauses",
        F.when(
            F.col("doc_sha") == doc_sha,
            F.map_concat(
                F.map_filter(
                    F.coalesce(
                        F.col("clauses"),
                        F.create_map().cast("map<string,string>"),
                    ),
                    lambda k, _v: k != F.lit(clause_key),
                ),
                F.create_map(F.lit(clause_key), F.lit(cleaned)),
            ),
        ).otherwise(F.col("clauses")),
    )
    io.overwrite_partitions(updated, EXTRACTED_TABLE, "part_id")
    return n_hit


def truncate(spark: SparkSession, io: TableIO, n_parts: int) -> None:
    """DELETE all (S13): overwrite with an empty frame of the same
    schema (Iceberg: DELETE FROM)."""
    schema = io.read(EXTRACTED_TABLE).schema
    empty = spark.createDataFrame([], schema)
    if io.iceberg:
        io.overwrite_partitions(empty, EXTRACTED_TABLE, "part_id")
    else:
        # STATIC overwrite: dynamic mode replaces only the partitions
        # present in the frame — an empty frame would be a no-op
        (
            empty.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("part_id")
            .parquet(io._path(EXTRACTED_TABLE))  # noqa: SLF001
        )
