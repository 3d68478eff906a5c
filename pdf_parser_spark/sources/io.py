"""Table IO facade (SURVEY.md §1.2 storage note).

The north rule targets Iceberg tables; this sandbox has no Iceberg jars
(verified, SURVEY.md §7.0), so the facade detects whether an Iceberg
catalog is configured and otherwise uses plain parquet with IDENTICAL
schemas and dynamic-partition-overwrite semantics (the parquet stand-in
for Iceberg's atomic partition replace). Job code only ever touches this
facade, so pointing a real cluster at Iceberg is a config change, not a
code change.

Executing the Iceberg branch against a real catalog is IMPOSSIBLE in
this sandbox — settled after three rounds of trying: no
iceberg-spark-runtime jar anywhere on disk (`find / -name '*iceberg*'`
returns only pytest tmpdirs) and no network to fetch one
(repo1.maven.org does not resolve — "Name or service not known"). What
IS verified instead: (a) both dispatch branches route the right calls
with the right arguments (tests/test_io_dispatch.py, including a
recording writeTo stub asserting the ``overwritePartitions`` call
chain), and (b) the parquet branch's dynamic partition overwrite
reproduces Iceberg's replace-exactly-the-written-partitions semantics
on real data (test_iceberg_overwrite_partitions_semantics runs the
SAME scenario through both a semantic stub and the parquet path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        cls = "org.apache.iceberg.spark.SparkCatalog"
        spark.sparkContext._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return any(
            k.startswith("spark.sql.catalog.")
            and v.endswith("SparkCatalog")
            for k, v in spark.sparkContext.getConf().getAll()
        )
    except Exception:
        return False


class TableIO:
    """read/write/overwrite-partitions against Iceberg tables or a
    parquet directory tree, behind one interface."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.iceberg = _iceberg_available(spark)

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._path(name))
        # parquet: probe the directory through Hadoop FS (works for any
        # scheme the cluster can reach, not just file://)
        sc = self.spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(self._path(name))  # noqa: SLF001
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
        return fs.exists(hpath)

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._path(name))
        return self.spark.read.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.iceberg:
            df.writeTo(self._path(name)).append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def overwrite_partitions(
        self, df: DataFrame, name: str, partition_col: str
    ) -> None:
        """Replace exactly the partitions present in ``df`` — Iceberg's
        dynamic overwrite, or parquet dynamic partitionOverwriteMode.
        This is what makes resume idempotent: a half-written partition
        from a killed run is fully replaced on re-run, never duplicated.

        The overwrite mode is set PER WRITE (not relied on from session
        config): with an externally created SparkSession the session
        default is ``static``, under which this write would delete every
        already-committed partition — silent data loss on resume."""
        if self.iceberg:
            df.writeTo(self._path(name)).overwritePartitions()
        else:
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(self._path(name))
            )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sorted_by: str | None = None,
    path: str | None = None,
) -> None:
    """Bucketed table write: rows are hash-partitioned on ``bucket_col``
    into ``n_buckets`` files per partition AND the layout is recorded in
    the catalog, so every subsequent equi-join or aggregation on that
    key reads co-located data and skips its Exchange entirely.

    This is the 100 TB co-location move: shuffle the big fact tables
    ONCE at write time (documents and every doc_id-keyed derivative on
    the same bucket spec), then the daily join/agg workload runs
    shuffle-free on the hot key. Pick n_buckets ~ table_size /
    target_partition_size (128-512 MB); both join sides must share the
    bucket count for the exchange-free plan. ``sorted_by`` additionally
    orders within buckets so sort-merge joins skip their sorts.

    Iceberg note: on an Iceberg catalog the same layout is a
    bucket(n, col) partition transform; this helper targets the session
    catalog (parquet tables), which local mode supports out of the box."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sorted_by is not None:
        w = w.sortBy(sorted_by)
    if path is not None:
        # external bucketed table: data lands at ``path`` instead of
        # the managed warehouse (which sits under the session CWD in
        # local mode — not necessarily writable for every caller)
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
