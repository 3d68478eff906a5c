"""URL canonicalization + URL-level dedup — the step a Common-Crawl
pipeline runs before content dedup (the same page is crawled under
http/https, default-port, trailing-slash, fragment and query-order
variants).

Pure regex/string expressions so DuckDB replicates the canonical form
exactly (oracle-checkable); a real pipeline may swap in a full WHATWG
normalizer behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(col: Column) -> Column:
    """Deterministic canonical form:
    lowercase scheme and host, strip default ports (http:80 / https:443),
    drop the fragment, collapse trailing slashes in the path ('' -> '/'),
    sort query parameters lexicographically."""
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(col, _HOST_RE, 1))
    host = (
        F.when(
            scheme == "http", F.regexp_replace(hostport, ":80$", "")
        )
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(col, _PATH_RE, 1)
    path = F.when(
        raw_path.isin("", "/"), F.lit("/")
    ).otherwise(F.regexp_replace(raw_path, "/+$", ""))
    query = F.regexp_extract(col, _QUERY_RE, 1)
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.concat_ws("&", F.array_sort(F.split(query, "&"))))
    )
    return F.concat(scheme, F.lit("://"), host, path, query_part)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by canonical URL: one row per canonical form with the
    min-id keeper and the variant count. Same shuffle shape as
    exact_dedup — groupBy on the canonical string, map-side partial agg,
    shuffle O(distinct urls)."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canon_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canon_url")
        .agg(
            F.min("_id").alias("keeper_id"),
            F.count("*").alias("n_variants"),
        )
    )


def url_host(col: Column) -> Column:
    """Lowercased host (port stripped) of a URL — the quota/grouping
    key for per-site damping."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(col, _HOST_RE, 1)), ":[0-9]+$", ""
    )


def domain_quota_sample(
    df: DataFrame,
    quota: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Cap documents per host (dominant-site damping — a raw crawl is
    power-law distributed and a handful of hosts would otherwise own
    the token budget): keep the ``quota`` docs per host that win a
    deterministic md5 lottery, ties by id. Stateless and
    engine/partitioning/resume stable — the same doc wins on every
    engine and every re-run, like stratified_sample.

    Scale: one window over (host) — shuffle keyed by host. A viral host
    IS a hot key here, but its partition holds only that host's rows
    and the window computes a streaming row_number, so the cost is one
    pass over the hot partition, not a quadratic blowup; AQE skew-join
    handling does not apply, so for truly pathological hosts pre-filter
    with a per-partition approximate cap first."""
    from pyspark.sql import Window

    from .hashing import hash64

    lottery = hash64(
        F.concat(
            F.lit(f"{salt}:"), F.col(id_col).cast("string")
        ),
        "md5",
    )
    host = url_host(F.col(url_col))
    w = Window.partitionBy("host").orderBy("lottery", id_col)
    return (
        df.withColumn("host", host)
        .withColumn("lottery", lottery)
        .withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= quota)
        .drop("lottery", "host_rank")
    )
