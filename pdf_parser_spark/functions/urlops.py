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
