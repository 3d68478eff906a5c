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

    Scale — two-phase quota, hot-host safe: a viral host would
    otherwise land its ENTIRE row set in the one reducer that owns its
    key in the final window. Phase 1 ranks within (host, input
    partition) — the window key carries spark_partition_id(), so a hot
    host spreads over as many reducers as it had input partitions — and
    keeps only each partition's ``quota`` best rows. That bounds any
    host to quota * n_input_partitions rows entering phase 2's
    per-host window. The output is IDENTICAL to the one-phase form:
    the lottery order is total, and every global winner is by
    definition among its own partition's top-``quota`` for its host, so
    phase 1 never drops a winner."""
    from pyspark.sql import Window

    from .hashing import hash64

    lottery = hash64(
        F.concat(
            F.lit(f"{salt}:"), F.col(id_col).cast("string")
        ),
        "md5",
    )
    host = url_host(F.col(url_col))
    pre = _per_partition_host_cap(
        df.withColumn("host", host).withColumn("lottery", lottery),
        quota,
        id_col,
    )
    w = Window.partitionBy("host").orderBy("lottery", id_col)
    return (
        pre.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= quota)
        .drop("lottery", "host_rank")
    )


def _per_partition_host_cap(
    df: DataFrame, quota: int, id_col: str
) -> DataFrame:
    """Phase-1 pre-cap: keep each input partition's ``quota`` best
    (lottery, id) rows per host. The window partitions on
    (host, spark_partition_id()), so the exchange it induces is keyed by
    the SALTED pair — a hot host's rows split across reducers instead of
    converging on one. Exposed separately so the skew test can assert
    the bound on phase 2's input directly."""
    from pyspark.sql import Window

    w_pre = Window.partitionBy("host", "_pid").orderBy("lottery", id_col)
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_pp_rank", F.row_number().over(w_pre))
        .filter(F.col("_pp_rank") <= quota)
        .drop("_pid", "_pp_rank")
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """Drop documents whose URL host matches a domain blocklist
    (UT1-style): a pattern blocks the host itself AND every subdomain
    (``example.com`` blocks ``a.b.example.com``). Suffix matching breaks
    the equi-join a blocklist filter wants, so each host is expanded to
    its dot-suffix chain (``a.b.c`` -> ``a.b.c``, ``b.c``, ``c``) and
    the chain is equi-joined against the patterns:

    - the blocklist (even UT1's millions of domains = tens of MB) is
      BROADCAST — the corpus never shuffles;
    - the suffix explode is a slim (id, suffix) relation, <= label-count
      (~4-5) rows per doc, immediately semi-joined down to the matched
      ids;
    - survivors exit via left_anti against the matched-id relation
      (match-count sized, AQE picks the join strategy).

    Returns the input rows (all columns) whose host matches no pattern.
    """
    host = url_host(F.col(url_col))
    tmp = df.withColumn("_h", host)
    # posexplode + substring_index stays in codegen; the transform()
    # HOF formulation of the suffix chain would be interpreted
    # (CLAUDE.md: array HOFs are the slow path)
    ex = tmp.select(
        F.col(id_col),
        F.col("_h"),
        F.posexplode(F.split("_h", "\\.")).alias("_p", "_lbl"),
    ).select(
        F.col(id_col),
        F.expr("substring_index(_h, '.', -(_p + 1))").alias("_sfx"),
    )
    bad = (
        ex.join(
            F.broadcast(blocked.select(F.col(pattern_col).alias("_sfx"))),
            "_sfx",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return tmp.join(bad, id_col, "left_anti").drop("_h")
