"""End-to-end training-data curation: the composition a 100 TB web-text
pipeline actually runs, as ONE operator —

    [url_dedup] -> [normalize_text] -> gopher_quality_filter
        -> redact_pii -> minhash_lsh_candidates -> dedup_clusters
        -> stratified_sample

Each stage is the already-contract-checked component function; this
module only wires them (no forked logic — the sharing IS the
correctness argument, same as kernels/ vs oracle.py).

Scale notes:
- Stage boundaries can MATERIALIZE to parquet (``materialize_dir``).
  That is deliberate, not a convenience: it firewalls Catalyst's
  projection collapse from re-inlining the giant per-stage expression
  trees into one plan (the Janino 64KB / canonicalization-OOM failure
  mode), truncates lineage for free, and makes the job resumable — a
  stage whose ``_SUCCESS`` marker exists is read back, not recomputed.
- Id-level filtering uses left_semi / left_anti joins (no row
  duplication, no payload shuffle: only ids cross the wire, and the
  id sides here are the SMALL relations — broadcast under AQE).
- The shuffle story per stage is documented on each component:
  url/exact dedup shuffle O(distinct), LSH is band-bucketed,
  clustering is O(edges)/round or driver union-find under 100k edges,
  sampling and the row-wise filters are shuffle-free codegen.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters, minhash_lsh_candidates
from .quality import gopher_quality_filter, redact_pii, repetition_stats
from .sampling import stratified_sample
from .textnorm import normalize_text
from .urlops import domain_quota_sample, url_dedup


@dataclass
class CurationResult:
    """curated: the output docs (input columns with ``text`` replaced by
    the redacted ``clean_text``). audit: per-stage evidence tables a
    production pipeline keeps (quality reasons, PII counts, cluster
    assignments) — already materialized when ``materialize_dir`` was
    given."""

    curated: DataFrame
    audit: dict[str, DataFrame] = field(default_factory=dict)
    # post-filter, post-dedup, PRE-sampling docs — what "deduped
    # survivor count" actually means whatever combination of optional
    # stages ran (the job's stdout contract counts this directly
    # instead of deriving it from the quality keep count)
    survivors: DataFrame | None = None


def curate(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str = "lang",
    default_pct: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
    host_quota: int | None = None,
    normalize: bool = False,
    repetition_filter: bool = False,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
    hash_fn: str = "xx",
    keeper: str = "min_id",
    cjk: bool = False,
    materialize_dir: str | None = None,
    input_fingerprint: str | None = None,
) -> CurationResult:
    """Run the full curation pipeline over a documents-shaped table.

    With ``materialize_dir`` set, each stage output lands in
    ``<dir>/<stage>/`` and a re-run SKIPS stages whose ``_SUCCESS``
    marker exists AND whose ``_PARAMS.json`` fingerprint (stage params
    + full upstream lineage) matches the current call — a changed
    parameter recomputes exactly the stages it can affect. Delete a
    stage dir to force recompute from that point. ``hash_fn='md5'``
    selects the
    cross-engine hash so a DuckDB replica can verify the whole
    composition (the contract variant); production default is
    xxhash64.

    ``keeper`` picks the near-dup cluster survivor: ``"min_id"``
    (exact_dedup's rule, the contract default) or ``"longest"``
    (keep the longest redacted text per cluster, ties to min id — the
    keep-the-best-copy policy, via keep_best_per_cluster's
    singleton-pass-through plan).

    ``cjk=True`` makes the quality stage segment CJK codepoints as
    single-character tokens (functions/textseg.py) — without it a real
    Common-Crawl zh/ja document is ONE whitespace token and the gopher
    stage drops the whole language as too_few_tokens. It is part of
    the quality stage's fingerprint, so flipping it recomputes exactly
    the quality stage and its downstream."""
    if keeper not in ("min_id", "longest"):
        raise ValueError(f"keeper must be min_id|longest: {keeper}")
    spark = df.sparkSession

    # Cumulative stage fingerprint: each mat() folds (stage name, the
    # params that shape THAT stage) onto everything upstream, so a
    # stage's _PARAMS.json pins both its own knobs and its whole input
    # lineage. Resume reuses a stage only when _SUCCESS exists AND the
    # fingerprint matches — re-running the same --output with a changed
    # --threshold recomputes pairs/clusters/curated but still reuses
    # quality/pii (round-3 ADVICE: marker-only resume silently reused
    # stale outputs computed under old parameters).
    chain = hashlib.sha256()
    # Seed with the INPUT identity, not just stage params: without it a
    # re-run against a different --input but the same --output matches
    # every stage fingerprint and silently reuses the old corpus's
    # outputs. The CLI passes its input path; callers with changing
    # data under a stable path should pass a snapshot id here.
    if input_fingerprint is not None:
        chain.update(input_fingerprint.encode())

    def mat(d: DataFrame, name: str, params: dict | None = None) -> DataFrame:
        chain.update(
            json.dumps([name, params or {}], sort_keys=True).encode()
        )
        if materialize_dir is None:
            return d
        digest = chain.hexdigest()[:16]
        path = os.path.join(materialize_dir, name)
        pfile = os.path.join(path, "_PARAMS.json")
        fresh = os.path.exists(os.path.join(path, "_SUCCESS"))
        if fresh:
            try:
                with open(pfile) as f:
                    fresh = json.load(f).get("fingerprint") == digest
            except (OSError, ValueError):
                fresh = False  # legacy/unreadable manifest: recompute
        if not fresh:
            d.write.mode("overwrite").parquet(path)
            with open(pfile, "w") as f:
                json.dump(
                    {"stage": name, "fingerprint": digest,
                     "params": params or {}},
                    f,
                    sort_keys=True,
                )
        return spark.read.parquet(path)

    audit: dict[str, DataFrame] = {}

    # 0. crawl-level URL dedup + per-host quota (only when the table
    #    carries a url — the synthetic documents contract table does not)
    if url_col is not None:
        keepers = url_dedup(df, url_col=url_col, id_col=id_col).select(
            F.col("keeper_id").alias(id_col)
        )
        df = mat(
            df.join(keepers, on=id_col, how="left_semi"),
            "url_kept",
            {"url_col": url_col, "id_col": id_col},
        )
        if host_quota is not None:
            df = mat(
                domain_quota_sample(
                    df, quota=host_quota, url_col=url_col, id_col=id_col
                ).drop("host"),
                "host_quota",
                {"quota": host_quota},
            )

    # 0a. optional Unicode canonicalization (NFC + control strip +
    #     whitespace collapse) BEFORE any hashing, so NFD/NFC spellings
    #     of the same document dedup together — off by default so the
    #     composed contract oracle stays fixed (repetition_filter
    #     pattern)
    if normalize:
        norm = mat(
            normalize_text(df, text_col=text_col, id_col=id_col),
            "normalized",
        )
        df = df.drop(text_col).join(
            norm.select(
                F.col("doc_id").alias(id_col),
                F.col("text_norm").alias(text_col),
            ),
            on=id_col,
        )

    # 1. quality filter (audit keeps the reasons for every doc)
    quality = mat(
        gopher_quality_filter(df, text_col=text_col, id_col=id_col,
                              cjk=cjk),
        "quality",
        {"text_col": text_col, "id_col": id_col, "cjk": cjk},
    )
    audit["quality"] = quality
    kept = df.join(
        quality.filter(F.col("keep")).select(F.col("doc_id").alias(id_col)),
        on=id_col,
        how="left_semi",
    )

    # 1b. optional Gopher repetition filter (top-ngram coverage caps) —
    #     off by default so the composed contract oracle stays fixed
    if repetition_filter:
        rep = mat(
            repetition_stats(kept, text_col=text_col, id_col=id_col),
            "repetition",
        )
        audit["repetition"] = rep
        kept = kept.join(
            rep.filter(F.col("keep")).select(
                F.col("doc_id").alias(id_col)
            ),
            on=id_col,
            how="left_semi",
        )

    # 2. PII redaction — text is replaced by clean_text from here on,
    #    so dedup fingerprints the text that would actually be trained on
    red = mat(
        redact_pii(kept, text_col=text_col, id_col=id_col), "pii"
    )
    audit["pii"] = red.select("doc_id", "n_emails", "n_ips", "n_phones")
    docs = mat(
        kept.drop(text_col).join(
            red.select(
                F.col("doc_id").alias(id_col),
                F.col("clean_text"),
            ),
            on=id_col,
        ),
        "redacted",
    )

    # 3. near-dup detection + cluster resolution; survivors keep the
    #    min-id representative per cluster (exact_dedup's survivor rule)
    pairs = mat(
        minhash_lsh_candidates(
            docs,
            num_perm=num_perm,
            bands=bands,
            n=n,
            threshold=threshold,
            text_col="clean_text",
            id_col=id_col,
            hash_fn=hash_fn,
        ),
        "pairs",
        {"num_perm": num_perm, "bands": bands, "n": n,
         "threshold": threshold, "hash_fn": hash_fn},
    )
    clusters = mat(dedup_clusters(pairs), "clusters")
    audit["clusters"] = clusters
    if keeper == "min_id":
        dupes = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias(id_col))
    else:  # longest redacted text wins its cluster
        from .dedup import keep_best_per_cluster

        kb = keep_best_per_cluster(
            docs.select(
                F.col(id_col), F.length("clean_text").alias("_len")
            ),
            clusters.select(F.col("doc_id").alias(id_col), "cluster_id"),
            "_len",
            id_col=id_col,
        )
        dupes = kb.filter(~F.col("kept")).select(id_col)
    survivors = docs.join(dupes, on=id_col, how="left_anti")

    # 4. deterministic stratified sampling (engine/partitioning/resume
    #    stable by construction — pure hash of the id)
    curated = mat(
        stratified_sample(
            survivors,
            rates=rates,
            strata_col=strata_col,
            default_pct=default_pct,
            id_col=id_col,
        ),
        "curated",
        # keeper shapes the survivor set feeding this stage — it must
        # be in the fingerprint or a --keeper change would silently
        # reuse a stale curated table
        {"rates": rates, "strata_col": strata_col,
         "default_pct": default_pct, "keeper": keeper},
    )
    return CurationResult(curated=curated, audit=audit, survivors=survivors)


def filter_funnel(
    df: DataFrame, stages: list[tuple[str, "F.Column"]]
) -> DataFrame:
    """Per-stage attrition report for a filter chain — the audit table a
    curation run publishes next to its output ("we started with N docs;
    quality cut X%, language cut Y%, ..."). Stages apply IN ORDER: a
    document is charged to the FIRST stage that rejects it.

    One corpus pass, one aggregate row: the cumulative AND of the stage
    predicates is evaluated per row (pure codegen), each stage's
    survivor count is a conditional sum in a single map-side-combining
    aggregate, and the k-row report is unpivoted from that one row with
    ``stack`` — no per-stage scan, no driver loop over data.

    Output: (stage, docs_in, docs_out, dropped, drop_pct[4dp]), one row
    per stage in application order.
    """
    if not stages:
        raise ValueError("filter_funnel needs at least one stage")
    cum = None
    sums = [F.count(F.lit(1)).alias("_n0")]
    for i, (_, cond) in enumerate(stages):
        cum = cond if cum is None else (cum & cond)
        sums.append(
            F.sum(F.when(cum, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"_s{i}")
        )
    row = df.agg(*sums)
    pairs = []
    for i, (name, _) in enumerate(stages):
        prev = "_n0" if i == 0 else f"_s{i - 1}"
        # stage names reach a SQL string literal: escape backslashes
        # FIRST (Spark parses \-escapes when escapedStringLiterals is
        # false, the default), then quotes
        esc = name.replace("\\", "\\\\").replace("'", "\\'")
        pairs.append(f"'{esc}', {prev}, _s{i}")
    k = len(stages)
    stacked = row.select(
        F.expr(
            f"stack({k}, {', '.join(pairs)}) AS (stage, docs_in, docs_out)"
        )
    )
    return stacked.select(
        "stage",
        F.col("docs_in").cast("long").alias("docs_in"),
        F.col("docs_out").cast("long").alias("docs_out"),
        (F.col("docs_in") - F.col("docs_out")).cast("long").alias("dropped"),
        F.when(
            F.col("docs_in") > 0,
            F.round(
                (F.col("docs_in") - F.col("docs_out"))
                / F.col("docs_in"),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("drop_pct"),
    )
