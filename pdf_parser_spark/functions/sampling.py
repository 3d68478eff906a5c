"""Deterministic (hash-based) sampling for training-data curation.

``df.sample()`` is seed-dependent per partitioning — rerunning a
resumed job can sample a different subset. Hash-based sampling keys the
decision on the ROW, so the subset is a pure function of the data:
reproducible across runs, partitionings, engines (md5 is the
cross-engine hash — see functions/hashing.py), and resumable for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import hash64


def deterministic_sample(
    df: DataFrame,
    pct: int,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep rows whose md5-60bit(salt:id) mod 100 < pct. Same id+salt ->
    same decision, everywhere. Scale: a stateless per-row filter, pushed
    wherever the scan is."""
    bucket = F.pmod(
        hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")), "md5"),
        F.lit(100),
    )
    return df.filter(bucket < pct)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str,
    default_pct: int = 0,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic rates (pct per value of strata_col) —
    the rebalancing move of a multilingual training mix. Unlisted strata
    fall back to ``default_pct``."""
    bucket = F.pmod(
        hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")), "md5"),
        F.lit(100),
    )
    pct = F.lit(default_pct)
    for value, rate in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(rate)).otherwise(pct)
    return df.filter(bucket < pct)


def pack_shards(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
) -> DataFrame:
    """Pack documents into fixed-token-budget training shards: documents
    are laid out in ``id_col`` order and a document starts shard
    ``floor(tokens_before_it / shard_tokens)`` — the deterministic
    doc->shard map a tokenize-and-train pipeline writes its output
    files from.

    The naive formulation is a running sum over ONE global window
    (``sum() over (order by id)``), which Spark executes as a single
    task holding the whole corpus — the textbook non-distributed plan.
    This is the two-phase distributed prefix sum instead:

    1. range-partition the slim (id, n_tokens) relation by id and sort
       within partitions (partition p holds an id-contiguous block),
       eagerly materialized so both phases read identical partitions;
    2. per-partition token totals — one metadata-sized pass
       (<= n_parts rows collected, the bounded-collect pattern);
    3. exclusive prefix offsets per partition, broadcast as a dict;
    4. one Arrow pass: numpy cumsum within each partition + that
       partition's offset = the EXACT global running sum, at full
       parallelism with 16-byte rows.

    Output: (id_col, n_tokens, shard_id). A document longer than
    ``shard_tokens`` occupies its starting shard (oversized docs are the
    chunk_documents operator's business, upstream of packing).
    """
    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be positive")
    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    id_type = df.schema[id_col].dataType.simpleString()

    n_tok = F.size(F.array_remove(F.split(F.trim(F.col(text_col)), " "), ""))
    slim = df.select(
        F.col(id_col),
        # null text = zero tokens (a NULL would reach the Arrow kernel
        # as NaN and break the int64 cumsum)
        F.coalesce(n_tok.cast("long"), F.lit(0)).alias("n_tokens"),
    )
    ranged = (
        slim.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .localCheckpoint(eager=True)  # phases 2 and 4 must see the SAME
        # partition boundaries (repartitionByRange re-samples per job)
    )

    def totals(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        s = 0
        for b in batches:
            s += int(b["n_tokens"].sum())
        yield pd.DataFrame({"pid": [pid], "tot": [s]})

    per_part = {
        r["pid"]: r["tot"]
        for r in ranged.mapInPandas(totals, "pid int, tot long").collect()
    }
    offsets = {}
    acc = 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += per_part.get(pid, 0)
    bc = spark.sparkContext.broadcast(offsets)
    size = shard_tokens

    def assign(batches):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        run = bc.value.get(TaskContext.get().partitionId(), 0)
        for b in batches:
            toks = b["n_tokens"].to_numpy(dtype="int64")
            # exclusive prefix, length-safe for empty batches
            ex = run + np.cumsum(toks) - toks
            run += int(toks.sum())
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "n_tokens": b["n_tokens"],
                    "shard_id": ex // size,
                }
            )

    return ranged.mapInPandas(
        assign, f"{id_col} {id_type}, n_tokens long, shard_id long"
    )


def dedup_aware_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: list[tuple[str, int]] | None = None,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Leak-free train/val/test assignment: the split is keyed on the
    near-dup CLUSTER, not the document, so two near-duplicates can never
    land on opposite sides of a train/test boundary — the classic
    contamination a naive per-doc random split causes (and the reason
    dedup pipelines exist at all).

    ``clusters`` is (id_col, cluster_id) from :func:`dedup_clusters`;
    unclustered docs are their own key. Assignment is the deterministic
    md5 lottery (stratified_sample's rule): bucket =
    h64(salt:key) mod 100, carved by cumulative ``weights``
    (default train 98 / val 1 / test 1). Pure projection + one
    broadcast join — no shuffle, stable across engines, partitionings
    and reruns.

    Output: (id_col, split_key, bucket, split).
    """
    from .hashing import hash64

    if weights is None:
        weights = [("train", 98), ("val", 1), ("test", 1)]
    if sum(w for _, w in weights) != 100:
        raise ValueError(f"weights must sum to 100: {weights}")
    # bind BOTH columns by name (dedup_clusters emits doc_id/cluster_id;
    # positional binding would silently swap key and id on a reordered
    # frame — and a swapped split_key is exactly the train/test leak
    # this operator exists to prevent)
    clusters = clusters.select(F.col(id_col), F.col("cluster_id"))
    joined = df.select(id_col).join(F.broadcast(clusters), id_col, "left")
    key = F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("string")
    bucket = F.pmod(
        hash64(F.concat(F.lit(f"{salt}:"), key), "md5"), F.lit(100)
    )
    expr = None
    cum = 0
    for name, w in weights:
        cum += w
        cond = F.col("bucket") < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return (
        joined.select(
            F.col(id_col),
            key.alias("split_key"),
            bucket.alias("bucket"),
        )
        .withColumn("split", expr)
    )
