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
