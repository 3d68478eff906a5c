"""As-of (temporal point-in-time) join — an operator Spark lacks as a
primitive, built Spark-first so Catalyst still sees one declarative plan.

The naive formulations both die at scale:

* range join (``l.key = r.key AND r.ts <= l.ts`` + max-per-row) explodes
  to O(|matches|) intermediate rows before the per-row argmax — a hot key
  with k right rows multiplies every left row by k;
* a correlated subquery per left row is a driver-side loop in disguise.

The scalable shape is the classic *union-sort* as-of: tag both inputs,
union them, sort each key's timeline once, and carry the most recent
right payload forward with ``last(..., ignorenulls=True)`` over a
running row frame.  That is ONE hash exchange on the key plus one sort —
no join node at all, and the per-row state is a single struct, so a key
with millions of rows streams through the window operator without
buffering the frame (running ``last`` needs only the previous value).

Skew: a single viral key serializes into one task, the same exposure as
any keyed window.  Mitigation at 100 TB is two-phase: pre-partition by
(key, coarse time bucket), run the same union-window inside each bucket,
then stitch bucket boundaries by carrying each bucket's final right
payload into the next bucket's seed — the operator below is the inner
kernel of that scheme and keeps the output contract identical.

DuckDB's ``ASOF JOIN`` implements the same semantics natively, which
makes it a genuinely independent oracle (different engine, different
algorithm — DuckDB sorts and binary-searches per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """Match every left row to the single right row with the same key and
    the latest ``right_ts`` <= ``left_ts`` (``direction="backward"``,
    inclusive — the pandas ``merge_asof`` default) or the earliest
    ``right_ts`` >= ``left_ts`` (``"forward"``).  Inner semantics: left
    rows with no match are dropped.

    Requirements: ``right`` must be unique per (key, ts) — dedup policy
    (keep max orderkey, keep last ingest, ...) is the caller's business
    and must be applied before the join so the match is deterministic.

    Output: all left columns plus every non-key right payload column
    (caller aliases/projects afterwards).  Plan shape: Union -> one
    Exchange(key) -> Window -> Filter; there is NO join node (pinned by
    tests/test_asof.py).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    payload = [c for c in right.columns if c not in (right_on, right_ts)]
    clash = sorted(set(left.columns) & ({right_ts} | set(payload)))
    if clash:
        # silent duplicate output names would make every downstream
        # select ambiguous — force the caller to alias up front
        raise ValueError(
            "asof_join: right columns collide with left columns "
            f"{clash}; alias them on one side before joining"
        )
    r_struct = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in payload],
    )

    l_side = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c).alias(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_side = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_l"),
        r_struct.alias("_r"),
    )

    # At equal ts the right row must be visible to the left row (inclusive
    # bound), so it sorts first: ts asc + is_right desc for backward, and
    # the time axis flips wholesale for forward.
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_is_right").desc()]
    else:
        order = [F.col("_ts").desc(), F.col("_is_right").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter((F.col("_is_right") == 0) & F.col("_m").isNotNull())
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{right_ts}").alias(right_ts)
    ] + [F.col(f"_m.{c}").alias(c) for c in payload]
    return matched.select(*out_cols)
