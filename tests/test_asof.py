"""asof_join: semantics (vs pandas merge_asof, an independent
implementation), edge cases, and the no-join-node plan shape."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.functions import asof_join
from tests.test_plans import count_nodes, plan_of


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(10), 11.0),
        (1, _ts(20), 12.0),
        (2, _ts(5), 99.0),
    ]
    return spark.createDataFrame(rows, "key long, qts timestamp, px double")


def test_backward_inclusive(spark, quotes):
    trades = spark.createDataFrame(
        [
            (100, 1, _ts(10)),  # equal ts -> matches the ts(10) quote
            (101, 1, _ts(15)),  # between -> ts(10)
            (102, 1, _ts(25)),  # after all -> ts(20)
            (103, 2, _ts(4)),   # before any quote -> dropped (inner)
            (104, 3, _ts(50)),  # no such key -> dropped
        ],
        "tid long, key long, tts timestamp",
    )
    out = asof_join(trades, quotes, "key", "key", "tts", "qts")
    got = {r["tid"]: r["px"] for r in out.collect()}
    assert got == {100: 11.0, 101: 11.0, 102: 12.0}


def test_forward(spark, quotes):
    trades = spark.createDataFrame(
        [
            (100, 1, _ts(10)),  # equal ts matches itself
            (101, 1, _ts(11)),  # next quote is ts(20)
            (102, 1, _ts(25)),  # nothing after -> dropped
        ],
        "tid long, key long, tts timestamp",
    )
    out = asof_join(
        trades, quotes, "key", "key", "tts", "qts", direction="forward"
    )
    got = {r["tid"]: r["px"] for r in out.collect()}
    assert got == {100: 11.0, 101: 12.0}


def test_matches_pandas_merge_asof(spark):
    """Seeded random timelines; pandas merge_asof is the independent
    reference implementation for backward-inclusive semantics."""
    import random

    rng = random.Random(7)
    left = [
        (i, rng.randrange(5), _ts(rng.randrange(1000)))
        for i in range(400)
    ]
    # right unique per (key, ts) by construction
    right = [
        (k, _ts(s), float(k * 10000 + s))
        for k in range(4)
        for s in rng.sample(range(1000), 60)
    ]
    ldf = spark.createDataFrame(left, "lid long, key long, ts timestamp")
    rdf = spark.createDataFrame(right, "key long, rts timestamp, val double")
    got = {
        r["lid"]: r["val"]
        for r in asof_join(ldf, rdf, "key", "key", "ts", "rts").collect()
    }

    lp = pd.DataFrame(left, columns=["lid", "key", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["key", "rts", "val"]).sort_values(
        "rts"
    )
    m = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="key", direction="backward"
    ).dropna(subset=["val"])
    want = dict(zip(m["lid"], m["val"]))
    assert got == want


def test_plan_has_no_join_and_one_exchange(spark, quotes):
    trades = spark.createDataFrame(
        [(100, 1, _ts(10))], "tid long, key long, tts timestamp"
    )
    df = asof_join(trades, quotes, "key", "key", "tts", "qts")
    plan = plan_of(df)
    assert "Join" not in plan, plan
    assert count_nodes(plan, "Exchange") == 1, plan
    assert count_nodes(plan, "Window") == 1, plan


def test_right_payload_columns_carried(spark, quotes):
    trades = spark.createDataFrame(
        [(100, 1, _ts(30))], "tid long, key long, tts timestamp"
    )
    out = asof_join(trades, quotes, "key", "key", "tts", "qts")
    assert out.columns == ["tid", "key", "tts", "qts", "px"]
    row = out.collect()[0]
    assert row["qts"] == _ts(20) and row["px"] == 12.0


def test_column_collision_rejected(spark, quotes):
    trades = spark.createDataFrame(
        [(1, _ts(5), 1.0)], "key long, qts timestamp, px double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes, "key", "key", "qts", "qts")
