"""As-of join, range join, hypertable rollup — vs DuckDB oracles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators import temporal as TP

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF}/part.parquet')"
    )
    return con


def test_asof_join_unit(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 5.0, 100), (1, 15.0, 200), (1, 20.0, 300), (3, 1.0, 9)],
        ["k", "ts", "v"],
    )
    got = {
        (r["k"], r["ts"], r["v"])
        for r in TP.asof_join(left, right, key="k").collect()
    }
    # ts=20 sees the exact-tie right row (300); ts=10 sees 100; k=2 none
    assert got == {(1, 10.0, 100), (1, 20.0, 300), (2, 5.0, None)}


def test_asof_join_vs_duckdb(spark, duck):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    got = TP.asof_join(clicks, purch, key="user_id").select(
        "event_id", "purchase_id"
    )
    want = duck.execute("""
        WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type='click'),
             p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
                   WHERE event_type='purchase')
        SELECT c.event_id, p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """).fetchall()
    g = sorted((r["event_id"], r["purchase_id"]) for r in got.collect())
    w = sorted((a, b) for a, b in want)
    assert g == w and len(g) > 0


def test_range_join_vs_duckdb(spark, duck):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", (F.lit(900.0) + F.col("value") % 100).alias("point")
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey",
        F.col("p_retailprice").alias("start"),
        (F.col("p_retailprice") + F.col("p_size")).alias("end"),
    )
    got = TP.range_join(ev, part, point_col="point").select("event_id", "p_partkey")
    want = duck.execute("""
        WITH pts AS (SELECT event_id, 900.0 + (value % 100) AS point FROM events)
        SELECT event_id, p_partkey FROM pts
        JOIN part ON point >= p_retailprice AND point < p_retailprice + p_size
    """).fetchall()
    g = sorted((r["event_id"], r["p_partkey"]) for r in got.collect())
    assert g == sorted(want)
    assert len(g) > 0, "range join must be non-trivial"


def test_range_join_no_cartesian(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "value")
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey",
        F.col("p_retailprice").alias("start"),
        (F.col("p_retailprice") + F.col("p_size")).alias("end"),
    )
    plan = (
        TP.range_join(ev, part, point_col="value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hypertable_rollup_consistency(spark, duck):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    tiers = TP.hypertable_rollup(ev, tiers=("5 minutes", "1 hour", "1 day"))
    day = tiers["1 day"].select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type", "n",
        F.round(F.col("sum_v").cast("decimal(18,6)").cast("double"), 4).alias("sum_v"),
    )
    want = duck.execute("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
               count(*) AS n,
               round(cast(cast(round(sum(cast(value as decimal(18,6))), 6) as decimal(18,6)) as double), 4) AS sum_v
        FROM events GROUP BY 1, 2
    """).fetchall()
    g = sorted(tuple(r) for r in day.collect())
    assert g == sorted(tuple(r) for r in want)
    # tier composition: hour tier sums to the same totals as day tier
    h = tiers["1 hour"].agg(F.sum("n")).collect()[0][0]
    d = tiers["1 day"].agg(F.sum("n")).collect()[0][0]
    assert h == d == ev.count()


def test_asof_join_latest_row_atomic(spark):
    """merge_asof returns the latest right ROW as-is: a NULL column in
    that row must stay NULL, not backfill from an older row
    (code-review r5 wave-4 #1)."""
    left = spark.createDataFrame([(1, 30.0)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 10.0, 1, 2), (1, 20.0, 5, None)],
        "k long, ts double, a int, b int",
    )
    row = TP.asof_join(left, right, key="k").collect()[0]
    assert (row["a"], row["b"], row["ts_right"]) == (5, None, 20.0)


def test_range_join_inverted_interval_dropped(spark):
    """An inverted interval (end < start) matches nothing and must not
    explode a descending sequence or poison the default bucket width
    (code-review r5 wave-4 #4)."""
    points = spark.createDataFrame([(5.0,)], ["p"])
    intervals = spark.createDataFrame(
        [(0.0, 10.0, "ok"), (1.7e9, 0.0, "bad")],
        "start double, end double, tag string",
    )
    got = [r["tag"] for r in
           TP.range_join(points, intervals, point_col="p").collect()]
    assert got == ["ok"]


def test_hypertable_rollup_rejects_non_nesting_tiers(spark):
    """7-minute buckets straddle 1-hour windows: the rollup must refuse
    instead of silently mis-counting (code-review r5 wave-4 #7)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("2024-01-01 00:58:00", "a", 1.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pytest.raises(ValueError, match="multiple"):
        TP.hypertable_rollup(df, tiers=("7 minutes", "1 hour"))
    # the nesting default chain still works
    out = TP.hypertable_rollup(df)
    assert out["1 day"].collect()[0]["n"] == 1
