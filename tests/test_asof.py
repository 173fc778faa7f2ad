"""As-of join: golden cases + columnar-vs-pandas implementation agreement."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.asof import asof_join, asof_join_pandas


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


LEFT = [
    (1, 10, _ts("2024-01-01 10:00:00")),
    (2, 10, _ts("2024-01-01 12:00:00")),
    (3, 20, _ts("2024-01-01 09:00:00")),  # before any right row for key 20
]
RIGHT = [
    (100, 10, _ts("2024-01-01 09:30:00"), 1.5),
    (101, 10, _ts("2024-01-01 11:00:00"), 2.5),
    (102, 20, _ts("2024-01-01 10:00:00"), 9.9),
    (103, 10, _ts("2024-01-01 12:00:00"), 3.5),  # equal-ts: must match row 2
]
L_SCHEMA = "id long, k long, ts timestamp"
R_SCHEMA = "rid long, k long, ts timestamp, v double"


def _frames(spark):
    return (
        spark.createDataFrame(LEFT, L_SCHEMA),
        spark.createDataFrame(RIGHT, R_SCHEMA),
    )


def test_asof_join_golden(spark):
    l, r = _frames(spark)
    got = {
        row.id: (row.rid_r, row.v_r)
        for row in asof_join(l, r, on="k", right_cols=("rid", "v")).collect()
    }
    assert got[1] == (100, 1.5)   # latest right ≤ 10:00 is 09:30
    assert got[2] == (103, 3.5)   # equal timestamp matches (inclusive)
    assert got[3] == (None, None)  # nothing at or before 09:00 for key 20


def test_asof_join_tolerance(spark):
    l, r = _frames(spark)
    got = {
        row.id: row.rid_r
        for row in asof_join(
            l, r, on="k", right_cols=("rid", "v"), tolerance_seconds=1800
        ).collect()
    }
    assert got[1] == 100   # 30 min gap: inside tolerance
    assert got[2] == 103   # 0 gap
    assert got[3] is None


def test_asof_pandas_agrees_with_columnar(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(e.dtypes)["ts"] == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("rid"), "user_id", "ts", "value"
    )
    a = {
        r.event_id: (r.rid_r, r.value_r)
        for r in asof_join(purchases, errors, on="user_id", right_cols=("rid", "value")).collect()
    }
    b = {
        r.event_id: (r.rid_r, r.value_r)
        for r in asof_join_pandas(
            purchases, errors, on="user_id", right_cols=("rid", "value")
        ).collect()
    }
    assert a == b
    assert len(a) == purchases.count()
