"""Batch source formats: csv / json / parquet round-trips through engine ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.prefix import prefix_frequencies

SCHEMA = "doc_id long, query string"
ROWS = [(1, "alpha"), (2, "alpha"), (3, "beta")]


def _check(df):
    freq = {
        (r.prefix, r.query): r.frequency
        for r in prefix_frequencies(df.select("query")).collect()
    }
    assert freq[("al", "alpha")] == 2
    assert freq[("be", "beta")] == 1


def test_csv_source_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "csv")
    src.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(SCHEMA).csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)
    _check(back)


def test_json_source_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "json")
    src.write.json(path)
    back = spark.read.schema(SCHEMA).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)
    _check(back)


def test_partitioned_parquet_sink(spark, tmp_path):
    src = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "bucket", (F.col("doc_id") % 2).cast("int")
    )
    path = str(tmp_path / "pq")
    src.write.partitionBy("bucket").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 3
    assert set(back.select("bucket").distinct().toPandas()["bucket"]) == {0, 1}
