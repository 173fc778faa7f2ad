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


def test_orc_source_roundtrip(spark, tmp_path):
    out = str(tmp_path / "orc")
    df = spark.range(100).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v")
    df.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == 100
    assert {r.id: r.v for r in back.collect()}[7] == 14.0


def test_python_datasource_querylog_reads_hourly_files(spark, tmp_path):
    """Custom Python DataSource (Spark 4 API): one partition per hourly
    file, hour-range pruning at planning time."""
    from batch_processing_pipeline_spark.sources.pyds import (
        QueryLogDataSource,
        QueryLogReader,
    )

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "2025-01-01-00.txt").write_text("alpha\nbeta\n")
    (logs / "2025-01-01-01.txt").write_text("gamma\n")
    (logs / "2025-01-01-02.txt").write_text("delta\n")
    (logs / "notes.md").write_text("ignored\n")

    spark.dataSource.register(QueryLogDataSource)
    df = spark.read.format("querylog").option("path", str(logs)).load()
    rows = {(r.value, r.hour) for r in df.collect()}
    assert rows == {
        ("alpha", "2025-01-01-00"),
        ("beta", "2025-01-01-00"),
        ("gamma", "2025-01-01-01"),
        ("delta", "2025-01-01-02"),
    }

    # planning-time pruning: the window options shrink the PARTITION list,
    # not just the rows
    reader = QueryLogReader(
        {
            "path": str(logs),
            "start_hour": "2025-01-01-01",
            "end_hour": "2025-01-01-01",
        }
    )
    parts = reader.partitions()
    assert [p.hour for p in parts] == ["2025-01-01-01"]
    windowed = (
        spark.read.format("querylog")
        .option("path", str(logs))
        .option("start_hour", "2025-01-01-01")
        .option("end_hour", "2025-01-01-02")
        .load()
    )
    assert {r.value for r in windowed.collect()} == {"gamma", "delta"}


def test_querylog_writer_round_trip(spark, tmp_path):
    """The WRITE half of the custom DataSource: distributed tasks stage
    per-hour part files, the driver commit assembles the final
    <hour>.txt layout atomically — then the READER half reads back
    exactly what was written (full custom-connector loop)."""
    import os

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.sources.pyds import QueryLogDataSource

    spark.dataSource.register(QueryLogDataSource)
    out = tmp_path / "out"
    out.mkdir()
    rows = [
        ("alpha", "2025-01-01-00"),
        ("beta", "2025-01-01-00"),
        ("gamma", "2025-01-01-01"),
        ("delta", "2025-01-01-02"),
        ("epsilon", "2025-01-01-02"),
    ]
    df = spark.createDataFrame(rows, "value string, hour string").repartition(3)
    df.write.format("querylog").option("path", str(out)).mode("append").save()

    files = sorted(p for p in os.listdir(out) if not p.startswith("."))
    assert files == [
        "2025-01-01-00.txt", "2025-01-01-01.txt", "2025-01-01-02.txt"
    ]
    # no staging residue
    assert not [p for p in os.listdir(out) if p.startswith(".staging")]

    back = spark.read.format("querylog").option("path", str(out)).load()
    assert {(r.value, r.hour) for r in back.collect()} == set(rows)

    # a bad hour value fails the job loudly and leaves no final files
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    bad = spark.createDataFrame([("x", "not-an-hour")], "value string, hour string")
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="bad hour"):
        bad.write.format("querylog").option("path", str(bad_dir)).mode(
            "append"
        ).save()
    assert not [p for p in os.listdir(bad_dir) if p.endswith(".txt")]


def test_querylog_stream_reader_incremental(spark, tmp_path):
    """Streaming half of the custom DataSource: each availableNow run
    ingests only hour files not in the checkpointed offset — including a
    LATE file sorting before already-seen hours — so arrivals land in
    exactly one micro-batch across restarts."""
    from batch_processing_pipeline_spark.sources.pyds import QueryLogDataSource

    spark.dataSource.register(QueryLogDataSource)
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "2025-01-01-01.txt").write_text("a\nb\n")
    (logs / "2025-01-01-02.txt").write_text("c\n")
    ckpt = str(tmp_path / "ckpt")
    out_rows = []

    def sink(df, batch_id):
        out_rows.extend((r.value, r.hour) for r in df.collect())

    def run_once():
        q = (
            spark.readStream.format("querylog")
            .option("path", str(logs))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert sorted(out_rows) == [
        ("a", "2025-01-01-01"), ("b", "2025-01-01-01"), ("c", "2025-01-01-02")
    ]

    # a NEW hour and a LATE hour (sorts before the seen ones) arrive
    (logs / "2025-01-01-03.txt").write_text("d\n")
    (logs / "2025-01-01-00.txt").write_text("late\n")
    out_rows.clear()
    run_once()
    assert sorted(out_rows) == [
        ("d", "2025-01-01-03"), ("late", "2025-01-01-00")
    ]

    # nothing new → empty batch, no re-ingestion
    out_rows.clear()
    run_once()
    assert out_rows == []


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema evolution across batches: a later batch adds a column; a
    mergeSchema read unifies both (older rows NULL-filled), and the
    default read of the union survives column pruning to either shape —
    the ingest reality at 100 TB where producers upgrade mid-stream."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(0, 10).select(
        F.col("id"), F.lit("v1").alias("source")
    ).write.mode("append").parquet(base)
    spark.range(10, 20).select(
        F.col("id"), F.lit("v2").alias("source"), F.lit(0.5).alias("score")
    ).write.mode("append").parquet(base)

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "source", "score"}
    assert merged.count() == 20
    # old-batch rows get NULL for the new column, new-batch rows keep it
    nulls = merged.where(F.col("score").isNull()).count()
    assert nulls == 10
    assert merged.where(F.col("score") == 0.5).count() == 10


def test_merge_schema_type_widening_rejected_loudly(spark, tmp_path):
    """Conflicting types for one column across batches must fail the
    mergeSchema read with a clear error, not silently coerce."""
    import pytest
    from pyspark.sql import functions as F

    base = str(tmp_path / "conflict")
    spark.range(0, 5).select(F.col("id"), F.lit(1).alias("v")).write.mode(
        "append"
    ).parquet(base)
    spark.range(5, 10).select(
        F.col("id"), F.lit("s").alias("v")
    ).write.mode("append").parquet(base)
    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        spark.read.option("mergeSchema", "true").parquet(base).collect()
