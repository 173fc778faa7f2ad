"""JDBC upsert SQL generation, Redis-style sink, Kafka record projection,
query-log source windowing."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.sources.jdbc import upsert_sql
from batch_processing_pipeline_spark.sources.kafka import to_kafka_records
from batch_processing_pipeline_spark.sources.text import hourly_paths, read_query_log
from batch_processing_pipeline_spark.sinks.redis import publish_suggestions


def test_upsert_sql_mysql():
    sql = upsert_sql(
        "prefix_query_frequency",
        ["prefix", "query", "frequency", "last_updated"],
        ["prefix", "query"],
        "stage_t",
    )
    assert "INSERT INTO prefix_query_frequency" in sql
    assert "ON DUPLICATE KEY UPDATE" in sql
    assert "frequency = VALUES(frequency)" in sql
    # key columns are never updated
    assert "prefix = VALUES(prefix)" not in sql


def test_upsert_sql_ansi_merge():
    sql = upsert_sql("t", ["k", "v"], ["k"], "s", dialect="ansi")
    assert sql.startswith("MERGE INTO t t USING s s ON (t.k = s.k)")
    assert "WHEN MATCHED THEN UPDATE SET t.v = s.v" in sql
    assert "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)" in sql


def test_hourly_paths_window():
    got = hourly_paths("/logs", datetime(2025, 6, 10, 23), hours=3)
    assert got == [
        "/logs/2025-06-10-23.txt",
        "/logs/2025-06-10-22.txt",
        "/logs/2025-06-10-21.txt",
    ]


def test_read_query_log_multi_file(spark, tmp_path):
    (tmp_path / "a.txt").write_text("one\ntwo\n")
    (tmp_path / "b.txt").write_text("three\n")
    df = read_query_log(spark, [str(tmp_path / "a.txt"), str(tmp_path / "b.txt")])
    assert sorted(r.value for r in df.collect()) == ["one", "three", "two"]


def test_kafka_record_projection(spark):
    df = spark.createDataFrame(
        [("te", '["test"]')], "prefix string, completions_json string"
    )
    rec = to_kafka_records(df).collect()[0]
    assert (rec.key, rec.value) == ("te", '["test"]')


def test_redis_sink_publishes_all_rows(spark, tmp_path):
    out = str(tmp_path / "redis.log")
    df = spark.createDataFrame(
        [("aa", "[1]"), ("bb", "[2]"), ("cc", "[3]")],
        "prefix string, completions_json string",
    ).repartition(2)

    def factory(path=out):
        # class defined inside the closure → cloudpickle ships it by value
        # (a test-module-level class would fail to import on executors)
        class FakeRedis:
            def __init__(self):
                self.buffer = []

            def set(self, k, v):
                self.buffer.append((k, v))

            def execute(self):
                with open(path, "a") as f:
                    for k, v in self.buffer:
                        f.write(f"{k}\t{v}\n")
                self.buffer = []

        return FakeRedis()

    publish_suggestions(df, factory, flush_every=2)
    lines = sorted(open(out).read().splitlines())
    assert lines == ["aa\t[1]", "bb\t[2]", "cc\t[3]"]


def test_mongodb_sink_upserts_nested_documents(spark, tmp_path):
    """The trending-era Mongo contract: one {prefix, completions:[{query,
    frequency}]} document per prefix, upserted keyed on prefix
    (approach 3 cli instructions.txt:9,43; steps.docx 'Step 1')."""
    import json

    from batch_processing_pipeline_spark.sinks.mongodb import (
        mongo_documents,
        publish_documents,
    )

    out = str(tmp_path / "mongo.log")
    sugg = spark.createDataFrame(
        [
            ("te", [("test", 2), ("ten", 1)]),
            ("ze", [("zebra", 1)]),
        ],
        "prefix string, completions array<struct<query string, frequency long>>",
    ).repartition(2)
    docs = mongo_documents(sugg)

    def factory(path=out):
        class FakeCollection:
            def replace_one(self, flt, doc, upsert=False):
                assert upsert is True
                assert set(flt) == {"prefix"}
                with open(path, "a") as f:
                    payload = {
                        "prefix": doc["prefix"],
                        "completions": [list(c) for c in doc["completions"]],
                    }
                    f.write(json.dumps(payload, sort_keys=True) + "\n")

        return FakeCollection()

    publish_documents(docs, factory)
    got = sorted(json.loads(line)["prefix"] for line in open(out))
    assert got == ["te", "ze"]
    by_prefix = {json.loads(l)["prefix"]: json.loads(l) for l in open(out)}
    assert by_prefix["te"]["completions"] == [["test", 2], ["ten", 1]]


def test_mongodb_documents_wrap_flat_serving_arrays(spark):
    """The flat serving shape (array<string>) wraps into one-field structs
    so both suggestion shapes produce valid documents."""
    from batch_processing_pipeline_spark.sinks.mongodb import mongo_documents

    flat = spark.createDataFrame(
        [("te", ["test", "ten"])], "prefix string, completions array<string>"
    )
    row = mongo_documents(flat).collect()[0]
    assert [c.query for c in row.completions] == ["test", "ten"]
