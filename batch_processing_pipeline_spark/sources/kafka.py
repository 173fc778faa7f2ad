"""Kafka source/sink wrappers.

The reference publishes suggestion changes to Kafka twice over its history:
directly from Spark (approach 3: topic ``autocomplete_prefixes``,
``approach 3 cli instructions.txt:6``) and via MySQL→Debezium CDC (approach
4: topic ``autocomplete.autocomplete.prefix_suggestions``). A Spark-first
design publishes directly: ``df.write.format("kafka")`` with the prefix as
the record key, exactly the (key = prefix, value = JSON array) contract the
Redis consumer expects (SURVEY §1.4).

The ``spark-sql-kafka-0-10`` package must be on the classpath
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``); calls
fail with a clear message when it is not (this container has no broker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _kafka_unavailable(exc: Exception) -> RuntimeError:
    return RuntimeError(
        "Kafka connector not on the classpath; submit with "
        "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
    )


def to_kafka_records(
    df: DataFrame, key_col: str = "prefix", value_col: str = "completions_json"
) -> DataFrame:
    """(key, value) projection Kafka's sink expects — key = prefix so all
    updates for one prefix land in one partition (ordered per prefix)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )


def write_suggestions(
    df: DataFrame, brokers: str, topic: str, key_col: str = "prefix",
    value_col: str = "completions_json",
) -> None:
    """Batch-publish a suggestions table to Kafka."""
    try:
        (
            to_kafka_records(df, key_col, value_col)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .save()
        )
    except Exception as exc:  # pragma: no cover - needs broker + package
        raise _kafka_unavailable(exc) from exc


def read_stream(
    spark: SparkSession, brokers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Streaming Kafka source → (key string, value string, timestamp)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - needs broker + package
        raise _kafka_unavailable(exc) from exc
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp"),
    )


def publish_delta_records(
    df: DataFrame,
    producer_factory,
    key_col: str = "prefix",
    value_col: str = "completions_json",
    op_col: str = "op",
) -> None:
    """Publish a suggestions delta as keyed records with DELETE-AS-
    TOMBSTONE semantics (value=None), the log-compacted-topic contract
    the reference's Debezium topic carries
    (``docker-compose.yml:126-145``). ``producer_factory`` is injectable
    (no broker in this container): it must be picklable and return an
    object with ``send(key: str, value: str | None)`` and optionally
    ``flush()`` — production passes a kafka-python producer adapter;
    tests inject a fake. For a classpath-native path use
    ``write_suggestions`` (spark-sql-kafka) instead."""
    ctx = (key_col, value_col, op_col, producer_factory)

    def send_partition(rows) -> None:
        key_col_, value_col_, op_col_, factory = ctx
        producer = factory()
        for row in rows:
            value = None if row[op_col_] == "delete" else row[value_col_]
            producer.send(row[key_col_], value)
        if hasattr(producer, "flush"):
            producer.flush()

    df.select(key_col, value_col, op_col).foreachPartition(send_partition)
