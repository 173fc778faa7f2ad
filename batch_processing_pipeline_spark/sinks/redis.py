"""Redis-style serving-layer sink.

The reference reaches Redis via MySQL → Debezium → Kafka → consumer
(``docker-compose.yml:147-184``); the served contract is
``SET <prefix> <json array of completions>`` distributed over a 3-node
cluster by hash slot (recovered from the shipped dump/AOF files, SURVEY
§1.4). A Spark-first design publishes directly from the suggestions
DataFrame with ``foreachPartition`` — one connection and one pipelined
batch per partition, no per-row round-trips.

``redis`` (the Python client) is not in this container, so the client is
injectable: ``client_factory`` returns any object with ``set(key, value)``
and optional ``execute()`` (pipeline flush). Tests inject a fake; production
passes ``lambda: redis.RedisCluster(...).pipeline()``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def publish_suggestions(
    df: DataFrame,
    client_factory: Callable[[], object],
    key_col: str = "prefix",
    value_col: str = "completions_json",
    flush_every: int = 1_000,
) -> None:
    """SET key→value for every row, one pipelined client per partition.

    ``client_factory`` must be picklable (it runs on executors). Batches of
    ``flush_every`` are flushed via ``client.execute()`` when the client
    exposes it (redis pipelines do).
    """
    key_idx_holder = (key_col, value_col, flush_every, client_factory)

    def send_partition(rows: Iterator) -> None:
        key_col_, value_col_, flush_every_, factory = key_idx_holder
        client = factory()
        pending = 0
        for row in rows:
            client.set(row[key_col_], row[value_col_])
            pending += 1
            if pending >= flush_every_ and hasattr(client, "execute"):
                client.execute()
                pending = 0
        if pending and hasattr(client, "execute"):
            client.execute()

    df.select(key_col, value_col).foreachPartition(send_partition)


def publish_delta(
    df: DataFrame,
    client_factory: Callable[[], object],
    key_col: str = "prefix",
    value_col: str = "completions_json",
    op_col: str = "op",
    flush_every: int = 1_000,
) -> None:
    """Apply a suggestions DELTA (``plans.autocomplete.diff_suggestions``
    output: op ∈ {'upsert','delete'}) to the serving store: SET for
    upserts, DEL for deletes — the full replacement of the reference's
    MySQL→Debezium→Kafka→consumer CDC hop with two idempotent verbs, so
    an at-least-once replay of the same delta converges to the same
    store state. One pipelined client per partition, as
    ``publish_suggestions``."""
    ctx = (key_col, value_col, op_col, flush_every, client_factory)

    def send_partition(rows: Iterator) -> None:
        key_col_, value_col_, op_col_, flush_every_, factory = ctx
        client = factory()
        pending = 0
        for row in rows:
            if row[op_col_] == "delete":
                client.delete(row[key_col_])
            else:
                client.set(row[key_col_], row[value_col_])
            pending += 1
            if pending >= flush_every_ and hasattr(client, "execute"):
                client.execute()
                pending = 0
        if pending and hasattr(client, "execute"):
            client.execute()

    df.select(key_col, value_col, op_col).foreachPartition(send_partition)
