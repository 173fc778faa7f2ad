"""MongoDB serving-layer sink — the trending-era document store.

The reference's deleted ``TrendingAutocomplete`` job sank nested
``{prefix, completions: [{query, frequency, last_updated}]}`` documents to
``mymongo.autocomplete_prefixes`` with an index on ``prefix``
(``approach 3 cli instructions.txt:9,43``; ``reports-steps/steps.docx``
"Step 1: MongoDB Schema & Index"; ``design.txt:1``). Two paths:

* ``write_mongodb`` — the connector path: a thin ``df.write
  .format("mongodb")`` wrapper (the official Spark connector; executors
  write partitions in parallel, no driver collect). The connector jar is
  not in this container, so the call is exercised in production, not in
  unit tests.
* ``publish_documents`` — the connector-less path mirroring
  ``sinks/redis.py``: ``foreachPartition`` with an injectable client
  factory; each partition upserts its documents through one client
  (``replace_one(filter, doc, upsert=True)`` per document — the
  idempotent write the prefix-keyed collection wants). Tests inject a
  fake client; production passes
  ``lambda: pymongo.MongoClient(uri)[db][coll]``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mongo_documents(
    suggestions: DataFrame,
    prefix_col: str = "prefix",
    completions_col: str = "completions",
    ts_col: str | None = None,
) -> DataFrame:
    """Shape a suggestions frame into the trending-era document rows.

    Accepts either the nested trending shape (``completions`` already an
    ``array<struct<query, frequency>>``) or the flat serving shape
    (``array<string>`` — wrapped into one-field structs). Output columns:
    (prefix, completions, last_updated?) — ``to_json(struct(*))`` of a row
    is exactly the reference's Mongo document.
    """
    field = suggestions.schema[completions_col].dataType
    from pyspark.sql.types import ArrayType, StringType

    comp = F.col(completions_col)
    if isinstance(field, ArrayType) and isinstance(field.elementType, StringType):
        comp = F.transform(comp, lambda q: F.struct(q.alias("query")))
    out = suggestions.select(F.col(prefix_col).alias("prefix"), comp.alias("completions"))
    if ts_col is not None:
        out = out.withColumn("last_updated", F.col(ts_col))
    return out


def write_mongodb(
    df: DataFrame,
    uri: str,
    database: str = "mymongo",
    collection: str = "autocomplete_prefixes",
    mode: str = "append",
) -> None:
    """Connector write (requires ``mongo-spark-connector`` on the
    classpath). ``idFieldList=prefix`` makes the write an upsert keyed on
    the prefix — the Mongo twin of the JDBC staged merge."""
    (
        df.write.format("mongodb")
        .mode(mode)
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .option("idFieldList", "prefix")
        .save()
    )


def publish_documents(
    df: DataFrame,
    client_factory: Callable[[], object],
    prefix_col: str = "prefix",
    doc_cols: tuple[str, ...] = ("prefix", "completions"),
) -> None:
    """Upsert one document per row, one client per partition.

    ``client_factory`` must be picklable (it runs on executors) and return
    an object with ``replace_one(filter, doc, upsert=)`` (a pymongo
    ``Collection`` does) — or ``bulk_write(ops)`` if it exposes one (used
    in batches automatically by pymongo's own pipelining; here one call
    per doc keeps the fake-client contract simple and the real client
    batches at the wire level).
    """
    holder = (prefix_col, tuple(doc_cols), client_factory)

    def send_partition(rows: Iterator) -> None:
        prefix_col_, doc_cols_, factory = holder
        client = factory()
        try:
            for row in rows:
                doc = {c: row[c] for c in doc_cols_}
                client.replace_one({prefix_col_: row[prefix_col_]}, doc, upsert=True)
        finally:
            # one client per partition per batch: release its connection
            # pool eagerly instead of waiting for executor-side GC
            close = getattr(client, "close", None)
            if callable(close):
                close()

    df.select(*doc_cols).foreachPartition(send_partition)
