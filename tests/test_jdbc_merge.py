"""Integration-shaped smoke for the staged JDBC upsert — without a live DB.

The Spark→staging JDBC write needs a driver jar + server (environment-bound;
options are unit-tested in test_sources_sinks). What CAN be proven end to
end is the server-side half: the exact SQL string ``upsert_sql`` generates,
executed against an in-process DuckDB playing the warehouse, with the same
staged flow ``write_upsert`` drives — stage, merge, re-run.

Covers the reference hazards the writer exists to fix
(``IncrementalAutocomplete.java:110-118``): H2 (SaveMode.Overwrite drops
the hand-built PRIMARY KEY) — here the PK survives because the target is
never dropped; H1 (re-processing doubles counts) — here a double-run merges
to the identical end state.
"""

from __future__ import annotations

import duckdb
import pytest

from batch_processing_pipeline_spark.sources.jdbc import upsert_sql

COLUMNS = ["prefix", "query", "frequency"]
KEYS = ["prefix", "query"]


def _warehouse():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE suggestions ("
        "prefix VARCHAR, query VARCHAR, frequency BIGINT, "
        "PRIMARY KEY (prefix, query))"
    )
    con.execute("CREATE TABLE suggestions__stage (prefix VARCHAR, query VARCHAR, frequency BIGINT)")
    con.execute("INSERT INTO suggestions VALUES ('th', 'the', 5), ('he', 'hello', 2)")
    return con


def _stage(con, rows):
    # write_upsert stages with truncate-not-drop semantics
    con.execute("DELETE FROM suggestions__stage")
    con.executemany("INSERT INTO suggestions__stage VALUES (?, ?, ?)", rows)


def test_staged_merge_updates_and_inserts():
    con = _warehouse()
    _stage(con, [("th", "the", 9), ("th", "this", 4)])
    merge = upsert_sql("suggestions", COLUMNS, KEYS, "suggestions__stage", "postgres")
    con.execute(merge)
    got = con.execute(
        "SELECT prefix, query, frequency FROM suggestions ORDER BY prefix, query"
    ).fetchall()
    # matched key updated, new key inserted, untouched key preserved
    assert got == [("he", "hello", 2), ("th", "the", 9), ("th", "this", 4)]


def test_double_run_is_idempotent_and_pk_survives():
    con = _warehouse()
    merge = upsert_sql("suggestions", COLUMNS, KEYS, "suggestions__stage", "postgres")
    _stage(con, [("th", "the", 9), ("wo", "world", 7)])
    con.execute(merge)
    once = con.execute("SELECT * FROM suggestions ORDER BY prefix, query").fetchall()
    # replayed batch: same staging content, same merge — identical end state
    _stage(con, [("th", "the", 9), ("wo", "world", 7)])
    con.execute(merge)
    twice = con.execute("SELECT * FROM suggestions ORDER BY prefix, query").fetchall()
    assert once == twice
    # H2: the PRIMARY KEY was never dropped — a direct duplicate insert
    # must still violate it
    with pytest.raises(duckdb.ConstraintException):
        con.execute("INSERT INTO suggestions VALUES ('th', 'the', 1)")


def test_merge_only_touches_non_key_columns():
    sql = upsert_sql("t", ["k1", "k2", "a", "b"], ["k1", "k2"], "t__stage", "postgres")
    assert "k1 = EXCLUDED" not in sql and "k2 = EXCLUDED" not in sql
    assert "a = EXCLUDED.a" in sql and "b = EXCLUDED.b" in sql


def test_mysql_and_ansi_dialects_generate():
    for dialect, marker in [
        ("mysql", "ON DUPLICATE KEY UPDATE"),
        ("ansi", "MERGE INTO"),
        ("postgres", "ON CONFLICT"),
    ]:
        sql = upsert_sql("t", COLUMNS, KEYS, "t__stage", dialect)
        assert marker in sql
    with pytest.raises(ValueError):
        upsert_sql("t", COLUMNS, KEYS, "t__stage", "oracle8i")
