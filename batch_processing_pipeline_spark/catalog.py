"""Fixture catalog: load the driver-generated parquet tables.

Tables (see TESTDATA.md / FIXTURES.md §B): TPC-H-ish star schema plus an
``events`` stream table, a ``documents`` corpus and an ``embeddings`` vector
table. Loaded lazily as DataFrames; ``register_views`` exposes them as temp
views so ``spark.sql`` queries and the DataFrame API share one catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table under ``sf_dir`` as a DataFrame."""
    return {name: spark.read.parquet(table_path(sf_dir, name)) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register the fixture tables as temp views."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
