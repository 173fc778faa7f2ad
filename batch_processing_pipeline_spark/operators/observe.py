"""In-flight data-quality metrics via ``df.observe`` (zero extra passes).

At 100 TB the difference between "count the rows, then write" and
"observe while writing" is a full extra scan of the input. Spark's
Observation API accumulates aggregate metrics ON the same job that
produces the output — the metrics ride the action, costing one aggregate
buffer per task, not a second pass. This module packages the standard
ingest-gate metrics (row count, per-column null counts, key range) so
every batch write can assert its contract cheaply.

Known Spark interaction: a session that has hosted observations can later
fail RDD-closure jobs (e.g. Spark ML training) with
``NotSerializableException: ObservationManager`` — the manager is session
state and can be dragged into task closures. On a long-lived shared
session, attach observations in a sibling session
(``spark.newSession()``, same SparkContext, separate session state); the
observed write behaves identically there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    null_cols: tuple[str, ...] = (),
    range_col: str | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / range metrics to ``df``.

    Returns ``(observed_df, observation)``; run any ACTION on the
    returned frame (a write, a count), then read ``observation.get`` —
    a dict like ``{"rows": n, "nulls_<col>": n, "min_<col>": v,
    "max_<col>": v}``. The metrics are exact and computed by the same
    tasks that produced the action's result.
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    if range_col is not None:
        metrics.append(F.min(range_col).alias(f"min_{range_col}"))
        metrics.append(F.max(range_col).alias(f"max_{range_col}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def assert_quality(
    observation: Observation,
    min_rows: int = 1,
    max_null_fraction: float = 0.0,
) -> dict:
    """Gate on the observed metrics AFTER the action ran; returns them.

    Raises ``ValueError`` when the batch is empty(-ish) or any observed
    null count exceeds ``max_null_fraction`` of the rows — the cheap
    ingest circuit-breaker that stops a bad batch from being published.
    """
    got = observation.get
    rows = got.get("rows", 0)
    if rows < min_rows:
        raise ValueError(f"quality gate: {rows} rows < min_rows={min_rows}")
    for key, val in got.items():
        if key.startswith("nulls_") and rows and val / rows > max_null_fraction:
            raise ValueError(
                f"quality gate: {key}={val} exceeds "
                f"{max_null_fraction:.1%} of {rows} rows"
            )
    return got
