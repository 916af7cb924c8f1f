"""Approximate & order-statistic aggregates — the sketch family a
100 TB engine needs (SURVEY §2.5 notes the reference has none; Spark
provides them natively, these queries pin the surface).

- ``value_percentiles``: EXACT interpolated percentiles
  (``percentile``), oracle-checked against DuckDB ``quantile_cont``
  (same linear-interpolation definition). Exact percentile is a full
  sort per group — fine for dashboards, not for 100 TB.
- ``approx_distinct_users``: HLL++ ``approx_count_distinct`` next to
  the exact count. Sketches are mergeable → map-side partial
  aggregation, constant memory; the exact column exists so the driver
  (rows-only) and the tolerance test can grade the estimate.
- ``approx_value_quantiles``: GK-sketch ``percentile_approx`` next to
  exact — same pattern.

Implementation-defined estimates differ across engines, so the approx
queries are deliberately *not* value-hash oracled (the engine's
tolerance tests grade them instead); ``value_percentiles`` is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries.analytics import EVENTS_CTE, load_events


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per event_type."""
    ev = load_events(spark, sf_dir)
    pct = F.percentile(F.col("value"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(pct[0], 4).alias("p50"),
            F.round(pct[1], 4).alias("p90"),
            F.round(pct[2], 4).alias("p99"),
        )
        .orderBy("event_type")
    )


VALUE_PERCENTILES_SQL = f"""
WITH {EVENTS_CTE}
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events_us
GROUP BY event_type
ORDER BY event_type
"""


def _distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL++ estimate next to the exact count (tolerance tests)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event_type, SELF-CHECKED against the
    exact count in the same job. Sketch estimates are
    implementation-defined, so the graded output carries the exact
    count plus ``hll_within_5pct`` — the oracle asserts the boolean;
    the raw estimate is graded by tolerance in tests/test_approx.py.
    At 100 TB the exact count is the expensive column (full shuffle of
    the distinct set); the sketch is a constant-memory partial agg."""
    sk = _distinct_users_sketch(spark, sf_dir)
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    return sk.select(
        "event_type", "exact_users", within.alias("hll_within_5pct")
    ).orderBy("event_type")


APPROX_DISTINCT_SQL = f"""
WITH {EVENTS_CTE}
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_5pct
FROM events_us GROUP BY event_type ORDER BY event_type
"""


def _value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw GK-sketch median next to the exact interpolated median."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
            F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("exact_p50"),
        )
        .orderBy("event_type")
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch median SELF-CHECKED against the exact interpolated
    median in the same job (same grading pattern as
    :func:`approx_distinct_users`; tolerance = max(5% relative, 1.0
    absolute) — the GK sketch returns a data point, the exact median
    interpolates between two)."""
    sk = _value_quantiles_sketch(spark, sf_dir)
    within = F.abs(F.col("approx_p50") - F.col("exact_p50")) <= F.greatest(
        0.05 * F.abs(F.col("exact_p50")), F.lit(1.0)
    )
    return sk.select(
        "event_type", "exact_p50", within.alias("gk_within_tol")
    ).orderBy("event_type")


APPROX_QUANTILES_SQL = f"""
WITH {EVENTS_CTE}
SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
       TRUE AS gk_within_tol
FROM events_us GROUP BY event_type ORDER BY event_type
"""
