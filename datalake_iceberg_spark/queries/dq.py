"""Data-quality expectations — the validation gate a training pipeline
runs before exporting shards (Delta constraints / dbt tests analogue,
beyond the reference's schema-drift check in ``ops/schema_validate``).

An expectation suite compiles to ONE aggregation pass over the table:
every rule becomes a conditional-count column, so checking 20 rules
costs the same scan as checking one. Output: one row per rule with
``n_checked`` / ``n_violations`` — zero violations means the gate is
green. Uniqueness rules ride in the same job via count-distinct.

All expressions are JVM-side; the suite is declarative data, so rule
sets can live in config and compile at plan time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load


@dataclass(frozen=True)
class Expectation:
    name: str
    violated: Column | None = None   # row-level predicate: True == violation
    unique_on: tuple[str, ...] = ()  # table-level uniqueness rule


def check_expectations(df: DataFrame, suite: list[Expectation]) -> DataFrame:
    """Compile the suite into one aggregation pass; returns
    (rule, n_checked, n_violations) per expectation, rule-ordered."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in suite:
        if e.unique_on:
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in e.unique_on])
                ).alias(f"__v_{e.name}")
            )
        else:
            aggs.append(F.sum(e.violated.cast("long")).alias(f"__v_{e.name}"))
    row = df.agg(*aggs)
    pairs: list[Column] = []
    for i, e in enumerate(suite):
        pairs += [F.lit(i), F.lit(e.name), F.col("__n"), F.col(f"__v_{e.name}")]
    return row.select(
        F.stack(F.lit(len(suite)), *pairs).alias(
            "rule_idx", "rule", "n_checked", "n_violations"
        )
    )


def documents_expectations() -> list[Expectation]:
    """The stock suite for the documents table (every rule here holds
    on the TESTDATA fixture EXCEPT the length band, which deliberately
    reports real violations so the non-zero path is exercised)."""
    return [
        Expectation("doc_id_not_null", F.col("doc_id").isNull()),
        Expectation("doc_id_unique", unique_on=("doc_id",)),
        Expectation("text_not_null", F.col("text").isNull()),
        Expectation("lang_in_domain", ~F.col("lang").isin("en", "de", "es", "fr", "zh")),
        Expectation(
            "n_chars_matches_text", F.col("n_chars") != F.length(F.col("text"))
        ),
        Expectation(
            "length_in_band", (F.col("n_chars") < 100) | (F.col("n_chars") > 2000)
        ),
    ]


def dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: run the stock documents suite."""
    return check_expectations(load(spark, sf_dir, "documents"), documents_expectations())


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over the events table (Deequ-profile
    analogue): per column — row count, null count, EXACT distinct
    count, and min/max (numeric columns only; computed natively, then
    rendered to a canonical string so one output schema fits every
    column type). The whole profile is a single aggregation job."""
    from datalake_iceberg_spark.queries.analytics import load_events

    ev = load_events(spark, sf_dir)
    numeric = {"event_id", "user_id", "value"}
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__ndv_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    row = ev.agg(*aggs)
    pairs: list[Column] = []
    for i, c in enumerate(cols):
        lo = F.col(f"__min_{c}") if c in numeric else F.lit(None).cast("string")
        hi = F.col(f"__max_{c}") if c in numeric else F.lit(None).cast("string")
        pairs += [
            F.lit(i), F.lit(c), F.col("__n"),
            F.col(f"__null_{c}"), F.col(f"__ndv_{c}"), lo, hi,
        ]
    return row.select(
        F.stack(F.lit(len(cols)), *pairs).alias(
            "col_idx", "column", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
        )
    )


COLUMN_PROFILE_SQL = """
WITH a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
         COUNT(DISTINCT event_id) AS ndv_event_id,
         CAST(MIN(event_id) AS VARCHAR) AS min_event_id, CAST(MAX(event_id) AS VARCHAR) AS max_event_id,
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
         COUNT(DISTINCT user_id) AS ndv_user_id,
         CAST(MIN(user_id) AS VARCHAR) AS min_user_id, CAST(MAX(user_id) AS VARCHAR) AS max_user_id,
         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
         COUNT(DISTINCT event_type) AS ndv_event_type,
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
         COUNT(DISTINCT value) AS ndv_value,
         CAST(MIN(value) AS VARCHAR) AS min_value_c, CAST(MAX(value) AS VARCHAR) AS max_value_c,
         CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
         COUNT(DISTINCT props) AS ndv_props
  FROM events
)
SELECT * FROM (
  SELECT 0 AS col_idx, 'event_id' AS column, n AS n_rows, null_event_id AS n_null, ndv_event_id AS n_distinct, min_event_id AS min_value, max_event_id AS max_value FROM a
  UNION ALL SELECT 1, 'user_id', n, null_user_id, ndv_user_id, min_user_id, max_user_id FROM a
  UNION ALL SELECT 2, 'event_type', n, null_event_type, ndv_event_type, NULL, NULL FROM a
  UNION ALL SELECT 3, 'value', n, null_value, ndv_value, min_value_c, max_value_c FROM a
  UNION ALL SELECT 4, 'props', n, null_props, ndv_props, NULL, NULL FROM a
)
"""


DQ_VIOLATIONS_SQL = """
WITH a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
         COUNT(*) - COUNT(DISTINCT doc_id) AS v1,
         CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(SUM(CASE WHEN lang NOT IN ('en','de','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         CAST(SUM(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v4,
         CAST(SUM(CASE WHEN n_chars < 100 OR n_chars > 2000 THEN 1 ELSE 0 END) AS BIGINT) AS v5
  FROM documents
)
SELECT * FROM (
  SELECT 0 AS rule_idx, 'doc_id_not_null' AS rule, n AS n_checked, v0 AS n_violations FROM a
  UNION ALL SELECT 1, 'doc_id_unique', n, v1 FROM a
  UNION ALL SELECT 2, 'text_not_null', n, v2 FROM a
  UNION ALL SELECT 3, 'lang_in_domain', n, v3 FROM a
  UNION ALL SELECT 4, 'n_chars_matches_text', n, v4 FROM a
  UNION ALL SELECT 5, 'length_in_band', n, v5 FROM a
)
"""
