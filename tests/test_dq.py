"""check_expectations API: custom suites, uniqueness rules, one-pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_iceberg_spark.queries.dq import Expectation, check_expectations


def test_custom_suite_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, -1), (2, "c", 10), (4, "d", 200)],
        "id long, name string, score long",
    )
    suite = [
        Expectation("name_not_null", F.col("name").isNull()),
        Expectation("score_non_negative", F.col("score") < 0),
        Expectation("id_unique", unique_on=("id",)),
        Expectation("score_band", (F.col("score") < 0) | (F.col("score") > 100)),
    ]
    rows = {r["rule"]: r for r in check_expectations(df, suite).collect()}
    assert rows["name_not_null"]["n_violations"] == 1
    assert rows["score_non_negative"]["n_violations"] == 1
    assert rows["id_unique"]["n_violations"] == 1  # id=2 twice
    assert rows["score_band"]["n_violations"] == 2
    assert all(r["n_checked"] == 4 for r in rows.values())


def test_green_suite_is_all_zero(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    suite = [
        Expectation("id_not_null", F.col("id").isNull()),
        Expectation("id_unique", unique_on=("id",)),
    ]
    out = check_expectations(df, suite)
    assert out.filter(F.col("n_violations") != 0).count() == 0


def test_single_pass_plan(spark):
    """The whole suite must compile to one aggregation over one scan —
    no per-rule jobs."""
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("g"))
    suite = [
        Expectation("id_not_null", F.col("id").isNull()),
        Expectation("g_in_band", F.col("g") > 6),
        Expectation("id_unique", unique_on=("id",)),
    ]
    plan = check_expectations(df, suite)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # one logical scan (AQE may print reuse)
