"""Approximate-aggregate tolerance grading (their oracle is the exact
column computed in the same query)."""

from datalake_iceberg_spark.queries import approx


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = approx.approx_distinct_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_approx_quantile_within_tolerance(spark, sf_dir):
    rows = approx.approx_value_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # GK sketch at accuracy 10000 on sf-test data: near-exact
        assert abs(r.approx_p50 - r.exact_p50) <= max(0.05 * abs(r.exact_p50), 1.0)


def test_exact_percentile_monotone(spark, sf_dir):
    for r in approx.value_percentiles(spark, sf_dir).collect():
        assert r.p50 <= r.p90 <= r.p99
