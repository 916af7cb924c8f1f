"""Approximate-aggregate tolerance grading. The raw sketches are graded
here against the exact column computed in the same query; the driver
entries are SELF-CHECKING (exact value + within-tolerance boolean, so
the DuckDB oracle can assert them despite implementation-defined
estimates)."""

from datalake_iceberg_spark.queries import approx


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = approx._distinct_users_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_approx_quantile_within_tolerance(spark, sf_dir):
    rows = approx._value_quantiles_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # GK sketch at accuracy 10000 on sf-test data: near-exact
        assert abs(r.approx_p50 - r.exact_p50) <= max(0.05 * abs(r.exact_p50), 1.0)


def test_graded_entries_self_check_true(spark, sf_dir):
    """The driver-facing projections must report every group in
    tolerance — this is exactly what the oracle asserts."""
    d = approx.approx_distinct_users(spark, sf_dir).collect()
    assert d and all(r.hll_within_5pct for r in d)
    q = approx.approx_value_quantiles(spark, sf_dir).collect()
    assert q and all(r.gk_within_tol for r in q)


def test_exact_percentile_monotone(spark, sf_dir):
    for r in approx.value_percentiles(spark, sf_dir).collect():
        assert r.p50 <= r.p90 <= r.p99
