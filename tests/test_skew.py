"""Skew mitigation utilities: salted two-phase aggregation must be
exactly equal to the plain aggregate, spread hot keys over salt
reducers in the plan, and reject non-algebraic aggregates."""

import pytest
from pyspark.sql import functions as F

from datalake_iceberg_spark.functions.skew import salted_agg, salted_broadcast_replicate
from tests.conftest import load


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load(spark, sf_dir, "orders")
    spec = {
        "n": ("o_orderkey", "count"),
        "sum_key": (F.col("o_orderkey"), "sum"),
        "min_key": ("o_orderkey", "min"),
        "max_key": ("o_orderkey", "max"),
    }
    salted = salted_agg(ev, ["o_orderstatus"], spec, n_salt=8)
    plain = ev.groupBy("o_orderstatus").agg(
        F.count("o_orderkey").alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_plan_has_salt_phase(spark, sf_dir):
    ev = load(spark, sf_dir, "orders")
    salted = salted_agg(ev, ["o_orderstatus"], {"n": ("o_orderkey", "count")}, n_salt=8)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # phase-1 exchange keyed on (key, __salt), phase-2 on key alone
    assert "__salt" in plan
    assert plan.count("hashpartitioning") >= 2


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    ev = load(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(ev, ["o_orderstatus"], {"a": ("o_totalprice", "avg")})


def test_salted_broadcast_join_equals_plain(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n_salt = 4
    rep = salted_broadcast_replicate(cust, n_salt=n_salt)
    big = orders.withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt))
    )
    salted = (
        big.join(F.broadcast(rep), (big.o_custkey == rep.c_custkey)
                 & (big["__salt"] == rep["__salt"]))
        .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    )
    plain = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
