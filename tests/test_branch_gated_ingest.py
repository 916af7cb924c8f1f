"""Audit-gated ingestion: the composition the branch + DQ + CDC pieces
exist for. A CDC batch lands on a BRANCH (full envelope →
transform_and_dedup → apply_cdc_changes), the declarative expectation
suite audits the branch state, and only a clean audit fast-forwards
main — a dirty batch is dropped with main never having seen it.
This is Iceberg's branch-WAP pattern end-to-end.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_iceberg_spark.cdc.pipeline import apply_cdc_changes, transform_and_dedup
from datalake_iceberg_spark.functions.keys import SURROGATE_KEY_COL, surrogate_key
from datalake_iceberg_spark.queries.dq import Expectation, check_expectations
from datalake_iceberg_spark.tables import LakeCatalog

from tests.test_cdc import make_env


@pytest.fixture()
def target(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    base = surrogate_key(
        spark.createDataFrame([Row(id=i, v=f"base{i}") for i in range(10)]), ["id"]
    ).withColumn("last_applied_date", F.current_timestamp())
    return cat.create_or_replace(
        "db.gated", base, key=[SURROGATE_KEY_COL], n_buckets=4
    )


def _suite():
    return [
        Expectation("v_not_null", F.col("v").isNull()),
        Expectation("key_unique", unique_on=(SURROGATE_KEY_COL,)),
    ]


def _ingest_on_branch(table, env, name="staging"):
    br = table.create_branch(name)
    upserts, deletes = transform_and_dedup(env, br, ["id"])
    apply_cdc_changes(br, upserts, deletes)
    audit = {r["rule"]: r["n_violations"]
             for r in check_expectations(br.read(), _suite()).collect()}
    if any(audit.values()):
        table.drop_branch(name)
        return None, audit
    snap = table.fast_forward(name)
    table.drop_branch(name)
    return snap, audit


def test_clean_batch_promotes(spark, target):
    env = make_env(spark, [
        ("u", 3, "patched", 1, 1000),
        ("c", 100, "new", 2, 1001),
        ("d", 9, "base9", 3, 1002),
    ])
    snap, audit = _ingest_on_branch(target, env)
    assert snap is not None and snap.operation == "fast_forward"
    assert audit == {"v_not_null": 0, "key_unique": 0}
    got = {r["id"]: r["v"] for r in target.read().collect()}
    assert got[3] == "patched" and got[100] == "new" and 9 not in got
    assert len(got) == 10


def test_dirty_batch_never_reaches_main(spark, target):
    v0 = target.current_version()
    before = {tuple(r) for r in target.read().select("id", "v").collect()}
    env = make_env(spark, [
        ("u", 3, None, 1, 1000),  # violates v_not_null
        ("c", 100, "new", 2, 1001),
    ])
    snap, audit = _ingest_on_branch(target, env)
    assert snap is None
    assert audit["v_not_null"] == 1
    assert target.current_version() == v0
    assert {tuple(r) for r in target.read().select("id", "v").collect()} == before
    assert target.branches() == []  # staging branch cleaned up
    # and the failed attempt's data dirs are reclaimable
    target.remove_orphan_files(older_than_s=0.0)
    assert target.read().count() == 10


def test_gate_then_retry_succeeds(spark, target):
    env_bad = make_env(spark, [("u", 3, None, 1, 1000)])
    snap, _ = _ingest_on_branch(target, env_bad)
    assert snap is None
    env_fixed = make_env(spark, [("u", 3, "fixed", 2, 2000)])
    snap, audit = _ingest_on_branch(target, env_fixed)
    assert snap is not None and not any(audit.values())
    probe = surrogate_key(spark.createDataFrame([Row(id=3)]), ["id"]).select(
        SURROGATE_KEY_COL
    )
    assert {r["v"] for r in target.lookup(probe).collect()} == {"fixed"}
