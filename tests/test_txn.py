"""Multi-table transactions: all-or-nothing publish, per-op conflict
detection, crash roll-forward recovery, staging guards."""

import json

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.tables import CommitConflict, LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _mk(catalog, spark, name, n=6):
    df = spark.createDataFrame([Row(id=i, v=f"{name}{i}") for i in range(n)])
    return catalog.create_or_replace(name, df, key=["id"], n_buckets=4)


def test_two_table_commit_is_atomic(catalog, spark):
    a = _mk(catalog, spark, "db.a")
    b = _mk(catalog, spark, "db.b")
    va, vb = a.current_version(), b.current_version()
    batch = spark.createDataFrame([Row(id=99, v="new")])
    with catalog.transaction() as txn:
        txn.table("db.a").append(batch)
        txn.table("db.b").merge(batch)
        # nothing published while staging
        assert a.current_version() == va and b.current_version() == vb
    assert a.current_version() == va + 1
    assert b.current_version() == vb + 1
    assert (99, "new") in _rows(a.read())
    assert (99, "new") in _rows(b.read())


def test_exception_aborts_everything(catalog, spark):
    a = _mk(catalog, spark, "db.a2")
    b = _mk(catalog, spark, "db.b2")
    va, vb = a.current_version(), b.current_version()
    batch = spark.createDataFrame([Row(id=1, v="changed")])
    with pytest.raises(RuntimeError, match="boom"):
        with catalog.transaction() as txn:
            txn.table("db.a2").merge(batch)
            raise RuntimeError("boom")
    assert a.current_version() == va and b.current_version() == vb
    assert (1, "changed") not in _rows(a.read())
    # the staged data files are unreferenced; orphan GC reclaims them
    report = a.remove_orphan_files()
    assert report["orphan_dirs_removed"] >= 1


def test_one_mutation_per_table_guard(catalog, spark):
    _mk(catalog, spark, "db.g")
    batch = spark.createDataFrame([Row(id=1, v="x")])
    with pytest.raises(ValueError, match="one mutation per table"):
        with catalog.transaction() as txn:
            txn.table("db.g").append(batch)
            txn.table("db.g").append(batch)


def test_ddl_and_dml_commit_together(catalog, spark):
    a = _mk(catalog, spark, "db.d1")
    b = _mk(catalog, spark, "db.d2")
    batch = spark.createDataFrame([Row(id=7, v="seven")])
    with catalog.transaction() as txn:
        txn.table("db.d1").set_properties({"pipeline.stage": "gold"})
        txn.table("db.d2").append(batch)
    assert a.snapshot().properties["pipeline.stage"] == "gold"
    assert (7, "seven") in _rows(b.read())


def test_stage_returns_preview_snapshot(catalog, spark):
    a = _mk(catalog, spark, "db.p")
    with catalog.transaction() as txn:
        snap = txn.table("db.p").append(
            spark.createDataFrame([Row(id=50, v="z")])
        )
        assert snap.version == a.current_version() + 1
        txn.abort()


def test_conflicting_merge_aborts_transaction(catalog, spark):
    """A concurrent writer rewriting the same buckets between stage and
    commit must fail the transaction, not silently drop its commit."""
    a = _mk(catalog, spark, "db.c")
    _mk(catalog, spark, "db.c2")
    batch = spark.createDataFrame([Row(id=2, v="txn")])
    txn = catalog.transaction()
    txn.table("db.c").merge(batch)
    txn.table("db.c2").append(batch)
    # concurrent direct merge on the same key/bucket
    a.merge(spark.createDataFrame([Row(id=2, v="direct")]))
    with pytest.raises(CommitConflict):
        txn.commit()
    # the concurrent writer's result survives untouched
    assert (2, "direct") in _rows(a.read())


def test_append_rebases_over_concurrent_append(catalog, spark):
    """Appends are conflict-free: the builder re-unions dir lists, so a
    concurrent append does not abort the transaction."""
    a = _mk(catalog, spark, "db.r")
    txn = catalog.transaction()
    txn.table("db.r").append(spark.createDataFrame([Row(id=100, v="txn")]))
    a.append(spark.createDataFrame([Row(id=101, v="direct")]))
    txn.commit()
    got = _rows(a.read())
    assert (100, "txn") in got and (101, "direct") in got


def test_empty_transaction_is_a_noop(catalog, spark):
    with catalog.transaction() as txn:
        pass
    assert txn.commit if False else True
    assert catalog.recover_transactions() == []


def test_crash_rollforward_recovery(catalog, spark):
    """Simulate a crash between the intent log and the pointer flips:
    manifests reserved, record written, only the FIRST pointer flipped.
    recover_transactions must complete the rest, idempotently."""
    a = _mk(catalog, spark, "db.x")
    b = _mk(catalog, spark, "db.y")
    fs = catalog.fs
    batch = spark.createDataFrame([Row(id=42, v="wal")])
    txn = catalog.transaction()
    sa = txn.table("db.x").append(batch)
    sb = txn.table("db.y").append(batch)
    # reserve manifests + intent record by hand (the commit prefix)
    for t, snap in ((txn.table("db.x"), sa), (txn.table("db.y"), sb)):
        fs.write_exclusive(
            fs.join(t.meta_dir, f"v{snap.version}.json"), snap.to_json()
        )
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    record = {
        "txn_id": "deadbeef",
        "flips": [
            {"location": a.location, "version": sa.version, "parent": sa.parent},
            {"location": b.location, "version": sb.version, "parent": sb.parent},
        ],
    }
    fs.write_exclusive(fs.join(txn_dir, "txn-deadbeef.json"), json.dumps(record))
    # crash after flipping only table a
    fs.replace_atomic(fs.join(a.meta_dir, "_current"), str(sa.version))
    assert a.current_version() == sa.version
    assert b.current_version() == sb.parent  # torn state
    processed = catalog.recover_transactions()
    assert len(processed) == 1
    assert b.current_version() == sb.version
    assert (42, "wal") in _rows(b.read())
    # idempotent: record consumed, second run is a no-op
    assert catalog.recover_transactions() == []


def test_recovery_skips_superseded_flip(catalog, spark):
    """If a table advanced past the recorded parent (someone committed
    after the crash window), recovery must NOT clobber it."""
    a = _mk(catalog, spark, "db.z")
    fs = catalog.fs
    stale_version = a.current_version() + 1
    stale_parent = a.current_version()
    # a later direct commit moves the table ahead, consuming the version
    a.append(spark.createDataFrame([Row(id=9, v="later")]))
    assert a.current_version() == stale_version
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    record = {
        "txn_id": "cafe",
        "flips": [
            {"location": a.location, "version": stale_version, "parent": stale_parent}
        ],
    }
    fs.write_exclusive(fs.join(txn_dir, "txn-cafe.json"), json.dumps(record))
    before = a.current_version()
    catalog.recover_transactions()
    assert a.current_version() == before  # current != parent -> skipped


def test_recovery_completes_table_created_inside_txn(catalog, spark):
    """A table born INSIDE an interrupted transaction (v0 manifest
    reserved, _current never written) must be completed by recovery,
    not skipped."""
    fs = catalog.fs
    txn = catalog.transaction()
    txn.create_or_replace(
        "db.born", spark.createDataFrame([Row(id=1, v="x")]), key=["id"]
    )
    # the stage captured a builder; reserve its manifest + intent by hand
    st = txn.table("db.born")
    build, _ = st._staged
    preview = st._finalize_snapshot(build(None), None)
    fs.makedirs(st.meta_dir)
    fs.write_exclusive(
        fs.join(st.meta_dir, f"v{preview.version}.json"), preview.to_json()
    )
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    fs.write_exclusive(
        fs.join(txn_dir, "txn-born.json"),
        json.dumps({"txn_id": "born", "flips": [
            {"location": st.location, "version": preview.version, "parent": None}
        ]}),
    )
    assert not catalog.table("db.born").exists()
    catalog.recover_transactions()
    t = catalog.table("db.born")
    assert t.exists() and t.read().count() == 1
