"""Merge-on-read equality deletes (M3): delete files apply at read
time, scope to their commit era (covers), and fold away under
rewrite_position_delete_files."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _ids(t):
    return {r.id for r in t.read().select("id").collect()}


def test_mor_delete_applies_at_read(catalog, spark):
    base = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(50)])
    t = catalog.create_or_replace("db.mor", base, key=["id"], n_buckets=4)
    snap = t.delete_keys(
        spark.createDataFrame([Row(id=3), Row(id=17), Row(id=999)]),
        mode="merge-on-read",
    )
    assert snap.operation == "delete-mor"
    assert snap.summary["mode"] == "merge-on-read"
    # data dirs untouched (O(delete set) commit, no bucket rewrite)
    assert snap.buckets == t.snapshot(snap.parent).buckets
    assert _ids(t) == set(range(50)) - {3, 17}
    # scan / lookup / read_buckets all see post-delete state
    assert {r.id for r in t.scan([("id", ">=", 0)]).collect()} == set(range(50)) - {3, 17}
    keys = spark.createDataFrame([Row(id=3), Row(id=4)])
    assert {r.id for r in t.lookup(keys).collect()} == {4}
    # travel to pre-delete snapshot still sees everything
    assert t.read(version=snap.parent).count() == 50


def test_mor_delete_era_scoped_reinsert(catalog, spark):
    """A deleted key re-inserted later (merge or append) must SURVIVE:
    the delete's covers pin it to dirs that existed at delete time."""
    base = spark.createDataFrame([Row(id=i, v="old") for i in range(20)])
    t = catalog.create_or_replace("db.mor2", base, key=["id"], n_buckets=4)
    t.delete_keys(spark.createDataFrame([Row(id=5)]), mode="merge-on-read")
    assert 5 not in _ids(t)
    # re-insert via merge (CoW rewrite of the bucket drops the dead entry)
    t.merge(spark.createDataFrame([Row(id=5, v="reborn")]))
    got = {r.id: r.v for r in t.read().collect()}
    assert got[5] == "reborn"
    # delete again MoR, then APPEND the key: appended dir is newer than
    # the delete's covers -> the append is visible
    t.delete_keys(spark.createDataFrame([Row(id=7)]), mode="merge-on-read")
    assert 7 not in _ids(t)
    t.append(spark.createDataFrame([Row(id=7, v="appended")]))
    vals = {r.v for r in t.read().filter(F.col("id") == 7).collect()}
    assert vals == {"appended"}


def test_rewrite_position_delete_files_folds(catalog, spark):
    base = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(40)])
    t = catalog.create_or_replace("db.mor3", base, key=["id"], n_buckets=4)
    t.delete_keys(spark.createDataFrame([Row(id=i) for i in range(0, 10)]),
                  mode="merge-on-read")
    assert len(t.snapshot().all_delete_dirs()) > 0
    res = t.rewrite_position_delete_files()
    assert res["rewritten_buckets"] >= 1
    assert res["removed_delete_files"] >= 1
    snap = t.snapshot()
    assert snap.deletes == {}                      # entries folded away
    assert _ids(t) == set(range(10, 40))           # content preserved
    # idempotent no-op afterwards
    assert t.rewrite_position_delete_files() == {
        "rewritten_buckets": 0, "removed_delete_files": 0,
    }
    # orphan cleanup after expiry reclaims the delete dirs
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(older_than_s=0.0)
    assert _ids(t) == set(range(10, 40))


def test_regular_compaction_folds_deletes(catalog, spark):
    base = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(30)])
    t = catalog.create_or_replace("db.mor4", base, key=["id"], n_buckets=2)
    t.delete_keys(spark.createDataFrame([Row(id=1), Row(id=2)]), mode="merge-on-read")
    t.rewrite_data_files(min_input_dirs=2)  # delete-bearing buckets qualify
    assert t.snapshot().deletes == {}
    assert _ids(t) == set(range(30)) - {1, 2}


def test_mor_stack_multiple_deletes(catalog, spark):
    """Two MoR deletes stack; both apply at read; maintenance service
    path records the fold."""
    from datalake_iceberg_spark.ops.maintenance import MaintenanceService
    from datalake_iceberg_spark.ops.watermark import WatermarkStore

    base = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(30)])
    t = catalog.create_or_replace("db.mor5", base, key=["id"], n_buckets=2)
    t.delete_keys(spark.createDataFrame([Row(id=1)]), mode="merge-on-read")
    t.delete_keys(spark.createDataFrame([Row(id=2)]), mode="merge-on-read")
    assert _ids(t) == set(range(30)) - {1, 2}

    store = WatermarkStore(catalog)
    store.ensure_tables()
    svc = MaintenanceService(catalog, store)
    res = svc.run_position_delete_compaction("db.mor5")
    assert res["status"] == "success"
    assert t.snapshot().deletes == {}
    assert _ids(t) == set(range(30)) - {1, 2}


def _optimized_plan(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_mor_plan_groups_by_delete_commit_not_bucket(catalog, spark):
    """One MoR delete over a many-bucket table must read back as ONE
    scan + ONE anti-join (era grouping), never one per bucket — the
    per-bucket form is an O(buckets) plan explosion at scale.
    Regression for the r7 fold slowdown (mor_fold_1024b 1.39s -> 11.9s)."""
    base = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(256)])
    t = catalog.create_or_replace("db.morplan", base, key=["id"], n_buckets=16)
    # delete keys spread across every bucket
    t.delete_keys(spark.createDataFrame([Row(id=i) for i in range(0, 256, 4)]),
                  mode="merge-on-read")
    df = t.read()
    plan = _optimized_plan(df)
    assert plan.count("LeftAnti") == 1, plan
    assert _ids(t) == set(range(256)) - set(range(0, 256, 4))
    # a SECOND narrow delete commit touches only the buckets holding
    # ids 1 and 3, so there are exactly TWO covering sets — {A} and
    # {A,B} — hence two era groups, REGARDLESS of bucket count
    t.delete_keys(spark.createDataFrame([Row(id=1), Row(id=3)]),
                  mode="merge-on-read")
    plan2 = _optimized_plan(t.read())
    assert plan2.count("LeftAnti") == 2, plan2
    assert _ids(t) == set(range(256)) - set(range(0, 256, 4)) - {1, 3}


def test_mor_era_grouping_single_bucket_commit_exact(catalog, spark):
    """n_buckets=1 delete dirs carry no _bucket= leaf; grouping must NOT
    collapse distinct delete commits there (a dir appended between two
    deletes is covered by the second only — pooling the first commit's
    keys onto it would wrongly re-delete a re-inserted key)."""
    base = spark.createDataFrame([Row(id=i, v="old") for i in range(8)])
    t = catalog.create_or_replace("db.mor1b", base, key=["id"], n_buckets=1)
    t.delete_keys(spark.createDataFrame([Row(id=2)]), mode="merge-on-read")
    t.append(spark.createDataFrame([Row(id=2, v="reborn")]))
    t.delete_keys(spark.createDataFrame([Row(id=5)]), mode="merge-on-read")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[2] == "reborn"          # survived: newer than delete A
    assert 5 not in got
    assert set(got) == (set(range(8)) - {5}) | {2}


def test_mor_read_broadcast_gated_by_delete_era_bytes(catalog, spark, monkeypatch):
    """r11 scale guard: the MoR read broadcasts an era's delete keys
    only while their on-disk bytes sit under DELETE_BROADCAST_MAX_BYTES
    — a bulk delete's key set can be GBs at 100 TB, where a forced
    broadcast pins the driver. Small era (KBs): the anti-join build
    side carries the broadcast hint; threshold forced to 0: no hint,
    the strategy is AQE's."""
    from datalake_iceberg_spark import tables as tables_mod

    df = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(40)])
    t = catalog.create_or_replace("db.bgate", df, key=["id"], n_buckets=4)
    t.delete_keys(
        spark.createDataFrame([(k,) for k in (3, 7, 11)], "id long"),
        mode="merge-on-read",
    )
    assert t.snapshot().deletes  # live era

    plan_small = t.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" in plan_small or "broadcast" in plan_small.lower()

    monkeypatch.setattr(tables_mod, "DELETE_BROADCAST_MAX_BYTES", 0)
    plan_big = t.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan_big and "broadcast" not in plan_big.lower()
    # value parity between the two strategies
    monkeypatch.setattr(tables_mod, "DELETE_BROADCAST_MAX_BYTES", 0)
    got = {r.id for r in t.read().collect()}
    assert got == set(range(40)) - {3, 7, 11}


def test_mor_broadcast_gate_is_manifest_math(catalog, spark, monkeypatch):
    """The delete-era broadcast size gate must answer from the
    snapshot's commit-time #bytes stat — constructing a read-with-
    deletes DataFrame may not LIST delete dirs (on an object store that
    was O(delete dirs + files) round trips per query)."""
    from pyspark.sql import Row

    from datalake_iceberg_spark.tables import BYTES_STAT

    df = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(40)])
    t = catalog.create_or_replace("db.mbytes", df, key=["id"], n_buckets=4)
    t.delete_keys(
        spark.createDataFrame([(k,) for k in (1, 2, 3)], "id long"),
        mode="merge-on-read",
    )
    snap = t.snapshot()
    del_dirs = {e["dir"] for es in snap.deletes.values() for e in es}
    assert del_dirs and all(
        BYTES_STAT in snap.stats.get(d, {}) for d in del_dirs
    ), "delete dirs missing commit-time #bytes stat"

    listed: list[str] = []
    orig = type(t.fs).listdir

    def spy(self, path):
        listed.append(path)
        return orig(self, path)

    monkeypatch.setattr(type(t.fs), "listdir", spy)
    out = t.read()  # plan construction: the gate decides broadcast here
    assert not [p for p in listed if any(d.split("/")[-2] in p for d in del_dirs)], (
        "read-with-deletes listed delete dirs instead of using #bytes"
    )
    assert out.count() == 37  # and the masked read is still correct
