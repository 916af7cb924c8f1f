"""Multi-table transactions: all-or-nothing publish, per-op conflict
detection, crash roll-forward recovery, staging guards."""

import json

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.tables import CommitConflict, LakeCatalog

# r16 (VERDICT item 2): heavy lifecycle/stress coverage lives in the
# SLOW tier so the default `pytest tests/` run (the driver's verify
# budget) completes; run the full suite with `pytest tests/ -m ''`.
pytestmark = pytest.mark.slow


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
    report = a.remove_orphan_files(older_than_s=0.0)
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


# ----------------------------- r6: reservation-leak + torn-state guards


class _FailingFS:
    """Delegating fs that raises on chosen operations (crash injection)."""

    def __init__(self, inner, fail_on=None):
        self._inner = inner
        self.fail_on = fail_on  # (method, substring) -> raise OSError

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if not callable(attr):
            return attr

        def wrapped(*a, **kw):
            if self.fail_on and name == self.fail_on[0] and any(
                isinstance(x, str) and self.fail_on[1] in x for x in a
            ):
                raise OSError(f"injected failure in {name}")
            return attr(*a, **kw)

        return wrapped


def test_failed_intent_write_rolls_back_reservations(spark, tmp_path):
    """A failure between manifest reservation and the intent-log write
    (the pre-commit-point window) must unreserve every manifest —
    otherwise every later commit to the table collides forever."""
    from datalake_iceberg_spark.fs import LocalFilesystem

    fs = _FailingFS(LocalFilesystem())
    catalog = LakeCatalog(spark, str(tmp_path / "wh"), fs=fs)
    a = _mk(catalog, spark, "db.leak")
    va = a.current_version()
    batch = spark.createDataFrame([Row(id=7, v="boom")])
    fs.fail_on = ("write_exclusive", "_txn")
    txn = catalog.transaction()
    txn.table("db.leak").append(batch)
    with pytest.raises(OSError, match="injected"):
        txn.commit()
    fs.fail_on = None
    # reservation rolled back: no manifest above _current
    leaked = [
        n for n in fs.listdir(a.meta_dir)
        if n.startswith("v") and n.endswith(".json")
        and int(n[1:-5]) > a.current_version()
    ]
    assert leaked == []
    # and the table is still committable
    a.append(batch)
    assert a.current_version() == va + 1


def test_reclaim_reserved_manifests_age_and_intent_gates(spark, tmp_path):
    """Leaked reservations are reclaimed only when old AND not named by
    a surviving intent record; fresh reservations are left alone."""
    import os

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    a = _mk(catalog, spark, "db.orph")
    fs = catalog.fs
    cur = a.current_version()
    old_leak = fs.join(a.meta_dir, f"v{cur + 1}.json")
    fresh_leak = fs.join(a.meta_dir, f"v{cur + 2}.json")
    wal_kept = fs.join(a.meta_dir, f"v{cur + 3}.json")
    for p in (old_leak, fresh_leak, wal_kept):
        fs.write_exclusive(p, "{}")
    os.utime(old_leak, (1, 1))
    os.utime(wal_kept, (1, 1))
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    fs.write_exclusive(
        fs.join(txn_dir, "txn-keepme.json"),
        json.dumps({"txn_id": "keepme", "flips": [
            {"location": a.location, "version": cur + 3, "parent": cur}
        ]}),
    )
    dry = catalog.reclaim_reserved_manifests(dry_run=True)
    assert dry == [old_leak]
    reclaimed = catalog.reclaim_reserved_manifests()
    assert reclaimed == [old_leak]
    assert not fs.exists(old_leak)
    assert fs.exists(fresh_leak)  # inside the age gate
    assert fs.exists(wal_kept)  # named by an intent record
    # with the stale reservation gone the table commits again
    a.append(spark.createDataFrame([Row(id=1, v="ok")]))


def test_recovery_retains_unresolvable_record(spark, tmp_path):
    """A record whose flip can no longer be applied or confirmed (table
    dropped after the crash) must be reported AND kept on disk, not
    silently consumed into a finalized torn state."""
    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    a = _mk(catalog, spark, "db.gone")
    fs = catalog.fs
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    rec_path = fs.join(txn_dir, "txn-torn.json")
    fs.write_exclusive(rec_path, json.dumps({"txn_id": "torn", "flips": [
        {"location": a.location, "version": a.current_version() + 1,
         "parent": a.current_version()},
    ]}))
    catalog.drop("db.gone")
    processed = catalog.recover_transactions()
    assert len(processed) == 1 and processed[0]["unresolved"]
    assert fs.exists(rec_path)  # retained for the operator
    # still reported (idempotently) on the next run
    processed2 = catalog.recover_transactions()
    assert len(processed2) == 1 and processed2[0]["unresolved"]


def test_rename_table_blocked_by_pending_txn_record(spark, tmp_path):
    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    a = _mk(catalog, spark, "db.ren")
    fs = catalog.fs
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    rec_path = fs.join(txn_dir, "txn-pin.json")
    fs.write_exclusive(rec_path, json.dumps({"txn_id": "pin", "flips": [
        {"location": a.location, "version": a.current_version() + 1,
         "parent": a.current_version()},
    ]}))
    with pytest.raises(ValueError, match="pending transaction"):
        catalog.rename_table("db.ren", "db.ren2")
    fs.remove(rec_path)
    t = catalog.rename_table("db.ren", "db.ren2")
    assert t.read().count() == 6


def test_commit_tolerates_concurrently_consumed_record(spark, tmp_path):
    """recover_transactions racing a live commit may consume the intent
    record first; the live commit must still succeed (it is durably
    committed either way)."""
    from datalake_iceberg_spark.fs import LocalFilesystem

    class _EagerRecoveryFS(_FailingFS):
        def __getattr__(self, name):
            attr = getattr(self._inner, name)
            if name != "replace_atomic" or not callable(attr):
                return super().__getattr__(name)

            def wrapped(path, text):
                attr(path, text)
                # simulate concurrent recovery finishing right after the
                # last pointer flip: the record vanishes before the
                # committer's own cleanup
                txn_dir = self._inner.join(self.warehouse, "_txn")
                if self._inner.isdir(txn_dir):
                    for n in self._inner.listdir(txn_dir):
                        if n.startswith("txn-"):
                            self._inner.remove(self._inner.join(txn_dir, n))

            return wrapped

    fs = _EagerRecoveryFS(LocalFilesystem())
    catalog = LakeCatalog(spark, str(tmp_path / "wh"), fs=fs)
    fs.warehouse = catalog.warehouse
    a = _mk(catalog, spark, "db.race")
    va = a.current_version()
    with catalog.transaction() as txn:
        txn.table("db.race").append(spark.createDataFrame([Row(id=5, v="r")]))
    assert a.current_version() == va + 1


# --------------------------------- r7: torn records + reclaimed reservations


def test_recovery_tolerates_torn_record(spark, tmp_path):
    """write_exclusive creates the intent file before writing content, so
    a crash in that window leaves an empty/truncated txn-*.json. Recovery
    must report it and keep processing OTHER records instead of raising
    JSONDecodeError catalog-wide; an aged torn record is deleted."""
    import os

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    a = _mk(catalog, spark, "db.torn")
    fs = catalog.fs
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    torn = fs.join(txn_dir, "txn-aaaa.json")
    fs.write_exclusive(torn, "")  # crash before content write
    truncated = fs.join(txn_dir, "txn-bbbb.json")
    fs.write_exclusive(truncated, '{"txn_id": "bb", "fl')
    # a healthy pending record AFTER the torn ones in sort order — it
    # must still be rolled forward
    preview_v = a.current_version() + 1
    snap = a.snapshot()
    healthy_manifest = fs.join(a.meta_dir, f"v{preview_v}.json")
    fs.write_exclusive(
        healthy_manifest,
        snap.to_json().replace(
            f'"version": {snap.version}', f'"version": {preview_v}'
        ),
    )
    fs.write_exclusive(
        fs.join(txn_dir, "txn-cccc.json"),
        json.dumps({"txn_id": "cc", "flips": [
            {"location": a.location, "version": preview_v,
             "parent": a.current_version()},
        ]}),
    )
    processed = catalog.recover_transactions()
    torn_recs = [r for r in processed if r.get("torn")]
    assert len(torn_recs) == 2
    assert all(not r.get("removed") for r in torn_recs)  # fresh: retained
    assert fs.exists(torn) and fs.exists(truncated)
    # the healthy record rolled forward despite its torn neighbours
    assert a.current_version() == preview_v
    # aged torn records are deleted on the next run
    os.utime(torn, (1, 1))
    os.utime(truncated, (1, 1))
    processed2 = catalog.recover_transactions()
    assert all(r.get("removed") for r in processed2 if r.get("torn"))
    assert not fs.exists(torn) and not fs.exists(truncated)


def test_reclaim_keepset_tolerates_torn_record(spark, tmp_path):
    """A torn intent record names nothing, so it must not wedge (or
    veto) reserved-manifest GC."""
    import os

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    a = _mk(catalog, spark, "db.tr")
    fs = catalog.fs
    txn_dir = fs.join(catalog.warehouse, "_txn")
    fs.makedirs(txn_dir)
    fs.write_exclusive(fs.join(txn_dir, "txn-torn.json"), "")
    leak = fs.join(a.meta_dir, f"v{a.current_version() + 1}.json")
    fs.write_exclusive(leak, "{}")
    os.utime(leak, (1, 1))
    assert catalog.reclaim_reserved_manifests() == [leak]
    assert not fs.exists(leak)


class _ReclaimRaceFS(_FailingFS):
    """Simulates reserved-manifest GC firing while the committer is
    stalled between reserving v{N}.json and publishing: deletes every
    manifest above _current the moment the intent record is written."""

    def __init__(self, inner, rounds=1):
        super().__init__(inner)
        self.rounds = rounds  # how many commit attempts to sabotage
        self.meta_dir = None
        self.current = None

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name != "write_exclusive" or not callable(attr):
            return super().__getattr__(name)

        def wrapped(path, text):
            attr(path, text)
            # match the _txn DIRECTORY segment, not the bare substring —
            # pytest tmp_path embeds the test NAME (often containing
            # "_txn"), which would otherwise trip this on manifest writes
            if "/_txn/" in path and self.rounds > 0:
                self.rounds -= 1
                for n in self._inner.listdir(self.meta_dir):
                    if n.startswith("v") and n.endswith(".json") and \
                            int(n[1:-5]) > self.current:
                        self._inner.remove(self._inner.join(self.meta_dir, n))

        return wrapped


def test_txn_commit_retries_when_reservation_reclaimed(spark, tmp_path):
    """If GC reclaimed a reservation during a pre-publish stall, the
    transaction must NOT flip _current to the deleted manifest — it
    withdraws the intent record and retries (fresh reservation)."""
    from datalake_iceberg_spark.fs import LocalFilesystem

    fs = _ReclaimRaceFS(LocalFilesystem(), rounds=1)
    catalog = LakeCatalog(spark, str(tmp_path / "wh"), fs=fs)
    a = _mk(catalog, spark, "db.rr")
    fs.meta_dir, fs.current = a.meta_dir, a.current_version()
    va = a.current_version()
    with catalog.transaction() as txn:
        txn.table("db.rr").append(spark.createDataFrame([Row(id=9, v="ok")]))
    # committed on the retry; the table is readable at its current version
    assert a.current_version() == va + 1
    assert (9, "ok") in _rows(a.read())
    txn_dir = catalog.fs.join(catalog.warehouse, "_txn")
    assert not catalog.fs.isdir(txn_dir) or all(
        not n.startswith("txn-") for n in catalog.fs.listdir(txn_dir)
    )


def test_txn_commit_conflict_when_reservation_always_reclaimed(spark, tmp_path):
    """Exhausting retries under persistent reclaim raises CommitConflict
    and leaves the table untouched and readable — never a _current that
    points at a deleted manifest."""
    from datalake_iceberg_spark.fs import LocalFilesystem
    from datalake_iceberg_spark.txn import COMMIT_RETRIES

    fs = _ReclaimRaceFS(LocalFilesystem(), rounds=COMMIT_RETRIES + 1)
    catalog = LakeCatalog(spark, str(tmp_path / "wh"), fs=fs)
    a = _mk(catalog, spark, "db.rc")
    fs.meta_dir, fs.current = a.meta_dir, a.current_version()
    va = a.current_version()
    txn = catalog.transaction()
    txn.table("db.rc").append(spark.createDataFrame([Row(id=9, v="no")]))
    with pytest.raises(CommitConflict, match="reclaimed"):
        txn.commit()
    assert a.current_version() == va
    assert a.read().count() == 6  # still readable, nothing torn
    txn_dir = catalog.fs.join(catalog.warehouse, "_txn")
    assert all(
        not n.startswith("txn-") for n in catalog.fs.listdir(txn_dir)
    )


class _DirectReclaimFS(_FailingFS):
    """For the DIRECT commit path: report the freshly reserved manifest
    as missing once (deleting it for real), as a GC race would."""

    def __init__(self, inner):
        super().__init__(inner)
        self.armed = False
        self.fired = False

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name != "exists" or not callable(attr):
            return super().__getattr__(name)

        def wrapped(path):
            import re as _re

            if self.armed and not self.fired and \
                    _re.search(r"v\d+\.json$", path) and attr(path):
                self._inner.remove(path)
                self.fired = True
                return False
            return attr(path)

        return wrapped


def test_direct_commit_survives_reclaimed_reservation(spark, tmp_path):
    """LakeTable._commit re-verifies the reservation before flipping
    _current; a reclaimed manifest is retried, not published."""
    from datalake_iceberg_spark.fs import LocalFilesystem

    fs = _DirectReclaimFS(LocalFilesystem())
    catalog = LakeCatalog(spark, str(tmp_path / "wh"), fs=fs)
    a = _mk(catalog, spark, "db.dr")
    va = a.current_version()
    fs.armed = True
    a.append(spark.createDataFrame([Row(id=10, v="later")]))
    fs.armed = False
    assert fs.fired
    assert a.current_version() == va + 1
    assert (10, "later") in _rows(a.read())
