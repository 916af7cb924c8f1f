"""Multi-table transactions for the lake catalog.

The reference pipeline publishes related tables independently (one MERGE
per topic, ``src/utils/cdc_pipeline.py:221-237``), which exposes readers
to torn states across tables — e.g. an ``orders`` batch visible while
the matching ``order_events`` rollup is still the old version. This
module adds the Iceberg-REST-catalog analogue of a multi-table commit:
stage any number of single-table operations (every DML and DDL path that
funnels through ``LakeTable._commit`` — append / merge / delete_keys /
update_where / create_or_replace / set_properties / schema DDL), then
publish all of them together.

Commit protocol (two-phase with a write-ahead intent log):

1. **Build + reserve.** For every staged table, re-run its builder
   against the CURRENT parent (the same optimistic-rebase closures the
   direct commit path uses, so per-operation conflict detection —
   bucket overlap, fork-base drift — fires exactly as it would outside
   a transaction), then ``write_exclusive`` the new ``v{N}.json``
   manifest. A reservation race anywhere rolls back every manifest
   reserved so far and retries the whole build; nothing was published,
   because no ``_current`` pointer moved.
2. **Intent log.** Once every manifest is reserved, write one
   ``{warehouse}/_txn/txn-{uuid}.json`` record naming every
   ``(table_location, version, parent)`` flip. This is the commit
   point.
3. **Flip.** Atomically replace each table's ``_current``; delete the
   intent record last.

Crash safety: a crash before step 2 leaves only reserved manifests and
staged data dirs — invisible to readers (``_current`` never moved) and
reclaimed by ``remove_orphan_files``. A crash after step 2 is ROLLED
FORWARD by :meth:`LakeCatalog.recover_transactions`: every flip whose
table still sits at the recorded parent is completed (the manifests are
all on disk — that was the reservation invariant), flips that already
happened are recognized as done, and the record is then dropped. So the
transaction is atomic to any reader that runs recovery first, and
repairable-forward for everyone else; the torn window is bounded by
crash-to-recovery, never by data rewrite time.

Scale note: both phases move manifests only (KBs), never data — staged
operations write their data files at stage time through the normal
bucketed writers, so a 100-table transaction costs 100 small metadata
writes at publish, independent of table sizes.

Scope: one mutation per table per transaction. A second mutation would
have to read its own uncommitted predecessor (a merge rewrites buckets
from table state), which the stage-time writers cannot see — the guard
raises instead of producing a silently-wrong rewrite.
"""

from __future__ import annotations

import json
import time
import uuid

from datalake_iceberg_spark.tables import (
    COMMIT_RETRIES,
    COMMIT_RETRY_WAIT_S,
    CommitConflict,
    LakeTable,
    Snapshot,
    _AlreadyApplied,
)


class _StagedTable(LakeTable):
    """A ``LakeTable`` whose commits are captured instead of published.

    Every public operation (merge / append / DDL ...) runs exactly as
    usual — data files land under the table's own ``data/`` dirs — but
    the final ``_commit`` records the builder closure for the owning
    :class:`CatalogTransaction` to publish later. The snapshot returned
    at stage time is a PREVIEW built against the pre-transaction
    parent; the publish re-runs the builder against the then-current
    parent (same contract as the direct path's optimistic retry).
    """

    def __init__(self, spark, location, fs, txn):
        super().__init__(spark, location, fs=fs)
        self._txn = txn
        self._staged = None  # (build_snapshot, operation)

    def _commit(
        self, build_snapshot, operation: str,
        txn_app: str | None = None, txn_version: int | None = None,
    ) -> Snapshot:
        from datalake_iceberg_spark.tables import _txn_wrap

        if self._staged is not None:
            raise ValueError(
                f"transaction already stages {self._staged[1]!r} on "
                f"{self.location}; one mutation per table per transaction "
                "— a second would need to read its own uncommitted "
                "predecessor. Commit first, or use a second transaction."
            )
        build_snapshot = _txn_wrap(build_snapshot, txn_app, txn_version)
        parent = self.snapshot() if self.exists() else None
        preview = self._finalize_snapshot(build_snapshot(parent), parent)
        self._staged = (build_snapshot, operation)
        return preview


class CatalogTransaction:
    """Context manager staging commits across tables of one catalog.

    >>> with catalog.transaction() as txn:
    ...     txn.table("default.orders").merge(batch)
    ...     txn.table("default.order_rollup").append(delta)
    ... # both visible now, or neither
    """

    def __init__(self, catalog):
        self.catalog = catalog
        self.fs = catalog.fs
        self._tables: dict[str, _StagedTable] = {}
        self._done = False

    # ------------------------------------------------------------ staging
    def table(self, name: str) -> _StagedTable:
        loc = self.catalog._loc(name)
        if loc not in self._tables:
            self._tables[loc] = _StagedTable(
                self.catalog.spark, loc, self.fs, self
            )
        return self._tables[loc]

    def create_or_replace(self, name: str, df, **kw) -> _StagedTable:
        t = self.table(name)
        t.create_or_replace(df, **kw)
        return t

    # ------------------------------------------------------------ publish
    def _staged_ops(self):
        return [
            (t, *t._staged) for t in self._tables.values() if t._staged is not None
        ]

    def commit(self) -> dict[str, Snapshot]:
        """Publish every staged operation all-or-nothing. Returns
        ``{table_location: committed snapshot}``."""
        if self._done:
            raise ValueError("transaction already committed or aborted")
        staged = self._staged_ops()
        self._done = True
        if not staged:
            return {}
        for attempt in range(COMMIT_RETRIES + 1):
            built: list[tuple[_StagedTable, Snapshot]] = []
            for t, build, _op in staged:
                parent = t.snapshot() if t.exists() else None
                # per-op conflict detection (bucket overlap etc.) raises
                # CommitConflict here and aborts the transaction — the
                # staged rewrite is against stale data, retrying the
                # metadata alone cannot fix it
                try:
                    built.append((t, t._finalize_snapshot(build(parent), parent)))
                except _AlreadyApplied:
                    # idempotent write already landed (txn_app/version
                    # replay) — this table needs no flip; the rest of
                    # the transaction proceeds
                    continue
            if not built:  # every staged write was an already-applied replay
                return {}
            reserved: list[tuple[_StagedTable, Snapshot]] = []
            race = False
            for t, snap in built:
                try:
                    t.fs.makedirs(t.meta_dir)
                    t.fs.write_exclusive(
                        t.fs.join(t.meta_dir, f"v{snap.version}.json"),
                        snap.to_json(),
                    )
                    reserved.append((t, snap))
                except FileExistsError:
                    race = True
                    break
            if race:
                # roll back every reservation; _current never moved, so
                # nothing was published
                for t, snap in reserved:
                    t.fs.remove(t.fs.join(t.meta_dir, f"v{snap.version}.json"))
                if attempt == COMMIT_RETRIES:
                    raise CommitConflict(
                        f"transaction lost {COMMIT_RETRIES} commit races"
                    )
                time.sleep(COMMIT_RETRY_WAIT_S)
                continue
            # ---- commit point: write-ahead intent record ----
            txn_dir = self.fs.join(self.catalog.warehouse, "_txn")
            self.fs.makedirs(txn_dir)
            record = {
                "txn_id": uuid.uuid4().hex,
                "flips": [
                    {
                        "location": t.location,
                        "version": snap.version,
                        "parent": snap.parent,
                    }
                    for t, snap in built
                ],
            }
            rec_path = self.fs.join(txn_dir, f"txn-{record['txn_id']}.json")
            self.fs.write_exclusive(rec_path, json.dumps(record))
            # ---- roll-forward region: flip every pointer ----
            for t, snap in built:
                t.fs.replace_atomic(
                    t.fs.join(t.meta_dir, "_current"), str(snap.version)
                )
                t._pending_stats = {}
            self.fs.remove(rec_path)
            return {t.location: snap for t, snap in built}
        raise AssertionError("unreachable")

    def abort(self) -> None:
        """Drop staged operations. Data files already written by staged
        ops become unreferenced and are reclaimed by each table's
        ``remove_orphan_files``."""
        self._done = True
        self._tables.clear()

    # ------------------------------------------------------------ with
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            self.abort()
            return False
        if not self._done:
            self.commit()
        return False


def recover_transactions(catalog) -> list[dict]:
    """Roll forward transactions interrupted between intent-log write
    and the last pointer flip. Safe to run at any time (idempotent;
    concurrent writers unaffected — a flip is applied only if the table
    still sits at the recorded parent, i.e. the interrupted transaction
    is still the next commit in line). Returns the processed records."""
    txn_dir = catalog.fs.join(catalog.warehouse, "_txn")
    if not catalog.fs.isdir(txn_dir):
        return []
    processed = []
    for name in sorted(catalog.fs.listdir(txn_dir)):
        if not (name.startswith("txn-") and name.endswith(".json")):
            continue
        path = catalog.fs.join(txn_dir, name)
        record = json.loads(catalog.fs.read_text(path))
        for flip in record["flips"]:
            t = LakeTable(catalog.spark, flip["location"], fs=catalog.fs)
            manifest = catalog.fs.join(t.meta_dir, f"v{flip['version']}.json")
            if not catalog.fs.exists(manifest):
                continue
            if not t.exists():
                # table created INSIDE the interrupted transaction: the
                # v0 manifest is reserved but _current was never
                # written — completing the flip IS creating the table
                if flip["parent"] is None:
                    catalog.fs.replace_atomic(
                        catalog.fs.join(t.meta_dir, "_current"),
                        str(flip["version"]),
                    )
                continue
            if t.current_version() == flip["parent"]:
                catalog.fs.replace_atomic(
                    catalog.fs.join(t.meta_dir, "_current"), str(flip["version"])
                )
        catalog.fs.remove(path)
        processed.append(record)
    return processed
