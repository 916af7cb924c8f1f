"""Model-based random walk over the full DML surface.

A seeded random interleaving of every mutating operation the table
supports — append, CoW/MoR merge, CoW/MoR delete, update_where,
compaction, MoR fold, snapshot expiry, rollback — executed against BOTH
the lake table and a plain Python dict model. After every step the
table must read back exactly the model; archived model states must
remain reachable via time travel until expiry removes them; a final
maintenance cycle must change nothing.

This is the integration-level complement of the per-op suites: those
pin each operator's contract in isolation, this hunts cross-operator
interactions (e.g. a MoR delete era surviving a rollback, compaction
after update_where, merges over folded deletes) that unit fixtures
never compose. Seeds are fixed — failures reproduce exactly.
"""

import random

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.tables import LakeCatalog

# r16 (VERDICT item 2): heavy lifecycle/stress coverage lives in the
# SLOW tier so the default `pytest tests/` run (the driver's verify
# budget) completes; run the full suite with `pytest tests/ -m ''`.
pytestmark = pytest.mark.slow


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _df(spark, rows: dict[int, str]):
    return spark.createDataFrame(
        [Row(id=k, v=v) for k, v in sorted(rows.items())], "id long, v string"
    )


def _read_state(t) -> dict[int, str]:
    return {r.id: r.v for r in t.read().collect()}


def _fsck_ok(t, ctx: str):
    """Manifest<->disk integrity must hold after EVERY walk step — the
    cheapest tripwire for a DML change that corrupts the manifest the
    moment it lands (deep=True also recounts footers vs ROWS_STAT)."""
    rep = t.fsck(deep=True)
    found = {k: v for k, v in rep.items() if v and k not in ("ok", "version")}
    assert rep["ok"], f"{ctx}: fsck issues {found}"



N_STEPS = 24


@pytest.mark.parametrize("seed", [7, 19])
def test_random_walk_matches_model(catalog, spark, seed):
    rng = random.Random(seed)
    model: dict[int, str] = {i: f"v{i}" for i in range(40)}
    t = catalog.create_or_replace(
        "db.walk", _df(spark, model), key=["id"], n_buckets=4
    )
    next_id = 40
    history: dict[int, dict[int, str]] = {t.current_version(): dict(model)}

    def fresh_ids(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    for step in range(N_STEPS):
        op = rng.choice(
            ["append", "merge_cow", "merge_mor", "delete_cow", "delete_mor",
             "update", "update_mor", "delete_where_cow", "delete_where_mor",
             "compact", "fold", "rollback",
             "rebucket_grow", "rebucket_shrink"]
        )
        if op == "append":
            rows = {i: f"a{step}" for i in fresh_ids(rng.randint(1, 5))}
            t.append(_df(spark, rows))
            model.update(rows)
        elif op in ("merge_cow", "merge_mor"):
            upd = {
                k: f"m{step}"
                for k in rng.sample(sorted(model), min(len(model), rng.randint(1, 6)))
            }
            upd.update({i: f"m{step}" for i in fresh_ids(rng.randint(0, 2))})
            mode = "merge-on-read" if op == "merge_mor" else "copy-on-write"
            t.merge(_df(spark, upd), mode=mode)
            model.update(upd)
        elif op in ("delete_cow", "delete_mor"):
            if not model:
                continue
            keys = rng.sample(sorted(model), min(len(model), rng.randint(1, 4)))
            mode = "merge-on-read" if op == "delete_mor" else "copy-on-write"
            t.delete_keys(
                spark.createDataFrame([(k,) for k in keys], "id long"), mode=mode
            )
            for k in keys:
                model.pop(k)
        elif op in ("update", "update_mor"):
            cut = rng.randint(0, next_id)
            mode = "merge-on-read" if op == "update_mor" else "copy-on-write"
            # string assignment values are SQL EXPRESSIONS (SET v = ...)
            t.update_where([("id", "<=", cut)], {"v": f"'u{step}'"}, mode=mode)
            for k in list(model):
                if k <= cut:
                    model[k] = f"u{step}"
        elif op in ("delete_where_cow", "delete_where_mor"):
            # predicate delete of a random id range (r12): dir-pruned
            # CoW rewrite or a predicate-scoped equality-delete era
            lo = rng.randint(0, next_id)
            hi = lo + rng.randint(0, 8)
            mode = (
                "merge-on-read" if op == "delete_where_mor" else "copy-on-write"
            )
            t.delete_where([("id", ">=", lo), ("id", "<=", hi)], mode=mode)
            for k in list(model):
                if lo <= k <= hi:
                    model.pop(k)
        elif op == "compact":
            t.rewrite_data_files()
        elif op == "fold":
            t.rewrite_position_delete_files()
        elif op == "rebucket_grow":
            # layout-only: the model is unchanged; exercises the
            # shuffle-free local-split path over live MoR deletes
            n = t.snapshot().n_buckets
            if n >= 16:
                continue
            t.rebucket(n * 2)
        elif op == "rebucket_shrink":
            # metadata-only path: delete entries remap across merged
            # buckets; era grouping must stay exact afterwards
            n = t.snapshot().n_buckets
            if n < 2 or n % 2:
                continue
            t.rebucket(n // 2)
        elif op == "rollback":
            candidates = [v for v in history if v < t.current_version()]
            if not candidates:
                continue
            target = rng.choice(candidates)
            t.rollback_to(target)
            model = dict(history[target])
        history[t.current_version()] = dict(model)
        assert _read_state(t) == model, f"seed={seed} step={step} op={op}"
        _fsck_ok(t, f"seed={seed} step={step} op={op}")

    # time travel: every recorded version still reads as its archived model
    for v in rng.sample(sorted(history), min(4, len(history))):
        assert {r.id: r.v for r in t.read(version=v).collect()} == history[v], (
            f"seed={seed} time-travel v{v}"
        )

    # a full maintenance cycle must not change what readers see
    t.rewrite_position_delete_files()
    t.rewrite_data_files()
    t.expire_snapshots(keep_last=2)
    t.remove_orphan_files(older_than_s=0.0)
    assert _read_state(t) == model
    _fsck_ok(t, f"seed={seed} post-maintenance")


@pytest.mark.parametrize("seed", [11, 23])
def test_branch_wap_txn_walk_matches_model(catalog, spark, seed):
    """Second walk layering the isolation surfaces over DML: branch
    fork → branch-local DML → fast-forward/drop, WAP stage →
    publish/abort, and multi-table transactions (second table `aux`).
    Models: main dict, aux dict, branch dict (while a branch lives),
    staged batches. Main must never see branch/WAP work before
    promotion; fast_forward must land exactly the branch model;
    transactions must land on both tables or neither."""
    rng = random.Random(seed)
    model: dict[int, str] = {i: f"v{i}" for i in range(30)}
    aux_model: dict[int, str] = {i: f"x{i}" for i in range(10)}
    t = catalog.create_or_replace(
        "db.bwalk", _df(spark, model), key=["id"], n_buckets=4
    )
    aux = catalog.create_or_replace(
        "db.bwalk_aux", _df(spark, aux_model), key=["id"], n_buckets=2
    )
    next_id = 1000
    branch = None  # (LakeBranch, branch_model) while a branch is live
    staged_wap: dict[str, dict[int, str]] = {}

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    for step in range(20):
        op = rng.choice(
            ["main_dml", "fork", "branch_dml", "promote", "drop_branch",
             "wap_stage", "wap_publish", "wap_abort", "txn_commit", "txn_abort"]
        )
        if op == "main_dml" or (op in ("branch_dml",) and branch is None):
            if branch is not None and rng.random() < 0.5:
                continue  # fast_forward requires main at fork base
            upd = {k: f"m{step}" for k in fresh(2)}
            t.merge(_df(spark, upd))
            model.update(upd)
            if branch is not None:
                branch = None  # main moved: promotion impossible; drop
                t.drop_branch("wip")
        elif op == "fork":
            if branch is not None:
                continue
            t.create_branch("wip")
            branch = (t.branch("wip"), dict(model))
        elif op == "branch_dml":
            br, bm = branch
            upd = {k: f"b{step}" for k in fresh(2)}
            upd.update({
                k: f"b{step}"
                for k in rng.sample(sorted(bm), min(len(bm), 2))
            })
            br.merge(_df(spark, upd))
            bm.update(upd)
            branch = (br, bm)
            # branch work invisible on main
            assert _read_state(t) == model
            assert {r.id: r.v for r in br.read().collect()} == bm
        elif op == "promote":
            if branch is None:
                continue
            br, bm = branch
            t.fast_forward("wip")
            model = dict(bm)
            t.drop_branch("wip")
            branch = None
        elif op == "drop_branch":
            if branch is None:
                continue
            t.drop_branch("wip")
            branch = None
        elif op == "wap_stage":
            wid = f"w{step}"
            rows = {k: f"s{step}" for k in fresh(2)}
            t.stage_append(_df(spark, rows), wid)
            staged_wap[wid] = rows
            assert _read_state(t) == model  # invisible until publish
        elif op == "wap_publish":
            if not staged_wap:
                continue
            wid = sorted(staged_wap)[0]
            try:
                t.publish_staged(wid)
            except ValueError:
                # staged against an older base after main moved —
                # legitimate rejection; discard the stale stage
                t.abort_staged(wid)
                staged_wap.pop(wid)
                continue
            model.update(staged_wap.pop(wid))
        elif op == "wap_abort":
            if not staged_wap:
                continue
            wid = sorted(staged_wap)[-1]
            t.abort_staged(wid)
            staged_wap.pop(wid)
        elif op in ("txn_commit", "txn_abort"):
            rows_t = {k: f"t{step}" for k in fresh(2)}
            rows_a = {k: f"t{step}" for k in fresh(2)}
            txn = catalog.transaction()
            txn.table("db.bwalk").merge(_df(spark, rows_t))
            txn.table("db.bwalk_aux").merge(_df(spark, rows_a))
            if op == "txn_commit" and branch is None and not staged_wap:
                txn.commit()
                model.update(rows_t)
                aux_model.update(rows_a)
            else:
                # abort (also the path while branch/WAP hold stale
                # bases — keeps the walk's promotion invariants simple)
                txn.abort()
        assert _read_state(t) == model, f"seed={seed} step={step} op={op}"
        assert _read_state(aux) == aux_model, f"seed={seed} step={step} op={op}"
        _fsck_ok(t, f"seed={seed} step={step} op={op} (main)")
        _fsck_ok(aux, f"seed={seed} step={step} op={op} (aux)")

    # cleanup surfaces still open at walk end, then maintenance no-op
    for wid in list(staged_wap):
        t.abort_staged(wid)
    if branch is not None:
        t.drop_branch("wip")
    t.rewrite_data_files()
    t.expire_snapshots(keep_last=2)
    t.remove_orphan_files(older_than_s=0.0)
    assert _read_state(t) == model
    assert _read_state(aux) == aux_model
    _fsck_ok(t, f"seed={seed} post-maintenance (main)")
    _fsck_ok(aux, f"seed={seed} post-maintenance (aux)")


@pytest.mark.parametrize("seed", [5, 31])
def test_layout_evolution_walk_matches_model(catalog, spark, seed):
    """Third walk: LAYOUT evolution composed with DML — rebucket
    (metadata-only shrink and local-split grow), metadata-only type
    widening of the key column, CoW/MoR merge+delete, compaction and
    MoR fold — asserting exact read-back equality after every step.
    Rebucket must remap outstanding MoR delete eras; widening must
    leave old narrow-typed dirs readable and the bucket layout valid
    (bucket hashing is on the string form, value-stable across
    integral widths)."""
    rng = random.Random(seed)
    model: dict[int, str] = {i: f"v{i}" for i in range(48)}
    df0 = spark.createDataFrame(
        [Row(id=k, v=v) for k, v in sorted(model.items())], "id int, v string"
    )
    t = catalog.create_or_replace("db.layout", df0, key=["id"], n_buckets=4)
    next_id = 1000
    widened = False
    n_buckets = 4

    def _frame(rows):
        typ = "id bigint, v string" if widened else "id int, v string"
        return spark.createDataFrame(
            [Row(id=k, v=v) for k, v in sorted(rows.items())], typ
        )

    for step in range(18):
        nonlocal_ops = ["merge", "merge_mor", "delete_mor", "compact", "fold",
                        "rebucket_grow", "rebucket_shrink", "widen"]
        op = rng.choice(nonlocal_ops)
        if op in ("merge", "merge_mor"):
            upd = {k: f"m{step}" for k in rng.sample(sorted(model), 3)}
            upd[next_id] = f"m{step}"
            next_id += 1
            t.merge(_frame(upd),
                    mode="merge-on-read" if op == "merge_mor" else "copy-on-write")
            model.update(upd)
        elif op == "delete_mor":
            keys = rng.sample(sorted(model), 2)
            typ = "id bigint" if widened else "id int"
            t.delete_keys(spark.createDataFrame([(k,) for k in keys], typ),
                          mode="merge-on-read")
            for k in keys:
                model.pop(k)
        elif op == "compact":
            t.rewrite_data_files()
        elif op == "fold":
            t.rewrite_position_delete_files()
        elif op == "rebucket_grow" and n_buckets < 16:
            n_buckets *= 2
            t.rebucket(n_buckets)
        elif op == "rebucket_shrink" and n_buckets > 2:
            n_buckets //= 2
            t.rebucket(n_buckets)
        elif op == "widen" and not widened:
            t.alter_column_type("id", "bigint")
            widened = True
        else:
            continue
        got = {r.id: r.v for r in t.read().collect()}
        assert got == model, f"seed={seed} step={step} op={op}"
        assert t.snapshot().n_buckets == n_buckets
        _fsck_ok(t, f"seed={seed} step={step} op={op}")

    t.rewrite_position_delete_files()
    t.rewrite_data_files()
    t.expire_snapshots(keep_last=2)
    t.remove_orphan_files(older_than_s=0.0)
    assert {r.id: r.v for r in t.read().collect()} == model
    _fsck_ok(t, f"seed={seed} post-maintenance")


@pytest.mark.parametrize("seed", [11])
def test_clone_walk_matches_model(catalog, spark, seed):
    """Random interleaving of SHALLOW-CLONE lifecycle with DML and GC on
    both sides of the boundary: clone tables at random points, mutate
    source and clones independently, compact/expire/GC the source, drop
    clones — every table must read back exactly its own model at every
    step (clones pinned at their clone point plus their own edits), and
    source GC must never break a live clone."""
    rng = random.Random(seed)
    model: dict[int, str] = {i: f"v{i}" for i in range(30)}
    src = catalog.create_or_replace(
        "db.cw_src", _df(spark, model), key=["id"], n_buckets=4
    )
    tables = {"db.cw_src": (src, model)}
    next_id, clone_n = 1000, 0

    for step in range(20):
        op = rng.choice(
            ["merge", "delete", "clone", "gc_source", "drop_clone", "merge",
             "clone"]
        )
        name = rng.choice(sorted(tables))
        t, m = tables[name]
        if op == "merge":
            ids = [rng.randrange(0, 30) for _ in range(3)] + [next_id]
            next_id += 1
            batch = {i: f"s{step}" for i in set(ids)}
            t.merge(_df(spark, batch))
            m.update(batch)
        elif op == "delete":
            victims = sorted(m)[: rng.randrange(1, 3)]
            if victims:
                t.delete_keys(_df(spark, {i: "" for i in victims}).select("id"))
                for i in victims:
                    m.pop(i, None)
        elif op == "clone" and len(tables) < 4:
            clone_n += 1
            cname = f"db.cw_c{clone_n}"
            ct = catalog.clone_table(name, cname)
            tables[cname] = (ct, dict(m))
        elif op == "gc_source":
            src.rewrite_data_files(sort_by=["id"])
            src.expire_snapshots(keep_last=1)
            src.remove_orphan_files(older_than_s=0.0)
        elif op == "drop_clone" and len(tables) > 1:
            victims = [n for n in sorted(tables) if n != "db.cw_src"]
            if victims:
                gone = rng.choice(victims)
                del tables[gone]
                catalog.drop(gone)
        # EVERY table must read back its own model after every step
        for n, (tt, mm) in sorted(tables.items()):
            assert _read_state(tt) == mm, (seed, step, op, n)
            _fsck_ok(tt, f"seed={seed} step={step} op={op} ({n})")
    # closing: localize + drop every clone, then source GC reclaims
    for n in [x for x in sorted(tables) if x != "db.cw_src"]:
        catalog.drop(n)
    src.rewrite_data_files(sort_by=["id"])
    src.expire_snapshots(keep_last=1)
    src.remove_orphan_files(older_than_s=0.0)
    assert _read_state(src) == tables["db.cw_src"][1]
    assert src.clone_markers() == []
    _fsck_ok(src, f"seed={seed} closing GC")


@pytest.mark.parametrize("seed", [5, 13])
def test_clone_gc_walk_matches_model(catalog, spark, seed):
    """Third walk: shallow clones under source churn and GC. The two
    round-10 marker bugs were cross-operator interactions (fresh clone
    + routine source GC; keep-data drop + source churn) that no per-op
    fixture composed — this walk interleaves clone creation, divergent
    DML on both sides, compaction/fold/expiry/orphan-GC on both sides,
    and keep-data/purging drops, asserting after every step that the
    source and EVERY live clone read back exactly their models."""
    rng = random.Random(seed)
    src_model: dict[int, str] = {i: f"v{i}" for i in range(30)}
    src = catalog.create_or_replace(
        "db.gcwalk_src", _df(spark, src_model), key=["id"], n_buckets=4
    )
    clones: dict[str, tuple[object, dict[int, str]]] = {}
    next_id = 100
    n_clones = 0

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    for step in range(16):
        op = rng.choice(
            ["src_merge", "src_delete_mor", "src_gc_cycle", "clone_new",
             "clone_merge", "clone_gc_cycle", "drop_keep", "drop_purge"]
        )
        if op == "src_merge":
            upd = {k: f"s{step}" for k in fresh(2)}
            upd.update({
                k: f"s{step}"
                for k in rng.sample(sorted(src_model), min(3, len(src_model)))
            })
            src.merge(_df(spark, upd))
            src_model.update(upd)
        elif op == "src_delete_mor":
            if not src_model:
                continue
            keys = rng.sample(sorted(src_model), min(2, len(src_model)))
            src.delete_keys(
                spark.createDataFrame([(k,) for k in keys], "id long"),
                mode="merge-on-read",
            )
            for k in keys:
                src_model.pop(k)
        elif op == "src_gc_cycle":
            src.rewrite_position_delete_files()
            src.rewrite_data_files()
            src.expire_snapshots(keep_last=1)
            src.remove_orphan_files(older_than_s=0.0)
        elif op == "clone_new":
            if len(clones) >= 2:
                continue
            n_clones += 1
            name = f"db.gcwalk_c{n_clones}"
            c = catalog.clone_table("db.gcwalk_src", name)
            clones[name] = (c, dict(src_model))
        elif op == "clone_merge":
            if not clones:
                continue
            name = rng.choice(sorted(clones))
            c, m = clones[name]
            upd = {k: f"c{step}" for k in fresh(2)}
            c.merge(_df(spark, upd))
            m.update(upd)
        elif op == "clone_gc_cycle":
            if not clones:
                continue
            name = rng.choice(sorted(clones))
            c, _ = clones[name]
            c.rewrite_data_files()
            c.expire_snapshots(keep_last=1)
            c.remove_orphan_files(older_than_s=0.0)
        elif op == "drop_keep":
            if not clones:
                continue
            # keep-data drop: table stays readable, markers must survive
            name = rng.choice(sorted(clones))
            catalog.drop(name, purge=False)
            c, m = clones[name]
            clones[name] = (catalog.table(name), m)  # reopen handle
        elif op == "drop_purge":
            if not clones:
                continue
            name = rng.choice(sorted(clones))
            catalog.drop(name, purge=True)
            del clones[name]
        assert _read_state(src) == src_model, f"seed={seed} step={step} op={op} (src)"
        _fsck_ok(src, f"seed={seed} step={step} op={op} (src)")
        for name, (c, m) in clones.items():
            assert _read_state(c) == m, f"seed={seed} step={step} op={op} ({name})"
            _fsck_ok(c, f"seed={seed} step={step} op={op} ({name})")

    # end state: one more aggressive source GC cycle, then every
    # survivor (and the source) must still read back exactly
    src.rewrite_data_files()
    src.expire_snapshots(keep_last=1)
    src.remove_orphan_files(older_than_s=0.0)
    assert _read_state(src) == src_model
    _fsck_ok(src, "final (src)")
    for name, (c, m) in clones.items():
        assert _read_state(c) == m, f"final ({name})"
        _fsck_ok(c, f"final ({name})")


def test_rollback_across_rebucket_with_mor(catalog, spark):
    """Deterministic composition the random seeds may miss: MoR delete
    -> shrink rebucket (metadata-only delete remap) -> merge -> rollback
    to the pre-rebucket version. Reads must follow each snapshot's OWN
    n_buckets and delete-era map."""
    model = {i: f"v{i}" for i in range(24)}
    t = catalog.create_or_replace("db.rbwalk", _df(spark, model), key=["id"], n_buckets=8)
    t.delete_keys(spark.createDataFrame([(3,), (7,)], "id long"), mode="merge-on-read")
    for k in (3, 7):
        model.pop(k)
    v_pre = t.current_version()
    assert _read_state(t) == model
    t.rebucket(4)                      # metadata-only shrink, deletes remap
    assert _read_state(t) == model
    t.merge(_df(spark, {1: "post"}))
    post = dict(model); post[1] = "post"
    assert _read_state(t) == post
    t.rollback_to(v_pre)               # back across the rebucket boundary
    assert _read_state(t) == model
    assert t.snapshot().n_buckets == 8
    # and forward again: DML after rollback still lands correctly
    t.merge(_df(spark, {2: "again"}))
    model[2] = "again"
    assert _read_state(t) == model


@pytest.mark.parametrize("seed", [3, 17])
def test_branch_conflict_or_converge_walk(catalog, spark, seed):
    """r13 verdict item 6: the branch walk above keeps promotion always
    possible by dropping the branch whenever main moves — so the
    CONFLICT rule (fast_forward while main is past the fork base must
    raise CommitConflict, never silently overwrite) and the CONVERGE
    path (re-fork + replay, then promote) were never random-walked.
    Here main and a live branch both take DML freely; every promotion
    attempt asserts conflict-or-converge:

    - main at fork base  -> fast_forward succeeds, main == branch model
    - main moved         -> fast_forward raises CommitConflict; the
      branch rebase (drop, re-fork from current main, REPLAY the
      recorded branch intents) must then promote cleanly with the
      replayed model — the lake-table analogue of a git rebase.

    Branch-local DML is also wider than the happy-path walk: MoR
    deletes, predicate update_where, compaction and MoR fold all run
    ON THE BRANCH with main provably untouched after each."""
    from datalake_iceberg_spark.tables import CommitConflict

    rng = random.Random(seed)
    model: dict[int, str] = {i: f"v{i}" for i in range(36)}
    t = catalog.create_or_replace(
        "db.cbwalk", _df(spark, model), key=["id"], n_buckets=4
    )
    next_id = 1000
    # live branch state: (LakeBranch, branch_model, fork_base_version,
    # recorded intents for replay-on-rebase)
    branch = None
    n_clean, n_conflict = 0, 0

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    def _apply_intent(m: dict[int, str], intent) -> None:
        kind, payload = intent
        if kind == "merge":
            m.update(payload)
        elif kind == "delete":
            for k in payload:
                m.pop(k, None)
        elif kind == "update_where":
            cut, val = payload
            for k in list(m):
                if k <= cut:
                    m[k] = val

    for step in range(22):
        op = rng.choice(
            ["main_merge", "main_delete", "fork",
             "branch_merge", "branch_delete_mor", "branch_update",
             "branch_compact", "branch_fold", "promote"]
        )
        if op == "main_merge":
            upd = {k: f"M{step}" for k in fresh(2)}
            upd.update({
                k: f"M{step}"
                for k in rng.sample(sorted(model), min(2, len(model)))
            })
            t.merge(_df(spark, upd))
            model.update(upd)
        elif op == "main_delete":
            if not model:
                continue
            keys = rng.sample(sorted(model), min(2, len(model)))
            t.delete_keys(spark.createDataFrame([(k,) for k in keys], "id long"))
            for k in keys:
                model.pop(k)
        elif op == "fork":
            if branch is not None:
                continue
            base = t.current_version()
            t.create_branch("wip")
            branch = (t.branch("wip"), dict(model), base, [])
        elif op in ("branch_merge", "branch_delete_mor", "branch_update",
                    "branch_compact", "branch_fold"):
            if branch is None:
                continue
            br, bm, base, intents = branch
            if op == "branch_merge":
                upd = {k: f"B{step}" for k in fresh(2)}
                upd.update({
                    k: f"B{step}"
                    for k in rng.sample(sorted(bm), min(2, len(bm)))
                })
                br.merge(_df(spark, upd), mode=rng.choice(
                    ["copy-on-write", "merge-on-read"]))
                _apply_intent(bm, ("merge", upd))
                intents.append(("merge", upd))
            elif op == "branch_delete_mor":
                if bm:
                    keys = rng.sample(sorted(bm), min(2, len(bm)))
                    br.delete_keys(
                        spark.createDataFrame([(k,) for k in keys], "id long"),
                        mode="merge-on-read",
                    )
                    _apply_intent(bm, ("delete", keys))
                    intents.append(("delete", keys))
            elif op == "branch_update":
                cut = rng.randint(0, 40)
                br.update_where([("id", "<=", cut)], {"v": f"'U{step}'"})
                _apply_intent(bm, ("update_where", (cut, f"U{step}")))
                intents.append(("update_where", (cut, f"U{step}")))
            elif op == "branch_compact":
                br.rewrite_data_files()
            elif op == "branch_fold":
                br.rewrite_position_delete_files()
            branch = (br, bm, base, intents)
            # branch work must be invisible on main, and vice versa
            assert _read_state(t) == model, f"seed={seed} step={step} {op} leaked to main"
            assert {r.id: r.v for r in br.read().collect()} == bm
        elif op == "promote":
            if branch is None:
                continue
            br, bm, base, intents = branch
            if t.current_version() == base:
                t.fast_forward("wip")
                model = dict(bm)
                n_clean += 1
            else:
                # CONFLICT: main moved past the fork base — promotion
                # must refuse, main must be byte-identical after
                before = _read_state(t)
                with pytest.raises(CommitConflict):
                    t.fast_forward("wip")
                assert _read_state(t) == before
                # CONVERGE: rebase = re-fork from current main and
                # replay the branch's intents, then promote cleanly
                t.drop_branch("wip")
                t.create_branch("wip")
                br = t.branch("wip")
                rbm = dict(model)
                for intent in intents:
                    kind, payload = intent
                    if kind == "merge":
                        br.merge(_df(spark, payload))
                    elif kind == "delete":
                        br.delete_keys(spark.createDataFrame(
                            [(k,) for k in payload], "id long"))
                    elif kind == "update_where":
                        cut, val = payload
                        br.update_where([("id", "<=", cut)], {"v": f"'{val}'"})
                    _apply_intent(rbm, intent)
                assert {r.id: r.v for r in br.read().collect()} == rbm
                t.fast_forward("wip")
                model = dict(rbm)
                n_conflict += 1
            t.drop_branch("wip")
            branch = None
        assert _read_state(t) == model, f"seed={seed} step={step} op={op}"
        _fsck_ok(t, f"seed={seed} step={step} op={op} (main)")
        if branch is not None:
            assert {r.id: r.v for r in branch[0].read().collect()} == branch[1]

    # both promotion outcomes must have been exercised by the seed
    # measured per-seed outcomes (pinned so a future rng-consumption
    # change that silently stops exercising the CONFLICT path fails
    # loudly): seed 3 walks the conflict+rebase promotion, seed 17
    # walks three clean fast-forwards
    expected = {3: (0, 1), 17: (3, 0)}[seed]
    assert (n_clean, n_conflict) == expected, (
        f"seed={seed}: promotion mix changed: clean={n_clean} "
        f"conflict={n_conflict}, expected {expected} — re-pin after "
        f"verifying both paths still run across the seed set"
    )
    if branch is not None:
        t.drop_branch("wip")
    t.rewrite_position_delete_files()
    t.rewrite_data_files()
    t.expire_snapshots(keep_last=2)
    t.remove_orphan_files(older_than_s=0.0)
    assert _read_state(t) == model
    _fsck_ok(t, f"seed={seed} post-maintenance")
