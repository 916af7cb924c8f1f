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


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _df(spark, rows: dict[int, str]):
    return spark.createDataFrame(
        [Row(id=k, v=v) for k, v in sorted(rows.items())], "id long, v string"
    )


def _read_state(t) -> dict[int, str]:
    return {r.id: r.v for r in t.read().collect()}


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
             "update", "compact", "fold", "rollback"]
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
        elif op == "update":
            cut = rng.randint(0, next_id)
            # string assignment values are SQL EXPRESSIONS (SET v = ...)
            t.update_where([("id", "<=", cut)], {"v": f"'u{step}'"})
            for k in list(model):
                if k <= cut:
                    model[k] = f"u{step}"
        elif op == "compact":
            t.rewrite_data_files()
        elif op == "fold":
            t.rewrite_position_delete_files()
        elif op == "rollback":
            candidates = [v for v in history if v < t.current_version()]
            if not candidates:
                continue
            target = rng.choice(candidates)
            t.rollback_to(target)
            model = dict(history[target])
        history[t.current_version()] = dict(model)
        assert _read_state(t) == model, f"seed={seed} step={step} op={op}"

    # time travel: every recorded version still reads as its archived model
    for v in rng.sample(sorted(history), min(4, len(history))):
        assert {r.id: r.v for r in t.read(version=v).collect()} == history[v], (
            f"seed={seed} time-travel v{v}"
        )

    # a full maintenance cycle must not change what readers see
    t.rewrite_position_delete_files()
    t.rewrite_data_files()
    t.expire_snapshots(keep_last=2)
    t.remove_orphan_files()
    assert _read_state(t) == model
