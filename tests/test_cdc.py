"""CDC semantics: envelope flatten, dedup-latest, MERGE/DELETE apply,
idempotent convergence under shuffled/duplicated event streams
(BASELINE.md "CDC convergence" target)."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_iceberg_spark.cdc.pipeline import (
    apply_cdc_changes,
    batch_stats,
    dedup_latest,
    transform_and_dedup,
)
from datalake_iceberg_spark.functions.keys import SURROGATE_KEY_COL, surrogate_key
from datalake_iceberg_spark.tables import LakeCatalog


ENVELOPE_SCHEMA = (
    "op STRING, after STRUCT<id BIGINT, v STRING>, "
    "before STRUCT<id BIGINT, v STRING>, offset BIGINT, ts_ms BIGINT"
)


def envelope_rows(events):
    """events: list of (op, id, payload_val, offset, ts_ms)."""
    rows = []
    for op, id_, val, offset, ts in events:
        body = Row(id=id_, v=val)
        rows.append(
            Row(
                op=op,
                after=None if op == "d" else body,
                before=body if op == "d" else None,
                offset=offset,
                ts_ms=ts,
            )
        )
    return rows


def make_env(spark, events):
    return spark.createDataFrame(envelope_rows(events), ENVELOPE_SCHEMA)


@pytest.fixture()
def target(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    base = surrogate_key(
        spark.createDataFrame([Row(id=i, v=f"base{i}") for i in range(10)]), ["id"]
    ).withColumn("last_applied_date", F.current_timestamp())
    return cat.create_or_replace(
        "db.cdc_target", base, key=[SURROGATE_KEY_COL], n_buckets=4
    )


def test_dedup_latest_keeps_final_state(spark):
    df = spark.createDataFrame(
        [Row(id_iceberg="k1", v=1, __offset=10),
         Row(id_iceberg="k1", v=2, __offset=20),
         Row(id_iceberg="k2", v=9, __offset=5)]
    )
    out = {(r.id_iceberg, r.v) for r in dedup_latest(df).collect()}
    assert out == {("k1", 2), ("k2", 9)}


def test_transform_and_apply(spark, target):
    events = [
        ("c", 100, "ins100", 1, 1700000000000),
        ("u", 1, "upd1-a", 2, 1700000001000),
        ("u", 1, "upd1-b", 3, 1700000002000),  # same PK, later offset wins
        ("d", 2, "del2", 4, 1700000003000),
    ]
    env = make_env(spark, events)
    upserts, deletes = transform_and_dedup(env, target, ["id"])
    apply_cdc_changes(target, upserts, deletes)
    got = {r.id: r.v for r in target.read().collect()}
    assert got[100] == "ins100"
    assert got[1] == "upd1-b"
    assert 2 not in got
    assert len(got) == 10  # 10 base - 1 delete + 1 insert


def test_delete_then_reinsert(spark, target):
    """FIXTURES.md F6: delete-then-reinsert across batches → reinserted row."""
    b1 = make_env(spark, [("d", 5, "x", 1, 1)])
    u, d = transform_and_dedup(b1, target, ["id"])
    apply_cdc_changes(target, u, d)
    assert target.read().filter("id = 5").count() == 0
    b2 = make_env(spark, [("c", 5, "reborn", 2, 2)])
    u, d = transform_and_dedup(b2, target, ["id"])
    apply_cdc_changes(target, u, d)
    assert [r.v for r in target.read().filter("id = 5").collect()] == ["reborn"]


def test_convergence_random_workload(spark, target):
    """60/20/20 I/U/D random stream, any batch partitioning + in-batch
    duplicates → same final state as a sequential reference apply."""
    rng = random.Random(42)
    events, offset = [], 0
    live = set(range(10))
    expected = {i: f"base{i}" for i in range(10)}
    for _ in range(200):
        offset += 1
        roll = rng.random()
        if roll < 0.6 or not live:
            id_ = rng.randrange(1000)
            val = f"v{offset}"
            events.append(("c", id_, val, offset, offset * 1000))
            expected[id_] = val
            live.add(id_)
        elif roll < 0.8:
            id_ = rng.choice(sorted(live))
            val = f"u{offset}"
            events.append(("u", id_, val, offset, offset * 1000))
            expected[id_] = val
        else:
            id_ = rng.choice(sorted(live))
            events.append(("d", id_, "x", offset, offset * 1000))
            expected.pop(id_, None)
            live.discard(id_)
    # arbitrary batch boundaries (ordered within, as Kafka partitions give)
    cuts = sorted(rng.sample(range(1, len(events)), 5))
    batches = [events[a:b] for a, b in zip([0] + cuts, cuts + [len(events)])]
    for batch in batches:
        env = make_env(spark, batch)
        u, d = transform_and_dedup(env, target, ["id"])
        apply_cdc_changes(target, u, d)
    got = {r.id: r.v for r in target.read().collect()}
    assert got == expected


def test_batch_stats(spark):
    df = spark.createDataFrame(
        [Row(last_applied_date=None, __offset=7), Row(last_applied_date=None, __offset=3)],
        "last_applied_date TIMESTAMP, __offset BIGINT",
    )
    s = batch_stats(df)
    assert s.event_count == 2 and s.min_offset == 3 and s.max_offset == 7
