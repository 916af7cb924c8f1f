"""Metadata-only schema evolution: add / rename / drop column.

Parity target: Iceberg schema evolution, which the reference gets from
the Iceberg runtime (``UpdateSchema`` via Spark DDL). All three DDLs are
O(manifest) — no data rewrite — and honor Iceberg's guarantees:
renamed columns keep their values, dropped columns disappear, and a
drop + re-add does NOT resurrect old values.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_add_column_reads_null_then_values(catalog, spark):
    t = catalog.create_or_replace(
        "db.add", spark.createDataFrame([Row(id=i, v=f"x{i}") for i in range(4)]),
        key=["id"], n_buckets=2,
    )
    v_before = t.current_version()
    t.add_column("score", "double", comment="quality score")
    assert [f.name for f in t.schema().fields] == ["id", "v", "score"]
    assert t.column_comments()["score"] == "quality score"
    # pre-existing rows read NULL, no data was rewritten
    assert _rows(t.read()) == {(i, f"x{i}", None) for i in range(4)}
    # new writes carry the column; old dirs still read NULL alongside
    t.append(spark.createDataFrame([Row(id=10, v="new", score=0.5)]))
    got = {r.id: r.score for r in t.read().collect()}
    assert got[10] == 0.5 and got[0] is None
    # time travel: the pre-add snapshot still has the old schema
    assert [f.name for f in t.read(version=v_before).schema.fields] == ["id", "v"]


def test_add_column_requires_aligned_merge_source(catalog, spark):
    t = catalog.create_or_replace(
        "db.addm", spark.createDataFrame([Row(id=1, v="a")]), key=["id"], n_buckets=2,
    )
    t.add_column("n", "bigint")
    with pytest.raises(ValueError, match="missing target columns"):
        t.merge(spark.createDataFrame([Row(id=1, v="b")]))
    t.merge(spark.createDataFrame([Row(id=1, v="b", n=7)]))
    assert _rows(t.read()) == {(1, "b", 7)}


def test_rename_column_preserves_values_and_travel(catalog, spark):
    t = catalog.create_or_replace(
        "db.ren", spark.createDataFrame([Row(id=i, val=i * 10) for i in range(6)]),
        key=["id"], n_buckets=2,
    )
    v_before = t.current_version()
    t.rename_column("val", "amount")
    assert [f.name for f in t.schema().fields] == ["id", "amount"]
    assert _rows(t.read()) == {(i, i * 10) for i in range(6)}
    # old snapshot reads under the old name
    assert [f.name for f in t.read(version=v_before).schema.fields] == ["id", "val"]
    # writes after the rename use the new name; both eras union cleanly
    t.append(spark.createDataFrame([Row(id=100, amount=999)]))
    assert (100, 999) in _rows(t.read())
    # rename chain old->new->old: original-era dirs land back on
    # identity (mapping entries removed); only the dir written during
    # the "amount" era keeps a mapping
    t.rename_column("amount", "val")
    rn = t.snapshot().renames
    assert rn and all(m == {"val": "amount"} for m in rn.values())
    assert _rows(t.read()) == {(i, i * 10) for i in range(6)} | {(100, 999)}


def test_rename_key_column_merge_and_lookup(catalog, spark):
    t = catalog.create_or_replace(
        "db.renkey", spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(8)]),
        key=["id"], n_buckets=4,
    )
    t.rename_column("id", "order_id")
    assert t.snapshot().key == ["order_id"]
    t.merge(spark.createDataFrame([Row(order_id=3, v="upd")]))
    got = {r.order_id: r.v for r in t.read().collect()}
    assert got[3] == "upd" and len(got) == 8
    hit = t.lookup(spark.createDataFrame([Row(order_id=5)]))
    assert _rows(hit) == {(5, "v5")}


def test_rename_then_scan_still_skips_dirs(catalog, spark):
    """Data-skipping stats are keyed by physical names; a filter on the
    renamed logical column must still translate and prune dirs."""
    t = catalog.create_or_replace(
        "db.renscan",
        spark.createDataFrame([Row(id=i, ts=i) for i in range(100)]).repartition(1),
        key=["id"], n_buckets=2,
    )
    # three appends with disjoint ts ranges -> distinct dirs with stats
    for lo in (1000, 2000, 3000):
        t.append(
            spark.createDataFrame([Row(id=lo + i, ts=lo + i) for i in range(10)])
        )
    t.rename_column("ts", "event_ts")
    all_dirs = t.snapshot().all_dirs()
    cand = t.candidate_dirs([("event_ts", ">=", 3000)])
    assert len(cand) < len(all_dirs)
    assert t.scan([("event_ts", ">=", 3000)]).count() == 10


def test_drop_then_readd_does_not_resurrect(catalog, spark):
    t = catalog.create_or_replace(
        "db.resur",
        spark.createDataFrame([Row(id=i, secret=f"s{i}", keep=i) for i in range(5)]),
        key=["id"], n_buckets=2,
    )
    t.drop_column("secret")
    assert [f.name for f in t.schema().fields] == ["id", "keep"]
    assert _rows(t.read()) == {(i, i) for i in range(5)}
    # re-adding the same name must read NULL, never the old values
    t.add_column("secret", "string")
    assert {r.secret for r in t.read().collect()} == {None}
    # compaction folds the mapping away and keeps the nulls
    t.rewrite_data_files(min_input_dirs=1)
    assert t.snapshot().renames == {}
    assert {r.secret for r in t.read().collect()} == {None}


def test_drop_key_column_rejected(catalog, spark):
    t = catalog.create_or_replace(
        "db.dropkey", spark.createDataFrame([Row(id=1, v="a")]), key=["id"], n_buckets=2,
    )
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "string")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("zzz", "q")


def test_mor_deletes_survive_key_rename(catalog, spark):
    """Equality-delete files written before a key rename still apply:
    the delete-key read follows the same per-dir mapping."""
    t = catalog.create_or_replace(
        "db.morren", spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(10)]),
        key=["id"], n_buckets=2,
    )
    t.delete_keys(spark.createDataFrame([Row(id=2), Row(id=7)]), mode="merge-on-read")
    t.rename_column("id", "pk")
    got = {r.pk for r in t.read().collect()}
    assert got == set(range(10)) - {2, 7}
    # folding the deletes rewrites under the NEW name
    t.rewrite_position_delete_files()
    assert t.snapshot().deletes == {}
    assert {r.pk for r in t.read().collect()} == set(range(10)) - {2, 7}


def test_evolution_chain_compaction_and_orphans(catalog, spark):
    """add + rename + drop stacked, then compaction normalizes files to
    the current schema and maintenance stays consistent."""
    t = catalog.create_or_replace(
        "db.chain",
        spark.createDataFrame([Row(id=i, a=i, b=f"b{i}") for i in range(6)]),
        key=["id"], n_buckets=2,
    )
    t.add_column("c", "bigint")
    t.rename_column("a", "alpha")
    t.drop_column("b")
    assert [f.name for f in t.schema().fields] == ["id", "alpha", "c"]
    assert _rows(t.read()) == {(i, i, None) for i in range(6)}
    t.append(spark.createDataFrame([Row(id=50, alpha=5, c=9)]))
    t.rewrite_data_files(min_input_dirs=1)
    assert t.snapshot().renames == {}
    assert _rows(t.read()) == {(i, i, None) for i in range(6)} | {(50, 5, 9)}
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(older_than_s=0.0)
    assert t.read().count() == 7


# ------------------------------------------------------ type promotion


def test_widen_int_to_bigint_reads_old_files(catalog, spark):
    df = spark.createDataFrame([Row(id=i, v=i * 10) for i in range(8)],
                               "id int, v int")
    t = catalog.create_or_replace("db.widen", df, key=["id"], n_buckets=4)
    t.alter_column_type("v", "bigint")
    assert dict(t.schema().fields[1].jsonValue().items())["type"] == "long"
    got = t.read()
    assert got.schema["v"].dataType.simpleString() == "bigint"
    assert {(r.id, r.v) for r in got.collect()} == {(i, i * 10) for i in range(8)}
    # time travel still reads the era-correct narrow type
    assert t.read(version=0).schema["v"].dataType.simpleString() == "int"


def test_widen_float_to_double_and_mixed_dirs(catalog, spark):
    df = spark.createDataFrame([Row(id=i, x=float(i)) for i in range(4)],
                               "id int, x float")
    t = catalog.create_or_replace("db.widenf", df, key=["id"], n_buckets=2)
    t.alter_column_type("x", "double")
    # append AFTER the widen: new dirs carry double, old dirs float
    t.append(spark.createDataFrame([Row(id=100, x=2.5)], "id int, x double"))
    got = {(r.id, r.x) for r in t.read().collect()}
    assert got == {(0, 0.0), (1, 1.0), (2, 2.0), (3, 3.0), (100, 2.5)}


def test_widen_key_column_keeps_buckets_valid(catalog, spark):
    df = spark.createDataFrame([Row(id=i, v=f"x{i}") for i in range(10)],
                               "id int, v string")
    t = catalog.create_or_replace("db.widenkey", df, key=["id"], n_buckets=4)
    t.alter_column_type("id", "bigint")
    # merge + lookup exercise bucket routing with the widened key
    t.merge(spark.createDataFrame([Row(id=3, v="upd")], "id bigint, v string"))
    assert {(r.id, r.v) for r in t.lookup(
        spark.createDataFrame([Row(id=3)], "id bigint")).collect()} == {(3, "upd")}
    assert t.read().count() == 10


def test_widen_rejects_narrowing_and_cross_family(catalog, spark):
    df = spark.createDataFrame([Row(id=1, v=2)], "id int, v bigint")
    t = catalog.create_or_replace("db.widenbad", df, key=["id"], n_buckets=2)
    with pytest.raises(ValueError, match="only widening"):
        t.alter_column_type("v", "int")
    with pytest.raises(ValueError, match="only widening"):
        t.alter_column_type("v", "string")
    with pytest.raises(ValueError, match="already"):
        t.alter_column_type("id", "int")
    with pytest.raises(ValueError, match="no such column"):
        t.alter_column_type("ghost", "bigint")


def test_widen_then_rename_then_compact(catalog, spark):
    df = spark.createDataFrame([Row(id=i, v=i) for i in range(6)],
                               "id int, v int")
    t = catalog.create_or_replace("db.widenchain", df, key=["id"], n_buckets=2)
    t.alter_column_type("v", "bigint")
    t.rename_column("v", "value")
    t.rewrite_data_files(min_input_dirs=1)
    got = t.read()
    assert got.schema["value"].dataType.simpleString() == "bigint"
    assert {(r.id, r.value) for r in got.collect()} == {(i, i) for i in range(6)}
