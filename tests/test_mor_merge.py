"""Merge-on-read MERGE: the batch appends as new data dirs whose key
set doubles as an equality-delete era over the pre-commit dirs —
O(batch) commit, matched rows masked at read, folded away by
rewrite_position_delete_files."""

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _rows(t, version=None):
    return {tuple(r) for r in t.read(version=version).collect()}


def _mk(catalog, spark, name="db.mm"):
    return catalog.create_or_replace(
        name,
        spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(50)]),
        key=["id"],
        n_buckets=4,
    )


def test_mor_merge_matches_cow_merge(catalog, spark):
    src = spark.createDataFrame(
        [Row(id=i, v="upd") for i in range(10)] + [Row(id=i, v="new") for i in (100, 101)]
    )
    t_cow = _mk(catalog, spark, "db.cow")
    t_mor = _mk(catalog, spark, "db.mor")
    t_cow.merge(src)
    snap = t_mor.merge(src, mode="merge-on-read")
    assert snap.operation == "merge-mor"
    assert _rows(t_mor) == _rows(t_cow)


def test_mor_merge_does_not_rewrite_old_dirs(catalog, spark):
    t = _mk(catalog, spark)
    dirs_before = {d for ds in t.snapshot().buckets.values() for d in ds}
    t.merge(
        spark.createDataFrame([Row(id=1, v="upd")]), mode="merge-on-read"
    )
    dirs_after = {d for ds in t.snapshot().buckets.values() for d in ds}
    assert dirs_before <= dirs_after  # old dirs all still referenced


def test_sequential_mor_merges_newest_wins(catalog, spark):
    t = _mk(catalog, spark)
    t.merge(spark.createDataFrame([Row(id=5, v="first")]), mode="merge-on-read")
    t.merge(spark.createDataFrame([Row(id=5, v="second")]), mode="merge-on-read")
    want = {(i, f"v{i}") for i in range(50) if i != 5} | {(5, "second")}
    assert _rows(t) == want


def test_fold_after_mor_merge(catalog, spark):
    t = _mk(catalog, spark)
    t.merge(
        spark.createDataFrame([Row(id=5, v="upd"), Row(id=100, v="new")]),
        mode="merge-on-read",
    )
    before = _rows(t)
    res = t.rewrite_position_delete_files()
    assert res["rewritten_buckets"] >= 1
    assert not t.snapshot().deletes
    assert _rows(t) == before


def test_mor_merge_duplicate_keys_raise(catalog, spark):
    t = _mk(catalog, spark)
    dup = spark.createDataFrame([Row(id=1, v="a"), Row(id=1, v="b")])
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(dup, mode="merge-on-read")


def test_mor_merge_then_mor_delete(catalog, spark):
    t = _mk(catalog, spark)
    t.merge(spark.createDataFrame([Row(id=5, v="upd")]), mode="merge-on-read")
    t.delete_keys(spark.createDataFrame([Row(id=5)]), mode="merge-on-read")
    want = {(i, f"v{i}") for i in range(50) if i != 5}
    assert _rows(t) == want


def test_mor_merge_then_cow_delete_other_range(catalog, spark):
    t = _mk(catalog, spark)
    t.merge(spark.createDataFrame([Row(id=5, v="upd")]), mode="merge-on-read")
    t.delete_keys(spark.createDataFrame([Row(id=40)]))
    want = {(i, "upd" if i == 5 else f"v{i}") for i in range(50) if i != 40}
    assert _rows(t) == want


def test_time_travel_before_mor_merge(catalog, spark):
    t = _mk(catalog, spark)
    v0 = t.current_version()
    t.merge(spark.createDataFrame([Row(id=5, v="upd")]), mode="merge-on-read")
    assert _rows(t, version=v0) == {(i, f"v{i}") for i in range(50)}


def test_read_changes_across_mor_merge(catalog, spark):
    t = _mk(catalog, spark)
    v0 = t.current_version()
    t.merge(
        spark.createDataFrame([Row(id=5, v="upd"), Row(id=100, v="new")]),
        mode="merge-on-read",
    )
    ch = {(r.id, r.v, r._change_type) for r in t.read_changes(v0).collect()}
    assert ch == {(5, "upd", "update_postimage"), (100, "new", "insert")}


def test_unknown_merge_mode_raises(catalog, spark):
    t = _mk(catalog, spark)
    with pytest.raises(ValueError, match="unknown merge mode"):
        t.merge(spark.createDataFrame([Row(id=1, v="x")]), mode="bogus")


# --------------------------------------------- partial-column MERGE (r7)


def _pmk(catalog, spark, name):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(id=i, a=f"a{i}", b=f"b{i}", n=i * 10) for i in range(8)]
    )
    return catalog.create_or_replace(name, df, key=["id"], n_buckets=4)


def test_partial_update_merge_cow(spark, tmp_path):
    from pyspark.sql import Row

    from datalake_iceberg_spark.tables import LakeCatalog

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    t = _pmk(catalog, spark, "db.pu")
    batch = spark.createDataFrame([
        Row(id=2, a="A2", b="IGNORED", n=999),   # matched: only a,n taken
        Row(id=50, a="A50", b="B50", n=500),      # unmatched: full insert
    ])
    t.merge(batch, update_columns=["a", "n"])
    got = {r.id: (r.a, r.b, r.n) for r in t.read().collect()}
    assert got[2] == ("A2", "b2", 999)      # b kept its CURRENT value
    assert got[50] == ("A50", "B50", 500)   # insert carries everything
    assert got[3] == ("a3", "b3", 30)       # untouched row untouched


def test_partial_update_merge_mor(spark, tmp_path):
    from pyspark.sql import Row

    from datalake_iceberg_spark.tables import LakeCatalog

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    t = _pmk(catalog, spark, "db.pum")
    batch = spark.createDataFrame([
        Row(id=1, a="A1", b="IGNORED", n=111),
        Row(id=60, a="A60", b="B60", n=600),
    ])
    t.merge(batch, update_columns=["a", "n"], mode="merge-on-read")
    got = {r.id: (r.a, r.b, r.n) for r in t.read().collect()}
    assert got[1] == ("A1", "b1", 111)
    assert got[60] == ("A60", "B60", 600)
    # folding the delete era preserves the partial-update result
    t.rewrite_position_delete_files()
    assert {r.id: (r.a, r.b, r.n) for r in t.read().collect()} == got


def test_partial_update_guards(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    from datalake_iceberg_spark.tables import LakeCatalog

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    t = _pmk(catalog, spark, "db.pg")
    batch = spark.createDataFrame([Row(id=1, a="x", b="y", n=1)])
    with pytest.raises(ValueError, match="key columns"):
        t.merge(batch, update_columns=["id", "a"])
    with pytest.raises(ValueError, match="not in table schema"):
        t.merge(batch, update_columns=["nope"])


def test_partial_update_all_nonkey_equals_full_merge(spark, tmp_path):
    from pyspark.sql import Row

    from datalake_iceberg_spark.tables import LakeCatalog

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    t1 = _pmk(catalog, spark, "db.pe1")
    t2 = _pmk(catalog, spark, "db.pe2")
    batch = spark.createDataFrame([
        Row(id=3, a="A3", b="B3", n=333),
        Row(id=70, a="A70", b="B70", n=700),
    ])
    t1.merge(batch)
    t2.merge(batch, update_columns=["a", "b", "n"])
    assert {tuple(r) for r in t1.read().collect()} == \
           {tuple(r) for r in t2.read().collect()}
