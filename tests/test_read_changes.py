"""Incremental changes reader (LakeTable.read_changes) — Iceberg
incremental-scan / Delta CDF analogue.

Covers: the append-only fast path (new dirs only, all 'insert'), the
keyed general path (insert / update_postimage / delete classification,
deletes carrying the pre-image), empty ranges, and validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = cat.create_or_replace("cdc.orders", orders, key=["o_orderkey"], n_buckets=8)
    return t, orders


def test_append_only_fast_path(table, spark, sf_dir):
    t, orders = table
    v0 = t.current_version()
    extra1 = orders.limit(30).withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    extra2 = orders.limit(20).withColumn("o_orderkey", F.col("o_orderkey") + 20_000_000)
    t.append(extra1)
    t.append(extra2)
    ch = t.read_changes(v0)
    assert ch.count() == 50
    assert ch.select("_change_type").distinct().collect()[0][0] == "insert"
    # only the appended keys appear
    keys = {r[0] for r in ch.select("o_orderkey").collect()}
    assert all(k >= 10_000_000 for k in keys)


def test_keyed_diff_classifies_all_three(table):
    t, orders = table
    v0 = t.current_version()
    upd = orders.limit(10).withColumn("o_orderstatus", F.lit("Z"))
    t.merge(upd)
    t.delete_keys(orders.select("o_orderkey").orderBy(F.desc("o_orderkey")).limit(5))
    ch = t.read_changes(v0)
    by_type = {r["_change_type"]: r["n"] for r in
               ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type.get("update_postimage", 0) == 10
    assert by_type.get("delete", 0) == 5
    assert by_type.get("insert", 0) == 0
    # updates carry the post-image
    upd_rows = ch.filter(F.col("_change_type") == "update_postimage")
    assert upd_rows.filter(F.col("o_orderstatus") != "Z").count() == 0
    # deletes carry the pre-image (real column values, not nulls)
    del_rows = ch.filter(F.col("_change_type") == "delete")
    assert del_rows.filter(F.col("o_totalprice").isNull()).count() == 0


def test_empty_range_and_same_version(table):
    t, _ = table
    v = t.current_version()
    ch = t.read_changes(v, v)
    assert ch.count() == 0
    assert "_change_type" in ch.columns


def test_insert_via_merge_classified(table):
    t, orders = table
    v0 = t.current_version()
    new_rows = orders.limit(7).withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
    t.merge(new_rows)
    ch = t.read_changes(v0)
    by_type = {r["_change_type"]: r["n"] for r in
               ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"insert": 7}


def test_update_between_sentinel_and_null_classified(table):
    """A value update where either side is NULL (or a string equal to a
    would-be sentinel) must classify as update_postimage — the row hash
    carries NULL-ness as an explicit flag, not a sentinel string."""
    t, orders = table
    one = orders.orderBy("o_orderkey").limit(1)
    t.merge(one.withColumn("o_orderpriority", F.lit("\x00null")))
    v0 = t.current_version()
    t.merge(one.withColumn("o_orderpriority", F.lit(None).cast("string")))
    ch = t.read_changes(v0)
    rows = ch.collect()
    assert len(rows) == 1
    assert rows[0]["_change_type"] == "update_postimage"
    assert rows[0]["o_orderpriority"] is None
    # and the reverse direction: NULL -> sentinel-looking string
    v1 = t.current_version()
    t.merge(one.withColumn("o_orderpriority", F.lit("\x00null")))
    ch2 = t.read_changes(v1).collect()
    assert len(ch2) == 1
    assert ch2[0]["_change_type"] == "update_postimage"
    assert ch2[0]["o_orderpriority"] == "\x00null"


def test_keyed_diff_prunes_unchanged_buckets(table):
    """The general path must read only buckets whose dir/delete lists
    differ between the endpoints — diff cost ∝ changed buckets."""
    t, orders = table
    v0 = t.current_version()
    upd = orders.limit(3).withColumn("o_orderstatus", F.lit("Q"))
    t.merge(upd)
    calls = []
    real = t.read_buckets

    def spy(bucket_ids, version=None):
        calls.append(list(bucket_ids))
        return real(bucket_ids, version)

    t.read_buckets = spy
    try:
        ch = t.read_changes(v0)
        by_type = {r["_change_type"]: r["n"] for r in
                   ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    finally:
        t.read_buckets = real
    assert by_type == {"update_postimage": 3}
    # both endpoint reads requested the same ≤3 touched buckets (of 8)
    assert len(calls) == 2
    assert calls[0] == calls[1] and 1 <= len(calls[0]) <= 3


def test_validation(table):
    t, _ = table
    with pytest.raises(ValueError):
        t.read_changes(5, 1)


def test_keyed_diff_across_compaction_yields_no_changes(table):
    """Compaction re-points dirs without changing rows: the pruned diff
    re-reads those buckets and must classify nothing."""
    t, _ = table
    v0 = t.current_version()
    t.rewrite_data_files(min_input_dirs=1)
    assert t.current_version() > v0  # compaction actually committed
    assert t.read_changes(v0).count() == 0


def test_keyed_diff_mixed_merge_and_compaction(table):
    """A range holding a merge AND a compaction surfaces exactly the
    merged rows."""
    t, orders = table
    v0 = t.current_version()
    t.merge(orders.limit(4).withColumn("o_orderstatus", F.lit("Y")))
    t.rewrite_data_files(min_input_dirs=1)
    ch = t.read_changes(v0)
    rows = ch.collect()
    assert len(rows) == 4
    assert all(r["_change_type"] == "update_postimage" for r in rows)


def test_partial_merge_changes_carry_current_columns(table, spark):
    """CDC-out over a partial-column MERGE commit (r11): the diff's
    update_postimage rows must show the MERGED row — updated columns
    from the batch, every other column at its pre-merge CURRENT value —
    and a batch key absent from the table surfaces as a plain insert
    with all batch columns. Downstream incremental consumers see
    exactly what a reader of the table sees."""
    t, orders = table
    v0 = t.current_version()
    keys = [r.o_orderkey for r in orders.select("o_orderkey").limit(3).collect()]
    pre = {
        r.o_orderkey: (r.o_custkey, r.o_orderpriority)
        for r in t.read().filter(F.col("o_orderkey").isin(keys)).collect()
    }
    batch = (
        orders.filter(F.col("o_orderkey").isin(keys))
        .withColumn("o_custkey", F.col("o_custkey") + 5_000_000)  # NOT updated
        .withColumn("o_orderpriority", F.lit("PARTIAL"))           # updated
    )
    new_key = 77_000_000
    insert = batch.limit(1).withColumn("o_orderkey", F.lit(new_key))
    t.merge(batch.unionByName(insert), update_columns=["o_orderpriority"])

    ch = {r.o_orderkey: r for r in t.read_changes(v0).collect()}
    for k in keys:
        r = ch[k]
        assert r._change_type == "update_postimage"
        assert r.o_orderpriority == "PARTIAL"          # from the batch
        assert r.o_custkey == pre[k][0]                # current, NOT +5M
    r = ch[new_key]
    assert r._change_type == "insert"
    assert r.o_orderpriority == "PARTIAL"
    assert r.o_custkey >= 5_000_000                    # insert takes ALL batch cols


def test_read_changes_over_update_where_mor(spark, tmp_path):
    """CDC diff across a merge-on-read predicate UPDATE: the updated
    keys surface with their POST-update images, untouched keys are
    absent."""
    from pyspark.sql import Row

    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    t = cat.create_or_replace(
        "db.uwmor_cdc",
        spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(40)]),
        key=["id"], n_buckets=2,
    )
    v0 = t.current_version()
    t.update_where([("id", ">=", 30)], {"v": "'upd'"}, mode="merge-on-read")
    changes = {(r.id, r.v, r._change_type) for r in t.read_changes(v0).collect()}
    want = {(i, "upd", "update_postimage") for i in range(30, 40)} | {
        (i, f"v{i}", "update_preimage") for i in range(30, 40)
    }
    # accept either pre+post or post-only shapes, but post-images must
    # be exactly the updated keys with updated values
    posts = {c for c in changes if c[2] != "update_preimage"}
    assert {(i, v) for i, v, _ in posts} == {(i, "upd") for i in range(30, 40)}, (
        changes, want,
    )
