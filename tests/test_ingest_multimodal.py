"""JDBC type mapping (F7 matrix), batch snapshot ingest, schema
validation, and multimodal plumbing."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_iceberg_spark.ingest.batch import snapshot_to_table
from datalake_iceberg_spark.ingest.jdbc import (
    convert_db_type_to_spark,
    mysql_primary_key_sql,
    partition_options,
    range_predicates,
)
from datalake_iceberg_spark.ops.schema_validate import (
    source_columns_to_schema,
    validate_schema,
)
from datalake_iceberg_spark.queries.multimodal import (
    decode_assets,
    describe_assets,
    frame_sample_plan,
    synthetic_assets,
)
from datalake_iceberg_spark.tables import LakeCatalog


# ---- F7 type-mapping matrix (FIXTURES.md) ----
@pytest.mark.parametrize("db_type,dialect,expected", [
    ("decimal(10,2)", "mysql", T.DecimalType(10, 2)),
    ("decimal(6)", "mysql", T.DecimalType(6, 0)),
    ("numeric(12, 8)", "mysql", T.DecimalType(12, 8)),
    ("tinyint(1)", "mysql", T.BooleanType()),
    ("tinyint", "mysql", T.IntegerType()),
    ("int unsigned", "mysql", T.LongType()),
    ("bigint unsigned", "mysql", T.DecimalType(20, 0)),
    ("bigint", "mysql", T.LongType()),
    ("json", "mysql", T.StringType()),
    ("enum('a','b')", "mysql", T.StringType()),
    ("datetime(6)", "mysql", T.TimestampType()),
    ("time", "mysql", T.TimestampType()),
    ("mediumblob", "mysql", T.BinaryType()),
    ("completely_unknown", "mysql", T.StringType()),
    ("money", "mssql", T.DecimalType(19, 4)),
    ("smallmoney", "mssql", T.DecimalType(10, 4)),
    ("tinyint", "mssql", T.ByteType()),
    ("smallint", "mssql", T.ShortType()),
    ("time", "mssql", T.StringType()),
    ("uniqueidentifier", "mssql", T.StringType()),
    ("real", "mssql", T.FloatType()),
    ("float", "mssql", T.DoubleType()),
])
def test_type_mapping(db_type, dialect, expected):
    assert convert_db_type_to_spark(db_type, dialect) == expected


def test_partition_options_and_predicates():
    opts = partition_options("id", 1, 1000, 8)
    assert opts["numPartitions"] == "8" and opts["lowerBound"] == "1"
    preds = range_predicates(0, 100, 4, "id")
    assert len(preds) == 4
    assert "IS NULL" in preds[0]          # first partition catches nulls
    assert preds[-1].startswith("id >= ") # last partition unbounded above
    assert range_predicates(0, 100, 1, "id") == []  # single read fallback


def test_primary_key_sql_shape():
    sql = mysql_primary_key_sql("shop", "orders")
    assert "KEY_COLUMN_USAGE" in sql and "'shop'" in sql and "ORDINAL_POSITION" in sql


def test_snapshot_ingest(spark, tmp_path, sf_dir):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = snapshot_to_table(cat, "lake.orders", orders, ["o_orderkey"], n_buckets=4)
    df = t.read()
    assert df.count() == orders.count()
    assert "id_iceberg" in df.columns and "last_applied_date" in df.columns
    # surrogate key unique over PK
    assert df.select("id_iceberg").distinct().count() == orders.count()
    # re-snapshot replaces atomically
    t2 = snapshot_to_table(cat, "lake.orders", orders.limit(10), ["o_orderkey"])
    assert t2.read().count() == 10


def test_schema_validate_detects_drift():
    src = source_columns_to_schema(
        [("id", "int", False), ("name", "varchar(20)", True), ("amt", "decimal(10,2)", True)]
    )
    target_ok = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("amt", T.DecimalType(10, 2), True),
        T.StructField("id_iceberg", T.StringType(), True),
        T.StructField("last_applied_date", T.TimestampType(), True),
    ])
    assert validate_schema(src, target_ok, primary_key=["id"]).ok
    target_drift = T.StructType([
        T.StructField("id", T.LongType(), False),      # type drift
        T.StructField("name", T.StringType(), False),  # nullability drift
    ])
    diff = validate_schema(src, target_drift)
    assert not diff.ok
    assert any("type mismatch on id" in i for i in diff.issues)
    assert any("nullability mismatch on name" in i for i in diff.issues)
    assert any("missing in target: amt" in i for i in diff.issues)


def test_multimodal_decode_and_describe(spark):
    assets = synthetic_assets(spark, n=30)
    feats = decode_assets(assets, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # determinism: same payload -> same feature
    again = {r.asset_id: r.feature for r in decode_assets(assets, feature_dim=8).collect()}
    assert all(again[r.asset_id] == r.feature for r in rows)
    desc = describe_assets(assets)
    got = {r.modality: r.n_assets for r in desc.collect()}
    assert got == {"image": 10, "audio": 10, "video": 10}


def test_frame_sample_plan(spark):
    assets = synthetic_assets(spark, n=30)
    plan = frame_sample_plan(assets, every_ms=1000)
    rows = plan.collect()
    assert all(r.frame_ts_ms % 1000 == 0 for r in rows)
    per_asset = plan.groupBy("asset_id").count().collect()
    durations = {r.asset_id: r.meta.duration_ms for r in assets.filter("modality='video'").collect()}
    for r in per_asset:
        assert r["count"] == max(durations[r.asset_id] // 1000, 1)
