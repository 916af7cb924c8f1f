"""Raw landing zone: partitioned layout, streaming landing, promote."""

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from datalake_iceberg_spark.ingest import landing
from datalake_iceberg_spark.tables import LakeCatalog


def _events(spark, n=20):
    rows = [
        (i, f"u{i % 3}", datetime(2024, 1, 1 + (i % 3), 5 + (i % 2), 0, tzinfo=timezone.utc))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_id long, user string, timestamp timestamp")


def test_partitioned_layout_day(spark, tmp_path):
    path = str(tmp_path / "raw")
    landing.write_raw_partitioned(_events(spark), path, granularity="day")
    assert os.path.isdir(f"{path}/year=2024/month=01/day=01")
    assert os.path.isdir(f"{path}/year=2024/month=01/day=03")
    back = landing.read_raw(spark, path)
    assert back.count() == 20
    # partition pruning: a day filter must prune to one directory
    pruned = back.filter((F.col("day") == "02") & (F.col("month") == "01"))
    assert pruned.count() == 7


def test_partitioned_layout_hour(spark, tmp_path):
    path = str(tmp_path / "rawh")
    landing.write_raw_partitioned(_events(spark), path, granularity="hour")
    assert os.path.isdir(f"{path}/year=2024/month=01/day=01/hour=05")


def test_land_stream_availablenow(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    _events(spark).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id long, user string, timestamp timestamp"
    ).parquet(src_dir)
    q = landing.land_stream(
        stream,
        str(tmp_path / "landed"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = landing.read_raw(spark, str(tmp_path / "landed"))
    assert out.count() == 20
    # re-run with same checkpoint: no duplicate landing (exactly-once)
    stream2 = spark.readStream.schema(
        "event_id long, user string, timestamp timestamp"
    ).parquet(src_dir)
    q2 = landing.land_stream(
        stream2, str(tmp_path / "landed"), checkpoint=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert landing.read_raw(spark, str(tmp_path / "landed")).count() == 20


def test_promote_raw_keeps_dms_timestamp(spark, tmp_path):
    path = str(tmp_path / "raw2")
    df = _events(spark).withColumn(
        "update_ts_dms", F.col("timestamp") + F.expr("INTERVAL 1 HOUR")
    )
    landing.write_raw_partitioned(df, path)
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    t = landing.promote_raw(cat, "db.events_promoted", spark, path, ["event_id"])
    out = t.read()
    assert out.count() == 20
    assert "last_applied_date" in out.columns and "update_ts_dms" not in out.columns
    assert "id_iceberg" in out.columns
    # audit col is the renamed DMS ts (ts + 1h), not the load time
    r = out.filter(F.col("event_id") == 0).first()
    assert r.last_applied_date == datetime(2024, 1, 1, 6, 0)
    # time partition helper columns do not leak into the lake table
    assert not set(landing.TIME_PARTS) & set(out.columns)


def test_landing_formats_roundtrip(spark, tmp_path):
    """json/csv/orc landing writes partition identically to parquet and
    read back with explicit schemas (no inference pass)."""
    from datalake_iceberg_spark.ingest.landing import read_raw, write_raw_partitioned

    df = spark.createDataFrame(
        [(1, "a", "2024-03-05 10:00:00"), (2, "b", "2024-03-06 11:00:00")],
        "id long, v string, timestamp string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    for fmt in ("json", "csv", "orc"):
        path = str(tmp_path / f"land_{fmt}")
        write_raw_partitioned(df, path, fmt=fmt)
        schema = (
            "id long, v string, timestamp timestamp, "
            "year string, month string, day string"
        )
        back = read_raw(spark, path, fmt=fmt, schema=schema)
        assert back.count() == 2
        assert {r["day"] for r in back.select("day").collect()} == {"05", "06"}
        assert {r["id"] for r in back.select("id").collect()} == {1, 2}


def test_landing_format_validation(spark, tmp_path):
    import pytest as _pytest

    from datalake_iceberg_spark.ingest.landing import read_raw, write_raw_partitioned

    df = spark.range(1).withColumn("timestamp", F.current_timestamp())
    with _pytest.raises(ValueError, match="fmt must be one of"):
        write_raw_partitioned(df, str(tmp_path / "x"), fmt="avro")
    with _pytest.raises(ValueError, match="fmt must be one of"):
        read_raw(spark, str(tmp_path / "x"), fmt="xml")
