"""Raw landing zone: stream/batch → time-partitioned Parquet → promote.

Rebuilds the reference's ``src/kafka_to_s3.py`` landing path and the
``src/parquet_to_iceberg.py`` promotion:

- ``with_time_partitions`` — derive ``year=/month=/day=[/hour=]`` Hive
  partition columns from the event timestamp (``kafka_to_s3.py:86-95``).
  Zero-padded strings so directory ordering is lexicographic.
- ``write_raw_partitioned`` — append-mode partitioned Parquet (W8).
- ``land_stream`` — Structured Streaming ``foreachBatch`` landing (W10):
  each micro-batch is appended under its event-time partitions with a
  per-source checkpoint (exactly-once file landing).
- ``read_raw`` — ``recursiveFileLookup`` scan of the landing dir (S9).
- ``promote_raw`` — landing dir → cleanse → UTC-normalize →
  ``update_ts_dms``→``last_applied_date`` rename → surrogate key → RTAS
  (``parquet_to_iceberg.py:73-142``).

Scale notes: partitionBy on low-cardinality time columns gives
partition pruning for time-ranged reads at 100 TB; writers shuffle
nothing (dynamic partition write). Promotion is a full-table rewrite by
design (snapshot semantics) — for incremental promotion use the CDC
path instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_iceberg_spark.ingest.batch import prepare_snapshot
from datalake_iceberg_spark.functions.keys import SURROGATE_KEY_COL
from datalake_iceberg_spark.tables import LakeCatalog, LakeTable

TIME_PARTS = ("year", "month", "day", "hour")
DMS_TS_COL = "update_ts_dms"


def with_time_partitions(
    df: DataFrame, ts_col: str = "timestamp", granularity: str = "day"
) -> DataFrame:
    """Derive Hive time-partition columns from ``ts_col``."""
    n = {"day": 3, "hour": 4}[granularity]
    fmts = {"year": "yyyy", "month": "MM", "day": "dd", "hour": "HH"}
    out = df
    for part in TIME_PARTS[:n]:
        out = out.withColumn(part, F.date_format(F.col(ts_col), fmts[part]))
    return out


RAW_FORMATS = ("parquet", "json", "csv", "orc")


def write_raw_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    granularity: str = "day",
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Partitioned landing write. ``fmt`` ∈ RAW_FORMATS: parquet is the
    promotion default; json/csv cover interchange drops from systems
    that can't emit parquet; orc for ecosystems standardized on it. All
    four ride the same dynamic-partition writer (no shuffle)."""
    if fmt not in RAW_FORMATS:
        raise ValueError(f"fmt must be one of {RAW_FORMATS}, got {fmt!r}")
    writer = (
        with_time_partitions(df, ts_col, granularity)
        .write.format(fmt)
        .partitionBy(*list(TIME_PARTS[: {"day": 3, "hour": 4}[granularity]]))
        .mode(mode)
    )
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def land_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "timestamp",
    granularity: str = "day",
    available_now: bool = True,
    processing_time: str | None = None,
):
    """foreachBatch landing writer (``kafka_to_s3.py:124-155``)."""

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_raw_partitioned(batch_df, path, ts_col, granularity)

    writer = (
        stream_df.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_raw(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Landing scan (S9). Partition columns come back from the Hive
    layout in every format; csv/json readers take an explicit
    ``schema`` to avoid a schema-inference pass over the whole landing
    zone (mandatory at scale — inference reads every file twice)."""
    if fmt not in RAW_FORMATS:
        raise ValueError(f"fmt must be one of {RAW_FORMATS}, got {fmt!r}")
    reader = spark.read.option("recursiveFileLookup", "false")
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)


def promote_raw(
    catalog: LakeCatalog,
    table_name: str,
    spark: SparkSession,
    path: str,
    primary_key: list[str],
    n_buckets: int | None = None,
) -> LakeTable:
    """Landing dir → lake table snapshot (``parquet_to_iceberg.py``)."""
    df = read_raw(spark, path).drop(*TIME_PARTS)
    rename = {DMS_TS_COL: "last_applied_date"} if DMS_TS_COL in df.columns else None
    prepared = prepare_snapshot(df, primary_key, rename_map=rename, utc_normalize=True)
    return catalog.create_or_replace(
        table_name, prepared, key=[SURROGATE_KEY_COL], n_buckets=n_buckets
    )
