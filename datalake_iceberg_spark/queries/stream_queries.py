"""Driver-gradeable Structured Streaming queries.

Each function drains a STREAM (``readStream`` file source over the
TESTDATA parquet, ``availableNow`` trigger) through real streaming
operators — watermark + tumbling window — into a memory sink, then
returns the drained result as a batch DataFrame. Because event-time
windowing is deterministic, the result is value-identical to the batch
formulation, so the DuckDB oracle grades the STREAMING path exactly —
stream/batch parity as a first-class correctness check, not just a
unit test.

Scale notes: the same plan runs unbounded — the file source becomes
Kafka (option swap, see ``streaming/runner.py``), ``availableNow``
becomes a processing-time trigger, and the memory sink becomes
``foreachBatch`` → ``LakeTable.merge``. Watermarked window state is
O(active windows × keys), GC'd as the watermark advances; the memory
sink here is bench-only (a real deployment never collects to the
driver).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stream_events(spark: SparkSession, sf_dir: str):
    """File-source stream over the events table with the same
    type-adaptive ts decode as the batch ``load_events``. Spark's file
    source requires a DIRECTORY, so the single TESTDATA parquet is
    staged (copied) into a temp dir — in production the directory is
    the landing zone / Kafka topic and nothing is staged."""
    from datalake_iceberg_spark.queries.analytics import load_events

    # batch read first: resolves the on-disk ts encoding (and, for a
    # legacy int64-nanos fixture, sets the session conf the file source
    # needs before schema inference)
    load_events(spark, sf_dir)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = tempfile.mkdtemp(prefix="stream_events_src_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), stage)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    ts_type = raw_schema["ts"].dataType.typeName()
    if ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.to_timestamp_ltz("ts"))
    elif ts_type in ("long", "bigint"):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup computed BY THE STREAMING ENGINE: file-source
    stream → type-adaptive ts decode → 1-hour tumbling window with
    watermark → availableNow drain → memory sink. Output matches the
    batch/oracle rollup bit-for-bit (sums ride in exact integer cents).
    """
    from datalake_iceberg_spark.queries.analytics import cents
    from datalake_iceberg_spark.streaming.event_time import windowed_aggregate

    stream = _stream_events(spark, sf_dir)
    agg = windowed_aggregate(
        stream,
        "ts",
        window_duration="1 hour",
        watermark="1 minute",
        keys=["event_type"],
        aggs=[F.sum(cents("value")).alias("sum_value_c")],
    )
    sink = f"stream_hourly_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_stream_q_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            (F.col("sum_value_c").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


STREAM_HOURLY_ROLLUP_SQL = """
WITH events_us AS (
  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
         user_id, event_type, value, props
  FROM events
)
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events_us GROUP BY 1, 2 ORDER BY 1, 2
"""


def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup parity check: drain the events stream
    through ``dropDuplicatesWithinWatermark`` on the event key and
    count survivors per event_type — matches batch COUNT(DISTINCT).
    State is watermark-bounded; at scale this is the streaming
    ingest-dedup front door."""
    from datalake_iceberg_spark.streaming.event_time import dedup_within_watermark

    stream = _stream_events(spark, sf_dir)
    deduped = dedup_within_watermark(stream, ["event_id"], "ts", watermark="1 minute")
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_stream_q_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select("event_type", "n_unique").orderBy("event_type")


STREAM_DEDUP_COUNT_SQL = """
SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
FROM events GROUP BY event_type ORDER BY event_type
"""
