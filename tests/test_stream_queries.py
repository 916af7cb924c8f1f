"""Streaming drain queries — fixture-shape tolerance.

The batch reader accepts both a single parquet file and the
directory-shaped dataset Spark itself writes; the staged streaming
source must accept the same (round-3 ADVICE: shutil.copy threw
IsADirectoryError on directory fixtures).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import stream_queries
from datalake_iceberg_spark.queries.analytics import load_events


def test_stream_accepts_directory_shaped_events(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    dest = tmp_path / "sfdir"
    dest.mkdir()
    src.write.parquet(str(dest / "events.parquet"))

    out = stream_queries.stream_dedup_count(spark, str(dest)).collect()
    got = {r["event_type"]: r["n_unique"] for r in out}

    expect = {
        r["event_type"]: r["n"]
        for r in load_events(spark, str(dest))
        .groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    assert got == expect
