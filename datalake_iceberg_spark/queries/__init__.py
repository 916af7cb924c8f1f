"""Query surface: each module exposes ``(spark, sf_dir) -> DataFrame``
callables plus matching DuckDB oracle SQL, registered in
``__spark_entry__.py`` for the driver's correctness gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_balanced(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load`` + scan-parallelism floor for compute-heavy per-row work
    (shingle md5, embedding dot products, decode UDFs).

    A small table often arrives as ONE parquet split (single file, single
    row group), so everything before the first shuffle runs on one core —
    at sf0.1 the 600 KB ``documents`` scan serializes ~1 M downstream md5
    evaluations. When the scan yields fewer than half the cluster's slots
    we round-robin repartition up to the default parallelism: the shuffle
    moves only the small scan output, then the expensive expressions run
    wide. At production scale the scan already yields >= cluster-slots
    splits and this is a no-op — the probe keeps big scans shuffle-free.
    """
    df = load(spark, sf_dir, name)
    try:
        current = df.rdd.getNumPartitions()
        target = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no RDD probe; leave the scan as-is
        return df
    if current < max(2, target // 2):
        return df.repartition(target)
    return df
