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
