"""SparkSession factory.

Mirrors the reference's session bootstrap (``src/utils/spark.py:18-83``):
UTC session timezone, case-sensitive identifiers (the reference ingests
``tb_lower`` / ``TB_UPPER`` as distinct tables), and performance pins.
Instead of Iceberg catalog extensions (unavailable here) the engine uses
:mod:`datalake_iceberg_spark.tables` for snapshot/DML semantics.

Scale notes
-----------
- ``spark.sql.adaptive.enabled`` (AQE) is left ON: runtime coalescing,
  skew-join splitting and dynamic join selection are exactly what a
  1000-executor run needs; nothing in the engine depends on a fixed
  partition count.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on
  a real cluster AQE coalesces from a higher initial number, so callers
  should override via ``extra_conf`` at submit time.
- Arrow is enabled for the Pandas-UDF slow path (text/vector ops).
- The reference excludes the ``SimplifyCasts`` optimizer rule on its
  JDBC batch paths (``src/mysql_to_iceberg.py:107``) so explicit
  type-coercion casts survive; we carry the same pin behind a flag.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

SIMPLIFY_CASTS_RULE = "org.apache.spark.sql.catalyst.optimizer.SimplifyCasts"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def create_spark_session(
    app_name: str = "datalake_iceberg_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    preserve_explicit_casts: bool = False,
    extra_conf: dict[str, str] | None = None,
    settings=None,
) -> SparkSession:
    """Create (or fetch) the engine SparkSession.

    ``preserve_explicit_casts=True`` replicates the reference's
    ``SimplifyCasts`` exclusion — required when ingesting JDBC-shaped
    data whose cast chains must not be elided as redundant.

    ``settings`` (a :class:`datalake_iceberg_spark.settings.Settings`)
    supplies cpu count / driver memory when given, so a deployment is
    constructible from env alone (reference settings-layer parity).
    """
    cores = (settings.cpus if settings and settings.cpus else None) or default_parallelism()
    driver_mem = (
        settings.driver_memory if settings else os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.caseSensitive", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # INT96 timestamps (the legacy default) carry no footer min/max,
        # which defeats data skipping; micros is the modern parquet type
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.rdd.compress", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_mem)
    )
    if preserve_explicit_casts:
        builder = builder.config("spark.sql.optimizer.excludedRules", SIMPLIFY_CASTS_RULE)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
