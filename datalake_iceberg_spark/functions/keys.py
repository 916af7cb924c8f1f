"""Key derivation & cleansing projections.

Reference parity:
- ``surrogate_key``: ``id_iceberg = md5(concat_ws('|', pk...))`` —
  ``src/utils/cdc_pipeline.py:171-174`` (CDC) and
  ``src/mysql_to_iceberg.py:60`` (batch).
- ``trim_string_columns``: CHAR-padding cleanse over every StringType
  column — ``src/utils/iceberg.py:17-29``.
- ``normalize_timestamps_utc``: UTC normalize TimestampType columns —
  ``src/parquet_to_iceberg.py:26-35``.
- ``with_audit_columns``: ``last_applied_date`` audit timestamp —
  ``src/mysql_to_iceberg.py:57`` / ``src/utils/cdc_pipeline.py:179``.

All are single ``select`` projections of JVM built-ins: they stay inside
whole-stage codegen and add no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SURROGATE_KEY_COL = "id_iceberg"
AUDIT_COL = "last_applied_date"


def surrogate_key_expr(key_cols: list[str | Column]) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))


def surrogate_key(df: DataFrame, key_cols: list[str], out: str = SURROGATE_KEY_COL) -> DataFrame:
    return df.withColumn(out, surrogate_key_expr(key_cols))


def trim_string_columns(df: DataFrame) -> DataFrame:
    return df.select(
        [
            F.trim(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def normalize_timestamps_utc(df: DataFrame) -> DataFrame:
    return df.select(
        [
            F.to_utc_timestamp(F.col(f.name), "UTC").alias(f.name)
            if isinstance(f.dataType, T.TimestampType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def with_audit_columns(df: DataFrame, event_ts: Column | None = None) -> DataFrame:
    """Batch loads stamp load time; CDC stamps the source event time."""
    return df.withColumn(AUDIT_COL, event_ts if event_ts is not None else F.current_timestamp())
