"""Batch snapshot ingestion: source DataFrame → cleanse → surrogate key →
replace-table-as-select.

The reference's ``mysql_to_iceberg.py`` / ``parquet_to_iceberg.py`` flow:
1. read source (JDBC partitioned scan or parquet dir)
2. ``trim_string_columns`` (CHAR padding, ``iceberg.py:17-29``)
3. ``last_applied_date`` audit stamp (``mysql_to_iceberg.py:57``)
4. ``id_iceberg = md5(concat_ws('|', pk...))`` (``mysql_to_iceberg.py:60``)
5. atomic RTAS into the lake (``iceberg.py:37-96``)

Correctness pin carried over: JDBC-shaped inputs must keep their
explicit cast chains (the reference disables the ``SimplifyCasts``
optimizer rule, ``mysql_to_iceberg.py:107``) — use
``create_spark_session(preserve_explicit_casts=True)`` on these paths.

The legacy-rename step of the parquet path
(``update_ts_dms`` → ``last_applied_date``, ``parquet_to_iceberg.py:79-82``)
is exposed via ``rename_map``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from datalake_iceberg_spark.functions.keys import (
    SURROGATE_KEY_COL,
    normalize_timestamps_utc,
    surrogate_key,
    trim_string_columns,
    with_audit_columns,
)
from datalake_iceberg_spark.tables import LakeCatalog, LakeTable


def prepare_snapshot(
    df: DataFrame,
    primary_key: list[str],
    rename_map: dict[str, str] | None = None,
    event_ts: Column | None = None,
    utc_normalize: bool = False,
) -> DataFrame:
    from datalake_iceberg_spark.functions.keys import AUDIT_COL

    for old, new in (rename_map or {}).items():
        df = df.withColumnRenamed(old, new)
    df = trim_string_columns(df)
    if utc_normalize:
        df = normalize_timestamps_utc(df)
    # The parquet-promote path carries the source's DMS timestamp through
    # the rename (parquet_to_iceberg.py:79-82) — don't stamp over it.
    if event_ts is not None or AUDIT_COL not in df.columns:
        df = with_audit_columns(df, event_ts)
    return surrogate_key(df, primary_key)


def snapshot_to_table(
    catalog: LakeCatalog,
    table_name: str,
    df: DataFrame,
    primary_key: list[str],
    n_buckets: int | None = None,
    rename_map: dict[str, str] | None = None,
) -> LakeTable:
    """Full-table snapshot load (RTAS). Bucketed by the surrogate key so
    subsequent CDC merges prune to affected buckets."""
    prepared = prepare_snapshot(df, primary_key, rename_map)
    return catalog.create_or_replace(
        table_name, prepared, key=[SURROGATE_KEY_COL], n_buckets=n_buckets
    )
