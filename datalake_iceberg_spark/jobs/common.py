"""Shared argparse + session plumbing for the job entry points.

Mirrors the reference's per-job boilerplate (``src/mysql_to_iceberg.py``
argparse block + ``utils.spark.create_spark_session(settings)``) once:
``--env-file`` feeds the Settings layer (env > file precedence, the
reference contract), the session comes from the engine factory, and an
injected ``spark`` short-circuits creation for tests and notebook use.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from datalake_iceberg_spark.session import create_spark_session
from datalake_iceberg_spark.settings import Settings
from datalake_iceberg_spark.tables import LakeCatalog


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--env-file", default=".env", help="settings env file")
    p.add_argument(
        "--warehouse", default=None,
        help="lake warehouse root (overrides STORAGE__WAREHOUSE)",
    )
    return p


def load_settings(args) -> Settings:
    s = Settings.load(env_file=args.env_file)
    if getattr(args, "warehouse", None):
        # warehouse is derived (bucket + data_path); a CLI override is a
        # direct local/posix path
        s.storage.bucket = ""
        s.storage.data_path = args.warehouse
    return s


def get_session(
    app_name: str, settings: Settings, spark: SparkSession | None = None,
    preserve_explicit_casts: bool = False,
) -> SparkSession:
    if spark is not None:
        return spark
    return create_spark_session(
        app_name=app_name,
        settings=settings,
        preserve_explicit_casts=preserve_explicit_casts,
    )


def get_catalog(spark: SparkSession, settings: Settings) -> LakeCatalog:
    wh = settings.WAREHOUSE
    if not wh:
        raise SystemExit(
            "no warehouse configured — set STORAGE__WAREHOUSE or pass --warehouse"
        )
    return LakeCatalog(spark, wh)
