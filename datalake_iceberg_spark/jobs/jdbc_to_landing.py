"""JDBC table → time-partitioned parquet landing — the reference's
``mysql_to_parquet.py`` / ``sqlserver_to_parquet.py`` job.

Reads the source table (same reader as ``jdbc_to_lake``; offline seam
via ``--input-parquet``) and lands it under ``--output`` with
``year=/month=/day=[/hour=]`` partitions derived from ``--ts-col`` —
the raw zone a later ``landing_to_lake`` promotes.
"""

from __future__ import annotations

from datalake_iceberg_spark.ingest.jdbc import JdbcSource, read_jdbc_table
from datalake_iceberg_spark.ingest.landing import write_raw_partitioned
from datalake_iceberg_spark.jobs.common import base_parser, get_session, load_settings


def build_parser():
    p = base_parser("JDBC table -> partitioned parquet landing")
    p.add_argument("--service", required=True, type=str.lower)
    p.add_argument("--table", required=True)
    p.add_argument("--num-partition", type=int, default=1)
    p.add_argument("--output", required=True, help="landing directory")
    p.add_argument("--ts-col", default="timestamp")
    p.add_argument("--granularity", choices=["day", "hour"], default="day")
    p.add_argument("--mode", choices=["append", "overwrite"], default="append")
    p.add_argument("--fmt", default="parquet")
    p.add_argument("--input-parquet", default=None)
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(
        f"jdbc_to_landing:{args.table}", settings, spark,
        preserve_explicit_casts=True,
    )
    if args.input_parquet:
        df = spark.read.parquet(args.input_parquet)
    else:
        database, _, table = args.table.rpartition(".")
        source = JdbcSource.from_settings(settings.database, database or args.service)
        df = read_jdbc_table(spark, source, table, num_partitions=args.num_partition)
    write_raw_partitioned(
        df, args.output, ts_col=args.ts_col,
        granularity=args.granularity, mode=args.mode, fmt=args.fmt,
    )
    print(f"landed {args.table} -> {args.output}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
