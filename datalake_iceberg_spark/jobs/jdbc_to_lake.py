"""JDBC table → lake snapshot (RTAS) — the reference's
``mysql_to_iceberg.py`` / ``sqlserver_to_iceberg.py`` job.

Same argument vocabulary (``--service --table --num-partition
--env-file``) and the same flow: read the source table (partitioned
parallel scan when ``--num-partition`` > 1 and a partition column is
discoverable), cleanse/audit/surrogate-key it, and replace the lake
table atomically. ``--input-parquet`` is the offline source seam for
environments with no live database (test/CI): the prepare+RTAS path is
identical; only the reader swaps.

The session carries the reference's ``SimplifyCasts`` exclusion
(``mysql_to_iceberg.py:107``) so explicit type-coercion casts on the
JDBC read survive optimization.
"""

from __future__ import annotations

from datalake_iceberg_spark.ingest.batch import snapshot_to_table
from datalake_iceberg_spark.ingest.jdbc import JdbcSource, read_jdbc_table
from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)


def build_parser():
    p = base_parser("JDBC table -> lake snapshot (RTAS)")
    p.add_argument("--service", required=True, type=str.lower,
                   help="service identifier (schema prefix)")
    p.add_argument("--table", required=True, help="db.table_name")
    p.add_argument("--num-partition", type=int, default=1)
    p.add_argument("--primary-key", nargs="+", required=True)
    p.add_argument("--n-buckets", type=int, default=None)
    p.add_argument("--partition-column", default=None,
                   help="numeric column for the partitioned scan")
    p.add_argument("--input-parquet", default=None,
                   help="offline source seam: read this parquet instead of JDBC")
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(
        f"jdbc_to_lake:{args.table}", settings, spark,
        preserve_explicit_casts=True,
    )
    if args.input_parquet:
        df = spark.read.parquet(args.input_parquet)
    else:
        database, _, table = args.table.rpartition(".")
        source = JdbcSource.from_settings(settings.database, database or args.service)
        bounds = None
        if args.partition_column and args.num_partition > 1:
            from datalake_iceberg_spark.ingest.jdbc import bounds_probe_sql

            reader = spark.read.format("jdbc")
            for k, v in source.base_options().items():
                reader = reader.option(k, v)
            row = reader.option(
                "query", bounds_probe_sql(args.partition_column, table)
            ).load().collect()[0]
            if row.lo is not None and row.hi is not None:
                bounds = (int(row.lo), int(row.hi))
        df = read_jdbc_table(
            spark, source, table,
            partition_column=args.partition_column,
            bounds=bounds,
            num_partitions=args.num_partition,
        )
    catalog = get_catalog(spark, settings)
    t = snapshot_to_table(
        catalog, f"{args.service}.{args.table.rpartition('.')[2]}",
        df, args.primary_key, n_buckets=args.n_buckets,
    )
    print(f"loaded {t.location} v{t.current_version()} rows={t.read().count()}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
