"""Parquet landing zone → lake snapshot — the reference's
``parquet_to_iceberg.py`` job: read the raw partitioned drop, carry the
DMS timestamp through the audit rename, surrogate-key, RTAS.
"""

from __future__ import annotations

from datalake_iceberg_spark.ingest.landing import promote_raw
from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)


def build_parser():
    p = base_parser("parquet landing -> lake snapshot")
    p.add_argument("--service", required=True, type=str.lower)
    p.add_argument("--table", required=True, help="target table name")
    p.add_argument("--path", required=True, help="landing directory to promote")
    p.add_argument("--primary-key", nargs="+", required=True)
    p.add_argument("--n-buckets", type=int, default=None)
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(f"landing_to_lake:{args.table}", settings, spark)
    catalog = get_catalog(spark, settings)
    t = promote_raw(
        catalog, f"{args.service}.{args.table}", spark, args.path,
        args.primary_key, n_buckets=args.n_buckets,
    )
    print(f"promoted {args.path} -> {t.location} v{t.current_version()}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
