"""Watermark-ledger retention job — the reference's
``watermark_maintenance.sh`` driver: purge the CDC and maintenance
progress ledgers down to the newest record per key older than the
retention window.
"""

from __future__ import annotations

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)
from datalake_iceberg_spark.ops.watermark import WatermarkStore


def build_parser():
    p = base_parser("watermark ledger retention purge")
    p.add_argument("--retention-days", type=int, default=14)
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session("watermark_maintenance", settings, spark)
    catalog = get_catalog(spark, settings)
    store = WatermarkStore(catalog)
    store.ensure_tables()
    n_cdc = store.purge_cdc(retention_days=args.retention_days)
    n_m = store.purge_maintenance(retention_days=args.retention_days)
    print(f"purged cdc={n_cdc} maintenance={n_m} (>{args.retention_days}d)")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
