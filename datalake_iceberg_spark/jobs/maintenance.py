"""Table maintenance job — the reference's ``iceberg_maintenance.py``:
compaction / MoR-delete fold / snapshot expiry / orphan cleanup per
table, through the recorded never-raise service, either on the fixed
interval gates (``run_all``) or advisor-driven (``--advised``: only the
procedures the metadata says are due). Also rolls forward interrupted
multi-table transactions and reclaims leaked reserved manifests first
(crash hygiene belongs to the maintenance window).
"""

from __future__ import annotations

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)
from datalake_iceberg_spark.ops.maintenance import MaintenanceService, run_advised
from datalake_iceberg_spark.ops.watermark import WatermarkStore


def build_parser():
    p = base_parser("lake table maintenance")
    p.add_argument("--tables", nargs="+", default=None,
                   help="tables to maintain (default: every catalog table)")
    p.add_argument("--schema", default="default")
    p.add_argument("--advised", action="store_true",
                   help="run only the advisor-recommended procedures")
    p.add_argument("--skip-recovery", action="store_true")
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session("maintenance", settings, spark)
    catalog = get_catalog(spark, settings)
    if not args.skip_recovery:
        recovered = catalog.recover_transactions()
        unresolved = [r for r in recovered if r.get("unresolved")]
        if recovered:
            print(f"recovered {len(recovered)} txn record(s), "
                  f"{len(unresolved)} unresolved")
    store = WatermarkStore(catalog)
    store.ensure_tables()
    svc = MaintenanceService(catalog, store)
    rc = 0
    if args.advised:
        tables = args.tables or catalog.list_tables(args.schema)
        for name in tables:
            results = run_advised(svc, name)
            print(f"{name}: {results}")
            if any(r.get("run") == "failed" for r in results):
                rc = 1
    else:
        results = svc.run_all(args.schema)
        for name, rec in results.items():
            print(f"{name}: {rec}")
            if rec.get("status") == "failed":
                rc = 1
    return rc


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
