"""Source-vs-lake schema drift report — the reference's
``schema_validate.py`` job: compare a source schema (live
INFORMATION_SCHEMA when database settings are present, or an offline
``--columns-json`` spec of ``[name, db_type, nullable]`` rows) against
the lake table's current schema; non-zero exit on drift so schedulers
alert.
"""

from __future__ import annotations

import json

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)
from datalake_iceberg_spark.ops.schema_validate import (
    source_columns_to_schema,
    validate_schema,
)


def build_parser():
    p = base_parser("source vs lake schema drift report")
    p.add_argument("--table", required=True, help="lake table name")
    p.add_argument("--primary-key", nargs="+", default=None)
    p.add_argument("--dialect", default="mysql")
    p.add_argument("--columns-json", default=None,
                   help="offline source spec: JSON [[name, db_type, nullable], ...]")
    p.add_argument("--no-nullability", action="store_true")
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(f"schema_validate:{args.table}", settings, spark)
    catalog = get_catalog(spark, settings)
    if args.columns_json:
        cols = [tuple(c) for c in json.loads(open(args.columns_json).read())]
    else:
        raise SystemExit(
            "live INFORMATION_SCHEMA probing needs database settings and a "
            "deployed JDBC driver; pass --columns-json for the offline path"
        )
    source = source_columns_to_schema(cols, dialect=args.dialect)
    target = catalog.table(args.table).schema()
    diff = validate_schema(
        source, target, primary_key=args.primary_key,
        check_nullability=not args.no_nullability,
    )
    if diff.issues:
        for issue in diff.issues:
            print(f"DRIFT: {issue}")
        return 1
    print(f"{args.table}: schema in sync ({len(target.fields)} cols)")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
