"""Catalog administration as a job CLI — the operator surface for the
catalog-level verbs that don't belong to any one pipeline: listing,
zero-copy clones, renames, drops, and the storage/GC accounting report.

Subcommands::

    catalog_admin list    [--schema default]
    catalog_admin storage [--schema default] [--json]
    catalog_admin stats   [--schema default | --table db.t] [--column c] [--json]
    catalog_admin clone   --table db.src --target db.dst
    catalog_admin rename  --table db.old --target db.new
    catalog_admin drop    --table db.t [--keep-data]
    catalog_admin purge    --table db.t --filters JSON [--mode cow|mor]
                           [--dry-run]
    catalog_admin backfill --table db.t --filters JSON --set JSON
                           [--mode cow|mor] [--dry-run]

``purge`` / ``backfill`` are the operator retention/repair verbs over
``delete_where`` / ``update_where``: ``--filters`` takes the scan
vocabulary as JSON — a conjunction (``[["ts","<","2024-01-01"]]``) or
a disjunction of conjunctions (``[[["src","=","a"]],
[["score","<",0.2]]]``) — with dir-level stats pruning in both modes;
``backfill --set`` is the assignments dict (string values are SQL
expressions, e.g. ``{"v": "upper(v)"}``). ``--dry-run`` prints the
scan_report plus the matched-row count WITHOUT committing (cost ∝ the
dirs the predicate can touch — the sane first step before touching a
100 TB table); ``--mode mor`` commits O(matched rows) via the
equality-delete era machinery instead of rewriting.

``stats`` answers COUNT(*) (and, with ``--column``, MIN/MAX bounds and
the null count) from manifest math — the 100 TB audit that never reads
the table (live MoR eras degrade only the masked dirs to a real read).
``clone`` is metadata-only at any table size (see
:meth:`LakeCatalog.clone_table`); ``drop``/``rename`` enforce the
clone-safety protocol (refused while live clones reference the table's
data). ``storage --json`` prints one JSON line per table for scripting;
without it, a human-readable table.
"""

from __future__ import annotations

import json
import sys

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)


def build_parser():
    p = base_parser(
        "catalog admin: list / storage / stats / fsck / clone / rename / "
        "drop / purge / backfill"
    )
    p.add_argument("command",
                   choices=["list", "storage", "stats", "fsck", "clone",
                            "rename", "drop", "purge", "backfill"])
    p.add_argument("--schema", default="default")
    p.add_argument("--table", default=None)
    p.add_argument("--target", default=None)
    p.add_argument("--keep-data", action="store_true",
                   help="drop: leave the directory in place (metadata drop)")
    p.add_argument("--json", action="store_true", dest="as_json",
                   help="storage/fsck: one JSON line per table")
    p.add_argument("--deep", action="store_true",
                   help="fsck: also recount rows from parquet footers")
    p.add_argument("--column", default=None,
                   help="stats: also report this column's bounds + null count")
    p.add_argument("--filters", default=None,
                   help="purge/backfill: scan-vocabulary predicate as JSON — "
                        "a conjunction of [col, op, value] triples or a list "
                        "of such conjunctions (OR of ANDs)")
    p.add_argument("--set", default=None, dest="assignments",
                   help="backfill: assignments as a JSON object; string "
                        "values are SQL expressions (quote literals)")
    p.add_argument("--mode", choices=["cow", "mor"], default="cow",
                   help="purge/backfill: copy-on-write rewrite (default) or "
                        "merge-on-read era (O(matched rows) commit)")
    p.add_argument("--dry-run", action="store_true",
                   help="purge/backfill: report matched rows + dir pruning "
                        "without committing")
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(f"catalog_admin:{args.command}", settings, spark)
    catalog = get_catalog(spark, settings)
    if args.command == "list":
        for name in catalog.list_tables(args.schema):
            print(name)
        return 0
    if args.command == "storage":
        rows = catalog.storage_report(args.schema)
        if args.as_json:
            for r in rows:
                print(json.dumps(r, sort_keys=True))
        else:
            for r in rows:
                print(
                    f"{r['table']}: v{r['current_version']} "
                    f"disk={r['data_bytes_on_disk']} live={r['live_bytes']} "
                    f"reclaimable={r['reclaimable_bytes']} "
                    f"clones={len(r['clones'])}"
                )
        return 0
    if args.command == "stats":
        names = [args.table] if args.table else catalog.list_tables(args.schema)
        failed = 0
        for name in names:
            # per-table isolation: one broken table (vanished dir raises
            # by row_count's exactness contract) or one table lacking
            # --column must not abort the sweep — report and continue,
            # exactly like the sibling fsck subcommand's posture
            try:
                t = catalog.table(name)
                rec = {"table": name, "version": t.current_version(),
                       "row_count": t.row_count()}
                if args.column:
                    b = t.column_bounds(args.column)
                    rec["column"] = args.column
                    rec["bounds"] = list(b) if b is not None else None
                    rec["null_count"] = t.null_count(args.column)
            except Exception as e:  # noqa: BLE001 — sweep isolation
                failed += 1
                rec = {"table": name, "error": f"{type(e).__name__}: {e}"}
            if args.as_json:
                print(json.dumps(rec, sort_keys=True))
            elif "error" in rec:
                print(f"{name}: ERROR {rec['error']}")
            else:
                extra = (f" {args.column}: bounds={rec['bounds']} "
                         f"nulls={rec['null_count']}" if args.column else "")
                print(f"{name}: v{rec['version']} rows={rec['row_count']}"
                      + extra)
        return 0 if failed == 0 else 3
    if args.command == "fsck":
        names = [args.table] if args.table else catalog.list_tables(args.schema)
        bad = 0
        for name in names:
            rep = catalog.table(name).fsck(deep=args.deep)
            bad += 0 if rep["ok"] else 1
            if args.as_json:
                print(json.dumps({"table": name, **rep}, sort_keys=True))
            else:
                status = "ok" if rep["ok"] else "ISSUES"
                detail = {k: len(v) for k, v in rep.items()
                          if isinstance(v, list) and v}
                print(f"{name}: {status} v{rep['version']}"
                      + (f" {detail}" if detail else ""))
        return 0 if bad == 0 else 3
    if not args.table:
        raise SystemExit(f"{args.command} requires --table")
    if args.command in ("purge", "backfill"):
        if not args.filters:
            raise SystemExit(f"{args.command} requires --filters")
        try:
            filters = json.loads(args.filters)
        except json.JSONDecodeError as e:
            raise SystemExit(f"--filters is not valid JSON: {e}") from e
        assignments = None
        if args.command == "backfill":
            if not args.assignments:
                raise SystemExit("backfill requires --set")
            try:
                assignments = json.loads(args.assignments)
            except json.JSONDecodeError as e:
                raise SystemExit(f"--set is not valid JSON: {e}") from e
            if not isinstance(assignments, dict) or not assignments:
                raise SystemExit("--set must be a non-empty JSON object")
        t = catalog.table(args.table)
        # the ambiguous-JSON corner: a short list of triples parses as a
        # CONJUNCTION even when the operator meant OR-of-singles — say
        # so on stderr and show the parsed shape ({"or": ...} / {"and":
        # ...} markers are the unambiguous spelling)
        if (
            isinstance(filters, list)
            and 2 <= len(filters) <= 3
            and all(
                isinstance(f, list) and len(f) in (2, 3)
                and isinstance(f[0], str) for f in filters
            )
        ):
            print(
                f"note: --filters parsed as a CONJUNCTION (AND) of "
                f"{len(filters)} predicates; for a disjunction use "
                '{"or": [...]}', file=sys.stderr,
            )
        try:
            rep = t.scan_report(filters)  # validates the vocabulary up front
        except ValueError as e:
            raise SystemExit(f"invalid --filters: {e}") from e
        if args.dry_run:
            matched = t.scan(filters).count()
            verb = "would_delete_rows" if args.command == "purge" else "would_update_rows"
            print(json.dumps(
                {"table": args.table, "dry_run": True,
                 verb: matched, **rep}, sort_keys=True))
            return 0
        mode = "merge-on-read" if args.mode == "mor" else "copy-on-write"
        try:
            if args.command == "purge":
                snap = t.delete_where(filters, mode=mode)
            else:
                snap = t.update_where(filters, assignments, mode=mode)
        except ValueError as e:
            # keyless-table MoR, key-column assignment, malformed tuples
            # inside valid JSON — operator errors, not tracebacks (the
            # CLI error contract test_jobs.py pins)
            raise SystemExit(str(e)) from e
        print(json.dumps(
            {"table": args.table, "version": snap.version,
             "mode": mode, **snap.summary}, sort_keys=True))
        return 0
    if args.command == "drop":
        catalog.drop(args.table, purge=not args.keep_data)
        print(f"dropped {args.table}")
        return 0
    if not args.target:
        raise SystemExit(f"{args.command} requires --target")
    if args.command == "clone":
        t = catalog.clone_table(args.table, args.target)
        print(f"cloned {args.table} -> {args.target} "
              f"(v{t.snapshot().summary['source-version']} referenced, "
              "zero bytes copied)")
        return 0
    catalog.rename_table(args.table, args.target)
    print(f"renamed {args.table} -> {args.target}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
