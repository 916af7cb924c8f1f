"""Schema drift detection and comment reconciliation.

Rebuilds ``src/schema_validate.py``: source schema vs lake-table schema
— column count, order, types (``schema_validate.py:37-84``), nullability
(``:117-144``), PK presence (``:147-170``), and table/column COMMENT
sync from the source DB (``:87-114`` column comments, ``:173-203`` table
comment). Structural drift is *detected and reported, never
auto-applied* (schema evolution stays off, matching
``write.spark.accept-any-schema=false``); comments — documentation, not
structure — follow the reference and CAN be applied, with a report-only
mode for dry runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from datalake_iceberg_spark.ingest.jdbc import convert_db_type_to_spark


@dataclass
class SchemaDiff:
    ok: bool = True
    issues: list[str] = field(default_factory=list)

    def add(self, issue: str) -> None:
        self.ok = False
        self.issues.append(issue)


def source_columns_to_schema(
    columns: list[tuple[str, str, bool]], dialect: str = "mysql"
) -> T.StructType:
    """INFORMATION_SCHEMA-shaped (name, db_type, nullable) rows → StructType."""
    return T.StructType([
        T.StructField(name, convert_db_type_to_spark(db_type, dialect), nullable)
        for name, db_type, nullable in columns
    ])


def validate_schema(
    source: T.StructType,
    target: T.StructType,
    primary_key: list[str] | None = None,
    extra_target_cols: tuple[str, ...] = ("id_iceberg", "last_applied_date"),
    check_nullability: bool = True,
) -> SchemaDiff:
    """Compare source vs target; pipeline-added audit/surrogate columns
    are expected on the target side only."""
    diff = SchemaDiff()
    tgt_fields = [f for f in target.fields if f.name not in extra_target_cols]
    if len(source.fields) != len(tgt_fields):
        diff.add(
            f"column count mismatch: source={len(source.fields)} target={len(tgt_fields)}"
        )
    by_name = {f.name: f for f in tgt_fields}
    for pos, sf in enumerate(source.fields):
        tf = by_name.get(sf.name)
        if tf is None:
            diff.add(f"column missing in target: {sf.name}")
            continue
        if pos < len(tgt_fields) and tgt_fields[pos].name != sf.name:
            diff.add(
                f"column order mismatch at {pos}: source={sf.name} target={tgt_fields[pos].name}"
            )
        if sf.dataType != tf.dataType:
            diff.add(
                f"type mismatch on {sf.name}: source={sf.dataType.simpleString()} "
                f"target={tf.dataType.simpleString()}"
            )
        if check_nullability and sf.nullable != tf.nullable:
            diff.add(
                f"nullability mismatch on {sf.name}: source={sf.nullable} target={tf.nullable}"
            )
    for tf in tgt_fields:
        if tf.name not in {f.name for f in source.fields}:
            diff.add(f"column missing in source: {tf.name}")
    if primary_key:
        for k in primary_key:
            if k not in {f.name for f in source.fields}:
                diff.add(f"primary key column absent in source: {k}")
    return diff


def sync_comments(
    table,
    table_comment: str | None = None,
    column_comments: dict[str, str] | None = None,
    report_only: bool = False,
) -> dict:
    """Reconcile source-DB comments onto a :class:`LakeTable`.

    Reference semantics (``src/schema_validate.py:87-114,173-203``):
    empty/None source comments are skipped, comments for columns the
    target doesn't have are skipped, and a write happens only when the
    target's current comment differs — so a no-drift run commits
    nothing. ``report_only=True`` returns the same drift report without
    applying (the dry-run mode the reference logs through its
    SparkLoggerManager).

    Returns ``{"table_comment": old|None->new or None,
    "columns": {col: (old, new)}, "skipped": [cols absent in target],
    "applied": bool}``.
    """
    column_comments = column_comments or {}
    target_cols = {f.name for f in table.schema().fields}
    current = table.column_comments()
    report: dict = {"table_comment": None, "columns": {}, "skipped": [], "applied": not report_only}

    cur_tbl = table.table_comment()
    if table_comment and table_comment != cur_tbl:
        report["table_comment"] = (cur_tbl, table_comment)

    for col, comment in column_comments.items():
        if not comment:
            continue
        if col not in target_cols:
            report["skipped"].append(col)
            continue
        if current.get(col) != comment:
            report["columns"][col] = (current.get(col), comment)

    if not report_only:
        if report["table_comment"]:
            table.set_table_comment(table_comment)
        for col, (_, new) in report["columns"].items():
            table.set_column_comment(col, new)
    return report
