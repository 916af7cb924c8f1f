"""Schema drift detection.

Rebuilds ``src/schema_validate.py``: source schema vs lake-table schema
— column count, order, types (``schema_validate.py:37-84``), nullability
(``:117-144``), and PK presence (``:147-170``). Drift is *detected and
reported, never auto-applied* (schema evolution stays off, matching
``write.spark.accept-any-schema=false``).
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
