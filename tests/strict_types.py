"""Strict type-parity audit between Spark queries and DuckDB oracles.

The driver's correctness gate hashes values *with their types*, so a
DuckDB HUGEINT/DECIMAL against a Spark bigint/double hash-mismatches
even when every value is equal (round-1 VERDICT "What's wrong" §1).
This module maps both sides onto the allowed output families —
int / float / str / date / ts / bool — and fails when a column's family
differs, or when either side emits a family outside the allowlist
(DECIMAL and HUGEINT are deliberately NOT in the allowlist).

Run as a script for the full audit:
    python -m tests.strict_types [sf_dir]
"""

from __future__ import annotations

import decimal

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "date": "date", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts",
}


def spark_col_families(df) -> dict[str, str | None]:
    return {f.name: _SPARK_FAMILY.get(f.dataType.simpleString()) for f in df.schema.fields}


def _arrow_family(t) -> str | None:
    """Arrow dtype → allowed family. decimal128 (DuckDB HUGEINT/DECIMAL)
    maps to None on purpose: it's the hash-breaker family."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_boolean(t):
        return "bool"
    return None


def duck_col_families(arrow_schema) -> dict[str, str | None]:
    return {f.name: _arrow_family(f.type) for f in arrow_schema}


def audit(spark_df, con, sql) -> list[str]:
    """Return a list of human-readable type-parity violations (empty = ok)."""
    problems = []
    s_fam = spark_col_families(spark_df)
    d_fam = duck_col_families(con.execute(sql).fetch_arrow_table().schema)
    for name, fam in s_fam.items():
        if fam is None:
            problems.append(f"spark col {name!r} has disallowed type")
    for name, fam in d_fam.items():
        if fam is None:
            problems.append(f"duckdb col {name!r} has disallowed type (HUGEINT/DECIMAL?)")
    if sorted(s_fam) != sorted(d_fam):
        problems.append(f"column sets differ: spark={sorted(s_fam)} duck={sorted(d_fam)}")
        return problems
    for name in s_fam:
        if s_fam[name] and d_fam[name] and s_fam[name] != d_fam[name]:
            problems.append(f"col {name!r}: spark family {s_fam[name]} != duck family {d_fam[name]}")
    return problems


def strict_cell(v):
    """Driver-style typed cell: ints and floats do NOT unify, Decimal is
    its own (disallowed) family."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if hasattr(v, "isoformat"):
        return ("ts", v.replace(tzinfo=None).isoformat() if getattr(v, "tzinfo", None) else v.isoformat())
    return ("obj", v)


def strict_value_match(spark_df, con, sql) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    a = sorted(tuple(strict_cell(r[i]) for i in s_order) for r in s_rows)
    b = sorted(tuple(strict_cell(r[i]) for i in d_order) for r in d_rows)
    out = {"rows": (len(a), len(b)), "match": a == b}
    if not out["match"]:
        out["first_diffs"] = [(x, y) for x, y in zip(a, b) if x != y][:3]
    return out


def main(sf_dir: str) -> int:
    import __spark_entry__ as entrymod
    from datalake_iceberg_spark.session import create_spark_session
    from tests.oracle_harness import duck_connection

    spark = create_spark_session(app_name="strict-types", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        sql = sqls.get(name)
        if sql is None:
            print(f"{name}: (no oracle)")
            continue
        try:
            df = fn(spark, sf_dir)
            problems = audit(df, con, sql)
            if problems:
                bad += 1
                print(f"{name}: TYPE FAIL {problems}")
                continue
            vm = strict_value_match(df, con, sql)
            if not vm["match"]:
                bad += 1
                print(f"{name}: VALUE FAIL rows={vm['rows']} diffs={vm.get('first_diffs')}")
            else:
                print(f"{name}: ok ({vm['rows'][0]} rows)")
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"{name}: ERROR {exc}")
    print(f"\n{bad} failing")
    return 1 if bad else 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
