"""Local stand-in for the driver's correctness gate: run each Spark
query and its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", v)
    if isinstance(v, int):
        return ("num", float(v))
    if hasattr(v, "isoformat"):
        return ("ts", v.replace(tzinfo=None).isoformat() if getattr(v, "tzinfo", None) else v.isoformat())
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    out = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
    }
    out["count_match"] = out["rows_spark"] == out["rows_duck"]
    out["schema_match"] = out["cols_spark"] == out["cols_duck"]
    if out["count_match"] and out["schema_match"]:
        a = _normalize(s_rows, s_cols)
        b = _normalize(d_rows, d_cols)
        out["value_match"] = a == b
        if not out["value_match"]:
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            out["first_diffs"] = diff[:3]
    else:
        out["value_match"] = False
    out["ok"] = out["count_match"] and out["schema_match"] and out["value_match"]
    return out
