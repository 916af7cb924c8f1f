"""Three-way parity for the exact fixed-point rounding helpers behind
the quantization audits (queries/similarity.py _fx4/_fx4_sql): Spark,
DuckDB, and an exact-rational Python reference must agree on EVERY
input — including exact half-boundaries, where the r6 driver caught
double-summation divergence between the engines."""

import random
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries.similarity import _fx4, _fx4_sql


def _py_halfup(units: int, den: int) -> float:
    """Exact reference: half-up (away from zero) of units/den to 1e-4
    units, as the 4-dp double value."""
    q = Fraction(abs(units), den)
    mag = int(q) + (1 if (q - int(q)) >= Fraction(1, 2) else 0)
    return (mag if units >= 0 else -mag) / 10000.0


def _cases():
    rng = random.Random(4)
    cases = []
    for _ in range(300):
        den = rng.choice([100, 300, 700, 2500, 123400])
        units = rng.randrange(-(10**9), 10**9)
        cases.append((units, den))
    # adversarial exact half-boundaries: units/den == k + 1/2 exactly
    for den in (100, 200, 2500, 96400):
        for k in (0, 1, 7, 1157, 999999):
            half = k * den + den // 2
            cases.append((half, den))
            cases.append((-half, den))
    return cases


def test_fx4_three_way_parity(spark):
    cases = _cases()
    df = spark.createDataFrame(
        [Row(i=i, u=u, d=d) for i, (u, d) in enumerate(cases)],
        "i int, u long, d long",
    )
    got_spark = {
        r.i: r.v
        for r in df.select("i", _fx4(F.col("u"), F.col("d")).alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, u BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, u, d) for i, (u, d) in enumerate(cases)])
    got_duck = dict(con.execute(
        f"SELECT i, {_fx4_sql('u', 'd')} FROM t"
    ).fetchall())
    for i, (u, d) in enumerate(cases):
        want = _py_halfup(u, d)
        assert got_spark[i] == want, (u, d, got_spark[i], want)
        assert got_duck[i] == want, (u, d, got_duck[i], want)
