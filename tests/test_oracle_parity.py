"""Every queries() entry must match its oracle_sql() on sf0.001
(the driver gates at sf0.01 — same logic, more rows)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connection
from tests.strict_types import audit, strict_value_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check
        return
    result = compare(df, duck, ORACLES[name])
    assert result["ok"], f"{name}: {result}"
    # driver-faithful pass: the driver's hash is TYPE-sensitive (round-1
    # VERDICT — DuckDB HUGEINT/DECIMAL vs Spark bigint/double fails even
    # on equal values), so re-check with strict families and typed cells
    problems = audit(df, duck, ORACLES[name])
    assert not problems, f"{name}: type-parity {problems}"
    strict = strict_value_match(df, duck, ORACLES[name])
    assert strict["match"], f"{name}: strict values {strict}"
