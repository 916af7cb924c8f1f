"""Oracle output-type stability gate (no Spark session needed).

The driver's correctness hash is typed: a DuckDB HUGEINT/DECIMAL column
(the default result of ``SUM`` over an integer) hash-mismatches a Spark
bigint/double even when every value is equal. Round 1 lost eight rows
to exactly this. This test executes EVERY ``oracle_sql()`` entry against
DuckDB at sf0.001 and fails — naming the query and column — if any
output column lands outside the allowed type families (int / float /
str / date / ts / bool). DECIMAL and HUGEINT are deliberately excluded,
so reintroducing an un-cast ``SUM(`` over an integer column fails here
before it ever reaches the driver.
"""

from __future__ import annotations

import os
import re

import pytest

from tests.strict_types import _arrow_family

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"TESTDATA missing: {SF_DIR}")
    from tests.oracle_harness import duck_connection

    return duck_connection(SF_DIR)


def _oracle_items():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_allowed(con, name: str, sql: str) -> None:
    schema = con.execute(sql).fetch_arrow_table().schema
    bad = [(f.name, str(f.type)) for f in schema if _arrow_family(f.type) is None]
    assert not bad, (
        f"oracle {name!r} emits disallowed output type(s) {bad} — "
        "the driver's typed hash will mismatch Spark. Likely an un-cast "
        "SUM(...) over an integer column; wrap it in CAST(... AS BIGINT) "
        "or CAST(... AS DOUBLE) to match the Spark side."
    )


# Static first-line hint: a bare SUM( over a *known integer* column is
# the classic way the DECIMAL/HUGEINT hazard re-enters. The executed
# check above is authoritative; this one just points at the exact text.
_INT_COLS = (
    "o_orderkey o_custkey l_orderkey l_partkey l_suppkey l_linenumber "
    "c_custkey s_suppkey p_partkey p_size n_nationkey n_regionkey r_regionkey "
    "event_id user_id doc_id n_chars vec_id label"
).split()
_BARE_INT_SUM = re.compile(
    r"(?<![\w.])SUM\(\s*(?:" + "|".join(_INT_COLS) + r")\s*\)", re.IGNORECASE
)


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_no_bare_integer_sum_in_oracle_sql(name: str, sql: str) -> None:
    hits = []
    for m in _BARE_INT_SUM.finditer(sql):
        # allow when already inside an explicit CAST( ... AS <type>)
        prefix = sql[max(0, m.start() - 40) : m.start()].upper()
        if "CAST(" not in prefix:
            hits.append(m.group(0))
    assert not hits, (
        f"oracle {name!r} contains bare integer SUM {hits} — DuckDB "
        "widens this to HUGEINT/DECIMAL and the typed hash breaks; "
        "wrap in CAST(SUM(...) AS BIGINT)."
    )
