"""Driver-contract invariants for __spark_entry__.py.

Two rules came out of round 1 (VERDICT "What's wrong"):
1. The driver grades only the FIRST 50 ``queries()`` entries — every
   entry with an oracle must sit inside that window.
2. The driver's value hash is type-sensitive: DuckDB HUGEINT/DECIMAL
   against Spark bigint/double fails even when values are equal, so
   query outputs may only be BIGINT/DOUBLE/STRING/DATE/TIMESTAMP/BOOL.
   The full engine-vs-oracle type audit runs in tests/test_oracle_parity
   via tests.strict_types; here we lint the SQL text for DECIMAL casts
   so new oracles fail fast without a Spark session.
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50


def test_oracled_queries_inside_driver_window():
    """Every oracled entry past the 50-slot window must have been
    windowed (and therefore driver-graded) in a PRIOR recorded round —
    i.e. parking is only allowed for entries with an existing driver
    row. The per-round windows live in ROTATION_LEDGER.json; the
    cadence itself is enforced by tests/test_rotation_ledger.py."""
    import json
    from pathlib import Path

    ledger = json.loads(
        (Path(__file__).resolve().parent.parent / "ROTATION_LEDGER.json").read_text()
    )
    prior = set()
    for rnd in ledger["rounds"][:-1]:
        prior.update(rnd["window"])
    names = list(entrymod.queries())
    sqls = entrymod.oracle_sql()
    outside = [n for n in names[DRIVER_WINDOW:] if n in sqls and n not in prior]
    assert not outside, (
        f"oracled queries past entry {DRIVER_WINDOW} that have never been "
        f"driver-graded: {outside}"
    )


def test_oracle_sql_keys_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_decimal_never_in_oracle_output():
    offenders = [
        name for name, sql in entrymod.oracle_sql().items()
        if re.search(r"AS\s+DECIMAL", sql, re.IGNORECASE)
    ]
    assert not offenders, f"DECIMAL outputs hash-differently than Spark: {offenders}"


def test_no_duplicate_dict_keys_in_entry_file():
    """A duplicate literal key in queries()/oracle_sql() is silently
    shadowed by Python — the earlier line becomes dead and the window
    arithmetic (first-50 grading) miscounts. Lint the AST. Regression:
    q16_supplier_part_count appeared twice in rounds 7-9."""
    import ast
    from collections import Counter
    from pathlib import Path

    src = (Path(__file__).resolve().parent.parent / "__spark_entry__.py").read_text()
    tree = ast.parse(src)
    for fn in [n for n in tree.body
               if isinstance(n, ast.FunctionDef) and n.name in ("queries", "oracle_sql")]:
        for node in ast.walk(fn):
            if isinstance(node, ast.Dict):
                keys = [k.value for k in node.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)]
                dups = sorted(k for k, c in Counter(keys).items() if c > 1)
                assert not dups, f"duplicate dict keys in {fn.name}(): {dups}"


def test_readme_query_count_matches_registry():
    """r12 advice: the README's query count drifted twice (128, 137 vs
    the real registry). Derive it — the README must state the actual
    ``len(queries())`` so it can't drift again."""
    import re
    from pathlib import Path

    import __spark_entry__ as entry

    n = len(entry.queries())
    readme = Path(__file__).resolve().parent.parent / "README.md"
    m = re.search(r"exposes (\d+) queries", readme.read_text())
    assert m, "README.md no longer states the query count"
    assert int(m.group(1)) == n, (
        f"README claims {m.group(1)} queries, registry has {n}"
    )
