"""Guard against silent TESTDATA fixture drift.

Round 2 lost its entire scoreboard to one regenerated fixture: the
driver's ``events.parquet`` switched ``ts`` from int64-nanos to
``timestamp[us]`` and 11 driver rows + 33 tests + the bench all died
through one stale assumption. This test pins the *physical* parquet
schema of every TESTDATA table (via ``pyarrow.parquet.read_schema``,
no Spark session needed) to what the query layer assumes, so the next
regeneration fails ONE obvious test that names the drifted column.

Columns the code handles type-adaptively list every accepted encoding
(e.g. ``events.ts`` — see ``load_events``).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# table -> column -> set of accepted pyarrow type strings
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        # load_events branches on this dtype — every member of this set
        # is an encoding the reader genuinely supports.
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_physical_schema(table: str) -> None:
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"TESTDATA missing: {path}")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    expected = EXPECTED[table]

    missing = sorted(set(expected) - set(actual))
    extra = sorted(set(actual) - set(expected))
    drifted = {
        col: (actual[col], sorted(allowed))
        for col, allowed in expected.items()
        if col in actual and actual[col] not in allowed
    }
    problems = []
    if missing:
        problems.append(f"missing columns: {missing}")
    if extra:
        problems.append(f"unexpected new columns: {extra}")
    for col, (got, allowed) in drifted.items():
        problems.append(
            f"column {table}.{col} drifted to {got!r} (query layer accepts {allowed})"
        )
    assert not problems, (
        f"TESTDATA fixture drift in {path}:\n  " + "\n  ".join(problems)
        + "\n  -> update the reader (type-adaptively!) and this manifest together."
    )


def test_fixture_embedding_width_pins_emb_dim() -> None:
    """r14 advice: the physical-schema pin above checks the element
    TYPE but not the WIDTH, while the PQ serving oracle bakes
    PQ_DIM_PER_SUB = EMB_DIM // PQ_M into SQL literals. A fixture width
    change to another multiple of PQ_M would pass create() and surface
    as a grading mismatch misattributed to the engine — pin the width
    here (and _stage_pq_index re-checks at staging time)."""
    from datalake_iceberg_spark.queries.index_serving import EMB_DIM

    path = f"{SF_DIR}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip(f"TESTDATA missing: {path}")
    first = next(pq.ParquetFile(path).iter_batches(batch_size=4))
    widths = {len(v) for v in first.column("embedding").to_pylist()}
    assert widths == {EMB_DIM}, (
        f"fixture embedding width(s) {widths} != index_serving.EMB_DIM "
        f"{EMB_DIM} — update EMB_DIM and re-derive the PQ oracle literals"
    )
