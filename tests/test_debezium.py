"""Debezium/Confluent decode seam: wire framing, decimal bytes,
schema-version ordering, JSON envelope → CDC apply end-to-end."""

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_iceberg_spark.cdc import debezium as dz
from datalake_iceberg_spark.cdc import pipeline as cdc
from datalake_iceberg_spark.functions.temporal import (
    cast_debezium_column,
    confluent_schema_id,
)
from datalake_iceberg_spark.tables import LakeCatalog


def _frame(schema_id: int, payload: bytes) -> bytes:
    """Confluent wire format: magic 0x00 + int32 BE schema id + payload."""
    return b"\x00" + schema_id.to_bytes(4, "big") + payload


def test_wire_metadata_extraction(spark):
    rows = [
        (_frame(7, b"K1"), _frame(42, b"V-one"), 0, 100, None),
        (_frame(7, b"K2"), _frame(43, b"V-two"), 1, 101, None),
    ]
    df = spark.createDataFrame(
        rows, "key binary, value binary, partition int, offset long, timestamp timestamp"
    )
    out = dz.with_wire_metadata(df).collect()
    assert [r.key_schema_id for r in out] == [7, 7]
    assert sorted(r.value_schema_id for r in out) == [42, 43]
    assert {bytes(r.value_payload) for r in out} == {b"V-one", b"V-two"}
    assert {r.offset for r in out} == {100, 101}


def test_schema_id_large_unsigned(spark):
    # schema ids near int32 max must not be mangled by the hex/conv path
    big = 2_000_000_000
    df = spark.createDataFrame([(_frame(big, b"x"),)], "value binary")
    assert df.select(confluent_schema_id("value").alias("i")).first().i == big


DECIMAL_CASES = [
    Decimal("0.00000000"),
    Decimal("1.23456789"),
    Decimal("-1.23456789"),
    Decimal("9999.99999999"),
    Decimal("-9999.99999999"),
    Decimal("-0.00000001"),
    Decimal("123.45000000"),
]


def test_decimal_bytes_roundtrip(spark):
    """Golden-fixture semantics (resources/debezium_cdc_value_schema.json):
    scale=8 precision=12, big-endian two's-complement unscaled bytes."""
    scale, precision = 8, 12
    rows = []
    for d in DECIMAL_CASES:
        unscaled = int(d.scaleb(scale))
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        rows.append((str(d), unscaled.to_bytes(nbytes, "big", signed=True)))
    df = spark.createDataFrame(rows, "expect string, raw binary")
    out = df.select(
        "expect", dz.decode_decimal_bytes("raw", precision, scale).alias("got")
    ).collect()
    for r in out:
        assert r.got == Decimal(r.expect), (r.expect, r.got)


def test_decimal_bytes_money_scale(spark):
    # MSSQL money → decimal(19,4) path (reference database.py:49-52)
    d = Decimal("-922337203685477.5808")  # money min: full 8-byte range
    unscaled = int(d.scaleb(4))
    raw = unscaled.to_bytes(8, "big", signed=True)
    df = spark.createDataFrame([(raw,)], "raw binary")
    got = df.select(dz.decode_decimal_bytes("raw", 19, 4).alias("g")).first().g
    assert got == d


def test_schema_version_ordering(spark):
    df = spark.createDataFrame([(43,), (41,), (43,), (42,)], "value_schema_id int")
    assert dz.schema_versions(df) == [41, 42, 43]
    assert dz.for_schema_version(df, 43).count() == 2


def test_epoch_zero_sentinel_nulling(spark):
    df = spark.createDataFrame([(0,), (19000,), (None,)], "v long")
    out = df.select(
        cast_debezium_column(F.col("v"), "io.debezium.time.Date").alias("d")
    ).collect()
    assert out[0].d is None and out[2].d is None
    assert out[1].d is not None


def test_source_tz_shift(spark):
    # Debezium ms epoch produced from an Asia/Seoul-naive datetime: the
    # decoded UTC instant must be 9 hours earlier (cdc_pipeline.py:114).
    ms = 1_700_000_000_000
    df = spark.createDataFrame([(ms,)], "v long")
    utc = df.select(
        cast_debezium_column(F.col("v"), "io.debezium.time.Timestamp", source_tz="UTC").alias("t")
    ).first().t
    kst = df.select(
        cast_debezium_column(F.col("v"), "io.debezium.time.Timestamp", source_tz="Asia/Seoul").alias("t")
    ).first().t
    assert (utc - kst).total_seconds() == 9 * 3600


PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _envelope_json(op, pk, name, amount, ts_ms, use_before=False):
    payload = {"pk": pk, "name": name, "amount": amount}
    return json.dumps(
        {
            "before": payload if use_before else None,
            "after": None if use_before else payload,
            "source": {"version": "2.5", "connector": "mysql", "name": "local",
                       "ts_ms": ts_ms, "snapshot": "false", "db": "store", "table": "tb"},
            "op": op,
            "ts_ms": ts_ms,
        }
    ).encode()


def test_json_envelope_to_cdc_apply(spark, tmp_path):
    """Full seam: JSON Debezium bytes → parse → flatten/dedup → MERGE/DELETE."""
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], PAYLOAD_SCHEMA
    )
    from datalake_iceberg_spark.functions.keys import surrogate_key

    t = cat.create_or_replace(
        "db.tb", surrogate_key(base, ["pk"]), key=["id_iceberg"]
    )

    msgs = [
        (_envelope_json("u", 2, "b2", 2.5, 1000), 10),
        (_envelope_json("u", 2, "b3", 2.7, 1001), 11),  # later offset wins
        (_envelope_json("c", 4, "d", 4.0, 1002), 12),
        (_envelope_json("d", 3, "c", 3.0, 1003, use_before=True), 13),
    ]
    raw = spark.createDataFrame(msgs, "value binary, offset long")
    env = dz.parse_json_envelope(raw, PAYLOAD_SCHEMA)
    upserts, deletes = cdc.transform_and_dedup(env, t, ["pk"])
    cdc.apply_cdc_changes(t, upserts, deletes)

    final = {r.pk: (r.name, r.amount) for r in t.read().collect()}
    assert final == {1: ("a", 1.0), 2: ("b3", 2.7), 4: ("d", 4.0)}


def test_json_envelope_failfast(spark):
    raw = spark.createDataFrame([(b"not-json{{",)], "value binary")
    env = dz.parse_json_envelope(raw, PAYLOAD_SCHEMA)
    with pytest.raises(Exception):
        env.collect()
