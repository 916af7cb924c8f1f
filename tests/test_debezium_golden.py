"""Golden-fixture decode: the REFERENCE's own Debezium sample
(``/root/reference/resources/debezium_cdc_{key,value}{,_schema}.json``)
pushed through the engine's schema-driven decode path, asserting the
exact decoded row. If any sentinel-0 / TZ-shift / decimal-bytes /
composite-key rule drifts from the reference's sample, this fails.

The fixture is Avro-JSON (unions encoded as ``{"type": value}``); the
test unwraps unions and re-encodes the decimal as the wire's big-endian
two's-complement unscaled bytes, then drives the engine's
``payload_struct_type`` → ``parse_json_envelope`` (FAILFAST) →
``decode_payload`` pipeline — the same seam a deployment uses with
``try_from_avro`` swapped in for the JSON parse.
"""

from __future__ import annotations

import base64
import json
import os
from datetime import date, datetime, timedelta
from decimal import Decimal
from zoneinfo import ZoneInfo

import pytest
from pyspark.sql import functions as F

from datalake_iceberg_spark.cdc import debezium as dz

RES = "/root/reference/resources"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference resources not present"
)

SOURCE_TZ = "Asia/Seoul"  # the reference's source-DB timezone assumption


def _unwrap(v):
    """Avro-JSON union {'long': 5} -> 5 (recursively)."""
    if isinstance(v, dict) and len(v) == 1:
        return _unwrap(next(iter(v.values())))
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    return v


def _decimal_to_wire_bytes(d: Decimal, scale: int) -> bytes:
    """Connect Decimal encoding: big-endian two's-complement unscaled."""
    unscaled = int(d.scaleb(scale))
    length = max(1, (unscaled.bit_length() + 8) // 8)
    return unscaled.to_bytes(length, "big", signed=True)


def _seoul_to_utc(naive: datetime) -> datetime:
    return naive.replace(tzinfo=ZoneInfo(SOURCE_TZ)).astimezone(ZoneInfo("UTC")).replace(tzinfo=None)


@pytest.fixture(scope="module")
def fixture():
    value = json.load(open(f"{RES}/debezium_cdc_value.json"))
    value_schema = open(f"{RES}/debezium_cdc_value_schema.json").read()
    key = json.load(open(f"{RES}/debezium_cdc_key.json"))
    key_schema = open(f"{RES}/debezium_cdc_key_schema.json").read()
    return value, value_schema, key, key_schema


def test_value_schema_specs(fixture):
    _, value_schema, _, _ = fixture
    specs = {s.name: s for s in dz.avro_field_specs(value_schema)}
    # composite-PK table: 4 key columns present in the payload
    assert specs["DATE1"].logical == "io.debezium.time.Date"
    assert specs["TIME1"].logical == "io.debezium.time.MicroTime"
    assert specs["DATETIME1"].logical == "io.debezium.time.Timestamp"
    assert specs["CREATE_DATETIME"].logical == "io.debezium.time.MicroTimestamp"
    assert specs["UPDATE_TIMESTAMP"].logical == "io.debezium.time.ZonedTimestamp"
    assert specs["decimal1"].logical == "decimal"
    assert (specs["decimal1"].precision, specs["decimal1"].scale) == (12, 8)
    assert specs["integer2"].spark_type.simpleString() == "bigint"
    assert specs["BLOB1"].spark_type.simpleString() == "binary"


def test_golden_value_decodes_exactly(spark, fixture):
    value, value_schema, _, _ = fixture
    specs = dz.avro_field_specs(value_schema)
    payload_t = dz.payload_struct_type(specs)

    after = _unwrap(value["after"])
    # wire re-encode: decimal rides as 2's-complement bytes (the fixture
    # stores the already-decoded number); binary rides base64 for JSON
    dec = Decimal(str(after["decimal1"]))
    after["decimal1"] = base64.b64encode(
        _decimal_to_wire_bytes(dec, 8)
    ).decode()
    after["BLOB1"] = base64.b64encode(after["BLOB1"].encode("latin-1")).decode()

    envelope = json.dumps(
        {
            "before": None,
            "after": after,
            "source": _unwrap(value["source"]),
            "op": value["op"],
            "ts_ms": _unwrap(value["ts_ms"]),
        }
    )
    raw = spark.createDataFrame([(envelope.encode(),)], "value BINARY")
    parsed = dz.parse_json_envelope(raw, payload_t)
    flat = parsed.select("after.*", "op", F.col("source.ts_ms").alias("src_ts_ms"))
    decoded = dz.decode_payload(flat, specs, source_tz=SOURCE_TZ)
    row = decoded.collect()[0]

    # exact values from the reference's sample
    assert row.id == 33
    assert row.char36 == "Radio matter where rest."
    assert row.varchar36 == "Him strategy remember wrong."
    assert row.integer1 == 1992326530
    assert row.integer2 == 9109319090569724910
    assert row.unsigned_int == 270029265
    assert row.float1 == pytest.approx(1925.27, abs=1e-2)
    assert row.decimal1 == Decimal("5986.07380386")
    assert row.boolean1 is False
    assert row.TEXT1.startswith("Campaign factor next work.")
    # io.debezium.time.Date: days since epoch (composite-PK member)
    assert row.DATE1 == date(1970, 1, 1) + timedelta(days=19136)
    # MicroTime: µs since midnight anchored at epoch
    assert row.TIME1 == datetime(1970, 1, 1) + timedelta(microseconds=19689000000)
    # Timestamp (ms, source-TZ-naive) -> UTC
    assert row.DATETIME1 == _seoul_to_utc(
        datetime(1970, 1, 1) + timedelta(milliseconds=1584598489000)
    )
    # MicroTimestamp (µs, source-TZ-naive) -> UTC
    assert row.CREATE_DATETIME == _seoul_to_utc(
        datetime(1970, 1, 1) + timedelta(microseconds=1651942920734645)
    )
    # ZonedTimestamp: ISO-8601 with zone -> UTC instant
    assert row.UPDATE_TIMESTAMP == datetime(2023, 5, 27, 21, 28, 30, 715134)
    assert row.op == "c"
    assert row.src_ts_ms == 1774788399546


def test_golden_key_composite_pk(spark, fixture):
    """The key fixture: composite PK (id, DATE1, integer1, char36) with a
    Debezium-Date member — decode + surrogate key must be stable."""
    _, _, key, key_schema = fixture
    specs = dz.avro_field_specs(key_schema)
    assert [s.name for s in specs] == ["id", "DATE1", "integer1", "char36"]
    payload_t = dz.payload_struct_type(specs)
    raw = spark.createDataFrame([(json.dumps(key),)], "value STRING")
    flat = raw.select(
        F.from_json(F.col("value"), payload_t, {"mode": "FAILFAST"}).alias("k")
    ).select("k.*")
    decoded = dz.decode_payload(flat, specs, source_tz=SOURCE_TZ)
    row = decoded.collect()[0]
    assert row.id == 33
    assert row.DATE1 == date(1970, 1, 1) + timedelta(days=19136)
    assert row.integer1 == 1992326530
    assert row.char36 == "Radio matter where rest."

    # surrogate key over the composite PK is deterministic and stable
    from datalake_iceberg_spark.functions.keys import surrogate_key_expr

    expr = surrogate_key_expr(["id", "DATE1", "integer1", "char36"]).alias("id_iceberg")
    sk = decoded.select(expr).collect()[0].id_iceberg
    sk2 = decoded.select(expr).collect()[0].id_iceberg
    assert sk == sk2 and isinstance(sk, str) and len(sk) == 32
