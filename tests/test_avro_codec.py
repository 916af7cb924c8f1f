"""Pure-Python Avro binary codec: golden vectors straight from the
Avro 1.11 spec, encode/decode roundtrips over the full supported
surface, FAILFAST behavior, and the end-to-end Spark seam — Confluent
framed Debezium-Avro bytes streamed into a lake table.
"""

import json
import random
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from datalake_iceberg_spark.cdc.avro_codec import (
    _read_long,
    _write_long,
    decode_record,
    encode_record,
    parse_schema,
)


# ------------------------------------------------------- golden vectors

#: spec section "Binary encoding > primitive types": zigzag examples
SPEC_LONGS = [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
              (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
              (8192, b"\x80\x80\x01"), (-8193, b"\x81\x80\x01")]


def test_spec_zigzag_vectors():
    for value, wire in SPEC_LONGS:
        assert _write_long(value) == wire, value
        got, pos = _read_long(wire, 0)
        assert (got, pos) == (value, len(wire))


def test_spec_string_and_record_vector():
    # spec example: record {"a": long, "b": string} with a=27, b="foo"
    # encodes to 36 06 66 6f 6f
    s = parse_schema(json.dumps({
        "type": "record", "name": "test",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": "string"}],
    }))
    wire = bytes([0x36, 0x06, 0x66, 0x6F, 0x6F])
    assert encode_record({"a": 27, "b": "foo"}, s) == wire
    assert decode_record(wire, s) == {"a": 27, "b": "foo"}


def test_spec_array_vector():
    # spec example: array<long> [3, 27] encodes to 04 06 36 00
    s = parse_schema(json.dumps({"type": "array", "items": "long"}))
    wire = bytes([0x04, 0x06, 0x36, 0x00])
    assert encode_record([3, 27], s) == wire
    assert decode_record(wire, s) == [3, 27]


def test_spec_union_null_string():
    # spec example: union ["null","string"] null -> 00 ; "a" -> 02 02 61
    s = parse_schema(json.dumps(["null", "string"]))
    assert encode_record(None, s) == b"\x00"
    assert decode_record(b"\x00", s) is None
    assert encode_record("a", s) == b"\x02\x02\x61"
    assert decode_record(b"\x02\x02\x61", s) == "a"


# ----------------------------------------------------------- roundtrips

FULL_SCHEMA = json.dumps({
    "type": "record", "name": "Everything",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "raw", "type": "bytes"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "nums", "type": {"type": "array", "items": "long"}},
        {"name": "tags", "type": {"type": "map", "values": "int"}},
        {"name": "color", "type": {"type": "enum", "name": "C",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "price", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 10, "scale": 2}},
        {"name": "nested", "type": {
            "type": "record", "name": "Inner",
            "fields": [{"name": "x", "type": "long"},
                       {"name": "y", "type": ["null", "double"]}]}},
    ],
})


def test_full_surface_roundtrip():
    s = parse_schema(FULL_SCHEMA)
    rec = {
        "b": True, "i": -123, "l": 2**40, "f": 0.5, "d": -2.25,
        "s": "héllo", "raw": b"\x00\xff", "maybe": None,
        "nums": [1, -1, 0, 2**33], "tags": {"a": 1, "b": -2},
        "color": "GREEN", "price": Decimal("123.45"),
        "nested": {"x": 7, "y": 1.5},
    }
    assert decode_record(encode_record(rec, s), s) == rec


def test_randomized_long_roundtrip():
    rng = random.Random(11)
    s = parse_schema(json.dumps({"type": "record", "name": "L",
                                 "fields": [{"name": "v", "type": "long"}]}))
    for _ in range(200):
        v = rng.randrange(-2**62, 2**62)
        assert decode_record(encode_record({"v": v}, s), s) == {"v": v}


def test_negative_decimal_roundtrip():
    s = parse_schema(json.dumps({"type": "bytes", "logicalType": "decimal",
                                 "precision": 8, "scale": 3}))
    for v in (Decimal("-1.234"), Decimal("0.001"), Decimal("-0.001"),
              Decimal("99999.999")):
        assert decode_record(encode_record(v, s), s) == v


# ------------------------------------------------------------- FAILFAST


def test_failfast_trailing_and_truncated():
    s = parse_schema(json.dumps({"type": "record", "name": "R",
                                 "fields": [{"name": "a", "type": "long"}]}))
    with pytest.raises(ValueError, match="trailing"):
        decode_record(b"\x02\x00", s)  # one extra byte
    with pytest.raises(ValueError, match="truncated"):
        decode_record(b"\x80", s)  # unterminated varint
    u = parse_schema(json.dumps(["null", "string"]))
    with pytest.raises(ValueError, match="branch"):
        decode_record(b"\x04", u)  # union index 2 of 2


# ------------------------------------------------- Spark seam, end-to-end

PAYLOAD_AVRO = {
    "type": "record", "name": "Row",
    "fields": [{"name": "pk", "type": "long"},
               {"name": "name", "type": ["null", "string"]},
               {"name": "amount", "type": ["null", "double"]}],
}
ENVELOPE_AVRO = json.dumps({
    "type": "record", "name": "Envelope",
    "fields": [
        {"name": "before", "type": ["null", PAYLOAD_AVRO]},
        {"name": "after", "type": ["null", "Row"]},
        {"name": "source", "type": {
            "type": "record", "name": "Source",
            "fields": [{"name": "version", "type": "string"},
                       {"name": "connector", "type": "string"},
                       {"name": "name", "type": "string"},
                       {"name": "ts_ms", "type": "long"},
                       {"name": "snapshot", "type": ["null", "string"]},
                       {"name": "db", "type": "string"},
                       {"name": "table", "type": "string"}]}},
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": ["null", "long"]},
    ],
})
PAYLOAD_SPARK = T.StructType([
    T.StructField("pk", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])


def _env(op, pk, name, amount, ts):
    p = {"pk": pk, "name": name, "amount": amount}
    return {
        "before": p if op == "d" else None,
        "after": None if op == "d" else p,
        "source": {"version": "2.5", "connector": "mysql", "name": "local",
                   "ts_ms": ts, "snapshot": "false", "db": "store", "table": "tb"},
        "op": op, "ts_ms": ts,
    }


def _wire(msg, schema):
    # Confluent frame: magic 0 + big-endian schema id + avro body
    return b"\x00" + (42).to_bytes(4, "big") + encode_record(msg, schema)


def test_avro_stream_to_lake(spark, tmp_path):
    """S3 end-to-end without the jar: Confluent-framed Debezium-AVRO
    bytes → pure-Python decode seam → CDC pipeline → lake table."""
    from datalake_iceberg_spark.cdc import debezium as dz
    from datalake_iceberg_spark.functions.keys import surrogate_key
    from datalake_iceberg_spark.streaming.runner import CdcStreamRunner, SourceConfig
    from datalake_iceberg_spark.tables import LakeCatalog

    schema = parse_schema(ENVELOPE_AVRO)
    msgs = [_env("u", 2, "b2", 2.5, 1000), _env("c", 4, "d", 4.0, 1001),
            _env("d", 3, "c", 3.0, 1002)]
    src_dir = str(tmp_path / "src")
    rows = [(_wire(m, schema), o) for o, m in enumerate(msgs, start=10)]
    spark.createDataFrame(rows, "value binary, offset long").coalesce(1).write.parquet(
        f"{src_dir}/b1"
    )

    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], PAYLOAD_SPARK
    )
    target = cat.create_or_replace(
        "store.tb", surrogate_key(base, ["pk"]), key=["id_iceberg"]
    )
    runner = CdcStreamRunner(spark, checkpoint_root=str(tmp_path / "ck"), dag_id="av")
    source = SourceConfig(
        name="store.tb", path=src_dir, format="parquet",
        schema="value binary, offset long", key_cols=["pk"],
        options={"recursiveFileLookup": "true"},
        pre_transform=lambda df: dz.parse_avro_envelope_python(
            df, PAYLOAD_SPARK, ENVELOPE_AVRO
        ),
    )
    runner.run_source(source, target, timeout_sec=120)
    state = {r.pk: (r.name, r.amount) for r in target.read().collect()}
    assert state == {1: ("a", 1.0), 2: ("b2", 2.5), 4: ("d", 4.0)}


def test_avro_seam_failfast_in_spark(spark):
    from datalake_iceberg_spark.cdc import debezium as dz

    bad = b"\x00" + (42).to_bytes(4, "big") + b"\x80"  # truncated varint
    df = spark.createDataFrame([(bad, 1)], "value binary, offset long")
    out = dz.parse_avro_envelope_python(df, PAYLOAD_SPARK, ENVELOPE_AVRO)
    with pytest.raises(Exception, match="truncated|PythonException"):
        out.collect()


def test_multi_schema_registry_dispatch(spark):
    """Two schema versions live on the same topic: each message decodes
    with the schema its own Confluent header names; an unknown id
    fails fast."""
    from datalake_iceberg_spark.cdc import debezium as dz

    v2_payload = {
        "type": "record", "name": "Row2",
        "fields": [{"name": "pk", "type": "long"},
                   {"name": "name", "type": ["null", "string"]},
                   {"name": "amount", "type": ["null", "double"]},
                   {"name": "extra", "type": ["null", "string"]}],
    }
    v2 = json.dumps({
        "type": "record", "name": "Envelope2",
        "fields": [
            {"name": "before", "type": ["null", v2_payload]},
            {"name": "after", "type": ["null", "Row2"]},
            {"name": "source", "type": {
                "type": "record", "name": "Source2",
                "fields": [{"name": "version", "type": "string"},
                           {"name": "connector", "type": "string"},
                           {"name": "name", "type": "string"},
                           {"name": "ts_ms", "type": "long"},
                           {"name": "snapshot", "type": ["null", "string"]},
                           {"name": "db", "type": "string"},
                           {"name": "table", "type": "string"}]}},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"]},
        ],
    })
    s1 = parse_schema(ENVELOPE_AVRO)
    s2 = parse_schema(v2)
    m1 = _env("c", 10, "ten", 10.0, 100)
    m2 = _env("c", 11, "eleven", 11.0, 101)
    m2["after"]["extra"] = "new-col"

    def frame(sid, msg, schema):
        return b"\x00" + sid.to_bytes(4, "big") + encode_record(msg, schema)

    rows = [(frame(1, m1, s1), 1), (frame(2, m2, s2), 2)]
    df = spark.createDataFrame(rows, "value binary, offset long")
    out = dz.parse_avro_envelope_python(
        df, PAYLOAD_SPARK, {1: ENVELOPE_AVRO, 2: v2}
    )
    got = {r["after"]["pk"]: r["after"]["name"] for r in out.collect()}
    assert got == {10: "ten", 11: "eleven"}

    # unknown id -> FAILFAST
    bad = dz.parse_avro_envelope_python(df, PAYLOAD_SPARK, {1: ENVELOPE_AVRO})
    with pytest.raises(Exception, match="not in the registry|PythonException"):
        bad.collect()


def test_decimal_logical_through_spark_seam(spark):
    """Connect-style decimal payload field survives the Arrow hop into
    a DecimalType column exactly (no float detour)."""
    from datalake_iceberg_spark.cdc import debezium as dz

    payload = {
        "type": "record", "name": "P",
        "fields": [{"name": "pk", "type": "long"},
                   {"name": "price", "type": ["null", {
                       "type": "bytes", "logicalType": "decimal",
                       "precision": 10, "scale": 2}]}],
    }
    env = json.dumps({
        "type": "record", "name": "E",
        "fields": [
            {"name": "before", "type": ["null", payload]},
            {"name": "after", "type": ["null", "P"]},
            {"name": "source", "type": ["null", "string"]},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"]},
        ],
    })
    spark_payload = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("price", T.DecimalType(10, 2)),
    ])
    s = parse_schema(env)
    msg = {"before": None,
           "after": {"pk": 1, "price": Decimal("-12345.67")},
           "source": None, "op": "c", "ts_ms": 1}
    wire = b"\x00" + (7).to_bytes(4, "big") + encode_record(msg, s)
    df = spark.createDataFrame([(wire, 1)], "value binary, offset long")
    out = dz.parse_avro_envelope_python(df, spark_payload, env).collect()[0]
    assert out["after"]["price"] == Decimal("-12345.67")
    assert out["op"] == "c"
