"""Schema-driven randomized CDC workload generator.

Recreates the reference's datagen idea (``tests/06.datagen_iceberg.ipynb``:
Faker-based, schema-driven value synthesis per Spark type with a 10%
null rate, insert/update/delete mix 60/20/20) as a deterministic,
dependency-free generator: values are synthesized per Spark type from a
seeded ``random.Random``, so every run is reproducible.

Used by the MERGE-idempotence property tests: generate a random
envelope stream, apply it in different orders/duplications, assert the
lake table converges to the same state.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_MIX = {"c": 0.6, "u": 0.2, "d": 0.2}
NULL_RATE = 0.1


def _value_for(dtype: T.DataType, rng: random.Random):
    if isinstance(dtype, T.StringType):
        return "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 12)))
    if isinstance(dtype, (T.IntegerType, T.LongType)):
        return rng.randint(0, 10_000)
    if isinstance(dtype, T.ShortType):
        return rng.randint(0, 32_000)
    if isinstance(dtype, T.DoubleType):
        return round(rng.uniform(0, 1000), 4)
    if isinstance(dtype, T.FloatType):
        return round(rng.uniform(0, 1000), 2)
    if isinstance(dtype, T.BooleanType):
        return rng.random() < 0.5
    if isinstance(dtype, T.TimestampType):
        return datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(
            seconds=rng.randint(0, 86_400 * 30)
        )
    if isinstance(dtype, T.DateType):
        return (datetime(2024, 1, 1) + timedelta(days=rng.randint(0, 365))).date()
    if isinstance(dtype, T.BinaryType):
        return rng.randbytes(rng.randint(1, 16))
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal

        unscaled = rng.randint(0, 10 ** min(dtype.precision, 9))
        return Decimal(unscaled).scaleb(-dtype.scale)
    raise TypeError(f"datagen: unsupported type {dtype}")


def synth_row(schema: T.StructType, key_cols: list[str], pk, rng: random.Random) -> dict:
    """One payload row; non-key fields are nulled at NULL_RATE."""
    row = {}
    for f in schema.fields:
        if f.name in key_cols:
            row[f.name] = pk if len(key_cols) == 1 else pk[key_cols.index(f.name)]
        elif rng.random() < NULL_RATE:
            row[f.name] = None
        else:
            row[f.name] = _value_for(f.dataType, rng)
    return row


def generate_envelope_stream(
    schema: T.StructType,
    key_cols: list[str],
    n_events: int,
    seed: int = 7,
    mix: dict[str, float] | None = None,
    key_space: int = 50,
):
    """Yield (op, payload, offset) CDC events: inserts/updates target a
    bounded key space (so updates actually collide), deletes pick a
    previously-written key."""
    rng = random.Random(seed)
    mix = mix or DEFAULT_MIX
    ops, weights = zip(*mix.items())
    live: set = set()
    for offset in range(n_events):
        op = rng.choices(ops, weights)[0]
        if op == "d" and not live:
            op = "c"
        if op == "d":
            pk = rng.choice(sorted(live))
            live.discard(pk)
        else:
            pk = rng.randrange(key_space)
            live.add(pk)
        yield op, synth_row(schema, key_cols, pk, rng), offset


def envelope_df(
    spark: SparkSession,
    schema: T.StructType,
    key_cols: list[str],
    events: list[tuple[str, dict, int]],
) -> DataFrame:
    """Events → Debezium-shaped envelope DataFrame (before/after/op/
    ts_ms/offset), the input shape of ``cdc.pipeline``."""
    env_schema = T.StructType(
        [
            T.StructField("before", schema),
            T.StructField("after", schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    rows = [
        (
            payload if op == "d" else None,
            None if op == "d" else payload,
            op,
            1_700_000_000_000 + offset,
            offset,
        )
        for op, payload, offset in events
    ]
    return spark.createDataFrame(rows, env_schema)


def expected_final_state(
    events: list[tuple[str, dict, int]], key_cols: list[str]
) -> dict:
    """Driver-side oracle: replay events in offset order; the surviving
    payload per key (None = deleted)."""
    state: dict = {}
    for op, payload, _ in sorted(events, key=lambda e: e[2]):
        k = tuple(payload[c] for c in key_cols)
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = payload
    return state
