"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Beyond-reference surface for a training-data pipeline. The actual
codecs (PIL/ffmpeg/torchaudio) are not in this container, so the decode
kernels are **deterministic fakes behind a clearly-marked seam**
(``register_decoder``) — the Spark-side plumbing (schema, batch
iteration via ``mapInPandas``, partition sizing, metadata extraction)
is real and tested. Swapping in a real codec is a one-function change.

Scale notes:
- binary payloads ride in parquet pages; ``mapInPandas`` streams Arrow
  record batches so one executor never materializes a whole partition
  of blobs — set ``spark.sql.files.maxPartitionBytes`` so (blob size ×
  rows per batch) fits executor memory;
- metadata-only operations (``describe_assets``) project the metadata
  struct and never touch the payload column — column pruning keeps the
  blobs unread on disk;
- feature extraction emits fixed-width vectors; downstream ANN uses
  :mod:`datalake_iceberg_spark.queries.similarity`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image | audio | video
    T.StructField("media_type", T.StringType(), True),  # e.g. image/png
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

_DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {}


def register_decoder(modality: str, fn: Callable[[bytes], dict[str, Any]]) -> None:
    """Swap-in point for real codecs (PIL, ffmpeg, ...)."""
    _DECODERS[modality] = fn


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a codec: derives pseudo pixel stats
    from the payload digest. NOT a real decoder — see module docstring."""
    d = hashlib.md5(payload or b"").digest()
    return {"mean_intensity": d[0] / 255.0, "n_bytes": len(payload or b"")}


def decode_assets(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """payload → features via mapInPandas (Arrow batches).

    Output: asset_id, modality, n_bytes, feature array<float>.
    Raises NotImplementedError at runtime for modalities with no
    registered decoder and no fake allowed.
    """
    out_schema = T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                decoder = _DECODERS.get(r["modality"], _fake_decode)
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                stats = decoder(payload)
                digest = hashlib.md5(payload).digest()
                feature = [
                    (digest[i % len(digest)] / 255.0) * stats.get("mean_intensity", 1.0)
                    for i in range(feature_dim)
                ]
                rows.append((r["asset_id"], r["modality"], len(payload), feature))
            yield pd.DataFrame(rows, columns=["asset_id", "modality", "n_bytes", "feature"])

    return df.select("asset_id", "modality", "payload").mapInPandas(run, out_schema)


def describe_assets(df: DataFrame) -> DataFrame:
    """Metadata-only projection — never reads the payload column, so
    parquet column pruning skips the blob pages entirely."""
    return (
        df.select(
            "modality",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        )
        .groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
            F.sum("duration_ms").alias("total_duration_ms"),
        )
        .orderBy("modality")
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (asset, frame_ts).
    The timestamps come from metadata; actual frame extraction is the
    decoder seam. Demonstrates the explode-based fan-out shape that
    keeps sampling distributed."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic asset table for tests/benches (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 3)
        meta = {
            "width": 64 + i if modality == "image" else None,
            "height": 48 + i if modality == "image" else None,
            "duration_ms": 1000 * (1 + i % 10) if modality != "image" else None,
            "sample_rate": 16000 if modality == "audio" else None,
        }
        rows.append((i, modality, f"{modality}/bin", payload, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
