"""Training-shard export: the hand-off from curated lake data to a
training job.

Beyond-reference surface (the reference stops at Iceberg tables). A
trainer wants N similarly-sized, deterministically-assigned shard
files plus a manifest — not a directory of whatever task layout the
last Spark stage happened to have:

- **Deterministic assignment**: shard = ``pmod(xxhash64(key), n)`` —
  the same row lands in the same shard on every run and on any
  cluster, so resumed/re-run exports are reproducible and downstream
  sampling can seed off shard ids. With no key given, the content
  hash of all columns is used (re-exports stay stable under row-order
  changes).
- **One file per shard**: rows are shuffled once on the shard id
  (``repartition(n, shard)``) and written via the dynamic-partition
  writer, so shard files are as balanced as the hash is uniform. At
  100 TB pick ``n_shards`` so a shard ≈ a few GB (same sizing rule as
  bucket counts).
- **Manifest**: per-shard row counts + bytes + the assignment spec,
  written as JSON next to the shards — the contract a data loader
  reads instead of listing the filesystem.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHARD_COL = "_shard"


def shard_expr(columns: list[str], n_shards: int):
    """Deterministic shard id for a row (same hash family as the lake
    bucket layout — null-safe via coalesce-to-sentinel)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in columns]
    return F.pmod(F.xxhash64(*cols), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    by: list[str] | None = None,
    compression: str = "zstd",
) -> dict[str, Any]:
    """Export ``df`` into ``n_shards`` deterministic parquet shards
    under ``path`` (dirs ``_shard=K``) and write ``manifest.json``.
    Returns the manifest dict."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = by or df.columns
    missing = [c for c in key if c not in df.columns]
    if missing:
        raise ValueError(f"shard key columns not in DataFrame: {missing}")
    staged = df.withColumn(_SHARD_COL, shard_expr(key, n_shards))
    (
        staged.repartition(n_shards, _SHARD_COL)
        .write.partitionBy(_SHARD_COL)
        .option("compression", compression)
        .mode("overwrite")
        .parquet(path)
    )
    shards: dict[str, dict[str, int]] = {}
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{_SHARD_COL}="):
            continue
        sdir = os.path.join(path, entry)
        files = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        n_bytes = sum(os.path.getsize(os.path.join(sdir, f)) for f in files)
        shards[entry.split("=", 1)[1]] = {"files": len(files), "bytes": n_bytes}
    # row counts in one job, not one count() per shard
    counts = {
        str(r[_SHARD_COL]): r["n"]
        for r in staged.groupBy(_SHARD_COL).agg(F.count("*").alias("n")).collect()
    }
    for sid, meta in shards.items():
        meta["rows"] = counts.get(sid, 0)
    manifest = {
        "n_shards": n_shards,
        "shard_key": key,
        "assignment": "pmod(xxhash64(key-as-strings), n_shards)",
        "compression": compression,
        "total_rows": sum(m["rows"] for m in shards.values()),
        "total_bytes": sum(m["bytes"] for m in shards.values()),
        "shards": shards,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
