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

All manifest I/O goes through the
:mod:`datalake_iceberg_spark.fs` seam (like the lake core), so an
S3/GCS adapter is a drop-in; only the parquet bytes themselves ride
Spark's own Hadoop FileSystem. Row counts come from the written
files' parquet footers — the manifest always describes the bytes on
disk, even when the source DataFrame is non-deterministic. The footer
sweep is driver-side over ``n_shards`` metadata reads; with a
non-local FS at very high shard counts, lower ``n_shards`` (shards
should be few and large anyway).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_iceberg_spark.fs import DEFAULT_FS

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
    fs=None,
) -> dict[str, Any]:
    """Export ``df`` into ``n_shards`` deterministic parquet shards
    under ``path`` (dirs ``_shard=K``) and write ``manifest.json``.
    Returns the manifest dict."""
    fs = fs or DEFAULT_FS
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
    for entry in sorted(fs.listdir(path)):
        if not entry.startswith(f"{_SHARD_COL}="):
            continue
        sdir = fs.join(path, entry)
        n_files = n_bytes = n_rows = 0
        for name in fs.listdir(sdir):
            if not name.endswith(".parquet"):
                continue
            fpath = fs.join(sdir, name)
            n_files += 1
            n_bytes += fs.size(fpath)
            # footer-only read: the manifest reports what is ON DISK
            with fs.open_input(fpath) as f:
                n_rows += pq.ParquetFile(f).metadata.num_rows
        shards[entry.split("=", 1)[1]] = {
            "files": n_files,
            "bytes": n_bytes,
            "rows": n_rows,
        }
    manifest = {
        "n_shards": n_shards,
        "shard_key": key,
        "assignment": "pmod(xxhash64(key-as-strings), n_shards)",
        "compression": compression,
        "total_rows": sum(m["rows"] for m in shards.values()),
        "total_bytes": sum(m["bytes"] for m in shards.values()),
        "shards": shards,
    }
    fs.replace_atomic(
        fs.join(path, "manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def write_sorted_export(
    df: DataFrame,
    path: str,
    n_shards: int,
    order_by: list[str],
    compression: str = "zstd",
    fs=None,
) -> dict[str, Any]:
    """Globally-ordered export: ``n_shards`` parquet shards with
    DISJOINT, ordered key ranges — shard K holds keys strictly below
    shard K+1's, rows sorted within each shard. The layout an
    eval/serving reader wants for merge-scans and binary-searchable
    lookups (find the shard by manifest range, then one sorted file).

    Plan: ``repartitionByRange`` (one sampling pass to pick balanced
    split points + one range shuffle) then ``sortWithinPartitions`` —
    a TOTAL ordering at any scale WITHOUT a single-partition global
    sort: each task sorts only its own range. The manifest records
    each shard's (min, max) key from the written files' footers, so a
    reader never opens a shard outside its probe range.
    """
    fs = fs or DEFAULT_FS
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    missing = [c for c in order_by if c not in df.columns]
    if missing:
        raise ValueError(f"order_by columns not in DataFrame: {missing}")
    cols = [F.col(c) for c in order_by]
    (
        df.repartitionByRange(n_shards, *cols)
        .sortWithinPartitions(*cols)
        .write.option("compression", compression)
        .mode("overwrite")
        .parquet(path)
    )
    lead = order_by[0]
    shards: dict[str, dict[str, Any]] = {}
    for name in sorted(fs.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fpath = fs.join(path, name)
        with fs.open_input(fpath) as f:
            md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema != lead:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if hasattr(mn, "isoformat"):
                    mn, mx = mn.isoformat(), mx.isoformat()
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
        shards[name] = {
            "bytes": fs.size(fpath),
            "rows": md.num_rows,
            "min": lo,
            "max": hi,
        }
    manifest = {
        "order_by": order_by,
        "n_shards": n_shards,
        "compression": compression,
        "layout": "range-partitioned, sorted within shard, disjoint ranges",
        "total_rows": sum(m["rows"] for m in shards.values()),
        "total_bytes": sum(m["bytes"] for m in shards.values()),
        "shards": shards,
    }
    fs.replace_atomic(
        fs.join(path, "manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True, default=str),
    )
    return manifest
