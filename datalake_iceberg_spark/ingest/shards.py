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
- **One file per shard, one task per shard**: rows are shuffled once,
  routed so shard K lands on exactly task K (pre-imaged hash tokens —
  see ``_shard_partitioned``), and written via the dynamic-partition
  writer; shard files are as balanced as the hash is uniform and every
  task writes exactly one shard. At 100 TB pick ``n_shards`` so a
  shard ≈ a few GB (same sizing rule as bucket counts).
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
from datalake_iceberg_spark.tables import _exact_partition_col

_SHARD_COL = "_shard"
#: routing column for the export shuffle (dropped before write)
_PT_COL = "_pt"


def _shard_partitioned(staged: DataFrame, n_shards: int) -> DataFrame:
    """Shuffle so shard K lands on EXACTLY task K. Hashing the shard id
    itself into ``n_shards`` partitions is balls-into-bins (~37% of
    tasks empty, others writing 2-3 shard files each — the same skew
    class the bucketed table writer fixed via pre-imaged hash tokens);
    routing through ``_exact_partition_col`` gives one task per shard,
    so export parallelism and file sizing match the n_shards the caller
    chose."""
    return staged.withColumn(
        _PT_COL, _exact_partition_col(F.col(_SHARD_COL), n_shards)
    ).repartition(n_shards, _PT_COL).drop(_PT_COL)


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
    staged = _shard_partitioned(
        df.withColumn(_SHARD_COL, shard_expr(key, n_shards)), n_shards
    )
    (
        staged
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


# --------------------------------------------------------- webdataset tars

def write_webdataset_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    payload_cols: dict[str, str],
    meta_cols: list[str] | None = None,
    fs=None,
) -> dict[str, Any]:
    """Export samples as WebDataset-style tar shards — the sequential-
    read format multimodal training loaders consume (one tar per
    shard; each sample's members are ``<key>.<ext>`` entries, grouped
    consecutively; loaders stream the tar, never seek).

    - ``payload_cols``: ``{column: extension}`` — binary or string
      columns written as raw member bytes (e.g. ``{"payload": "jpg",
      "text": "txt"}``).
    - ``meta_cols``: columns serialized together into one
      ``<key>.json`` member per sample.

    Scale shape: shard = ``pmod(xxhash64(key), n_shards)`` (same
    deterministic assignment as the parquet shards), ONE shuffle to
    co-locate each shard's rows in one task, rows sorted by key within
    the shard, then each task streams its shards' tars directly from
    the executor through an Arrow ``mapInPandas`` pass — sample bytes
    never collect to the driver, and a shard is written exactly once
    because the repartition puts all of its rows in one partition. Tar
    bytes are deterministic (sorted members, zeroed mtime/uid/gid), so
    re-exports of the same data are byte-identical — rsync/dedup
    friendly.

    Local-FS note: executors write ``shard-%05d.tar`` under ``path``
    directly (fine on local[...] and any shared POSIX mount); an
    object-store deployment points ``path`` at a fuse/NFS-style mount
    or swaps the writer for a streaming-upload seam. The manifest
    (via the metadata ``fs`` seam) reports bytes/samples per tar as
    they landed on disk.
    """
    fs = fs or DEFAULT_FS
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    missing = [
        c for c in [key_col, *payload_cols, *(meta_cols or [])]
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    fs.makedirs(path)

    pay = dict(payload_cols)
    metas = list(meta_cols or [])

    staged = _shard_partitioned(
        df.withColumn(_SHARD_COL, shard_expr([key_col], n_shards)), n_shards
    ).sortWithinPartitions(_SHARD_COL, key_col)

    def _write(batches):
        # executor-side DATA-plane writes (like Spark's own parquet
        # tasks) — plain POSIX-joined paths, no driver fs-seam object
        # shipped into the closure. Each tar is written to a task-
        # attempt-unique temp name and atomically renamed into place at
        # task end: under task retries or speculative execution two
        # attempts of the same partition never append to the same file,
        # and the final path only ever holds a COMPLETE tar from
        # whichever attempt renamed last (byte-identical content either
        # way — the export is deterministic).
        import os
        import tarfile

        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else os.getpid()
        tars: dict[int, tarfile.TarFile] = {}
        paths: dict[int, tuple[str, str]] = {}  # shard -> (tmp, final)
        counts: dict[int, int] = {}

        def member(tf, name, data: bytes):
            import io
            import tarfile as _t

            info = _t.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))

        for pdf in batches:
            for _, row in pdf.iterrows():
                shard = int(row[_SHARD_COL])
                tf = tars.get(shard)
                if tf is None:
                    final = f"{path.rstrip('/')}/shard-{shard:05d}.tar"
                    tmp = f"{final}.attempt-{attempt}.tmp"
                    tf = tarfile.open(tmp, "w")
                    tars[shard] = tf
                    paths[shard] = (tmp, final)
                    counts[shard] = 0
                key = str(row[key_col])
                for col, ext in pay.items():
                    v = row[col]
                    if v is None:
                        continue
                    data = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    member(tf, f"{key}.{ext}", bytes(data))
                if metas:
                    doc = {c: _jsonable(row[c]) for c in metas}
                    member(
                        tf, f"{key}.json",
                        json.dumps(doc, sort_keys=True).encode(),
                    )
                counts[shard] += 1
        for shard, tf in tars.items():
            tf.close()
            tmp, final = paths[shard]
            os.replace(tmp, final)
        import pandas as pd

        yield pd.DataFrame(
            {"shard": list(counts), "n_samples": [counts[s] for s in counts]}
        )

    stats = (
        staged.mapInPandas(_write, schema="shard int, n_samples long")
        .collect()
    )
    shards = {}
    for r in sorted(stats, key=lambda r: r.shard):
        tar_name = f"shard-{r.shard:05d}.tar"
        shards[tar_name] = {
            "samples": r.n_samples,
            "bytes": fs.size(fs.join(path, tar_name)),
        }
    manifest = {
        "format": "webdataset-tar",
        "n_shards": n_shards,
        "key": key_col,
        "payloads": pay,
        "meta": metas,
        "assignment": "pmod(xxhash64(key-as-string), n_shards)",
        "total_samples": sum(m["samples"] for m in shards.values()),
        "total_bytes": sum(m["bytes"] for m in shards.values()),
        "shards": shards,
    }
    fs.replace_atomic(
        fs.join(path, "manifest.json"), json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def _jsonable(v):
    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, np.ndarray):
        return [_jsonable(x) for x in v]
    return v


def read_webdataset_shards(spark, path: str, meta_as_json: bool = True, fs=None):
    """Read WebDataset-style tar shards back into a DataFrame — the
    ingest half of :func:`write_webdataset_shards`'s loop (import a
    corpus that ships as WebDataset archives, or verify an export).

    Output: one row per SAMPLE — (shard, key, members map<ext, binary>,
    meta string|null) — where ``meta`` is the ``<key>.json`` member
    (kept as a JSON string for ``get_json_object``/``from_json``
    downstream when ``meta_as_json``; otherwise it stays a binary
    member in ``members``).

    Scale shape: shards parallelize as one task each (a tar has no
    internal split points — same granularity as any loader); each task
    STREAMS its tar through an Arrow ``mapInPandas`` pass, so sample
    bytes never collect to the driver and memory is bounded by one
    sample batch. This is a deliberate Python data-plane seam, like the
    multimodal decode.

    Member-name split: WebDataset's convention is key = name up to the
    FIRST dot — which cannot round-trip a key that itself contains a
    dot (``doc.v2`` + ``txt`` → ``doc.v2.txt`` → key ``doc``). When our
    export manifest sits next to the tars it names the exact extension
    set, so the split is longest-KNOWN-suffix instead and dotted keys
    round-trip; foreign archives without a manifest keep the spec's
    first-dot behavior."""
    import pandas as pd  # noqa: F401 (executor import mirrors below)

    from pyspark.sql import functions as F  # noqa: F401

    fs = fs or DEFAULT_FS
    known_exts: list[str] = []
    try:
        manifest = json.loads(fs.read_text(fs.join(path, "manifest.json")))
        if manifest.get("format") == "webdataset-tar":
            known_exts = sorted(
                {*manifest.get("payloads", {}).values(), "json"},
                key=len, reverse=True,
            )
    except (FileNotFoundError, ValueError, OSError):
        pass

    shards_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path")
    )

    def _split_member(name: str) -> tuple[str, str]:
        for e in known_exts:  # longest first; empty without a manifest
            if len(name) > len(e) + 1 and name.endswith("." + e):
                return name[: -len(e) - 1], e
        key, _, ext = name.partition(".")
        return key, ext

    def _read(batches):
        import tarfile

        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                shard = local.rsplit("/", 1)[-1]
                rows = {"shard": [], "key": [], "ext": [], "data": []}
                with tarfile.open(local) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = _split_member(m.name)
                        rows["shard"].append(shard)
                        rows["key"].append(key)
                        rows["ext"].append(ext)
                        rows["data"].append(tf.extractfile(m).read())
                yield pd.DataFrame(rows)

    members = shards_df.mapInPandas(
        _read, schema="shard string, key string, ext string, data binary"
    )
    from pyspark.sql import functions as F

    grouped = (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ext", "data")))
            ).alias("members")
        )
    )
    if not meta_as_json:
        return grouped
    return grouped.select(
        "shard", "key",
        F.map_filter(F.col("members"), lambda k, v: k != "json").alias("members"),
        F.element_at(F.col("members"), "json").cast("string").alias("meta"),
    )
