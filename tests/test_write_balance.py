"""Exact shuffle placement for bucketed writes (r14 sf1 capture
finding: 3.7x task skew on the merge write).

``repartition(n, cols)`` hashes the column tuple into n partitions —
with ~n distinct (bucket, split) combos that's balls-into-bins: ~37%
of tasks empty, others carrying 2-3 combos. ``exact_shuffle_tokens``
pre-images Spark's Murmur3 int hash so the writer can route each combo
to exactly one partition. These tests pin the pure-Python murmur
replica against Spark's own ``F.hash`` (a Spark hash change must break
here, not silently skew writes) and verify end-to-end placement."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from datalake_iceberg_spark.tables import (
    _murmur3_hash_int,
    exact_shuffle_tokens,
)


def test_murmur_replica_matches_spark_hash(spark):
    vals = list(range(200)) + [2**31 - 1, 12345678]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r.v: r.h for r in df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert _murmur3_hash_int(v) == got[v], v


def test_tokens_cover_every_partition():
    for n in (1, 2, 7, 32, 64, 1024):
        toks = exact_shuffle_tokens(n)
        assert len(toks) == n
        assert sorted(_murmur3_hash_int(t) % n for t in toks) == list(range(n))


def test_exact_placement_balances_write_shuffle(spark):
    """A 64-combo shuffle into 64 partitions must land exactly one
    combo per partition (the raw tuple-hash repartition leaves ~37%
    empty)."""
    from datalake_iceberg_spark.tables import _exact_partition_col

    n = 64
    df = (
        spark.range(n * 1000)
        .select(F.pmod(F.col("id"), F.lit(n)).cast("int").alias("combo"))
        .withColumn("_pt", _exact_partition_col(F.col("combo"), n))
        .repartition(n, "_pt")
    )
    per_part = Counter(
        (r.p for r in df.select(
            F.spark_partition_id().alias("p")
        ).collect())
    )
    assert len(per_part) == n, f"only {len(per_part)}/{n} partitions used"
    assert max(per_part.values()) == min(per_part.values()) == 1000


def test_merge_persist_gate(spark, tmp_path, monkeypatch):
    """_persist_batch persists batch-sized sources (scan or pipeline)
    and passes table-scale estimates through uncached."""
    import datalake_iceberg_spark.tables as T
    from datalake_iceberg_spark.tables import LakeCatalog

    p = str(tmp_path / "src")
    spark.range(1000).write.parquet(p)
    scan = spark.read.parquet(p)
    tbl = LakeCatalog(spark, str(tmp_path / "wh")).create_or_replace(
        "t", spark.range(10).select(F.col("id")), key=["id"], n_buckets=2
    )
    for src in (scan, scan.groupBy((F.col("id") % 7).alias("g")).count()):
        df, handle = tbl._persist_batch(src)
        assert handle is not None, src  # small estimate: persisted
        handle.unpersist()
    with monkeypatch.context() as m:
        m.setattr(T, "MERGE_PERSIST_MAX_BYTES", 1)
        df2, handle2 = tbl._persist_batch(scan)
        assert handle2 is None and df2 is scan  # over cap: passthrough


def test_shard_export_one_task_per_shard(spark):
    """The training-shard exporter routes shard K to exactly task K —
    export parallelism matches the caller's n_shards instead of the
    balls-into-bins layout raw tuple-hash repartition gives."""
    from datalake_iceberg_spark.ingest.shards import (
        _SHARD_COL,
        _shard_partitioned,
        shard_expr,
    )

    n = 16
    df = spark.range(4000).select(F.col("id").alias("k"))
    staged = _shard_partitioned(
        df.withColumn(_SHARD_COL, shard_expr(["k"], n)), n
    )
    placed = staged.select(
        _SHARD_COL, F.spark_partition_id().alias("p")
    ).distinct().collect()
    assert len(placed) == n  # one (shard, partition) pair per shard
    for r in placed:
        assert r.p == r[_SHARD_COL] % n, (r[_SHARD_COL], r.p)
