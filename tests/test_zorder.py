"""Z-order clustering: the JVM bit-interleave must match a reference
Python Morton encoding exactly, respect the quadrant ordering property,
and `rewrite_data_files(zorder_by=...)` must preserve content while
leaving every bucket's file sorted by z."""

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_iceberg_spark.functions.zorder import zvalue
from datalake_iceberg_spark.tables import LakeCatalog


def _py_scale(v, lo, hi, bits):
    span = hi - lo
    top = (1 << bits) - 1
    if span <= 0 or v is None:
        return 0
    return int(max(0.0, min(((v - lo) / span) * top, float(top))))


def _py_morton(vals, ranges, bits):
    out = 0
    n = len(vals)
    for i, (v, (lo, hi)) in enumerate(zip(vals, ranges)):
        s = _py_scale(v, lo, hi, bits)
        for j in range(bits):
            out |= ((s >> j) & 1) << (j * n + i)
    return out


def test_zvalue_matches_python_reference(spark):
    pts = [(float(a), float(b)) for a in (0, 3, 17, 100, 255) for b in (0, 5, 77, 255)]
    ranges = [(0.0, 255.0), (0.0, 255.0)]
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in pts])
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue(["a", "b"], ranges, bits=8).alias("z")).collect()
    }
    for a, b in pts:
        assert got[(a, b)] == _py_morton([a, b], ranges, 8), (a, b)


def test_zvalue_quadrant_ordering(spark):
    """Morton property: every point with both coords in the low half
    sorts before every point with both coords in the high half."""
    ranges = [(0.0, 1023.0), (0.0, 1023.0)]
    rows = [Row(a=float(a), b=float(b)) for a in range(0, 1024, 97) for b in range(0, 1024, 89)]
    df = spark.createDataFrame(rows).select(
        "a", "b", zvalue(["a", "b"], ranges, bits=10).alias("z")
    )
    low = df.filter((F.col("a") < 512) & (F.col("b") < 512)).agg(F.max("z")).collect()[0][0]
    high = df.filter((F.col("a") >= 512) & (F.col("b") >= 512)).agg(F.min("z")).collect()[0][0]
    assert low < high


def test_zorder_rewrite_clusters_both_columns(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    # 2-D uniform grid, written in a-major order (worst case for b)
    df = spark.range(0, 4096).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("double").alias("a"),
        (F.col("id") / 64).cast("double").alias("b"),
    )
    t = cat.create_or_replace("db.z", df, key=["k"], n_buckets=2)
    before = {tuple(r) for r in t.read().collect()}
    res = t.rewrite_data_files(zorder_by=["a", "b"])
    assert res["rewritten_buckets"] == 2
    after = {tuple(r) for r in t.read().collect()}
    assert after == before                      # content preserved
    assert "__z" not in t.read().columns        # synthetic key dropped

    # clustering contract that row-group pruning actually relies on:
    # every FILE in a bucket dir is z-sorted internally, and the files'
    # z-extents are pairwise disjoint (the range sub-split write gives
    # parallel tasks contiguous slices — a hash sub-split would overlap)
    snap = t.snapshot()
    # recompute with the SAME bounds the rewrite used (actual min/max)
    bnd = t.read().agg(
        F.min("a"), F.max("a"), F.min("b"), F.max("b")
    ).collect()[0]
    ranges = [(bnd[0], bnd[1]), (bnd[2], bnd[3])]
    for dirs in snap.buckets.values():
        for rel in dirs:
            extents = []
            abs_dir = os.path.join(t.location, rel)
            for fname in sorted(os.listdir(abs_dir)):
                if not fname.endswith(".parquet"):
                    continue
                part = spark.read.parquet(os.path.join(abs_dir, fname))
                zs = [
                    r.z
                    for r in part.select(zvalue(["a", "b"], ranges).alias("z")).collect()
                ]
                if not zs:
                    continue
                assert zs == sorted(zs), f"file {fname} not z-ordered"
                extents.append((zs[0], zs[-1]))
            extents.sort()
            for (lo1, hi1), (lo2, hi2) in zip(extents, extents[1:]):
                assert hi1 <= lo2, "file z-extents overlap within a bucket"


def test_zorder_rejects_all_null_column(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "whn"))
    df = spark.range(0, 64).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("a"),
        F.lit(None).cast("double").alias("b"),
    )
    t = cat.create_or_replace("db.znull", df, key=["k"], n_buckets=2)
    with pytest.raises(ValueError, match="no non-NULL"):
        t.rewrite_data_files(zorder_by=["a", "b"])
    with pytest.raises(ValueError, match="not in table schema"):
        t.rewrite_data_files(zorder_by=["a", "missing"])


def test_zorder_on_temporal_column(spark, tmp_path):
    """date/timestamp columns scale via integer epoch instead of
    handing raw temporals to _scale (which needs floats)."""
    cat = LakeCatalog(spark, str(tmp_path / "wht"))
    df = spark.range(0, 256).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("a"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
    )
    t = cat.create_or_replace("db.ztemp", df, key=["k"], n_buckets=2)
    before = {tuple(r) for r in t.read().collect()}
    res = t.rewrite_data_files(zorder_by=["a", "d"])
    assert res["rewritten_buckets"] == 2
    assert {tuple(r) for r in t.read().collect()} == before
    res = t.rewrite_data_files(zorder_by=["a", "ts"])
    assert res["rewritten_buckets"] == 2
    assert {tuple(r) for r in t.read().collect()} == before
