"""The sfN derivation must preserve row multiplicity, referential
integrity, the graded modular splits, and the fixed query sets."""

import os

import pytest
from pyspark.sql import functions as F

from datalake_iceberg_spark.ops.scale_tier import (
    _MARKER,
    ensure_scaled_dir,
)

REP = 3


@pytest.fixture(scope="module")
def scaled(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scaled") / "sfx")
    return ensure_scaled_dir(spark, sf_dir, out, replication=REP)


def test_row_counts_scale(spark, sf_dir, scaled):
    for t, fixed in (("lineitem", False), ("documents", False),
                     ("embeddings", False), ("events", False),
                     ("nation", True), ("region", True)):
        n_src = spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        n_out = spark.read.parquet(f"{scaled}/{t}.parquet").count()
        assert n_out == (n_src if fixed else n_src * REP), t


def test_referential_integrity_holds(spark, scaled):
    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    orders = spark.read.parquet(f"{scaled}/orders.parquet")
    part = spark.read.parquet(f"{scaled}/part.parquet")
    dangling_o = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    dangling_p = li.join(
        part, li.l_partkey == part.p_partkey, "left_anti"
    ).count()
    assert dangling_o == 0 and dangling_p == 0
    cust = spark.read.parquet(f"{scaled}/customer.parquet")
    assert orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).count() == 0


def test_keys_stay_unique(spark, scaled):
    for t, k in (("orders", "o_orderkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id"), ("customer", "c_custkey")):
        df = spark.read.parquet(f"{scaled}/{t}.parquet")
        assert df.count() == df.select(k).distinct().count(), t


def test_modular_splits_preserved(spark, sf_dir, scaled):
    """Offsets are multiples of 100, so each copy contributes the same
    id%10 cohort sizes as the source — the incremental-dedup /
    index-staging splits keep their meaning."""
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).count()
    )
    out = (
        spark.read.parquet(f"{scaled}/documents.parquet")
        .filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).count()
    )
    assert out == src * REP


def test_fixed_query_set_unchanged(spark, sf_dir, scaled):
    """vec_id < N_QUERIES still selects exactly the copy-0 query rows."""
    from datalake_iceberg_spark.queries.similarity import N_QUERIES

    src = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < N_QUERIES).count()
    )
    out = (
        spark.read.parquet(f"{scaled}/embeddings.parquet")
        .filter(F.col("vec_id") < N_QUERIES).count()
    )
    assert out == src


def test_idempotent_marker(spark, sf_dir, scaled):
    """A second call with the same recipe reuses the tier (marker
    mtime unchanged — nothing rewritten)."""
    marker = os.path.join(scaled, _MARKER)
    before = os.path.getmtime(marker)
    assert ensure_scaled_dir(spark, sf_dir, scaled, replication=REP) == scaled
    assert os.path.getmtime(marker) == before


def test_replica_text_shuffled_not_neardup(spark, sf_dir, scaled):
    """Replicas must NOT be shingle-level near-dups of their source doc
    (the pair-blowup artifact), while copy 0 stays verbatim and every
    copy preserves the token MULTISET (tf/vocabulary/length-invariant
    for the token-level queries)."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = spark.read.parquet(f"{scaled}/documents.parquet").select(
        "doc_id", "text"
    )
    n_src = src.count()
    # copy 0 verbatim
    joined = src.alias("s").join(
        out.alias("o"), F.col("s.doc_id") == F.col("o.doc_id")
    )
    assert joined.filter(F.col("s.text") != F.col("o.text")).count() == 0
    # copy 1 (doc_id + offset, offset = smallest out id not in src):
    # same sorted token multiset, different word ORDER
    offs = sorted(
        r.doc_id for r in out.select("doc_id").distinct().collect()
    )
    src_ids = {r.doc_id for r in src.select("doc_id").collect()}
    copy1_base = min(d for d in offs if d not in src_ids)
    c1 = out.filter(
        (F.col("doc_id") >= copy1_base)
        & (F.col("doc_id") < copy1_base + n_src)
    ).select((F.col("doc_id") - copy1_base).alias("doc_id"),
             F.col("text").alias("t1"))
    both = src.join(c1, "doc_id").select(
        "doc_id", "text", "t1",
        F.array_sort(F.split("text", " ")).alias("ms"),
        F.array_sort(F.split("t1", " ")).alias("m1"),
        F.size(F.array_distinct(F.split("text", " "))).alias("nd"),
    )
    assert both.filter(F.col("ms") != F.col("m1")).count() == 0, (
        "token multiset changed"
    )
    # docs with >3 distinct words must (virtually all) change order —
    # allow a handful of hash-coincidence survivors
    big = both.filter(F.col("nd") > 3)
    n_big = big.count()
    unchanged = big.filter(F.col("text") == F.col("t1")).count()
    assert n_big > 0 and unchanged <= max(1, n_big // 100), (
        f"{unchanged}/{n_big} replicas kept their word order"
    )
