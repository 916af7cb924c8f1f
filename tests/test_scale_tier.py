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
