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
    copy preserves the token MULTISET up to the v3 vocabulary rename
    (``word`` -> ``word_c<copy>`` for a hash-gated fraction of types —
    tf/length-invariant for the token-level queries)."""
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
    # same sorted token multiset after stripping the copy-1 rename
    # suffix, different word ORDER
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
    unsuffixed = F.transform(
        F.split("t1", " "), lambda t: F.regexp_replace(t, "_c1$", "")
    )
    both = src.join(c1, "doc_id").select(
        "doc_id", "text", "t1",
        F.array_sort(F.split("text", " ")).alias("ms"),
        F.array_sort(unsuffixed).alias("m1"),
        F.size(F.array_distinct(F.split("text", " "))).alias("nd"),
    )
    assert both.filter(F.col("ms") != F.col("m1")).count() == 0, (
        "token multiset changed beyond the copy-suffix rename"
    )
    # docs with >3 distinct words must (virtually all) change order —
    # allow a handful of hash-coincidence survivors
    big = both.filter(F.col("nd") > 3)
    n_big = big.count()
    unchanged = big.filter(F.col("text") == F.col("t1")).count()
    assert n_big > 0 and unchanged <= max(1, n_big // 100), (
        f"{unchanged}/{n_big} replicas kept their word order"
    )


def test_replica_vocabulary_grows_heaps_like(spark, sf_dir, scaled):
    """v3 (r14 verdict item 2): DISTINCT word types must grow with the
    copy count ~per the _PERTURB_PCT derivation — V(out) ≈
    (1 + (REP-1) * pct/100) · V(src) — so vocabulary-keyed joins are
    measured under distinct-key growth, not sf0.1 cardinality."""
    from datalake_iceberg_spark.ops.scale_tier import _PERTURB_PCT

    def vocab(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.length("tok") > 0).select("tok").distinct().count()
        )

    v_src = vocab(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    v_out = vocab(spark.read.parquet(f"{scaled}/documents.parquet"))
    expected = v_src * (1 + (REP - 1) * _PERTURB_PCT / 100.0)
    assert v_src * 1.05 < v_out, "vocabulary did not grow with copies"
    assert 0.85 * expected <= v_out <= 1.15 * expected, (
        f"vocab {v_out} vs expected ~{expected:.0f} (src {v_src})"
    )


def test_replica_embeddings_perturbed_near_dup(spark, sf_dir, scaled):
    """v3 (r14 advice): replica embeddings must not be bit-identical to
    their source (exact-dup cluster-stack artifact) but must stay true
    near-duplicates (tiny relative offset); copy 0 stays verbatim."""
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("e_src")
    )
    out = spark.read.parquet(f"{scaled}/embeddings.parquet")
    n_src = src.count()
    # copy 0 verbatim
    copy0 = out.join(src, "vec_id")
    assert copy0.filter(F.col("embedding") != F.col("e_src")).count() == 0
    # copy 1: element-wise |delta| <= _EMB_EPS and at least one element
    # differs in (virtually) every vector
    from datalake_iceberg_spark.ops.scale_tier import _EMB_EPS

    base = (
        out.join(src, "vec_id", "left_anti").agg(F.min("vec_id")).collect()
    )[0][0]
    c1 = out.filter(
        (F.col("vec_id") >= base) & (F.col("vec_id") < base + n_src)
    ).select((F.col("vec_id") - base).alias("vec_id"), "embedding")
    both = c1.join(src, "vec_id").select(
        F.aggregate(
            F.zip_with(
                "embedding", "e_src",
                lambda a, b: F.abs(a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0), lambda acc, x: F.greatest(acc, x),
        ).alias("max_abs_delta")
    )
    stats = both.agg(
        F.max("max_abs_delta").alias("worst"),
        F.sum(F.when(F.col("max_abs_delta") == 0, 1).otherwise(0)).alias(
            "identical"
        ),
        F.count("*").alias("n"),
    ).collect()[0]
    # float32 rounding can push a hair past eps
    assert stats.worst <= _EMB_EPS * 1.01, stats
    assert stats.identical <= max(1, stats.n // 100), (
        f"{stats.identical}/{stats.n} replica vectors identical to source"
    )
