"""Physical-plan quality gates: these queries must keep the plan shapes
that survive a 100× scale-up — filters pushed into the parquet scan,
small dims broadcast (no shuffle of the fact table against them),
column pruning, and whole-stage codegen on the hot path."""

from datalake_iceberg_spark import plans
from datalake_iceberg_spark.queries import analytics, dedup

_explain = plans.explain_text


def test_lint_plan_q5(spark, sf_dir):
    rep = plans.lint_plan(analytics.q5_regional_revenue(spark, sf_dir))
    assert not rep.cartesian
    assert rep.broadcast_joins >= 3
    assert rep.pushed_filters  # date predicate reaches the scan
    assert not rep.python_eval


def test_lint_plan_flags_python_eval(spark, sf_dir):
    from datalake_iceberg_spark.queries import multimodal

    rep = plans.lint_plan(multimodal.mm_decode_features(spark, sf_dir), allow_python=False)
    assert rep.python_eval  # mapInPandas decode is the known Python seam
    assert any("Python" in f for f in rep.findings)


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    text = _explain(analytics.q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters" in text and "l_shipdate" in text.split("PushedFilters")[1][:200]
    # column pruning: o_comment-style unused columns absent; ReadSchema minimal
    read_schema = text.split("ReadSchema")[1][:400]
    assert "l_orderkey" not in read_schema  # not needed by q1
    assert "BatchEvalPython" not in text  # hot path stays JVM-side


def test_q3_broadcasts_dimensions(spark, sf_dir):
    text = _explain(analytics.q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in text
    # the selective customer filter must reach the scan
    assert "c_mktsegment" in text


def test_q5_single_fact_shuffle(spark, sf_dir):
    text = _explain(analytics.q5_regional_revenue(spark, sf_dir))
    assert text.count("BroadcastHashJoin") >= 3  # cust/sup/nation/region sides
    # lineitem⋈orders may be SMJ or (under AQE at small SF) broadcast — both fine;
    # what must NOT happen is a cartesian or nested-loop join
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_dedup_latest_single_shuffle(spark, sf_dir):
    text = _explain(analytics.dedup_latest_events(spark, sf_dir))
    # exactly one hash shuffle on the key (formatted mode puts
    # "Arguments: hashpartitioning(...)" on its own line); the final
    # rangepartitioning exchange is the presentation ORDER BY, which is fine
    n_hash = text.count("hashpartitioning(")
    assert n_hash == 1, text
    # r15: dedup-latest is a max_by AGGREGATION, not a rank window — a
    # partial aggregate must sit below the exchange so one row per key
    # crosses it (the struct-typed max_by buffer plans as SortAggregate;
    # partial + final = one operator on each side of the shuffle)
    assert "Window" not in text, text
    n_agg = text.count("SortAggregate") + text.count("HashAggregate")
    assert n_agg >= 2, text
    assert "max_by" in text, text


def test_exact_dedup_partial_aggregation(spark, sf_dir):
    text = _explain(dedup.exact_dedup(spark, sf_dir))
    # map-side partial agg before the shuffle (HashAggregate appears
    # twice per grouping: partial + final)
    assert text.count("HashAggregate") >= 2


def test_asof_join_single_hash_shuffle_no_nested_loop(spark, sf_dir):
    from datalake_iceberg_spark.queries import asof

    text = _explain(asof.asof_purchase_click(spark, sf_dir))
    # the as-of must NOT plan as an inequality join
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
    # union + window carry-forward: exactly one hash shuffle on the key
    assert text.count("hashpartitioning(") == 1, text


def test_range_join_binned_is_equi_join(spark, sf_dir):
    from datalake_iceberg_spark.queries import asof

    text = _explain(asof.errors_context_window(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
    assert "SortMergeJoin" in text or "BroadcastHashJoin" in text or "ShuffledHashJoin" in text


def test_knn_no_python_udf(spark, sf_dir):
    from datalake_iceberg_spark.queries import similarity

    text = _explain(similarity.knn_bruteforce(spark, sf_dir))
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_q6_full_predicate_pushdown(spark, sf_dir):
    from datalake_iceberg_spark.queries import analytics as a

    text = _explain(a.q6_forecast_revenue(spark, sf_dir))
    pushed = text.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    # pure scan-filter-agg: no join operator of any kind
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in text


def test_q11_broadcast_threshold_no_cartesian_blowup(spark, sf_dir):
    from datalake_iceberg_spark.queries import tpch_ext

    text = _explain(tpch_ext.q11_important_stock(spark, sf_dir))
    # the 1-row global total joins as a broadcast, never a shuffle
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text
    assert "CartesianProduct" not in text


def test_q21_no_distinct_expand(spark, sf_dir):
    from datalake_iceberg_spark.queries import tpch_ext

    text = _explain(tpch_ext.q21_waiting_suppliers(spark, sf_dir))
    # the two-level agg must not plan the countDistinct Expand (×N row
    # blowup on the fact table)
    assert "Expand" not in text, text
    assert "CartesianProduct" not in text


def test_q2_window_min_reuses_agg(spark, sf_dir):
    from datalake_iceberg_spark.queries import tpch_ext

    text = _explain(tpch_ext.q2_min_cost_supplier(spark, sf_dir))
    assert text.count("BroadcastHashJoin") >= 3  # part/supplier/nation/region
    assert "CartesianProduct" not in text


def test_pipeline_ops_stay_jvm_side(spark, sf_dir):
    from datalake_iceberg_spark.queries import pipeline_ops as p

    for q in (p.props_json_stats, p.bigram_counts, p.tfidf_top_terms,
              p.hash_split_stats, p.regex_term_scan):
        text = _explain(q(spark, sf_dir))
        assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text, q.__name__


def test_global_window_detector(spark, sf_dir):
    """has_global_window flags a partitionless window and stays quiet on
    a partitioned one; pack_sequences (the former offender) now plans a
    hash shuffle on the shard id, not a single-partition sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datalake_iceberg_spark.queries import curation

    df = spark.range(100).withColumn("g", F.pmod(F.col("id"), F.lit(4)))
    w_global = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    w_part = (
        Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assert plans.has_global_window(
        _explain(df.withColumn("c", F.sum("id").over(w_global)))
    )
    assert not plans.has_global_window(
        _explain(df.withColumn("c", F.sum("id").over(w_part)))
    )

    rep = plans.lint_plan(curation.pack_sequences(spark, sf_dir))
    assert not rep.global_window
    # the documented small-data variant IS the global sort
    rep_g = plans.lint_plan(curation.pack_sequences_global(spark, sf_dir))
    assert rep_g.global_window


def test_pack_sequences_shard_invariants(spark, sf_dir):
    """Shard-local packing conserves tokens/docs and keeps every bin's
    doc range inside one shard."""
    from pyspark.sql import functions as F

    from datalake_iceberg_spark.queries import curation
    from datalake_iceberg_spark.queries import load

    out = curation.pack_sequences(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tok = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    agg = out.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).collect()[0]
    assert agg["d"] == n_docs and agg["t"] == n_tok
    # bin endpoints belong to the bin's own shard
    bad = out.filter(
        (F.pmod(F.col("first_doc"), F.lit(curation.N_PACK_SHARDS)) != F.col("shard"))
        | (F.pmod(F.col("last_doc"), F.lit(curation.N_PACK_SHARDS)) != F.col("shard"))
    ).count()
    assert bad == 0
