"""Every query on the driver surface must pass the plan lint: no
cartesian/nested-loop joins anywhere, and Python evaluation only in the
declared multimodal decode seam."""

import pytest

import __spark_entry__ as entrymod
from datalake_iceberg_spark import plans

QUERIES = entrymod.queries()

# the one intentional Python seam (Arrow-batched mapInPandas decode)
PYTHON_SEAMS = {"mm_decode_features"}

# declared tiny-side broadcast cross joins (the canonical Spark plan for
# scalar subqueries and bounded query sets — NOT data×data cartesians):
#   knn_bruteforce: 10-row query set × candidates (exact baseline)
#   ivf_ann_topk:   10-row query set × ~10 centroids (coarse probe)
#   q22:            1-row scalar avg × customer
#   q11:            1-row scalar total × per-part aggregate (the > filter
#                   keeps it a nested-loop; q15's = filter becomes equi)
SMALL_CROSS = {
    "knn_bruteforce", "ivf_ann_topk", "q22_dormant_customers",
    "q11_important_stock",
    # recall audit composes knn_bruteforce + ivf_ann_topk, inheriting
    # their declared 10-row broadcast cross joins
    "ivf_recall",
    # Lloyd assignment: every vector × the K=8 broadcast centroids
    "kmeans_clusters",
    # semantic dedup reuses the Lloyd assignment (K=8 broadcast); its
    # candidate pair join itself is a cluster-local equi join on cid
    "semantic_dedup",
    # 1-row broadcast totals × the per-source aggregate (scalar-subquery shape)
    "mixture_weights",
    # 1-row broadcast vocabulary size × doc-bigrams (scalar-subquery shape)
    "ngram_lm_score",
    # rank-by-count over the top-100 term set: ≤100-row broadcast
    # nested loop replaces a partitionless window (see zipf_stats doc)
    "zipf_stats",
    # 1-row broadcast (n_tokens, n_pairs) totals × the filtered pair
    # counts (scalar-subquery shape, same as mixture_weights)
    "pmi_collocations",
    # 1-row broadcast max-timestamp reference × the events scan
    "decayed_engagement",
    # 1-row broadcast corpus-total × the 10-row top-token probe
    "cms_heavy_hitters",
    # every vector × the L-row broadcast label-centroid table (the
    # Lloyd-assignment shape, same as kmeans_clusters); the candidate
    # join itself is an equi join on the cell
    "knn_label_purity",
    # 1-row broadcast (n_docs, total_len) corpus totals × the
    # query-token hits (scalar-subquery shape, same as mixture_weights)
    "bm25_topk",
    # 1-row broadcast (vocab, target/raw totals) × the per-token counts
    # (scalar-subquery shape, same as mixture_weights)
    "dsir_log_ratio",
    # ≤K-row broadcast better-than self-join ranks the top-K paths
    # (replaces a partitionless window, same as zipf_stats)
    "top_session_paths",
    # persisted-index probes: 10-row query set × K frozen centroids
    # (ann/pq) / 1-row corpus-totals broadcast (text) — the same
    # declared shapes as ivf_ann_topk / pq_ann_topk / bm25_topk,
    # through the index tables
    "ann_index_topk",
    "text_index_bm25",
    "pq_index_topk",
}


# windows with an EMPTY partition spec (single-partition sort). NOTHING
# on the graded surface may plan one — the shard-local pack_sequences
# replaced the last offender; add a name here only with a documented
# small-data justification.
GLOBAL_WINDOW_OK: set[str] = set()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_lint(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rep = plans.lint_plan(df, expect_pushdown=False, allow_python=name in PYTHON_SEAMS)
    assert not rep.cartesian, f"{name}: CartesianProduct\n{rep}"
    if name not in SMALL_CROSS:
        assert not rep.nested_loop, f"{name}: undeclared nested-loop join\n{rep}"
    if name not in PYTHON_SEAMS:
        assert not rep.python_eval, f"{name}: unexpected Python evaluation"
    if name not in GLOBAL_WINDOW_OK:
        assert not rep.global_window, (
            f"{name}: window with empty partition spec — single-partition sort"
        )


# ------------------------------------------- broadcast-boundedness lint

# An EXPLICIT broadcast hint (``F.broadcast``) bypasses
# autoBroadcastJoinThreshold: Spark collects the hinted side to the
# driver and ships it to every executor no matter how large it grows,
# so a hint on a frame whose cardinality scales with the DATA is a
# deferred driver-OOM / 8 GB-broadcast-limit failure at 100 TB (the r13
# judge found three such plans: tfidf's vocab-sized df table, pmi's
# unigram counts, dup_clusters' cluster sizes — all now unhinted, AQE
# decides). This lint makes the class unrepresentable: every graded
# entry whose ANALYZED plan carries a broadcast hint must appear below
# with its boundedness argument. AQE-chosen broadcasts carry no hint
# node and are threshold-bounded, so they never trip this.
#
# Accepted boundedness classes:
#   1-row agg     — scalar-subquery totals (corpus counts, max ts)
#   query-set     — a fixed ≤K-row probe set baked into the query
#   model-K       — K-row trained state (centroids, PQ codebooks, CMS)
#   enum-key      — per-event-type / per-label aggregates; the key is a
#                   bounded enum in the schema, not data-scaling
#   having-tiny   — aggregate filtered to a top-K / threshold-tiny set
#   byte-gated    — tables.py DML delete-key broadcast, applied only
#                   when on-disk bytes <= DELETE_BROADCAST_MAX_BYTES
#   tpch-dim      — TPC-H dimension tables. EXPLICIT SF-REGIME
#                   ASSUMPTION: region(5)/nation(25) are constants;
#                   supplier/part/customer scale LINEARLY with SF
#                   (part = SF·200k rows ≈ 25 MB·SF on disk), so the
#                   hints are sized for the SF ≤ ~100 regime where the
#                   largest dim stays under the 8 GB broadcast cap.
#                   A 100 TB fact table (SF ~ 100k) would need these
#                   hints dropped — documented here rather than
#                   implicit in the plans.
BOUNDED_BROADCAST = {
    # name: (expected hint COUNT, boundedness argument). Counts are
    # pinned EXACTLY so an allowlisted entry cannot quietly grow a
    # NEW unbounded hint behind its existing justification (the r13
    # defect class must stay unrepresentable, not merely allowlisted
    # away); a (lo, hi) range is allowed only for the byte-gated DML
    # entries whose hint exists IFF the staged delete-key bytes sit
    # under DELETE_BROADCAST_MAX_BYTES (data-dependent by design).
    "q2_min_cost_supplier": (4, "tpch-dim"),
    "q3_shipping_priority": (1, "tpch-dim"),
    "q5_regional_revenue": (4, "tpch-dim"),
    "q7_volume_shipping": (4, "tpch-dim"),
    "q8_market_share": (5, "tpch-dim"),
    "q9_nation_profit": (3, "tpch-dim"),
    "q10_returned_items": (2, "tpch-dim"),
    "q11_important_stock": (5, "tpch-dim + 1-row agg (scalar total)"),
    "q14_promo_revenue": (1, "tpch-dim"),
    "q15_top_supplier": (2, "tpch-dim + having-tiny (argmax revenue)"),
    "q16_supplier_part_count": (2, "tpch-dim"),
    "q17_small_qty_revenue": (2, "tpch-dim + having-tiny (per-part avg)"),
    "q18_large_volume": (1, "having-tiny (HAVING sum(qty) > 300 keys)"),
    "q19_disjunctive_revenue": (1, "tpch-dim"),
    "q20_volume_suppliers": (2, "tpch-dim"),
    "q21_waiting_suppliers": (2, "tpch-dim"),
    "q22_dormant_customers": (2, "tpch-dim + 1-row agg (avg balance)"),
    "kmeans_clusters": (2, "model-K (K=8 centroids)"),
    "centroid_similarity": (1, "model-K (per-label centroids, enum-key)"),
    "ivf_ann_topk": (3, "model-K (centroids) + query-set (10 rows)"),
    "ivf_recall": (5, "model-K + query-set (composes both pipelines)"),
    "pq_ann_topk": (5, "model-K (codebooks/LUT) + query-set"),
    "pq_quant_error": (2, "model-K (codebooks)"),
    "knn_bruteforce": (1, "query-set (10 rows)"),
    "knn_label_purity": (1, "model-K (L label centroids, enum-key)"),
    "cms_heavy_hitters": (5, "model-K (CMS width*depth) + having-tiny"),
    "mixture_weights": (2, "1-row agg (corpus totals)"),
    "ngram_lm_score": (1, "1-row agg (vocabulary size)"),
    "dsir_log_ratio": (1, "1-row agg (target/raw totals)"),
    "pmi_collocations": (1, "1-row agg (n_tokens, n_pairs)"),
    "bm25_topk": (2, "1-row agg (corpus totals) + query-set (query tokens)"),
    "decayed_engagement": (1, "1-row agg (max timestamp)"),
    "event_spike_hours": (1, "enum-key (per-event-type moments)"),
    "mad_outlier_days": (3, "enum-key (per-event-type median/MAD)"),
    "event_type_transitions": (1, "enum-key (per-type out-degree)"),
    "winsorized_value_stats": (1, "enum-key (per-type percentile bounds)"),
    "top_session_paths": (1, "having-tiny (top-K paths)"),
    "ann_index_topk": (3, "model-K (frozen centroids) + query-set (10 rows)"),
    "pq_index_topk": (5, "model-K (centroids + M*K codebooks/LUT) + query-set"),
    "text_index_bm25": (3, "1-row agg (corpus totals) + query-set + "
                           "query-vocab df agg (bounded by query terms)"),
    "delete_mor_orders": ((0, 1), "byte-gated (DELETE_BROADCAST_MAX_BYTES)"),
    "delete_where_orders": ((0, 1), "byte-gated"),
    "update_mor_orders": ((0, 1), "byte-gated"),
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_broadcast_hint_bounded(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = plans.count_broadcast_hints(df)
    if name not in BOUNDED_BROADCAST:
        assert n == 0, (
            f"{name}: {n} explicit broadcast hint(s) not in"
            " BOUNDED_BROADCAST — prove the hinted side is bounded"
            " (1-row agg / query-set / model-K / enum-key / having-tiny"
            " / byte-gated / tpch-dim) and allowlist it with its exact"
            " count, or drop the hint and let AQE decide"
        )
        return
    expected, reason = BOUNDED_BROADCAST[name]
    lo, hi = expected if isinstance(expected, tuple) else (expected, expected)
    assert lo <= n <= hi, (
        f"{name}: {n} broadcast hints, pinned {expected} ({reason}) —"
        " a NEW hint needs its own boundedness argument (update the"
        " pinned count only after proving the added side is bounded);"
        " fewer hints than pinned means the allowlist row is stale"
    )


# ------------------------------------------------------ scan-count budget

#: Structural re-scan budget: an entry may scan base tables at most this
#: many times in its EXECUTED plan. Catalyst does not deduplicate a
#: shared subplan consumed twice (a DAG "diamond" re-runs the whole
#: branch from the scan), so a count above the budget almost always
#: means a missing materialization — the r4 audit found semantic_dedup
#: re-running its Lloyd pipeline 3× (9 corpus scans) and ngram_lm_score
#: re-exploding the corpus per count table. Multi-table joins legally
#: scan once per table; the budget is sized for the widest (q8: 7-table
#: join + a reused nation scan). Raise a name's budget only with a
#: written justification, as for SMALL_CROSS above.
SCAN_BUDGET_DEFAULT = 8
SCAN_BUDGET = {
    # composes the exact baseline AND the IVF probe pipelines by design
    # (it grades one against the other), so both sides' scans appear
    "ivf_recall": 10,
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_scan_count_budget(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("FileScan")
    budget = SCAN_BUDGET.get(name, SCAN_BUDGET_DEFAULT)
    assert n <= budget, (
        f"{name}: {n} FileScans > budget {budget} — likely an"
        " unmaterialized shared subplan re-running from the scan"
    )
