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
