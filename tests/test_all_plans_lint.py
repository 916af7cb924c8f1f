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
