"""The de-hinted vocabulary-keyed queries (tfidf_top_terms,
pmi_collocations, ngram_lm_score — r13/r14 removed their forced
broadcasts) rely on AQE choosing the join strategy: broadcast while the
vocab side fits, sort-merge once Heaps-law growth outgrows it. The
bench records that at sf1 AQE still (correctly) picks broadcast — the
√10-grown vocabulary is under the adaptive threshold at that absolute
scale — which means the sort-merge fallback path the 100 TB story
relies on had never actually EXECUTED.

This test executes it: disable the broadcast threshold (hints are
unaffected — the deliberate 1-row/model-K hints stay), verify the final
adaptive plan really took SortMergeJoin, and require value-identical
results to the default-config run. The fallback is then a measured
fact: same answers, different physical strategy."""

from __future__ import annotations

import pytest

from datalake_iceberg_spark.queries import pipeline_ops, textops

QUERIES = [
    ("tfidf_top_terms", pipeline_ops.tfidf_top_terms),
    ("pmi_collocations", textops.pmi_collocations),
    ("ngram_lm_score", textops.ngram_lm_score),
]

_THRESHOLD_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _executed_plan(df):
    df.collect()  # finalize the adaptive plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name,fn", QUERIES, ids=[n for n, _ in QUERIES])
def test_sort_merge_fallback_matches_broadcast_plan(spark, sf_dir, name, fn):
    expected = _rows(fn(spark, sf_dir))

    saved = {}
    for conf in _THRESHOLD_CONFS:
        try:
            saved[conf] = spark.conf.get(conf)
        except Exception:
            saved[conf] = None
        spark.conf.set(conf, "-1")
    try:
        df = fn(spark, sf_dir)
        plan = _executed_plan(df)
        assert "SortMergeJoin" in plan, (
            f"{name}: threshold disabled but no SortMergeJoin in the "
            "executed plan — the fallback path was not exercised"
        )
        assert _rows(fn(spark, sf_dir)) == expected, name
    finally:
        for conf, val in saved.items():
            if val is None:
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, val)
