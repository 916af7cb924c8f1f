#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes with a count-style terminal action so the full plan
runs but no result set serializes to the driver (what a real cluster
run would measure). A warmup query is run first so JVM/codegen startup
isn't attributed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_iceberg_spark.session import create_spark_session  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q10_returned_items",
    "dedup_latest_events",
    "hourly_rollup_events",
    "sessionize_events",
    "merge_upsert_orders",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash",
    "knn_bruteforce",
    "centroid_similarity",
    "quality_score",
    "embedding_neardup_pairs",
    "ivf_ann_topk",
    "mm_asset_stats",
    "mm_decode_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import tempfile

    import __spark_entry__ as entrymod

    # event logging on: after the run, the engine's own analyzer grades
    # the bench against BASELINE.md's health bands (skew/GC/spill/wait)
    evlog_dir = tempfile.mkdtemp(prefix="bench_evlog_")
    spark = create_spark_session(
        app_name="bench",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog_dir,
            "spark.eventLog.compress": "false",
        },
    )
    qs = entrymod.queries()

    # warmup: JVM + codegen + parquet footer caches
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    spark.stop()

    health = {}
    try:
        from pathlib import Path

        from datalake_iceberg_spark.ops import eventlog as el

        logs = [p for p in Path(evlog_dir).iterdir() if not p.name.endswith(".inprogress")]
        if logs:
            report = el.analyze_eventlog(logs[0])
            health = {
                "cpu_efficiency": report["cpu_efficiency"],
                "cpu_verdict": report["cpu_verdict"],
                "total_spill_bytes": report["total_spill_bytes"],
                "max_skew_ratio": report["max_skew_ratio"],
                "n_stage_findings": len(report["findings"]),
            }
            for f in report["findings"][:10]:
                print(f"# health: stage {f['stage_id']} {f['findings']}", file=sys.stderr)
    except Exception as ex:  # health grading must never fail the bench
        print(f"# health analysis skipped: {ex}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "health": health,
    }))


if __name__ == "__main__":
    main()
