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

    import __spark_entry__ as entrymod

    spark = create_spark_session(app_name="bench")
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
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
