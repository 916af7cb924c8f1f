#!/usr/bin/env python
"""Targeted A/B micro-bench: time a named subset of headline queries
with the bench's exact methodology (same session factory, warmup,
min-of-N ``df.count()``), printing one line per query plus the CPU
calibration fingerprint so runs on a drifting host stay comparable.

    python plans/r16/microbench.py q1_pricing_summary dup_clusters ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_BENCH_RUNS (default 3 here — A/B wants one more repeat
than the bench's 2 to beat host noise).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from datalake_iceberg_spark.session import create_spark_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = create_spark_session(app_name="microbench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).collect()  # warmup

    t0 = time.perf_counter()
    spark.range(0, 256_000_000, 1, 32).selectExpr(
        "sum(pmod(xxhash64(id), 1000000)) as h"
    ).collect()
    print(f"calibration_s={time.perf_counter() - t0:.3f}")

    total = 0.0
    for name in names:
        best, n = None, -1
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"micro:{name}")
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        total += best
        print(f"{name}: {best:.3f}s rows={n}")
    print(f"total: {total:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
