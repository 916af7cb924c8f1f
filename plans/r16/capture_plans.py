#!/usr/bin/env python
"""Capture .explain('formatted') for a named set of queries into
plans/r16/<query>_<tag>.txt (tag = before/after). Usage:

    python plans/r16/capture_plans.py <tag> <query> [<query> ...]

Plans are captured at sf0.1 (the driver's bench SF) with the same
session factory the bench uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from datalake_iceberg_spark.plans import explain_text  # noqa: E402
from datalake_iceberg_spark.session import create_spark_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = create_spark_session(app_name=f"plans_{tag}")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = explain_text(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)}B exchanges={n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
