#!/usr/bin/env python
"""Capture .explain('formatted') for registered queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
  tag     e.g. r14 — output goes to plans/r14/<query>_<suffix>.txt
  query   subset of registry names (default: all)

Suffix is 'before' unless PLANS_SUFFIX is set (e.g. PLANS_SUFFIX=after).
Building a query's DataFrame may run driver-side jobs (eager checkpoints,
iteration collects) — that is part of the plan being documented; the final
explain string is what lands in the file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    only = sys.argv[2:]
    suffix = os.environ.get("PLANS_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from enterprise_warp_spark.queries import REGISTRY
    from enterprise_warp_spark.session import get_spark

    spark = get_spark(app_name="ews-plans")
    spark.sparkContext.setLogLevel("ERROR")

    names = only or sorted(REGISTRY)
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — capture what we can
            plan = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
