#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries into plans/r13/.

Usage: python scripts/capture_plans.py <suffix> [query_substring ...]

Writes plans/r13/<query>_<suffix>.txt for every bench query (headline +
extras) matching any substring (default: all). Planning only — no jobs
are executed, so this is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2:]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from anime_data_pipeline_spark.registry import all_queries
    from anime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    qs = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    names = bench.BENCH_QUERIES + bench.EXTRA_QUERIES
    for name in names:
        if ONLY and not any(s in name for s in ONLY):
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
