#!/usr/bin/env python
"""Time individual queries through the noop sink, with job labels.

Usage: python scripts/time_query.py q115 [q151 ...] [--reps N] [--conf k=v ...]

Same methodology as bench.py (clearCache between runs, noop sink,
best-of-reps) but scoped to named queries for fast iteration.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    confs: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from anime_data_pipeline_spark.registry import all_queries
    from anime_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="time_query",
        extra_conf={"spark.ui.showConsoleProgress": "false", **confs},
    )
    qs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    matched = [q for q in qs if any(q.startswith(n) or n in q for n in names)]
    for name in matched:
        runs = []
        for r in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: best={min(runs):.3f} runs=" + " ".join(f"{r:.3f}" for r in runs),
            flush=True,
        )
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
