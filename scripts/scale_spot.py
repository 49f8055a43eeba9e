"""Measured-scaling spot-check: time the given queries at sf0.01 and
sf0.1 (cold cache per run) and print one line per query — the numbers
SCALE.md's "Measured scaling" section cites.

Usage: python scripts/scale_spot.py q89 q90 q91 q92 q93 q94
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from anime_data_pipeline_spark.registry import all_queries
    from anime_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="scale_spot",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    wanted = [n for n in qs if any(n.startswith(p) for p in sys.argv[1:])]
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    for name in wanted:
        times = {}
        for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[sf_dir.rsplit("sf", 1)[1]] = round(best, 2)
        print(f"{name}: sf0.01 {times['0.01']}s -> sf0.1 {times['0.1']}s")


if __name__ == "__main__":
    main()
