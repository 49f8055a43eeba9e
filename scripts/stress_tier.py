"""100×-over-sf0.01 stress tier (r5 verdict item 6): the sandbox tops
out at sf0.1, so synthesize an sf1-equivalent corpus (10× the sf0.1
rows = 100× the sf0.01 rows the driver gates on) in /tmp and measure
the heaviest operators against it — the closest local proxy for the
"would this survive a 100× scale-up" question the 100 TB design must
answer.

Generation (DuckDB, deterministic, idempotent):
- documents ×10: replica r gets doc_id + r*2,520,000 (a multiple of
  lcm(1..10), so every doc_id % k selection keeps its exact class
  distribution) and a Caesar-shifted alphabet (translate by r): word
  lengths, whitespace, punctuation and Zipf shape survive, but
  shingles/tokens are DISJOINT across replicas — duplicates stay
  ~proportional to corpus size instead of every replica colliding
  with its original, which is what a genuinely larger crawl looks
  like and what keeps the near-dup workload honest.
- embeddings ×10: vec_id offset the same way; per-dimension hash
  noise in [-0.05, 0.05] (values span ~[-0.6, 0.6]) so replicas are
  NOT near-parallel to their originals — semantic-dedup cells grow in
  population, not in artificial duplicate mass.
- lineitem ×10: l_orderkey + r*25,200,000 (same lcm trick) — ~6M rows
  for relational stress.
- every other table symlinks to sf0.1 (dimensions don't scale here).

Measurement: cold-cache best-of-2 per query at sf0.01 and at the
stress tier, reporting the 100× wall-time ratio and the growth
exponent log(ratio)/log(100) — exponent ≤ ~1.2 ≈ O(n log n); anything
above gets a written mitigation in SCALE.md.

Usage: python scripts/stress_tier.py [q88 q104 q86 q161 q34 ...]
"""

from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SMALL = "/root/testdata/sf0.01"
STRESS_DIR = os.environ.get("STRESS_DIR", "/tmp/stress_sf1")
REPLICAS = 10
OFF = 2_520_000  # lcm(1..10)=2520 — preserves every small-modulus class
LINE_OFF = 25_200_000
DEFAULT_QUERIES = ["q88", "q104", "q86", "q161", "q34"]
SYMLINK_TABLES = [
    "region", "nation", "customer", "supplier", "part",
]


def _rot(r: int) -> tuple[str, str]:
    low = string.ascii_lowercase
    up = string.ascii_uppercase
    return (
        low + up,
        low[r:] + low[:r] + up[r:] + up[:r],
    )


def generate() -> None:
    import duckdb

    marker = os.path.join(STRESS_DIR, ".complete")
    if os.path.exists(marker):
        print(f"stress tier already generated at {STRESS_DIR}")
        return
    os.makedirs(STRESS_DIR, exist_ok=True)
    con = duckdb.connect()
    t0 = time.perf_counter()

    for table, build in (
        (
            "documents",
            lambda r: f"""
            SELECT doc_id + {r * OFF} AS doc_id,
                   translate(text, '{_rot(r)[0]}', '{_rot(r)[1]}') AS text,
                   lang, source, n_chars
            FROM read_parquet('{SRC}/documents.parquet')
            """,
        ),
        (
            "embeddings",
            lambda r: f"""
            SELECT vec_id + {r * OFF} AS vec_id,
                   CAST(list_transform(embedding, (x, i) ->
                     x + (CAST(hash(vec_id * 1009 + i * 17 + {r}) % 101 AS DOUBLE)
                          - 50.0) / 1000.0) AS FLOAT[]) AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet')
            """,
        ),
        (
            "lineitem",
            lambda r: f"""
            SELECT * REPLACE (l_orderkey + {r * LINE_OFF} AS l_orderkey)
            FROM read_parquet('{SRC}/lineitem.parquet')
            """,
        ),
        # orders scales WITH lineitem (same key offset) so FK joins
        # stay closed — the same customers just place 10x the orders,
        # which is what a larger TPC-H SF does too.
        (
            "orders",
            lambda r: f"""
            SELECT * REPLACE (o_orderkey + {r * LINE_OFF} AS o_orderkey)
            FROM read_parquet('{SRC}/orders.parquet')
            """,
        ),
        # events: same users, 10x the traffic in the same wall-clock
        # span (a busier site, not a longer history) — jitter seconds
        # keep replicas from being tie-identical in windows.
        (
            "events",
            lambda r: f"""
            SELECT * REPLACE (
                event_id + {r * LINE_OFF} AS event_id,
                ts + INTERVAL ({r * 7}) SECOND AS ts)
            FROM read_parquet('{SRC}/events.parquet')
            """,
        ),
    ):
        out_dir = os.path.join(STRESS_DIR, f"{table}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for r in range(REPLICAS):
            dst = os.path.join(out_dir, f"part-{r:02d}.parquet")
            con.execute(f"COPY ({build(r)}) TO '{dst}' (FORMAT PARQUET)")
        print(f"  {table}: {REPLICAS} replicas -> {out_dir}")

    for table in SYMLINK_TABLES:
        dst = os.path.join(STRESS_DIR, f"{table}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{table}.parquet"), dst)

    with open(marker, "w") as f:
        f.write("ok\n")
    print(f"generated stress tier in {time.perf_counter() - t0:.1f}s")


def measure(prefixes: list[str]) -> None:
    from anime_data_pipeline_spark.registry import all_queries
    from anime_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="stress_tier",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    wanted = [n for n in qs if any(n.startswith(p + "_") for p in prefixes)]
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    import math

    print(f"{'query':35s} {'sf0.01':>8s} {'100x':>8s} {'ratio':>7s} {'exp':>5s}")
    for name in wanted:
        times = {}
        for tag, sf_dir in (("small", SMALL), ("big", STRESS_DIR)):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[tag] = best
        ratio = times["big"] / times["small"]
        exp = math.log(ratio) / math.log(100)
        print(
            f"{name:35s} {times['small']:8.2f} {times['big']:8.2f} "
            f"{ratio:6.1f}x {exp:5.2f}"
        )


def measure_streaming(prefixes: list[str]) -> None:
    """Streaming stress evidence (r7 verdict item 6): run each gate
    stream at sf0.01 and at the ×100 tier and report, from the
    StreamingQueryProgress audit trail the pipeline already records,
    the TOTAL stateful-operator rows (numRowsTotal summed over every
    stream the query runs) and the trigger execution time — the two
    numbers that decide whether a watermarked stream survives a 100×
    ingest burst: state must grow with ingest-per-horizon, not with
    history."""
    import math

    from anime_data_pipeline_spark.registry import all_queries
    from anime_data_pipeline_spark.session import get_spark
    from anime_data_pipeline_spark.streaming import pipeline as sp

    spark = get_spark(
        app_name="stress_tier_streaming",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    wanted = [n for n in qs if any(n.startswith(p + "_") for p in prefixes)]
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    print(
        f"{'query':32s} {'wall_s':>7s} {'wall_x':>7s} {'state_s':>9s} "
        f"{'state_x':>9s} {'ratio':>6s} {'trig_ms':>8s} {'exp':>5s}"
    )
    for name in wanted:
        rows = {}
        for tag, sf_dir in (("small", SMALL), ("big", STRESS_DIR)):
            sp.AUDIT.clear()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            state = 0
            trig = 0
            for p in sp.AUDIT:
                for op in p.get("stateOperators") or []:
                    state += int(op.get("numRowsTotal") or 0)
                d = p.get("durationMs") or {}
                trig = max(trig, int(d.get("triggerExecution") or 0))
            rows[tag] = (wall, state, trig)
        ws, ss, _ = rows["small"]
        wb, sb, tb = rows["big"]
        ratio = sb / ss if ss else float("nan")
        exp = math.log(wb / ws) / math.log(100)
        print(
            f"{name:32s} {ws:7.2f} {wb:7.2f} {ss:9d} {sb:9d} "
            f"{ratio:5.1f}x {tb:8d} {exp:5.2f}"
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    streaming = "--streaming" in args
    args = [a for a in args if a != "--streaming"]
    generate()
    if streaming:
        measure_streaming(args or ["q90", "q108", "q111", "q123"])
    else:
        measure(args or DEFAULT_QUERIES)
