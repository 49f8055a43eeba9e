"""Hot-bucket skew stress for the q97 mutual-kNN graph (VERDICT r4 #8).

knn_graph's probe join is a shuffle equi-join on the SRP bucket key;
its worst case is a corpus where a large fraction of vectors are
near-identical — they all land in ONE bucket (plus its Hamming-1
probes), so that bucket's candidate set is quadratic in the hot-group
size. This script measures that worst case directly at sf0.1:

- uniform: the real embeddings table (50k vectors, 2^planes buckets);
- hot-30: the same table with 30% of rows replaced by tiny
  perturbations of ONE base vector (deterministic per-id epsilon on
  two coordinates — perturbations this small never flip an SRP sign,
  so every replaced row shares one bucket).

Prints wall time and the bucket-occupancy histogram for both corpora;
SCALE.md cites the output. Mitigations measured/available: raise
``planes`` (halves expected occupancy per plane), AQE skew-join
splitting (enabled session-wide), and — if a real corpus is this
degenerate — exact-dup collapse BEFORE the graph (q106's pattern:
near-identical vectors carry no graph information anyway).

Usage: python scripts/skew_spot.py [hot_frac] [planes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.catalog import load_table
    from anime_data_pipeline_spark.operators.similarity import (
        knn_graph,
        srp_bucket,
        to_double_array,
    )
    from anime_data_pipeline_spark.session import get_spark

    hot_frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    planes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        app_name="skew_spot",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    n = emb.count()
    dim = len(emb.select("v").first()["v"])

    # hot corpus: vec_id % (1/hot_frac) == 0 rows become base + eps(id)
    base = emb.orderBy("vec_id").first()["v"]
    mod = max(2, int(round(1.0 / hot_frac)))
    eps = (F.col("vec_id") % 97).cast("double") / F.lit(1e7)
    base_arr = F.array(*[F.lit(float(x)) for x in base])
    perturbed = F.transform(
        base_arr,
        lambda x, i: x + F.when(i < 2, eps).otherwise(F.lit(0.0)),
    )
    hot = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % mod == 0, perturbed).otherwise(F.col("v")).alias("v"),
    )

    for label, corpus in (("uniform", emb), ("hot", hot)):
        occ = (
            corpus.withColumn("b", srp_bucket("v", planes, dim=dim))
            .groupBy("b")
            .count()
            .agg(
                F.max("count").alias("max_occ"),
                F.count(F.lit(1)).alias("n_buckets"),
            )
            .first()
        )
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            knn_graph(corpus, "vec_id", "v", k=5, planes=planes).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(
            f"{label}: n={n} planes={planes} max_bucket_occ={occ['max_occ']} "
            f"n_buckets={occ['n_buckets']} knn_graph={best:.2f}s"
        )


if __name__ == "__main__":
    main()
