"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); on a real cluster the same
settings hold except memory sizing. Every knob here is scale-motivated:

- AQE on: runtime partition coalescing + skew-join splitting, so plans
  survive skewed keys (e.g. bucket resolutions cluster on few ARs).
- shuffle.partitions sized to cores locally; on a 1000-executor cluster
  AQE's coalescePartitions makes the static number mostly irrelevant.
- Arrow on: every pandas_udf / mapInPandas crossing is vectorized.
- UTC session timezone: parquet timestamps compare bit-identically with
  the DuckDB oracle (DuckDB is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "anime_data_pipeline_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``getOrCreate`` semantics: safe to call from tests, bench, and the
    driver harness alike — the first caller wins on the config.
    """
    cpus = cpus or DEFAULT_CPUS
    # Python workers deserialize mapInPandas/UDF closures that reference
    # this package; make it importable regardless of the caller's cwd
    # (the driver harness runs from a neutral directory). Must happen
    # BEFORE the JVM launches so spawned workers inherit it.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # InferFiltersFromGenerate turns explode(computed_array) into a
        # pushed-down size()>0 filter whose predicate INLINES the whole
        # array expression once per element_at reference — measured 16×
        # recompute of the tokenize→hash→shingle chain on the dedup/
        # contamination paths (10.5 s → 2.1 s for the q78 universe at
        # sf0.1 with the rule off). The rule only pre-skips empty-array
        # rows, which the generator drops anyway.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
