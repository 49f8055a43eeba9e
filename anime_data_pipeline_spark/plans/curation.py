"""Training-corpus curation plan: the LLM-data pipeline composed
end-to-end (BASELINE north star) —

    quality filter → exact dedup → MinHash-LSH near-dup removal

Shuffle budget at 100 TB: the quality stage is map-only; exact dedup
shuffles 8-byte content hashes once; near-dup detection runs on the
(much smaller) unique survivor set; the final anti-join shuffles ids
only. Every stage is deterministic, so the whole chain is
oracle-checkable (queries/curation_q).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from anime_data_pipeline_spark.functions.hashing import polyhash, polyhash2
from anime_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
from anime_data_pipeline_spark.operators.textstats import quality_columns


def ensure_map_parallelism(df: DataFrame) -> DataFrame:
    """Fan the corpus out ONLY when the scan yields fewer splits than
    cores. The quality/langid scoring stage is the chain's largest
    map-CPU block, and a single-row-group parquet layout (the test-SF
    shape; in production, any source with fewer files than executors)
    pins it to one task while the rest of the cluster idles — the
    round-9 `_spread` finding, generalized to the text chains. The
    guard keeps the policy scale-safe: a production scan already
    carries >= parallelism splits, so NO shuffle is added there; in
    the under-split regime one pass of the raw text buys full-width
    scoring, dedup hashing, and shingling.

    CAVEAT — call on pre-shuffle scans/unions only (every current call
    site is one): ``df.rdd.getNumPartitions()`` forces physical
    planning outside AQE, and for a plan whose FINAL stage is a
    shuffle it reports spark.sql.shuffle.partitions, so the guard
    would no-op even when the upstream scan is under-split. If a
    post-shuffle call site ever appears, inspect the leaf scan's
    input-split count instead (e.g. via the executed plan's scan
    nodes), not the final-stage RDD partition count."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.7,
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Returns the curated corpus (survivor rows + quality columns).

    Near-dup policy: for every verified pair (id_a < id_b) the LARGER
    id is dropped — greedy, deterministic, one anti-join.
    """
    scored = quality_columns(ensure_map_parallelism(df), text_col)
    kept = scored.filter(F.col("quality_score") >= quality_threshold)

    # exact dedup: keep the min-id row per content-hash PAIR. Two
    # independent polynomial hashes (base 31 + 37) push the per-pair
    # false-collapse probability from ~1/P to ~1/P² (≈1e-18) — a single
    # ~2^30 hash silently drops ~N²/2P unrelated docs at corpus scale.
    # The shuffle key stays two 8-byte ints, never the text payload.
    hashed = kept.withColumn("_ch", polyhash(F.col(text_col))).withColumn(
        "_ch2", polyhash2(F.col(text_col))
    )
    keeper = F.min(id_col).over(W.partitionBy("_ch", "_ch2"))
    uniq = (
        hashed.withColumn("_keeper", keeper)
        .filter(F.col(id_col) == F.col("_keeper"))
        .drop("_ch", "_ch2", "_keeper")
    )

    pairs = minhash_lsh_pairs(
        uniq, id_col, text_col, n=n, k=k, bands=bands, threshold=jaccard_threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return uniq.join(losers, id_col, "left_anti")


def prepare_pretraining_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    lang: str = "en",
    quality_threshold: float = 0.7,
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    contam_n: int = 8,
    budget: int = 256,
) -> DataFrame:
    """The COMPLETE pretraining-data preparation chain as one lazy DAG:

        language-ID + quality filter     (map-only)
      → exact dedup                      (8-byte hash shuffle)
      → MinHash-LSH near-dup removal     (banded join on survivors)
      → benchmark decontamination        (bench universe broadcast)
      → greedy sequence packing          (per-source, budget tokens)

    Each stage shrinks the data before the next shuffle; the stages
    are the q51-q86 operators composed, and the whole chain is
    oracle-checked end-to-end (q88). Returns
    (id, group, n_tokens, chunk_id) — the packed training manifest."""
    from anime_data_pipeline_spark.operators.dedup import benchmark_contamination
    from anime_data_pipeline_spark.operators.packing import pack_greedy
    from anime_data_pipeline_spark.operators.textstats import (
        language_id,
        ws_token_count,
    )

    from pyspark import StorageLevel

    scored = quality_columns(
        language_id(ensure_map_parallelism(docs), text_col), text_col
    )
    kept = scored.filter(
        (F.col("pred_lang") == lang)
        & (F.col("quality_score") >= quality_threshold)
    )

    hashed = kept.withColumn("_ch", polyhash(F.col(text_col))).withColumn(
        "_ch2", polyhash2(F.col(text_col))
    )
    keeper = F.min(id_col).over(W.partitionBy("_ch", "_ch2"))
    # uniq feeds three consumers (LSH signatures, the anti-join left
    # side, contamination) and its lineage holds the langid/quality
    # expression forest — persist the already-shrunk survivor set
    # rather than recompute the scan+filter chain per consumer. At
    # 100 TB this is the stage boundary you'd parquet-checkpoint.
    uniq = (
        hashed.withColumn("_keeper", keeper)
        .filter(F.col(id_col) == F.col("_keeper"))
        .drop("_ch", "_ch2", "_keeper")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    pairs = minhash_lsh_pairs(
        uniq, id_col, text_col, n=n, k=k, bands=bands, threshold=jaccard_threshold
    )
    survivors = uniq.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    contaminated = (
        benchmark_contamination(survivors, bench, id_col, text_col, n=contam_n)
        .filter(F.col("n_hits") > 0)
        .select(F.col("doc").alias(id_col))
    )
    clean = survivors.join(contaminated, id_col, "left_anti")

    weighted = clean.select(
        id_col, group_col, ws_token_count(F.col(text_col)).alias("n_tokens")
    )
    return pack_greedy(weighted, group_col, id_col, "n_tokens", budget)
