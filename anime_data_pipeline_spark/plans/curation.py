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

from anime_data_pipeline_spark.functions.hashing import polyhash
from anime_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
from anime_data_pipeline_spark.operators.textstats import quality_columns


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
    scored = quality_columns(df, text_col)
    kept = scored.filter(F.col("quality_score") >= quality_threshold)

    # exact dedup: keep the min-id row per 64-bit content hash
    hashed = kept.withColumn("_ch", polyhash(F.col(text_col)))
    keeper = F.min(id_col).over(W.partitionBy("_ch"))
    uniq = (
        hashed.withColumn("_keeper", keeper)
        .filter(F.col(id_col) == F.col("_keeper"))
        .drop("_ch", "_keeper")
    )

    pairs = minhash_lsh_pairs(
        uniq, id_col, text_col, n=n, k=k, bands=bands, threshold=jaccard_threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return uniq.join(losers, id_col, "left_anti")
