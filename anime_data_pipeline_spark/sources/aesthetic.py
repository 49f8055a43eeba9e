"""Aesthetic-score JSON source (SURVEY S5/J3/U2).

Reference shape (run.py:72-76): N JSON files, each a list of
single-entry dicts ``[{"/path/img_p0.jpg": 0.87}, ...]``; files are
concatenated and rebuilt into one dict — so later files win on key
collisions, and keys are normalized to the basename stem before the
first '_'.

Spark-first: read every file as JSON, explode the per-row map, make
last-write-wins EXPLICIT with a (file_order, array_index) priority and
one row_number — the reference's dict-overwrite semantics depend on
Python dict insertion order, which a distributed engine must pin down
deterministically (SURVEY §7 "what's hard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from anime_data_pipeline_spark.sources.images import path_stem


def read_aesthetic_scores(spark: SparkSession, files: list[str]) -> DataFrame:
    """(image_id, score), deduped last-write-wins by (file order, index
    within file). ``files`` order = the reference's CLI order."""
    # Top-level JSON arrays of maps aren't directly readable with a Map
    # schema, so read each file wholetext and from_json-parse it; one
    # row per file, then posexplode to keep within-file entry order
    # (which the dict-rebuild overwrite semantics depend on).
    frames = []
    for idx, path in enumerate(files):
        txt = spark.read.text(path, wholetext=True)  # keyword, not .option()
        entries = F.from_json(
            F.col("value"), T.ArrayType(T.MapType(T.StringType(), T.DoubleType()))
        )
        frames.append(
            txt.select(F.lit(idx).alias("file_idx"), F.posexplode(entries))
            .select(
                "file_idx",
                F.col("pos"),
                F.explode(F.col("col")).alias("image_path", "score"),
            )
        )
    unioned = frames[0]
    for fr in frames[1:]:
        unioned = unioned.unionByName(fr)
    keyed = unioned.select(
        F.split(path_stem(F.col("image_path")), "_").getItem(0).alias("image_id"),
        "score",
        "file_idx",
        "pos",
    )
    w = W.partitionBy("image_id").orderBy(F.desc("file_idx"), F.desc("pos"))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("image_id", "score")
    )
