"""Multimodal + ML-inference gate queries (SURVEY §2.9 M1/M5, S7).

q71 is fully oracle-checked: the expected decode output is recomputed
from doc_id in SQL, closing the loop over the binary encode →
mapInPandas decode → resize plan. q72/q73 stay rows-only: their stub
models hash raw BYTES with sha256, and DuckDB's sha256 only accepts
VARCHAR (UTF-8) — no blob spelling exists, so the driver records the
weaker rows-only check for those two.

The binary corpus is synthesized deterministically from `documents`
(FIMG container with doc_id-derived dimensions, text-derived payload),
so results are stable run-to-run even without an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.operators.inference import (
    collate_by_bucket,
    tag_inference_stage,
)
from anime_data_pipeline_spark.operators.multimodal import (
    decode_image_meta,
    encode_fimg,
    extract_features,
    resize_plan,
)
from anime_data_pipeline_spark.registry import register

_LABELS = ["long hair", "blue eyes", "smile", "standing", "hatsune miku"]


def _binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, content: binary): FIMG blobs with
    deterministic dims; every 29th row corrupt (P6 path)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    @F.udf(T.BinaryType())
    def make_blob(doc_id: int, text: str) -> bytes:
        if doc_id % 29 == 28:
            return b"corrupt" + bytes([doc_id % 256])
        w = 256 + (doc_id * 97) % 1792
        h = 256 + (doc_id * 131) % 1280
        mode = ["RGB", "RGBA", "L", "P"][doc_id % 4]
        return encode_fimg(w, h, mode, text[:64].encode())

    return docs.select("doc_id", make_blob("doc_id", "text").alias("content"))


# The oracle recomputes the expected decode output directly from
# doc_id — an end-to-end check of the synthesize → encode → mapInPandas
# decode → resize-plan roundtrip (any header/byte-order/null-handling
# bug in the binary path breaks the match).
_Q71_ORACLE = """
    WITH meta AS (
      SELECT doc_id,
             CAST(256 + (doc_id * 97) % 1792 AS INTEGER) AS width,
             CAST(256 + (doc_id * 131) % 1280 AS INTEGER) AS height,
             CASE CAST(doc_id % 4 AS INTEGER)
               WHEN 0 THEN 'RGB' WHEN 1 THEN 'RGBA'
               WHEN 2 THEN 'L' ELSE 'P' END AS mode
      FROM documents WHERE doc_id % 29 <> 28
    )
    SELECT doc_id, width, height, mode,
           CAST(floor(width * scale + 0.5) AS INTEGER) AS resized_w,
           CAST(floor(height * scale + 0.5) AS INTEGER) AS resized_h
    FROM (
      SELECT *,
             CASE WHEN CAST(1024 AS DOUBLE) / 1024 > CAST(width AS DOUBLE) / height
                  THEN CAST(1024 AS DOUBLE) / height
                  ELSE CAST(1024 AS DOUBLE) / width END AS scale
      FROM meta
    )
"""


@register("q71_multimodal_decode", oracle=_Q71_ORACLE)
def q71_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: binary decode → typed metadata; corrupt rows surface as null
    meta and are dropped with a countable audit (P6)."""
    decoded = decode_image_meta(_binary_corpus(spark, sf_dir))
    ok = decoded.filter(F.col("image_meta").isNotNull())
    resized = resize_plan(ok, F.lit(1024), F.lit(1024))
    return resized.select(
        "doc_id",
        F.col("image_meta.width").alias("width"),
        F.col("image_meta.height").alias("height"),
        F.col("image_meta.mode").alias("mode"),
        "resized_w",
        "resized_h",
    )


@register("q72_multimodal_features")
def q72_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary content (Arrow-batched); output
    is the embedding norm + first component per doc (scalar columns —
    stable schema for the driver's rows-only check)."""
    feats = extract_features(_binary_corpus(spark, sf_dir))
    v = F.transform(F.col("features"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return feats.filter(F.col("features").isNotNull()).select(
        "doc_id",
        norm.alias("feat_norm"),
        F.element_at(v, 1).alias("feat_0"),
    )


@register("q73_tag_inference")
def q73_tag_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M5: bucket-collated batched stub inference + native
    threshold/sort/escape postprocessing."""
    corpus = _binary_corpus(spark, sf_dir)
    decoded = decode_image_meta(corpus).filter(F.col("image_meta").isNotNull())
    bucketed = decoded.withColumn(
        "bucket_reso",
        F.struct(
            (F.col("image_meta.width") - F.col("image_meta.width") % 64).alias("w"),
            (F.col("image_meta.height") - F.col("image_meta.height") % 64).alias("h"),
        ),
    )
    collated = collate_by_bucket(bucketed, ["bucket_reso"])
    staged = tag_inference_stage(
        collated,
        _LABELS,
        general_names=_LABELS[:4],
        character_names=_LABELS[4:],
        general_threshold=0.35,
        character_threshold=0.8,
    )
    return staged.select("doc_id", "synth_tags")
