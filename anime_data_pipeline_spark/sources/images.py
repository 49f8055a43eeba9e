"""Image scans + path-key derivation (SURVEY S1/S2/S7, P1).

The reference globs ``*.jpg|*.png|*.jpeg`` per directory into a Python
list (run.py:38-41) and derives join keys from paths (run.py:49-51).
Spark-first: ``binaryFile`` scans give a distributed listing + content
column in one go; key derivation is a projection.

At 100 TB the listing itself is distributed (driver only enumerates
top-level dirs) and ``content`` is only materialized for rows that
survive pushed-down filters (``length`` is available without reading
bytes; the binaryFile source prunes the content column when unused).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_EXTS = ("jpg", "png", "jpeg")


def scan_image_dirs(
    spark: SparkSession,
    dirs: list[str],
    exts: tuple[str, ...] = IMAGE_EXTS,
    recursive: bool = False,
    with_content: bool = True,
) -> DataFrame:
    """S1/S2: distributed scan of image files across N directories.

    Returns (path, modificationTime, length, content?) unioned over
    dirs — the DataFrame shape of run.py:38-41's path list.
    """
    glob = "*.{" + ",".join(exts) + "}"
    out: DataFrame | None = None
    for d in dirs:
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", glob)
            .option("recursiveFileLookup", str(recursive).lower())
            .load(d)
        )
        out = df if out is None else out.unionByName(df)
    assert out is not None, "scan_image_dirs: empty dir list"
    if not with_content:
        out = out.drop("content")
    return out


def path_stem(path: Column) -> Column:
    """basename without extension: '/a/b/123_p0.jpg' → '123_p0'."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


def derive_keys(df: DataFrame, path_col: str = "path") -> DataFrame:
    """P1: path → image_dir, image_stem, image_id (stem before first '_',
    run.py:51 / prepare_aesthetic_tags_metadata.py:39)."""
    p = F.col(path_col)
    stem = path_stem(p)
    return (
        df.withColumn("image_dir", F.regexp_replace(p, r"/[^/]*$", ""))
        .withColumn("image_stem", stem)
        .withColumn("image_id", F.split(stem, "_").getItem(0))
    )
