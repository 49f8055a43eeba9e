"""Dict-keyed JSON metadata adapter (SURVEY S5/S9, §4.2 item 4).

The reference's interchange format is one big JSON object keyed by
image path: ``{"/path/img.jpg": {"tags": ..., ...}, ...}`` (run.py:117;
merge_all_to_metadata.py:203; bucketing_to_metadata.py:135). That shape
is driver-hostile at scale — these adapters convert it to/from rows at
the boundary, and the native interchange between our stages is
Parquet.

- read: wholetext + from_json(Map) + explode → (image_key, fields...)
- write: per-partition JSON fragments assembled into one object — the
  single output file is inherently a 1-file sink (like the reference);
  ``coalesce(1)`` + text write keeps assembly off the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_keyed_json(
    spark: SparkSession, path: str, value_schema: T.StructType
) -> DataFrame:
    """{key: record} JSON file → rows (image_key, *record fields)."""
    # NB: the wholetext flag must be the text() keyword — DataFrameReader
    # .text() overrides a prior .option("wholetext", ...) with its default.
    txt = spark.read.text(path, wholetext=True)
    entries = F.from_json(F.col("value"), T.MapType(T.StringType(), value_schema))
    exploded = txt.select(F.explode(entries).alias("image_key", "rec"))
    return exploded.select("image_key", "rec.*")


def write_keyed_json(df: DataFrame, key_col: str, out_path: str) -> None:
    """rows → one {key: record} JSON file at ``out_path``.

    Record fields = every column except the key. Keys sorted for a
    deterministic byte layout (the reference's output order is Python
    dict insertion order — not reproducible; ours is).
    """
    value_cols = [c for c in df.columns if c != key_col]
    # JSON-escape the key by serializing a one-field object and
    # stripping its braces: {"k":"v"} → "v".
    key_json = F.regexp_replace(
        F.to_json(F.struct(F.col(key_col).alias("k"))), '^\\{"k": ?|\\}$', ""
    )
    frag = F.concat(key_json, F.lit(": "), F.to_json(F.struct(*value_cols)))
    rows = df.select(F.col(key_col).alias("_k"), frag.alias("_frag"))
    joined = (
        rows.orderBy("_k")
        .coalesce(1)
        .select("_frag")
        .agg(F.concat_ws(",\n", F.collect_list("_frag")).alias("body"))
        .select(F.concat(F.lit("{\n"), F.col("body"), F.lit("\n}")).alias("value"))
    )
    joined.write.mode("overwrite").text(out_path)
