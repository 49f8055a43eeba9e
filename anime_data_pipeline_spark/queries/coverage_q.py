"""Coverage gate queries for the remaining SURVEY §2 operators:
J5 upsert merge, B4 crop boxes, O1/O2 deterministic shuffle, F10/F12
map construction/filter/invert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import (
    dround,
    dround_sql,
    money_sum,
    money_sum_sql,
)
from anime_data_pipeline_spark.functions.hashing import P, polyhash, polyhash_sql
from anime_data_pipeline_spark.operators.ordering import bucketed_global_rank
from anime_data_pipeline_spark.operators.profiling import (
    corpus_profile,
    sketch_profile_audit,
)
from anime_data_pipeline_spark.operators.bucketing import (
    BucketConfig,
    assign_bucket_columns,
    crop_ltrb_columns,
)
from anime_data_pipeline_spark.queries.bucketing_q import _IMGS_SQL, synthetic_images
from anime_data_pipeline_spark.registry import register


# ---------------------------------------------------------------------------
# q27 — J5 upsert/outer-merge (merge_all_to_metadata.py:142-151: insert
# if absent, new non-null fields overwrite old). Both sides derived
# from documents: "existing metadata" = doc_id % 2 == 0 (with captions),
# "incoming sidecars" = doc_id % 3 == 0 (tags, no captions).
# At 100 TB this is Delta MERGE INTO; the engine-level semantics are
# one full-outer join + per-field coalesce(new, old).
# ---------------------------------------------------------------------------
@register(
    "q27_upsert_merge",
    oracle="""
    WITH old AS (
      SELECT doc_id, substr(text, 1, 20) AS tags, 'old caption ' || doc_id AS caption
      FROM documents WHERE doc_id % 2 = 0
    ),
    new AS (
      SELECT doc_id, substr(text, 5, 20) AS tags, CAST(NULL AS VARCHAR) AS caption
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT coalesce(new.doc_id, old.doc_id) AS doc_id,
           coalesce(new.tags, old.tags) AS tags,
           coalesce(new.caption, old.caption) AS caption,
           (old.doc_id IS NOT NULL AND new.doc_id IS NOT NULL) AS updated
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
)
def q27_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.substring("text", 1, 20).alias("tags"),
        F.concat(F.lit("old caption "), F.col("doc_id")).alias("caption"),
    )
    new = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.substring("text", 5, 20).alias("tags"),
        F.lit(None).cast("string").alias("caption"),
    )
    o, n = old.alias("o"), new.alias("n")
    return o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer").select(
        F.coalesce(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_id"),
        F.coalesce(F.col("n.tags"), F.col("o.tags")).alias("tags"),
        F.coalesce(F.col("n.caption"), F.col("o.caption")).alias("caption"),
        (F.col("o.doc_id").isNotNull() & F.col("n.doc_id").isNotNull()).alias("updated"),
    )


# ---------------------------------------------------------------------------
# q28 — B4 center-crop boxes (bucket_manager.py:161-179) on top of the
# bucket assignment.
# ---------------------------------------------------------------------------
from anime_data_pipeline_spark.operators.bucketing import bucket_oracle_sql  # noqa: E402


@register(
    "q28_crop_ltrb",
    oracle=f"""
    WITH assigned AS ({bucket_oracle_sql(_IMGS_SQL, BucketConfig())}),
    withimg AS (
      SELECT a.*, i.width, i.height
      FROM assigned a JOIN ({_IMGS_SQL}) i USING (image_key)
    )
    SELECT image_key, bucket_w, bucket_h,
           floor((bucket_w - rw) / 2) AS crop_left,
           floor((bucket_h - rh) / 2) AS crop_top,
           floor((bucket_w - rw) / 2) + rw AS crop_right,
           floor((bucket_h - rh) / 2) + rh AS crop_bottom
    FROM (
      SELECT *,
        CASE WHEN CAST(bucket_w AS DOUBLE) / bucket_h > CAST(width AS DOUBLE) / height
             THEN bucket_h * (CAST(width AS DOUBLE) / height) ELSE CAST(bucket_w AS DOUBLE) END AS rw,
        CASE WHEN CAST(bucket_w AS DOUBLE) / bucket_h > CAST(width AS DOUBLE) / height
             THEN CAST(bucket_h AS DOUBLE) ELSE bucket_w / (CAST(width AS DOUBLE) / height) END AS rh
      FROM withimg
    )
    """,
)
def q28_crop_ltrb(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = synthetic_images(spark, sf_dir)
    assigned = assign_bucket_columns(imgs, cfg=BucketConfig())
    return crop_ltrb_columns(assigned).select(
        "image_key", "bucket_w", "bucket_h",
        "crop_left", "crop_top", "crop_right", "crop_bottom",
    )


# ---------------------------------------------------------------------------
# q29 — O1/O2 deterministic shuffle. The reference uses
# random.shuffle/per-bucket shuffle (run.py:42, bucket_manager.py:57-59)
# — unseeded, irreproducible. Distributed redesign: order by a seeded
# key hash; shuffle_pos is then a pure function of (seed, key), stable
# across runs/engines (documented divergence: reproducibility).
# Per-bucket variant = same hash ranked within the bucket partition.
# The global index uses bucketed_global_rank (operators/ordering.py):
# deterministic range-bucketing of the hash domain + per-bucket
# row_number + broadcast cumulative offsets — bit-identical to a global
# row_number window but with NO single-partition stage.
# ---------------------------------------------------------------------------
_SEED = "s42"


@register(
    "q29_seeded_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, {polyhash_sql(f"'{_SEED}' || CAST(doc_id AS VARCHAR)")} AS hk
      FROM documents
    )
    SELECT doc_id, lang,
           row_number() OVER (ORDER BY hk, doc_id) AS shuffle_pos,
           row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS bucket_pos
    FROM keyed
    """,
)
def q29_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hk = polyhash(F.concat(F.lit(_SEED), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", "lang", hk.alias("hk"))
    indexed = bucketed_global_rank(
        keyed, key_col="hk", key_max=P, tiebreakers=["doc_id"], out_col="shuffle_pos"
    )
    return indexed.select(
        "doc_id",
        "lang",
        "shuffle_pos",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("hk", "doc_id"))
        .cast("long")
        .alias("bucket_pos"),
    )


# ---------------------------------------------------------------------------
# q30 — F10/F12: zip labels×scores → map, threshold-filter the map
# (P7 shape), invert/normalize keys, explode back to rows. Scores are
# deterministic per (doc, token).
# ---------------------------------------------------------------------------
@register(
    "q45_cube_rollup",
    oracle="""
    SELECT coalesce(lang, '<all>') AS lang,
           coalesce(source, '<all>') AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY CUBE (lang, source)
    """,
)
def q45_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (beyond the reference's flat counts; q15 covers
    ROLLUP). Null grouping markers coalesced identically both sides."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .select(
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            "n_docs",
            "total_chars",
        )
    )


@register(
    "q46_set_ops",
    oracle="""
    WITH long_docs AS (SELECT doc_id FROM documents WHERE n_chars >= 150),
    en_docs AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    both_sets AS (SELECT doc_id FROM long_docs INTERSECT SELECT doc_id FROM en_docs),
    only_long AS (SELECT doc_id FROM long_docs EXCEPT SELECT doc_id FROM en_docs)
    SELECT doc_id, 'both' AS membership FROM both_sets
    UNION ALL
    SELECT doc_id, 'long_only' AS membership FROM only_long
    """,
)
def q46_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect/except (SURVEY §2.6 notes them absent from the
    reference; Spark supplies them natively)."""
    docs = load_table(spark, sf_dir, "documents")
    long_docs = docs.filter(F.col("n_chars") >= 150).select("doc_id")
    en_docs = docs.filter(F.col("lang") == "en").select("doc_id")
    both = long_docs.intersect(en_docs).withColumn("membership", F.lit("both"))
    only_long = long_docs.exceptAll(en_docs).withColumn(
        "membership", F.lit("long_only")
    )
    return both.unionByName(only_long)


def _qd_sql(q: float) -> str:
    """Discrete quantile of n_chars inside a GROUP BY, spelled as
    sorted-list indexing (identical convention both engines; the
    built-in quantile functions differ in interpolation rules)."""
    return f"list_sort(list(n_chars))[CAST(ceil({q} * count(*)) AS INTEGER)]"


@register(
    "q40_corpus_profile",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           {_qd_sql(0.25)} AS p25_chars,
           {_qd_sql(0.5)} AS p50_chars,
           {_qd_sql(0.75)} AS p75_chars
    FROM documents GROUP BY source
    """,
)
def q40_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling rollup (A-family extension), EXACT oracle
    variant of operators/profiling.corpus_profile — countDistinct +
    sorted-list quantiles match the oracle bit-for-bit at test scale.
    The scale default is the approx path (q49)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus_profile(docs, approx=False)


@register(
    "q49_corpus_profile_approx",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           TRUE AS hll_langs_ok,
           TRUE AS hll_chars_ok,
           TRUE AS gk_p25_ok,
           TRUE AS gk_p50_ok,
           TRUE AS gk_p75_ok
    FROM documents GROUP BY source
    """,
)
def q49_corpus_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE default of corpus profiling: percentile_approx
    (Greenwald-Khanna) + approx_count_distinct (HLL++) — per-group
    sketch state is bounded, so a hot `source` group cannot OOM an
    executor at 100 TB (the exact twin is q40).

    Oracle-gated since round 9 (r8 verdict #3): raw sketch outputs are
    engine-specific, so instead of emitting them this audits them
    IN-PLAN — exact count/min/max are value-checked directly, and each
    sketch's published error contract (HLL++ sigma·rsd cardinality
    bound; the GK rank of the returned percentile within n/accuracy of
    target, measured by re-ranking the returned value against the
    group) is emitted as a boolean the DuckDB side pins to TRUE. A
    sketch straying outside its contract flips the bit and fails the
    value hash — falsifiable, where the old rows-only row was not.

    Residual-tail risk at the TRUE-literal oracle (ADVICE r9): the HLL
    bound is probabilistic, so the pin is only deterministic PER
    dataset — a regenerated documents table could in principle land in
    the tail and fail with no code change. sigma was widened 3→5
    (tail mass ~6e-7 per sketch, vs ~0.3% at 3σ) because the audit
    gates gross sketch breakage, not calibration; if this row ever
    reddens with no decode/profiling diff, check the HLL estimate
    against the exact count before suspecting the plan."""
    docs = load_table(spark, sf_dir, "documents")
    return sketch_profile_audit(docs)


@register(
    "q37_name_series_parse",
    oracle=r"""
    WITH chars AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN 'char_' || doc_id || '_(series ' || (doc_id % 7) || ')'
                  ELSE 'solo_char_' || doc_id END AS name_raw
      FROM documents
    )
    SELECT doc_id, name_raw,
           CASE WHEN regexp_matches(name_raw, '^(.*)_\((.*)\)$')
                THEN replace(regexp_extract(name_raw, '^(.*)_\((.*)\)$', 1), '_', ' ')
                ELSE replace(name_raw, '_', ' ') END AS char_name,
           CASE WHEN regexp_matches(name_raw, '^(.*)_\((.*)\)$')
                THEN regexp_extract(name_raw, '^(.*)_\((.*)\)$', 2)
                ELSE NULL END AS series
    FROM chars
    """,
)
def q37_name_series_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 (prepare_aesthetic_tags_metadata.py:14-23): split
    'name_(series)' character strings; rows without parens keep the
    whole name and null series (the reference's ValueError path)."""
    docs = load_table(spark, sf_dir, "documents")
    name_raw = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit("char_"), F.col("doc_id"), F.lit("_(series "),
            (F.col("doc_id") % 7).cast("string"), F.lit(")"),
        ),
    ).otherwise(F.concat(F.lit("solo_char_"), F.col("doc_id")))
    pat = r"^(.*)_\((.*)\)$"
    df = docs.select("doc_id", name_raw.alias("name_raw"))
    has = F.col("name_raw").rlike(pat)
    return df.select(
        "doc_id",
        "name_raw",
        F.when(
            has, F.regexp_replace(F.regexp_extract("name_raw", pat, 1), "_", " ")
        )
        .otherwise(F.regexp_replace(F.col("name_raw"), "_", " "))
        .alias("char_name"),
        F.when(has, F.regexp_extract("name_raw", pat, 2)).alias("series"),
    )


@register(
    "q30_map_zip_filter",
    oracle=f"""
    WITH tok AS (
      -- sorted distinct: DuckDB's list_distinct does NOT preserve
      -- first-occurrence order (Spark's array_distinct does), so both
      -- engines take the 6 smallest distinct tokens instead.
      SELECT doc_id,
             list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> '')))[1:6] AS names
      FROM documents
    ),
    entries AS (
      SELECT doc_id, unnest(names) AS tag FROM tok
    ),
    scored AS (
      SELECT doc_id, upper(tag) AS tag_norm,
             CAST({polyhash_sql("tag || CAST(doc_id AS VARCHAR)")} AS DOUBLE) / {P} AS score
      FROM entries
    )
    SELECT doc_id, tag_norm, score FROM scored WHERE score > 0.5
    """,
)
def q30_map_zip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    names = F.slice(
        F.array_sort(
            F.array_distinct(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        ),
        1,
        6,
    )
    df = docs.select("doc_id", names.alias("names"))
    # F10: zip names with scores into a map
    scores = F.transform(
        F.col("names"),
        lambda t: polyhash(F.concat(t, F.col("doc_id").cast("string"))).cast("double")
        / F.lit(float(P)),
    )
    df = df.select("doc_id", F.map_from_arrays(F.col("names"), scores).alias("m"))
    # P7-shaped map_filter + F12 transform_keys (normalize)
    filtered = F.map_filter(F.col("m"), lambda k, v: v > 0.5)
    inverted = F.transform_keys(filtered, lambda k, v: F.upper(k))
    return df.select(
        "doc_id", F.explode(inverted).alias("tag_norm", "score")
    )


# ---------------------------------------------------------------------------
# q76 — salted large⋈large join under a planted hot key: 1/4 of
# lineitem rows are re-keyed onto ONE orderkey, then joined to orders
# through the 8-way salted join (operators/skew.salted_join). The
# oracle is the PLAIN SQL join — a hash match proves salting is
# semantically invisible while spreading the hot key over 8 shuffle
# partitions (the plan property tests/test_plan_shape.py pins).
# ---------------------------------------------------------------------------
_HOT_KEY = 1


@register(
    "q76_salted_join_hot_key",
    oracle=f"""
    WITH li AS (
      SELECT CASE WHEN l_orderkey % 4 = 0 THEN {_HOT_KEY} ELSE l_orderkey END AS okey,
             l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem)
    SELECT o.o_orderstatus,
           count(*) AS n_rows,
           {{dround}} AS revenue
    FROM li JOIN orders o ON li.okey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """.replace("{dround}", money_sum_sql("l_extendedprice")),
)
def q76_salted_join_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 4 == 0, F.lit(_HOT_KEY))
        .otherwise(F.col("l_orderkey"))
        .alias("okey"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    # lineitem holds the hot key → it takes the salt (high-cardinality
    # source: its own original (orderkey, linenumber)); orders explodes 8×.
    joined = salted_join(
        orders,
        li,
        "okey",
        salts=8,
        salt_source=None,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("l_extendedprice")).alias("revenue"),
    )
