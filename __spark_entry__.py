"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``anime_data_pipeline_spark/queries/`` and register
themselves in ``anime_data_pipeline_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from anime_data_pipeline_spark.registry import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the COMPLETE pretraining-corpus preparation chain
    (language-ID + quality hygiene → exact dedup → MinHash-LSH
    near-dup removal → benchmark decontamination → greedy sequence
    packing) — the engine's LLM-training-data story in one
    oracle-checked plan (q88)."""
    qs = all_queries()
    return qs["q88_pretraining_corpus"](spark, SMOKE_SF_DIR)


# The driver's correctness gate samples a bounded prefix of queries()
# per round, so ordering decides which queries get a fresh driver row.
# The rule (r5 verdict item 2 — enforced by tests/test_cli.py): the
# first 50 positions MUST contain, in order, (a) queries whose
# implementation changed this round, (b) queries with no driver row in
# any prior round, (c) queries reworked in the previous round whose
# only green rows predate the rework, then (d) the stalest remaining
# rows. Never newer-before-never-rowed.

# (a) changed in round 6: q172 revenue re-typed to per-row-cents
# DOUBLE (the r5 red row), q173 dropped the fact-sized orders
# broadcast, q152/q153 go through the boundary-anchored tracking-param
# regex (operators/web.py), q151/q71/q115 go through the hardened
# JPEG marker walk + corrupt->None guards (operators/jpeg_codec.py,
# progressive-JPEG decode added to q151's fixture corpus), q115's
# corpus extended to the full PNG matrix (16-bit/Adam7/sub-8) with a
# pixel_ok gate, q180 is NEW (HTML → text extraction, closed-form
# oracle), and q177/q178/q179 are NEW (stdlib BMP+TIFF raster, WAV,
# and MJPEG-AVI + animated-GIF video sampling e2e).
_CHANGED_THIS_ROUND = [
    "q172_grouping_sets",
    "q173_referential_integrity",
    "q180_html_extract",
    "q181_image_dedup",
    "q177_raster_decode_bucket",
    "q178_wav_decode_chunk",
    "q179_video_frame_sample",
    "q152_url_canonical_dedup",
    "q153_normalized_dedup",
    "q151_gif_jpeg_decode_bucket",
    "q71_multimodal_decode",
    "q115_png_decode_bucket",
]

# (b) added in round 4, never sampled by the driver (r5 verdict item 2)
_NEVER_ROWED = [
    "q118_span_decontaminate",
    "q119_json_props_extract",
    "q120_minhash_quality_audit",
    "q121_embedding_dim_profile",
    "q122_source_overlap_matrix",
    "q123_stream_heavy_hitters",
    "q124_group_quantiles",
    "q125_signature_sidetable",
    "q126_curation_report",
    "q127_cdc_chunks",
    "q128_length_buckets",
    "q129_robust_outliers",
]

# (c) reworked in round 5 (bucketed_global_rank q29, TakeOrdered
# top-k q107/q109/q110/q114, dual-content-hash dedup
# q35/q88/q102/q104/q108, bloom q100) — green rows exist only from
# BEFORE the rework; the record must catch up.
_REWORKED_R5 = [
    "q29_seeded_shuffle",
    "q35_curation_pipeline",
    "q88_pretraining_corpus",
    "q100_bloom_contamination",
    "q102_incremental_dedup",
    "q104_curation_v2",
    "q107_bm25_topk",
    "q108_stream_incremental_dedup",
    "q109_pmi_collocations",
    "q110_bm25_rerank",
    "q114_gumbel_resample",
]

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_R5,
    # (d) stalest: newest driver row is from round 2 (pre-r3 testdata
    # regeneration) — fills the remaining first-50 slots
    "q27_upsert_merge",
    "q28_crop_ltrb",
    "q30_map_zip_filter",
    "q31_exact_dedup",
    "q33_simhash_fingerprint",
    "q34_ngram_jaccard_neardup",
    "q37_name_series_parse",
    "q40_corpus_profile",
    "q45_cube_rollup",
    "q46_set_ops",
    "q49_corpus_profile_approx",
    "q50_ngram_repetition",
    "q56_tfidf_topk",
    "q57_stratified_sample",
    "q59_pii_redact",
    # ---- 50-row driver cutoff lands here ----
    "q70_webdataset_roundtrip",
    "q73_tag_inference",
    "q74_snapshot_diff",
    "q75_mix_rebalance",
    "q76_salted_join_hot_key",
    "q78_contamination_check",
    "q80_video_frame_sample",
    "q81_line_dedup",
    "q87_audio_chunk_plan",
    "q66_stream_static_enrich",
    # remaining stale r1/r2-row queries, then stable/green rotate back
    "q15_rollup",
    "q16_pivot_status",
    "q17_tokenize_normalize",
    "q18_regex_extract",
    "q19_sessionize",
    "q20_tumbling_window",
    "q24_novelai_order",
    "q25_clean_caption",
    "q26_clean_tags",
    "q38_asof_join",
    "q39_range_join",
    "q47_running_window",
    "q51_token_counts",
    "q52_quality_score",
    "q53_language_id",
    "q54_winnow_fingerprints",
    "q55_quality_rollup",
    "q58_pack_chunks",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = all_queries()
    ordered = {name: qs[name] for name in _PRIORITY if name in qs}
    ordered.update((name, fn) for name, fn in qs.items() if name not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return all_oracles()
