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

# (a) changed in round 7: q177/q178 go through the hardened TIFF/WAV
# header handling (64MP bounds-before-allocation cap, tile-canvas cap,
# bounded Deflate inflate, ADPCM fact clamped to the data chunk's
# decodable maximum) and q181 through the gray+alpha dHash fix — the
# three r6 ADVICE items; q182/q183/q184 are NEW (outlink extraction →
# domain link graph, IR retrieval metrics MRR/recall@k/nDCG@k, and the
# audio silence/clipping hygiene filter over real decoded WAV bytes,
# blocked entity resolution over synthesized dirty records, and the
# extract->link-graph->PageRank crawl-prior composition); q187 is NEW
# (stdlib VP8L WebP decode -> bucket e2e, closing the WEBP codec tail);
# q188 is NEW (animated-WebP VP8X/ANMF frame sampling, the third video
# container), q179 rides the same extended sampling operator, and q189
# is NEW (gap-filled time series: LOCF + linear interpolation).
_CHANGED_THIS_ROUND = [
    "q177_raster_decode_bucket",
    "q178_wav_decode_chunk",
    "q181_image_dedup",
    "q182_link_graph",
    "q183_retrieval_metrics",
    "q184_audio_quality_filter",
    "q185_entity_resolution",
    "q186_domain_pagerank",
    "q187_webp_decode_bucket",
    "q188_webp_anim_sample",
    "q179_video_frame_sample",
    "q189_gapfill_interpolate",
]

# (b) never rowed: none — round 6 caught the record up; every
# registered query has at least one green driver row.
_NEVER_ROWED: list[str] = []

# (c) reworked last round with only pre-rework rows: none — the round-6
# reworks (q172/q173/q152/q153/q151/q71/q115) all got green r6 rows.
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first: newest driver row from round 2 ...
    "q70_webdataset_roundtrip",
    "q73_tag_inference",
    "q74_snapshot_diff",
    "q75_mix_rebalance",
    "q76_salted_join_hot_key",
    "q78_contamination_check",
    "q80_video_frame_sample",
    "q81_line_dedup",
    # ... then newest row from round 3
    "q87_audio_chunk_plan",
    "q66_stream_static_enrich",
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
    "q91_leakage_safe_split",
    "q67_pack_greedy",
    "q79_unigram_logprob",
    "q89_temperature_mix",
    "q92_pack_barriered",
    "q82_gopher_rules",
    "q94_rag_chunking",
    "q77_label_centroid_cohesion",
    "q61_stream_tumbling",
    "q62_stream_sliding",
    # ---- 50-row driver cutoff lands here ----
    "q63_stream_sessions",
    "q65_stream_stream_join",
    "q64_stream_dedup",
    "q68_stream_stateful_stats",
    "q69_stream_foreachbatch_upsert",
    "q90_stream_quality_dedup",
    "q83_zorder_key",
    "q84_zorder_skipping",
    # newest row from round 4 (refresh continues next round)
    "q21_bucket_assign",
    "q22_bucket_assign_noupscale",
    "q23_bucket_stats",
    "q32_minhash_lsh_neardup",
    "q96_editdist_verify",
    "q101_span_dedup",
    "q36_neardup_clusters",
    "q60_cluster_resolve",
    "q72_multimodal_features",
    "q106_image_neardup",
    "q01_pricing_summary",
    "q02_threshold_filter",
    "q03_inner_join_agg",
    "q04_left_join_nulls",
    "q05_semi_join",
    "q06_anti_join_count",
    "q07_union_dedup_last_wins",
    "q08_conditional_audit",
    "q09_distinct_pairs",
    "q10_topk_global",
    "q11_topk_per_group",
    "q12_argmax_per_group",
    "q13_star_join_revenue",
    "q14_monthly_orders",
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
