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
#
# Since round 8, (a) and (c) are COMPUTED, not hand-maintained:
# scripts/fingerprints.py hashes each query's function slice plus its
# operator-module closure against QUERY_FINGERPRINTS.json (the
# fingerprint at the query's newest verified row), and
# tests/test_cli.py::test_changed_this_round_matches_fingerprint_diff
# fails if any drifted query is missing below. Round-start ritual:
#   python scripts/fingerprints.py refresh <prev-round-end-rev> <N>
#   python scripts/fingerprints.py diff   # → this list
# (Round 6's q90 rework slipped through the old hand list — shared-
# source changes are exactly what hand lists miss.)

# (a) changed in round 9 (fingerprint diff vs the r8-end snapshot,
# QUERY_FINGERPRINTS.json refreshed at cc04b26):
# q49 gained the in-plan sketch-contract audit + its first oracle
# (r8 verdict #3 — the registry's last rows-only row is now gated).
_CHANGED_THIS_ROUND: list[str] = [
    "q49_corpus_profile_approx",
    # q111 promoted to production shape: update mode + wired watermark
    # over the 4-batch time-ordered replay (r8 verdict #5); q68/q69
    # ride the read_split_stream TIMESTAMP_NTZ→TIMESTAMP cast that
    # promotion needed (value-preserving under the UTC session tz).
    "q111_stream_window_drift",
    # q123 rides the same promotion (types × open-windows state)
    "q123_stream_heavy_hitters",
    "q68_stream_stateful_stats",
    "q69_stream_foreachbatch_upsert",
    # q192's foreign-encoder matrix gained the JVM ImageIO JPEG writer
    # as variant 4 (r8 verdict #6) — the baseline Huffman decoder now
    # sits under the driver gate against a foreign encoder.
    "q192_foreign_stream_decode",
    # q194 rides the ADVICE r8 gram-mass alignment: n-gram char mass is
    # now sum(len(word)) without join spaces, the Dolma/FineWeb/RPv2
    # convention (Spark + oracle + property reference moved together).
    "q194_repetition_signals",
    # the decode/audio corpus family rides (a) the jpeg_codec DAC
    # odd-length null-for-corrupt fix (ADVICE r8 #2) and (b) the
    # round-9 _spread corpus repartition: generation + decode now fan
    # out to full parallelism instead of inheriting the source file
    # count (ONE partition at gate SFs — the whole decode matrix was
    # single-threaded).
    "q115_png_decode_bucket",
    "q151_gif_jpeg_decode_bucket",
    "q177_raster_decode_bucket",
    "q179_video_frame_sample",
    "q181_image_dedup",
    "q187_webp_decode_bucket",
    "q188_webp_anim_sample",
    "q190_webp_lossy_decode",
    "q71_multimodal_decode",
    "q72_multimodal_features",
    "q73_tag_inference",
    "q80_video_frame_sample",
    "q87_audio_chunk_plan",
    "q106_image_neardup",
    "q178_wav_decode_chunk",
    "q184_audio_quality_filter",
    # the curation chains ride ensure_map_parallelism — the _spread
    # finding generalized to the text flagships (fan out the corpus
    # ONLY when the scan yields fewer splits than cores; no-op on
    # production layouts). q88 9.7→7.3 s, q104 9.2→7.4 warm at sf0.1.
    "q35_curation_pipeline",
    "q88_pretraining_corpus",
    "q104_curation_v2",
]

# (b) never rowed: new queries land here until their first driver row.
_NEVER_ROWED: list[str] = []

# (c) reworked last round with only pre-rework rows: none — all 23
# round-8 changed + 5 new queries got green r8 rows (50/50 in
# CORRECTNESS_r08.json).
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first. The 21 round-4-rowed queries lead (the r8
    # verdict's #1 ask — after this round every row in the registry is
    # ≤r5-stale): decode/temporal first (they share frequently-touched
    # operator modules, so a rework this round folds them into (a)
    # without reshuffling), then bucketing, then the pure-SQL
    # relational family. The remainder of the window fills from the
    # round-5 block.
    # (q106/q72 moved to (a): the _spread rework touched them)
    "q112_funnel",
    "q113_cohort_retention",
    "q21_bucket_assign",
    "q22_bucket_assign_noupscale",
    "q23_bucket_stats",
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
    # round-5 block (43 rows total; the 50-row driver cutoff lands
    # inside it, sliding up as (a)/(b) grow): operator-heavy families
    # first — ANN/graph/dedup share the most-touched modules — then
    # text/temporal, then pure-SQL last.
    "q130_pq_adc_topk",
    "q116_density_prune",
    "q131_hard_negatives",
    "q136_margin_bitext_mining",
    "q139_ann_recall_audit",
    "q142_ivf_drift_audit",
    "q161_containment_dedup",
    "q148_label_propagation",
    "q154_pagerank",
    "q157_hits",
    "q132_bpe_merge_pairs",
    "q134_vocab_coverage",
    "q137_blocklist_filter",
    "q149_rake_keywords",
    "q150_doremi_reweight",
    "q158_readability",
    "q159_zipf_slope",
    "q160_top_bigram_positions",
    "q133_cluster_balanced_sample",
    "q135_doc_stitching",
    "q138_teacher_majority_vote",
    "q140_source_lang_chi2",
    "q143_json_schema_profile",
    "q144_ab_test_ztest",
    "q145_event_cooccurrence_lift",
    "q146_level_shift",
    "q147_last_touch_attribution",
    "q155_markov_transitions",
    "q156_source_js_divergence",
    "q163_hierarchy_flatten",
    "q164_daily_max_concurrency",
    "q165_calibration_bins",
    "q166_time_decay_attribution",
    "q167_rfm_segmentation",
    "q168_ht_sample_audit",
    "q169_dau_wau_stickiness",
    "q170_scd2_dimension",
    "q171_top_event_paths",
    "q174_local_supplier_volume",
    "q175_brand_market_share",
    "q176_conversion_latency_quantiles",
    "q162_correlated_above_nation_avg",
    "q117_sql_shipping_priority",
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
