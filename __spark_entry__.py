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
# Front-load (a) queries with no driver row in any prior round, (b)
# queries whose implementation changed this round, (c) queries whose
# last driver row predates the current testdata; stable/green queries
# rotate to the back (their historical rows stand).
_PRIORITY = [
    # (a) NEW this round — no driver row exists yet
    "q95_dsir_logweights",
    "q96_editdist_verify",
    "q97_knn_graph",
    "q98_embedding_quantize",
    "q99_adaptive_quality_filter",
    "q100_bloom_contamination",
    "q101_span_dedup",
    "q102_incremental_dedup",
    "q103_perplexity_band",
    "q104_curation_v2",
    "q105_quality_drift",
    "q106_image_neardup",
    "q107_bm25_topk",
    "q108_stream_incremental_dedup",
    "q109_pmi_collocations",
    "q110_bm25_rerank",
    "q111_stream_window_drift",
    "q112_funnel",
    "q113_cohort_retention",
    "q114_gumbel_resample",
    # (b) reworked this round: SRP buckets rendered as one F.expr
    # (q42/q48/q43 + brute-force norm sharing), LSH band-candidate
    # refactor (q32/q35/q36/q60), fixed-k IVF seeding (q44/q93/q85/q86)
    "q42_ann_srp_lsh_topk",
    "q48_ann_multiprobe_topk",
    "q43_embedding_neardup",
    "q41_ann_bruteforce_topk",
    "q32_minhash_lsh_neardup",
    "q35_curation_pipeline",
    "q36_neardup_clusters",
    "q60_cluster_resolve",
    "q44_ann_ivf_topk",
    "q93_ann_ivf_multiprobe",
    "q85_ann_ivf_kmeans",
    "q86_semantic_dedup",
    "q72_multimodal_features",
    # (c) stalest: last driver row predates the r3-regenerated testdata
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
    "q21_bucket_assign",
    "q22_bucket_assign_noupscale",
    "q23_bucket_stats",
    "q27_upsert_merge",
    "q28_crop_ltrb",
    # (c) stale but past the 50-sample window this round — documented
    # coverage gap, front of the queue for round 5
    "q29_seeded_shuffle",
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
    "q66_stream_static_enrich",
    "q70_webdataset_roundtrip",
    "q71_multimodal_decode",
    "q73_tag_inference",
    "q74_snapshot_diff",
    "q75_mix_rebalance",
    "q76_salted_join_hot_key",
    "q78_contamination_check",
    "q80_video_frame_sample",
    "q81_line_dedup",
    "q87_audio_chunk_plan",
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
