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

# (a) changed in round 12 (fingerprint diff vs the r11-end snapshot,
# QUERY_FINGERPRINTS.json refreshed at 24f5950). Two change waves:
#
# Wave 1 (build-phase carryover):
# (1) r11 verdict #1 — `_spread` retired the decode chains' RDD
#     partition probe and now rides plans.curation.ensure_map_
#     parallelism keyed on doc_id (leaf-scan split math; RDD count
#     only as the file-less fallback) → the whole decode/corpus
#     family re-rows, exactly as the r11 deferral note planned;
# (2) r11 ADVICE #1 — scan_input_splits mirrors FilePartition's
#     bin-packing half, and the curate_corpus persist lifecycle is
#     caller-owned with per-query release (r11 verdict #3) → the
#     curation chain re-rows;
# (3) r11 ADVICE #2 — the replay resplit's one-file-per-slice
#     contract is a real raise instead of a `python -O`-erasable
#     assert → the resplit/stateful streaming consumers re-row.
#
# Wave 2 (optimization round; every change oracle-verified exact, see
# OPTIMIZATION_r12.md):
# (4) persisted multi-consumer stage boundaries (semantic_dedup cell
#     assignment, q60's component/quality table, incremental dedup's
#     per-side signature tables) and projection trims before the
#     exact-dedup windows → the curation/dedup/similarity consumers;
# (5) repetition_signals' map-only Arrow gram path (native form kept
#     as the oracle mirror) → q194;
# (6) F.expr spellings of the token/shingle-hash chains (identical
#     Catalyst nodes, ~1 py4j round-trip instead of ~1500) → the span/
#     DSIR/winnow/ngram consumers;
# (7) connected-components / graph loops: lazy localCheckpoints and
#     superseded-generation release → the CC/pagerank/HITS consumers.
_CHANGED_THIS_ROUND: list[str] = [
    # (1) decode/corpus family — the _spread probe swap
    "q71_multimodal_decode",
    "q72_multimodal_features",
    "q73_tag_inference",
    "q80_video_frame_sample",
    "q87_audio_chunk_plan",
    "q106_image_neardup",
    "q115_png_decode_bucket",
    "q151_gif_jpeg_decode_bucket",
    "q177_raster_decode_bucket",
    "q178_wav_decode_chunk",
    "q179_video_frame_sample",
    "q181_image_dedup",
    "q184_audio_quality_filter",
    "q187_webp_decode_bucket",
    "q188_webp_anim_sample",
    "q190_webp_lossy_decode",
    "q192_foreign_stream_decode",
    # (2) curation chain — split-math packing + persist lifecycle,
    # then the wave-2 projection trims and persisted boundaries
    "q35_curation_pipeline",
    "q88_pretraining_corpus",
    "q104_curation_v2",
    # (3) replay resplit contract hardening
    "q68_stream_stateful_stats",
    "q69_stream_foreachbatch_upsert",
    "q111_stream_window_drift",
    "q123_stream_heavy_hitters",
    "q195_stream_late_data",
    # (4-7) optimization-round rework set (fingerprint diff)
    "q194_repetition_signals",
    "q86_semantic_dedup",
    "q60_cluster_resolve",
    "q102_incremental_dedup",
    "q101_span_dedup",
    "q118_span_decontaminate",
    "q95_dsir_logweights",
    "q114_gumbel_resample",
    "q50_ngram_repetition",
    "q54_winnow_fingerprints",
    "q32_minhash_lsh_neardup",
    "q34_ngram_jaccard_neardup",
    "q36_neardup_clusters",
    "q96_editdist_verify",
    "q100_bloom_contamination",
    "q120_minhash_quality_audit",
    "q125_signature_sidetable",
    "q161_containment_dedup",
    "q78_contamination_check",
    "q91_leakage_safe_split",
    "q154_pagerank",
    "q157_hits",
    "q186_domain_pagerank",
    "q156_source_js_divergence",
    "q163_hierarchy_flatten",
    "q193_fasttext_quality_filter",
]

# (b) never rowed: none — registry growth is frozen at 195 for the
# fourth straight round (r8 rule).
_NEVER_ROWED: list[str] = []

# (c) reworked last round with only pre-rework rows: none — all 30
# round-11 changed queries got green r11 rows (50/50 in
# CORRECTNESS_r11.json).
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first: the remaining round-6 cohort. The wave-2
    # optimization rework set grew (a) past 50, so this block now
    # queues BEHIND the 50-row window (changed-first is the rule:
    # never newer-before-never-rowed, and every (a) entry was reworked
    # this round); entries that joined (a) above (q125/q34/q50) are
    # removed here rather than duplicated. The cohort keeps its stale
    # order for round 13's (d) block.
    "q124_group_quantiles",
    "q126_curation_report",
    "q127_cdc_chunks",
    "q128_length_buckets",
    "q129_robust_outliers",
    "q152_url_canonical_dedup",
    "q153_normalized_dedup",
    "q172_grouping_sets",
    "q173_referential_integrity",
    "q180_html_extract",
    "q27_upsert_merge",
    "q29_seeded_shuffle",
    "q30_map_zip_filter",
    "q31_exact_dedup",
    "q33_simhash_fingerprint",
    "q37_name_series_parse",
    "q40_corpus_profile",
    "q45_cube_rollup",
    "q46_set_ops",
    "q56_tfidf_topk",
    "q57_stratified_sample",
    "q59_pii_redact",
    # ---- 50-row driver cutoff lands here ----
    # round-7 rows, stalest-order queue for r13
    "q17_tokenize_normalize",
    "q18_regex_extract",
    "q24_novelai_order",
    "q25_clean_caption",
    "q26_clean_tags",
    "q38_asof_join",
    "q39_range_join",
    "q51_token_counts",
    "q52_quality_score",
    "q53_language_id",
    "q55_quality_rollup",
    "q58_pack_chunks",
    "q67_pack_greedy",
    "q70_webdataset_roundtrip",
    "q74_snapshot_diff",
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
