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

# (a) changed in round 13 (fingerprint diff vs the r12-end snapshot,
# QUERY_FINGERPRINTS.json refreshed at cc45497). q193 LEADS the window
# (r12 verdict #2): it was the 51st entry of r12's 51-query changed
# set and the only changed query the 50-row driver window missed.
# This round's rework (optimization round 2; every change
# oracle-verified exact, see OPTIMIZATION_r13.md):
# (1) connected_components measured-size fast path (single-task
#     vectorized kernel below CC_SMALL_EDGE_THRESHOLD edges, entered
#     pre-loop or mid-contraction) → the CC consumers;
# (2) curate_corpus passthrough-column guard (quality-output names
#     excluded from `other`, r12 ADVICE #3) → q35.
_CHANGED_THIS_ROUND: list[str] = [
    "q193_fasttext_quality_filter",
    # (1) CC fast path
    "q36_neardup_clusters",
    "q60_cluster_resolve",
    "q86_semantic_dedup",
    "q91_leakage_safe_split",
    # (2) curate_corpus guard
    "q35_curation_pipeline",
]

# (b) never rowed: none — registry growth is frozen at 195 for the
# fifth straight round (r8 rule).
_NEVER_ROWED: list[str] = []

# (c) reworked last round with only pre-rework rows: none — q193, the
# one r12 window-overflow miss, sits at the head of (a) above (its
# fingerprint is still drifted vs its newest verified row).
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first: the round-6 cohort deferred two rounds
    # running (r12's 51-query changed set consumed the whole window),
    # then the round-7 queue — with only 6 changed entries this round
    # the 50-row window finally flushes the whole round-6 block and
    # most of round-7's.
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
    # round-7 rows, stale queue (6 changed + 22 round-6 + these 15 =
    # 43 ≤ 50: the whole backlog sits inside this round's window)
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
    # round-7 tail (the 43-entry prefix above leaves 7 window slots;
    # fill them stalest-first so the registry-order fallback can't
    # promote a fresher row past these)
    "q185_entity_resolution",
    "q189_gapfill_interpolate",
    "q75_mix_rebalance",
    "q77_label_centroid_cohesion",
    "q79_unigram_logprob",
    "q81_line_dedup",
    "q82_gopher_rules",
    # ---- 50-row driver cutoff lands here ----
    # round-7 remainder (beyond the cutoff; keeps the queue explicit
    # for the r14 rotation)
    "q89_temperature_mix",
    "q92_pack_barriered",
    "q94_rag_chunking",
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
