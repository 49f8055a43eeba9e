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

# (a) changed in round 11 (fingerprint diff vs the r10-end snapshot,
# QUERY_FINGERPRINTS.json refreshed at 32453d7): the registry-wide
# retirement of the order-sensitive dround(sum(double)) money
# convention (r10 verdict #2). Every 2-decimal money/value SUM now
# rides the q174/q175 integer-units convention (functions/compat.py
# money_units/units_money): per-row exact BIGINT quantization, exact
# integer sum, one shared IEEE conversion — engine and oracle moved
# together, so gate-SF values are unchanged except possibly at .xx5
# boundaries the old convention resolved by summation order.
_CHANGED_THIS_ROUND: list[str] = [
    "q01_pricing_summary",
    "q03_inner_join_agg",
    "q04_left_join_nulls",
    "q06_anti_join_count",
    "q13_star_join_revenue",
    "q14_monthly_orders",
    "q15_rollup",
    "q16_pivot_status",
    "q19_sessionize",
    "q20_tumbling_window",
    "q47_running_window",
    # the streaming window/stateful family: the BIGINT units now live
    # INSIDE the state store (streaming/pipeline.py tumbling_agg /
    # sliding_agg / session_agg, streaming/stateful.py), so the
    # emitted totals are batch-split- and arrival-order-insensitive.
    "q61_stream_tumbling",
    "q62_stream_sliding",
    "q63_stream_sessions",
    "q66_stream_static_enrich",
    "q68_stream_stateful_stats",
    "q76_salted_join_hot_key",
    # riders of the ensure_map_parallelism probe rework (r10 verdict
    # #5: leaf-scan split math instead of rdd.getNumPartitions —
    # shuffle-final-safe, no physical planning outside AQE; behavior
    # at these call sites unchanged, pinned by test_plan_shape.py):
    "q35_curation_pipeline",
    "q88_pretraining_corpus",
    "q104_curation_v2",
    # ADVICE r10 #1: the ancestor-closure filter's k=0 operand no
    # longer computes power(10, -1) (greatest-clamped) — correctness
    # no longer leans on Or short-circuiting under ANSI mode.
    "q163_hierarchy_flatten",
    # riders of the resplit_events one-pass rework (r10 verdict #6:
    # all in-order slices land in one parallel partitionBy write over
    # a persisted ranked frame — q195's gate wall roughly halved;
    # slice contents byte-identical, streaming tests green):
    "q69_stream_foreachbatch_upsert",
    "q111_stream_window_drift",
    "q123_stream_heavy_hitters",
    "q195_stream_late_data",
    # ADVICE r10 #4: q192's foreign-corpus cache key now reuses the
    # streaming replay's _source_signature (one signature contract).
    "q192_foreign_stream_decode",
]

# (b) never rowed: none — q195 (the only r10 addition) got its green
# r10 row; registry growth is frozen per the r8 rule.
_NEVER_ROWED: list[str] = []

# (c) reworked last round with only pre-rework rows: none — all 29
# round-10 changed queries got green r10 rows (50/50 in
# CORRECTNESS_r10.json).
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first: the FINAL 14 round-5 rows (r10 verdict #1 —
    # this completes the flush r9 ordered: after these, every row in
    # the registry union is >=r6). (a) takes 26 slots, these take 14,
    # so 10 round-6 rows also fit the 50-row window.
    "q117_sql_shipping_priority",
    "q147_last_touch_attribution",
    "q155_markov_transitions",
    "q156_source_js_divergence",
    "q162_correlated_above_nation_avg",
    "q164_daily_max_concurrency",
    "q165_calibration_bins",
    "q166_time_decay_attribution",
    "q167_rfm_segmentation",
    "q168_ht_sample_audit",
    "q169_dau_wau_stickiness",
    "q170_scd2_dimension",
    "q171_top_event_paths",
    "q176_conversion_latency_quantiles",
    # round-6 rows (35 total; the 10 below fill the window, the rest
    # queue in the same stale order at 51+ for round 12's (d) block).
    "q100_bloom_contamination",
    "q102_incremental_dedup",
    "q107_bm25_topk",
    "q109_pmi_collocations",
    "q110_bm25_rerank",
    "q118_span_decontaminate",
    "q119_json_props_extract",
    "q120_minhash_quality_audit",
    "q121_embedding_dim_profile",
    "q122_source_overlap_matrix",
    # ---- 50-row driver cutoff lands here ----
    "q124_group_quantiles",
    "q125_signature_sidetable",
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
