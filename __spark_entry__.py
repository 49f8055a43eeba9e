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

# (a) changed in round 10 (fingerprint diff vs the r9-end snapshot,
# QUERY_FINGERPRINTS.json refreshed at f9249b6):
_CHANGED_THIS_ROUND: list[str] = [
    # q49 rides the HLL audit sigma widening 3->5 (ADVICE r9: the
    # audit gates gross sketch breakage, not calibration; the 3-sigma
    # tail could redden a regenerated dataset with no code change).
    "q49_corpus_profile_approx",
    # the streaming replay family rides the resplit_events rework:
    # source-signature cache keys + slice-count revalidation (ADVICE
    # r9) and the late-data carve-out machinery (r9 verdict #3).
    "q111_stream_window_drift",
    "q123_stream_heavy_hitters",
    "q68_stream_stateful_stats",
    "q69_stream_foreachbatch_upsert",
    # the decode/audio corpus family rides the _spread under-split
    # guard (r9 verdict #2 -- repartition only when scan splits <
    # cores, the ensure_map_parallelism policy applied to the second
    # site; gate-SF plans unchanged) and jpeg_lossless's
    # entropy-domain overflow now honoring null-for-corrupt instead
    # of clamping (ADVICE r9).
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
    # q192 additionally rides the foreign-corpus cache now keyed on a
    # documents.parquet (size, mtime) signature (ADVICE r9).
    "q192_foreign_stream_decode",
    # the bucketing family rides a REAL correctness fix the r10 100x
    # exact sweep caught: DuckDB typed the oracle's bare float VALUES
    # literals DECIMAL(18,17), whose non-double arithmetic silently
    # flipped an EXACT aspect-ratio tie ((45,92): both candidate
    # errors are 1/92) away from the reference's np.argmin answer;
    # the reso table is now CAST AS DOUBLE
    # (operators/bucketing.py bucket_oracle_sql, pinned by
    # tests/test_bucketing_golden.py). q22 (no-upscale builder,
    # untouched) correctly does NOT drift — function-level slicing.
    "q21_bucket_assign",
    "q23_bucket_stats",
    "q28_crop_ltrb",
    # three more r10 100x-sweep correctness fixes (the full-registry
    # exact sweep at the stress tier read 192/195):
    # q163 -- the synthesized forest was only well-formed at DENSE id
    # spaces; at sparse rotated ids every interior ancestor dangled
    # and the pointer-jump inner join silently dropped 90% of rows.
    # The node set is now the ancestor closure (identical result at
    # gate SFs, where closure == doc_id set).
    "q163_hierarchy_flatten",
    # q174/q175 -- money now sums in exact integer ten-thousandths
    # (BIGINT) instead of per-row-rounded doubles: the double sum
    # flipped a .xx5 boundary at 100x volume (order-sensitive).
    "q174_local_supplier_volume",
    "q175_brand_market_share",
]

# (b) never rowed: new queries land here until their first driver row.
_NEVER_ROWED: list[str] = [
    # NEW r10: late-data watermark falsifiability gate (r9 verdict
    # #3) -- deterministic out-of-order replay, oracle excludes the
    # exact closed-form drop set, n_emissions pins the
    # evict-but-readmit half-failure. tests/test_streaming_late.py
    # proves a disabled watermark re-admits the set.
    "q195_stream_late_data",
]

# (c) reworked last round with only pre-rework rows: none -- all 23
# round-9 changed queries got green r9 rows (50/50 in
# CORRECTNESS_r09.json).
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first: the round-5 block, 38 rows remaining after
    # r9's flush. (a)+(b) take 29 slots this round (the _spread guard
    # fans across the decode family, the oracle DECIMAL fix across
    # the bucketing family, and the three 100x-sweep fixes above are
    # themselves round-5-stale rows now front-loaded -- computed, not
    # chosen), so the window covers 21 more of the 38 here plus the 3
    # in (a) = 24 total; the 14 past the cutoff stay in
    # round-5-stale order at positions 51+ and MUST lead round 11's
    # (d) block. After r10, every other row in the registry is
    # <=r9-rowed.
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
    # ---- 50-row driver cutoff lands here ----
    "q147_last_touch_attribution",
    "q155_markov_transitions",
    "q156_source_js_divergence",
    "q164_daily_max_concurrency",
    "q165_calibration_bins",
    "q166_time_decay_attribution",
    "q167_rfm_segmentation",
    "q168_ht_sample_audit",
    "q169_dau_wau_stickiness",
    "q170_scd2_dimension",
    "q171_top_event_paths",
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
