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

# (a) changed in round 8 (fingerprint diff vs the r7-end snapshot):
# q115/q151/q177/q179/q181/q187/q188 ride the VP8L distance-plane-map
# spec fix + the animation lattice retained-bytes cap + the animated
# still alpha-hint fix + the lossy-frame system-binding path; q151
# additionally gained ARITHMETIC-coded JPEG slices (SOF9 sequential
# with restarts + SOF10 progressive — operators/jpeg_arith, the QM
# path cross-validated against the system libjpeg) and the i%16
# corpus split that keeps the baseline-SOF0 branch live;
# q182/q186 ride the href single-quote-pair strip; q183's metric fold
# was extracted into the helper q191 shares; the whole streaming
# family rides the directory-aware file-source reader (the ×100
# streaming stress run found the old pathGlobFilter read ZERO rows
# from a directory-shaped documents.parquet).
_CHANGED_THIS_ROUND = [
    "q187_webp_decode_bucket",
    "q188_webp_anim_sample",
    "q115_png_decode_bucket",
    "q151_gif_jpeg_decode_bucket",
    "q177_raster_decode_bucket",
    "q179_video_frame_sample",
    "q181_image_dedup",
    "q182_link_graph",
    "q186_domain_pagerank",
    "q183_retrieval_metrics",
    "q90_stream_quality_dedup",
    "q61_stream_tumbling",
    "q62_stream_sliding",
    "q63_stream_sessions",
    "q64_stream_dedup",
    "q65_stream_stream_join",
    "q66_stream_static_enrich",
    "q108_stream_incremental_dedup",
    "q111_stream_window_drift",
    "q123_stream_heavy_hitters",
    "q141_stream_blocklist",
    # q95/q114 ride the featurizer-oracle extraction the q193 review
    # asked for (shared CTE helper; results unchanged)
    "q95_dsir_logweights",
    "q114_gumbel_resample",
]

# (b) never rowed: new queries land here until their first driver row.
# q190 is NEW in round 8: lossy-VP8 decode through the system-libwebp
# ctypes binding (operators/webp_system.py) — the r7 "PIL seam" closed
# with the same C library PIL wraps. q191 is NEW: the indexed
# (SRP-LSH multi-probe) retrieval-metrics eval with recall delta vs
# the exact run (the r7 verdict's "promote q183 to the ANN scale
# path").
_NEVER_ROWED: list[str] = [
    "q190_webp_lossy_decode",
    "q191_index_retrieval_metrics",
    # q192: decode streams a FOREIGN encoder (the JVM's ImageIO
    # writers) produced — the gate-level answer to the matched
    # encoder/decoder bug class the TIFF-LZW fix exposed.
    "q192_foreign_stream_decode",
    # q193: fastText-shape hashed-ngram classifier inference — the
    # learned quality filter CCNet/RefinedWeb deploy, on the q95
    # featurizer with a closed-form pseudo-model.
    "q193_fasttext_quality_filter",
    # q194: Gopher Table A2 repetition signals (dup line/paragraph
    # fractions, top/dup n-gram char coverage, keep conjunction) — the
    # repetition-removal half q82's Table A1 bundle doesn't cover.
    "q194_repetition_signals",
]

# (c) reworked last round with only pre-rework rows: none — all 12
# round-7 changed/new queries got green r7 rows.
_REWORKED_LAST_ROUND: list[str] = []

_PRIORITY = [
    *_CHANGED_THIS_ROUND,
    *_NEVER_ROWED,
    *_REWORKED_LAST_ROUND,
    # (d) stalest first — q68/q69 (round-3 rows; their resplit-replay
    # reader path was not touched) and the zorder pair, then the
    # round-4 block: ANN/dedup first (they share the most
    # frequently-touched operator modules), then bucketing, then the
    # pure-SQL relational family (most stable, so last in line)
    "q68_stream_stateful_stats",
    "q69_stream_foreachbatch_upsert",
    "q83_zorder_key",
    "q84_zorder_skipping",
    "q32_minhash_lsh_neardup",
    "q36_neardup_clusters",
    "q41_ann_bruteforce_topk",
    "q42_ann_srp_lsh_topk",
    "q43_embedding_neardup",
    "q44_ann_ivf_topk",
    "q48_ann_multiprobe_topk",
    "q60_cluster_resolve",
    "q85_ann_ivf_kmeans",
    "q86_semantic_dedup",
    "q93_ann_ivf_multiprobe",
    "q96_editdist_verify",
    "q97_knn_graph",
    "q98_embedding_quantize",
    "q99_adaptive_quality_filter",
    "q101_span_dedup",
    "q103_perplexity_band",
    "q105_quality_drift",
    "q106_image_neardup",
    # ---- 50-row driver cutoff lands here ----
    "q72_multimodal_features",
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
