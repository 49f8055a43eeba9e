"""Training-mix construction gate queries: repetition profiling,
TF-IDF ranking, deterministic sampling, sequence packing, PII
redaction, and near-dup cluster resolution.

These are the steps between "deduped corpus" and "training batches" in
a 100 TB pipeline: score and drop repetitive boilerplate (q50), surface
characteristic terms (q56), draw reproducible stratified mixes (q57),
pack documents into context-window chunks (q58 concatenative, q67
document-preserving), scrub PII with an audit trail (q59), and collapse
each near-dup cluster to its best member (q60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.functions.hashing import polyhash_sql, shingle_hashes_sql
from anime_data_pipeline_spark.functions.text import tokens_sql
from anime_data_pipeline_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from anime_data_pipeline_spark.operators.packing import chunk_by_budget, pack_greedy
from anime_data_pipeline_spark.operators.sampling import (
    mix_rebalance,
    mix_rebalance_pred_sql,
    seeded_hash_sql,
    stratified_sample_n,
)
from anime_data_pipeline_spark.operators.terms import (
    ngram_repetition_profile,
    tfidf_topk,
)
from anime_data_pipeline_spark.operators.textstats import (
    quality_columns,
    quality_sql_projection,
    redact_pii,
    redact_pii_sql,
    ws_token_count,
    ws_token_count_sql,
)
from anime_data_pipeline_spark.queries.dedup_q import (
    _CORPUS_SQL,
    _BANDS,
    _K,
    _NGRAM,
    _THRESH,
    minhash_pairs_sql,
    mutated_corpus,
)
from anime_data_pipeline_spark.registry import register


# ---------------------------------------------------------------------------
# q50 — n-gram repetition profile (Gopher-style quality signals).
# Mutation appends each doc's own head back onto itself for 1/3 of
# docs, planting real duplicate bigrams for the metrics to find.
# ---------------------------------------------------------------------------
_REP_MUT_SQL = """SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN text || ' ' || substr(text, 1, 40) || ' ' || substr(text, 1, 40)
       ELSE text END AS text FROM documents"""


def _rep_mutated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring(F.col("text"), 1, 40)
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" "), head, F.lit(" "), head),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


_REP_N = 2

_Q50_ORACLE = f"""
    WITH corpus AS ({_REP_MUT_SQL}),
    tok AS (SELECT doc_id AS doc, {tokens_sql("text")} AS toks FROM corpus),
    tha AS (SELECT doc, list_transform(toks, t -> {polyhash_sql("t")}) AS th FROM tok),
    grams AS (SELECT doc, unnest({shingle_hashes_sql("th", _REP_N)}) AS gram FROM tha),
    per_gram AS (SELECT doc, gram, count(*) AS c FROM grams GROUP BY doc, gram)
    SELECT doc,
           CAST(sum(c) AS BIGINT) AS total_ngrams,
           count(*) AS distinct_ngrams,
           {dround_sql("CAST(max(c) AS DOUBLE) / sum(c)", 6)} AS top_ngram_frac,
           {dround_sql("CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c)", 6)} AS dup_ngram_frac
    FROM per_gram GROUP BY doc
"""


@register("q50_ngram_repetition", oracle=_Q50_ORACLE)
def q50_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ngram_repetition_profile(_rep_mutated(spark, sf_dir), "doc_id", "text", n=_REP_N)
    return out.select(
        "doc",
        "total_ngrams",
        "distinct_ngrams",
        dround(F.col("top_ngram_frac"), 6).alias("top_ngram_frac"),
        dround(F.col("dup_ngram_frac"), 6).alias("dup_ngram_frac"),
    )


# ---------------------------------------------------------------------------
# q56 — TF-IDF top-k characteristic terms per document.
# ---------------------------------------------------------------------------
_TFIDF_K = 3

_Q56_ORACLE = f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({tokens_sql("text")}) AS term FROM documents),
    tf AS (SELECT doc, term, count(*) AS tf FROM tok GROUP BY doc, term),
    dfq AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc, term FROM tok) GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc, tf.term, tf.tf, dfq.df,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN n),
    ranked AS (SELECT *, row_number() OVER (
                 PARTITION BY doc ORDER BY tfidf DESC, term) AS rank
               FROM scored)
    SELECT doc, term, tf, df, {dround_sql("tfidf", 6)} AS tfidf, rank
    FROM ranked WHERE rank <= {_TFIDF_K}
"""


@register("q56_tfidf_topk", oracle=_Q56_ORACLE)
def q56_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tfidf_topk(docs, "doc_id", "text", k=_TFIDF_K)
    return out.select(
        "doc",
        "term",
        "tf",
        "df",
        dround(F.col("tfidf"), 6).alias("tfidf"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q57 — deterministic stratified sample: exactly n docs per source,
# selected by seeded hash (rerun-stable, partition-stable).
# ---------------------------------------------------------------------------
_STRAT_N, _STRAT_SEED = 20, 1

_Q57_ORACLE = f"""
    SELECT doc_id, source, lang, n_chars FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY source
      ORDER BY {seeded_hash_sql("doc_id", _STRAT_SEED)}, doc_id) <= {_STRAT_N}
"""


@register("q57_stratified_sample", oracle=_Q57_ORACLE)
def q57_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_n(
        docs, "source", "doc_id", _STRAT_N, seed=_STRAT_SEED
    ).select("doc_id", "source", "lang", "n_chars")


# ---------------------------------------------------------------------------
# q58 — concatenative sequence packing: cut each source's doc stream
# (ordered by doc_id) every `budget` whitespace tokens.
# ---------------------------------------------------------------------------
_BUDGET = 256

_Q58_ORACLE = f"""
    WITH weighted AS (
      SELECT doc_id, source, {ws_token_count_sql("text")} AS n_tokens FROM documents),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
      FROM weighted)
    SELECT doc_id, source, n_tokens,
           CAST(floor(CAST(cum_before AS DOUBLE) / {_BUDGET}) AS BIGINT) AS chunk_id,
           CAST(cum_before % {_BUDGET} AS BIGINT) AS chunk_offset
    FROM cum
"""


@register("q58_pack_chunks", oracle=_Q58_ORACLE)
def q58_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens")
    )
    out = chunk_by_budget(docs, "source", "doc_id", "n_tokens", _BUDGET)
    return out.select(
        "doc_id", "source", "n_tokens", F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk_offset",
    )


# ---------------------------------------------------------------------------
# q59 — PII redaction with audit counts. Mutation plants emails/phones
# deterministically (1/4 of docs each), identically in both engines.
# ---------------------------------------------------------------------------
_PII_MUT_SQL = """SELECT doc_id,
  CASE CAST(doc_id % 4 AS INTEGER)
    WHEN 0 THEN text || ' contact alice.b@example.com or bob@mail.example.org'
    WHEN 1 THEN text || ' call 555-867-5309 now'
    WHEN 2 THEN text || ' mail carol@example.net at 111-222-3333'
    ELSE text END AS text FROM documents"""


def _pii_mutated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" contact alice.b@example.com or bob@mail.example.org")),
        )
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("text"), F.lit(" call 555-867-5309 now")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.col("text"), F.lit(" mail carol@example.net at 111-222-3333")),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", m.alias("text"))


def _q59_oracle() -> str:
    cols = redact_pii_sql("text")
    proj = ", ".join(f"{expr} AS {name}" for name, expr in cols.items())
    return f"WITH docs AS ({_PII_MUT_SQL}) SELECT doc_id, {proj} FROM docs"


@register("q59_pii_redact", oracle=_q59_oracle())
def q59_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return redact_pii(_pii_mutated(spark, sf_dir), "text").select(
        "doc_id", "n_emails", "n_phones", "redacted"
    )


# ---------------------------------------------------------------------------
# q60 — near-dup cluster resolution: connected components over the
# verified MinHash-LSH pairs, then keep each cluster's best-quality
# member (quality desc, doc_id asc tiebreak). The full curation
# endgame: clusters in, one survivor per cluster out.
# ---------------------------------------------------------------------------
_Q60_ORACLE = f"""
    WITH RECURSIVE pairs AS ({minhash_pairs_sql(_CORPUS_SQL, _NGRAM, _K, _BANDS, _THRESH)}),
    corpus AS ({_CORPUS_SQL}),
    nodes AS (SELECT doc_id FROM corpus),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node),
    scored AS (SELECT doc_id, {quality_sql_projection("text")["quality_score"]} AS q
               FROM corpus),
    ranked AS (SELECT component, doc_id, q, row_number() OVER (
                 PARTITION BY component ORDER BY q DESC, doc_id) AS rn
               FROM comp JOIN scored USING (doc_id)),
    best AS (SELECT component, doc_id AS keeper_id FROM ranked WHERE rn = 1),
    stats AS (SELECT component, count(*) AS n_members,
                     {dround_sql("max(q)", 6)} AS best_q
              FROM ranked GROUP BY component)
    SELECT component, n_members, keeper_id, best_q
    FROM stats JOIN best USING (component)
"""


@register("q60_cluster_resolve", oracle=_Q60_ORACLE)
def q60_cluster_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = mutated_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", "text", n=_NGRAM, k=_K, bands=_BANDS, threshold=_THRESH
    )
    comp = connected_components(
        corpus.select(F.col("doc_id").alias("node")), pairs
    ).select(F.col("node").alias("doc_id"), "component")
    scored = quality_columns(corpus, "text").select(
        "doc_id", F.col("quality_score").alias("q")
    )
    from pyspark import StorageLevel

    # (component, doc_id, q) feeds three consumers — the keeper window,
    # the stats aggregation, and (through both) the final join — and
    # its lineage holds the quality-regex forest over the full corpus
    # text; persist the 3-column rows once instead of recomputing that
    # scan per consumer. Lifecycle: callers release via clearCache, the
    # repo-wide convention (plans/curation.curate_corpus).
    joined = comp.join(scored, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("component").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("component", F.col("doc_id").alias("keeper_id"))
    )
    stats = joined.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        dround(F.max("q"), 6).alias("best_q"),
    )
    return stats.join(best, "component").select(
        "component", "n_members", "keeper_id", "best_q"
    )


# ---------------------------------------------------------------------------
# q67 — document-preserving greedy packing (applyInPandas stateful
# custom operator). The running-remainder state is sequential per
# group, but a recursive CTE replays the exact state machine row by
# row (rn+1 self-join carrying (chunk_id, acc)) — so the gate is fully
# oracle-checked; tests/test_packing.py additionally pins the
# distributed output to the pure-Python spec (pack_greedy_py).
# ---------------------------------------------------------------------------
_Q67_ORACLE = f"""
    WITH RECURSIVE docs AS MATERIALIZED (
      SELECT doc_id, source, {ws_token_count_sql("text")} AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    step(source, rn, doc_id, n_tokens, chunk_id, acc) AS (
      SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN s.acc > 0 AND s.acc + d.n_tokens > {_BUDGET}
                  THEN s.chunk_id + 1 ELSE s.chunk_id END,
             CASE WHEN s.acc > 0 AND s.acc + d.n_tokens > {_BUDGET}
                  THEN d.n_tokens ELSE s.acc + d.n_tokens END
      FROM step s JOIN docs d ON d.source = s.source AND d.rn = s.rn + 1
    )
    SELECT doc_id, source, n_tokens, chunk_id FROM step
"""


@register("q67_pack_greedy", oracle=_Q67_ORACLE)
def q67_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens")
    )
    return pack_greedy(docs, "source", "doc_id", "n_tokens", _BUDGET)


# ---------------------------------------------------------------------------
# q70 — WebDataset tar-shard roundtrip: documents → 8 byte-stable tar
# shards (.txt text + .json metadata per sample) → distributed unpack →
# reconstructed table. Oracle = the source table itself, so a hash
# match proves the sink/source pair is lossless end to end.
# ---------------------------------------------------------------------------
@register(
    "q70_webdataset_roundtrip",
    oracle="SELECT doc_id, lang, source, n_chars, text FROM documents",
)
def q70_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from anime_data_pipeline_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.format_string("%09d", F.col("doc_id")).alias("key"),
        F.col("text"),
        F.to_json(F.struct("lang", "source", "n_chars")).alias("meta"),
    )
    out_dir = tempfile.mkdtemp(prefix="wds_")
    manifest = write_webdataset(
        docs, out_dir, "key", text_members={"txt": "text", "json": "meta"}, n_shards=8
    )
    manifest.collect()  # materialize = execute the shard writes
    back = read_webdataset(spark, out_dir, text_exts=("txt", "json"))
    return back.select(
        F.col("key").cast("long").alias("doc_id"),
        F.get_json_object("json", "$.lang").alias("lang"),
        F.get_json_object("json", "$.source").alias("source"),
        F.get_json_object("json", "$.n_chars").cast("long").alias("n_chars"),
        F.col("txt").alias("text"),
    )


# ---------------------------------------------------------------------------
# q74 — snapshot diff (CDC): old = documents; new = documents with 1/7
# deleted, 1/5 text-modified, 1/11 re-keyed as additions. The change
# feed (added/deleted/modified + changed column names) drives
# incremental recomputation downstream.
# ---------------------------------------------------------------------------
_NEW_SNAP_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
           lang,
           CASE WHEN doc_id % 9 = 0 THEN 'src_moved' ELSE source END AS source
    FROM documents WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT doc_id + 300000 AS doc_id, text, lang, source
    FROM documents WHERE doc_id % 11 = 0
"""


def _new_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    kept = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        F.when(F.col("doc_id") % 9 == 0, F.lit("src_moved"))
        .otherwise(F.col("source"))
        .alias("source"),
    )
    added = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text", "lang", "source"
    )
    return kept.unionByName(added)


_Q74_ORACLE = f"""
    WITH old AS (SELECT doc_id, text, lang, source FROM documents),
    new AS ({_NEW_SNAP_SQL}),
    j AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
                 old.doc_id IS NOT NULL AS in_old,
                 new.doc_id IS NOT NULL AS in_new,
                 list_sort(list_filter(
                   [CASE WHEN old.text IS DISTINCT FROM new.text THEN 'text' END,
                    CASE WHEN old.lang IS DISTINCT FROM new.lang THEN 'lang' END,
                    CASE WHEN old.source IS DISTINCT FROM new.source THEN 'source' END],
                   x -> x IS NOT NULL)) AS diffs
          FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
    SELECT doc_id,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'deleted'
                WHEN len(diffs) > 0 THEN 'modified'
                ELSE 'unchanged' END AS change_type,
           coalesce(array_to_string(CASE WHEN in_old AND in_new THEN diffs ELSE [] END, ','), '') AS changed_cols
    FROM j
    WHERE NOT (in_old AND in_new AND len(diffs) = 0)
"""


@register("q74_snapshot_diff", oracle=_Q74_ORACLE)
def q74_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.diff import snapshot_diff

    old = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    out = snapshot_diff(
        old, _new_snapshot(spark, sf_dir), ["doc_id"], ["text", "lang", "source"]
    )
    # arrays don't survive the driver's column-sorted value hash;
    # project the changed-column list to a joined string on both sides
    return out.withColumn("changed_cols", F.array_join("changed_cols", ","))


# ---------------------------------------------------------------------------
# q75 — training-mix rebalance: downsample each lang toward target
# corpus shares (min(1, share*N/N_g) keep-rate, seeded-hash keep set).
# ---------------------------------------------------------------------------
_MIX_SHARES = {"en": 0.30, "zh": 0.20, "es": 0.15, "fr": 0.15, "de": 0.20}
_MIX_SEED = 3


@register(
    "q75_mix_rebalance",
    oracle=f"""
    WITH counted AS (
      SELECT doc_id, lang, source,
             count(*) OVER (PARTITION BY lang) AS n_g,
             count(*) OVER () AS n_total
      FROM documents)
    SELECT doc_id, lang, source FROM counted
    WHERE {mix_rebalance_pred_sql("lang", "doc_id", _MIX_SHARES, _MIX_SEED)}
    """,
)
def q75_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return mix_rebalance(docs, "lang", "doc_id", _MIX_SHARES, seed=_MIX_SEED)


# ---------------------------------------------------------------------------
# q78 — benchmark-contamination check: 1/29 of docs play the eval set;
# 1/13 of the remaining corpus is contaminated with a 120-char slice of
# a benchmark doc. Per-doc 8-gram overlap fraction against the
# benchmark shingle universe (broadcast), reported for every doc.
# ---------------------------------------------------------------------------
_CONTAM_N = 8

_Q78_CORPUS_SQL = """
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 13 = 0
                THEN d.text || ' ' || substr(b.text, 1, 120)
                ELSE d.text END AS text
    FROM documents d
    JOIN documents b ON b.doc_id = 29 * (d.doc_id % 2)
    WHERE d.doc_id % 29 <> 0
"""

_Q78_ORACLE = f"""
    WITH bench_raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0),
    corpus AS ({_Q78_CORPUS_SQL}),
    ctok AS (SELECT doc_id AS doc, {tokens_sql("text")} AS toks FROM corpus),
    cth AS (SELECT doc, list_transform(toks, t -> {polyhash_sql("t")}) AS th FROM ctok),
    chash AS (SELECT doc, list_distinct({shingle_hashes_sql("th", _CONTAM_N)}) AS hashes FROM cth),
    btok AS (SELECT doc_id AS doc, {tokens_sql("text")} AS toks FROM bench_raw),
    bth AS (SELECT doc, list_transform(toks, t -> {polyhash_sql("t")}) AS th FROM btok),
    bhash AS (SELECT doc, list_distinct({shingle_hashes_sql("th", _CONTAM_N)}) AS hashes FROM bth),
    universe AS (SELECT DISTINCT unnest(hashes) AS sh FROM bhash),
    ex AS (SELECT doc, unnest(hashes) AS sh FROM chash),
    hits AS (SELECT doc, count(*) AS n_hits FROM ex JOIN universe USING (sh) GROUP BY doc)
    SELECT c.doc,
           CAST(len(c.hashes) AS BIGINT) AS n_shingles,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           {dround_sql("coalesce(h.n_hits, 0) / greatest(len(c.hashes), 1)", 6)} AS overlap_frac
    FROM chash c LEFT JOIN hits h USING (doc)
"""


def _q78_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    bsrc = bench.select(
        F.col("doc_id").alias("b_id"), F.col("text").alias("b_text")
    )
    corpus = (
        d.filter(F.col("doc_id") % 29 != 0)
        .join(F.broadcast(bsrc), F.col("b_id") == 29 * (F.col("doc_id") % 2))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.col("text"), F.lit(" "), F.substring("b_text", 1, 120)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return corpus, bench


@register("q78_contamination_check", oracle=_Q78_ORACLE)
def q78_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.dedup import benchmark_contamination

    corpus, bench = _q78_tables(spark, sf_dir)
    out = benchmark_contamination(corpus, bench, "doc_id", "text", n=_CONTAM_N)
    return out.select(
        "doc",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_hits").cast("long").alias("n_hits"),
        dround(F.col("overlap_frac"), 6).alias("overlap_frac"),
    )


# ---------------------------------------------------------------------------
# q79 — unigram-LM negative log-likelihood per doc (perplexity-proxy
# quality signal; the LM is the corpus's own unigram distribution).
# ---------------------------------------------------------------------------
_Q79_ORACLE = f"""
    WITH tok AS (SELECT doc_id AS doc, unnest({tokens_sql("text")}) AS term FROM documents),
    vocab AS (SELECT term, count(*) AS n_term FROM tok GROUP BY term),
    tot AS (SELECT CAST(sum(n_term) AS DOUBLE) AS n_total FROM vocab),
    scored AS (SELECT doc, -ln(n_term / n_total) AS nll
               FROM tok JOIN vocab USING (term) CROSS JOIN tot)
    SELECT doc, count(*) AS n_tokens, {dround_sql("avg(nll)", 6)} AS mean_nll
    FROM scored GROUP BY doc
"""


@register("q79_unigram_logprob", oracle=_Q79_ORACLE)
def q79_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.terms import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    out = unigram_logprob(docs, "doc_id", "text")
    return out.select(
        "doc", "n_tokens", dround(F.col("mean_nll"), 6).alias("mean_nll")
    )


# ---------------------------------------------------------------------------
# q100 — contamination check with a Bloom-filter prefilter: same
# corpus/bench construction as q78, but the corpus-side membership test
# is map-only bit math against an m=2^16-bit Bloom filter (j=4
# deterministic probes); only flagged shingles (true hits + the
# filter's deterministic false positives) join the exact universe. The
# oracle rebuilds the identical bitmap in SQL, so the hash-match
# covers the false-positive set too.
# ---------------------------------------------------------------------------
_Q100_M, _Q100_J = 1 << 16, 4


def _q100_oracle() -> str:
    from anime_data_pipeline_spark.functions.hashing import P, perm_constants

    consts = perm_constants(20 + _Q100_J)[20 : 20 + _Q100_J]
    pos_sh = (
        "["
        + ", ".join(f"((({a} * sh) + {b}) % {P}) % {_Q100_M}" for a, b in consts)
        + "]"
    )
    pos_h = (
        "["
        + ", ".join(f"((({a} * h) + {b}) % {P}) % {_Q100_M}" for a, b in consts)
        + "]"
    )
    check = "p -> ((l[CAST(p // 32 AS INT) + 1] >> CAST(p % 32 AS INT)) & 1) = 1"
    flag = (
        f"list_reduce(list_prepend(true, list_transform({pos_h}, {check})), "
        "(x, y) -> x AND y)"
    )
    n = _CONTAM_N
    return f"""
    WITH bench_raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0),
    corpus AS ({_Q78_CORPUS_SQL}),
    ctok AS (SELECT doc_id AS doc, {tokens_sql("text")} AS toks FROM corpus),
    cth AS (SELECT doc, list_transform(toks, t -> {polyhash_sql("t")}) AS th FROM ctok),
    chash AS (SELECT doc, list_distinct({shingle_hashes_sql("th", n)}) AS hashes FROM cth),
    btok AS (SELECT doc_id AS doc, {tokens_sql("text")} AS toks FROM bench_raw),
    bth AS (SELECT doc, list_transform(toks, t -> {polyhash_sql("t")}) AS th FROM btok),
    bhash AS (SELECT doc, list_distinct({shingle_hashes_sql("th", n)}) AS hashes FROM bth),
    universe AS (SELECT DISTINCT unnest(hashes) AS sh FROM bhash),
    pos AS (SELECT DISTINCT unnest({pos_sh}) AS p FROM universe),
    wrd AS (SELECT CAST(p // 32 AS INT) AS idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS w
            FROM pos GROUP BY idx),
    bmw AS (SELECT g.i AS idx, coalesce(w.w, CAST(0 AS BIGINT)) AS w
            FROM generate_series(0, {_Q100_M // 32 - 1}) g(i)
            LEFT JOIN wrd w ON w.idx = g.i),
    bm AS (SELECT list(w ORDER BY idx) AS l FROM bmw),
    flagged AS (SELECT doc, hashes, list_filter(hashes, h -> {flag}) AS fh
                FROM chash CROSS JOIN bm),
    ex2 AS (SELECT doc, unnest(fh) AS sh FROM flagged),
    thits AS (SELECT doc, count(*) AS n_true
              FROM ex2 JOIN universe USING (sh) GROUP BY doc)
    SELECT f.doc,
           CAST(len(f.hashes) AS BIGINT) AS n_shingles,
           CAST(len(f.fh) AS BIGINT) AS n_flagged,
           CAST(coalesce(t.n_true, 0) AS BIGINT) AS n_true,
           CAST(len(f.fh) - coalesce(t.n_true, 0) AS BIGINT) AS n_false_pos
    FROM flagged f LEFT JOIN thits t USING (doc)
    """


@register("q100_bloom_contamination", oracle=_q100_oracle())
def q100_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.dedup import bloom_contamination

    corpus, bench = _q78_tables(spark, sf_dir)
    return bloom_contamination(
        corpus, bench, "doc_id", "text", n=_CONTAM_N, m_bits=_Q100_M, n_hash=_Q100_J
    )


# ---------------------------------------------------------------------------
# q89 — temperature mix weights (share^alpha source reweighting,
# Lample & Conneau 2019 §3.1): the sampling-probability table a
# 100 TB mixer draws from. Pure aggregation; the oracle mirrors the
# exact pow/normalize arithmetic.
# ---------------------------------------------------------------------------
_Q89_ALPHA = 0.3

_Q89_ORACLE = f"""
    WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n_total FROM counts),
    shared AS (SELECT source, n_docs, n_docs / n_total AS share
               FROM counts CROSS JOIN tot),
    powed AS (SELECT *, pow(share, {_Q89_ALPHA}) AS p FROM shared),
    z AS (SELECT sum(p) AS z FROM powed)
    SELECT source, n_docs,
           {dround_sql("share", 6)} AS share,
           {dround_sql("p / z", 6)} AS temp_weight,
           {dround_sql("p / z * (SELECT n_total FROM tot) / n_docs", 6)} AS effective_epochs
    FROM powed CROSS JOIN z
"""


@register("q89_temperature_mix", oracle=_Q89_ORACLE)
def q89_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.sampling import temperature_mix_weights

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mix_weights(docs, "source", alpha=_Q89_ALPHA)
    return out.select(
        "source",
        "n_docs",
        dround(F.col("share"), 6).alias("share"),
        dround(F.col("temp_weight"), 6).alias("temp_weight"),
        dround(F.col("effective_epochs"), 6).alias("effective_epochs"),
    )


# ---------------------------------------------------------------------------
# q92 — barriered greedy packing (the skew-safe mode): each source's
# token stream is pre-split at cumulative-token barriers, packed fresh
# per window, and stitched with a window-cumsum chunk offset — the
# form that fans a hot group out over total_tokens/barrier tasks. The
# oracle partitions the q67 recursive state replay by (source,
# barrier window) and applies the same stitch.
# ---------------------------------------------------------------------------
_Q92_BARRIER = 2048

_Q92_ORACLE = f"""
    WITH RECURSIVE weighted AS MATERIALIZED (
      SELECT doc_id, source, {ws_token_count_sql("text")} AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
      FROM weighted),
    docs AS MATERIALIZED (
      SELECT doc_id, source, n_tokens,
             CAST(floor(CAST(cum_before AS DOUBLE) / {_Q92_BARRIER}) AS BIGINT) AS b,
             row_number() OVER (
               PARTITION BY source, CAST(floor(CAST(cum_before AS DOUBLE) / {_Q92_BARRIER}) AS BIGINT)
               ORDER BY doc_id) AS rn
      FROM cum),
    step(source, b, rn, doc_id, n_tokens, chunk_id, acc) AS (
      SELECT source, b, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.source, d.b, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN s.acc > 0 AND s.acc + d.n_tokens > {_BUDGET}
                  THEN s.chunk_id + 1 ELSE s.chunk_id END,
             CASE WHEN s.acc > 0 AND s.acc + d.n_tokens > {_BUDGET}
                  THEN d.n_tokens ELSE s.acc + d.n_tokens END
      FROM step s JOIN docs d
        ON d.source = s.source AND d.b = s.b AND d.rn = s.rn + 1
    ),
    n_chunks AS (SELECT source, b, max(chunk_id) + 1 AS nc
                 FROM step GROUP BY source, b),
    offsets AS (SELECT source, b,
                       CAST(sum(nc) OVER (
                         PARTITION BY source ORDER BY b
                         ROWS UNBOUNDED PRECEDING) - nc AS BIGINT) AS off
                FROM n_chunks)
    SELECT s.doc_id, s.source, s.n_tokens, s.chunk_id + o.off AS chunk_id
    FROM step s JOIN offsets o ON s.source = o.source AND s.b = o.b
"""


@register("q92_pack_barriered", oracle=_Q92_ORACLE)
def q92_pack_barriered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens")
    )
    return pack_greedy(
        docs, "source", "doc_id", "n_tokens", _BUDGET, barrier_tokens=_Q92_BARRIER
    )


# ---------------------------------------------------------------------------
# q170 — SCD Type-2 dimension build over the q74 snapshot pair: one
# row per (doc_id, attribute version) with valid_from/valid_to/
# is_current — where q74 emits the CHANGE FEED, this emits the
# versioned dimension a warehouse keeps. Same single full-outer key
# join (exchange-free under bucketed ingest) + a map-only 1-or-2-row
# explode per key; the oracle replays the classification with UNION
# branches.
# ---------------------------------------------------------------------------
_Q170_ORACLE = f"""
    WITH old AS (SELECT doc_id, text, lang, source FROM documents),
    new AS ({_NEW_SNAP_SQL}),
    j AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
                 old.doc_id IS NOT NULL AS in_old,
                 new.doc_id IS NOT NULL AS in_new,
                 (old.text IS NOT DISTINCT FROM new.text)
                   AND (old.lang IS NOT DISTINCT FROM new.lang)
                   AND (old.source IS NOT DISTINCT FROM new.source) AS same,
                 old.text AS o_text, old.lang AS o_lang, old.source AS o_source,
                 new.text AS n_text, new.lang AS n_lang, new.source AS n_source
          FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
    SELECT doc_id, o_text AS text, o_lang AS lang, o_source AS source,
           CAST(1 AS BIGINT) AS valid_from, CAST(9999 AS BIGINT) AS valid_to,
           TRUE AS is_current
    FROM j WHERE in_old AND in_new AND same
    UNION ALL
    SELECT doc_id, o_text, o_lang, o_source, 1, 2, FALSE
    FROM j WHERE in_old AND in_new AND NOT same
    UNION ALL
    SELECT doc_id, n_text, n_lang, n_source, 2, 9999, TRUE
    FROM j WHERE in_old AND in_new AND NOT same
    UNION ALL
    SELECT doc_id, o_text, o_lang, o_source, 1, 2, FALSE
    FROM j WHERE in_old AND NOT in_new
    UNION ALL
    SELECT doc_id, n_text, n_lang, n_source, 2, 9999, TRUE
    FROM j WHERE in_new AND NOT in_old
"""


@register("q170_scd2_dimension", oracle=_Q170_ORACLE)
def q170_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.diff import scd2_merge

    old = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    return scd2_merge(
        old,
        _new_snapshot(spark, sf_dir),
        ["doc_id"],
        ["text", "lang", "source"],
    )
