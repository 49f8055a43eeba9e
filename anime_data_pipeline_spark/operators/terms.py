"""Term-level corpus statistics (LLM-pipeline extension surface):
TF-IDF term ranking and n-gram repetition profiling.

Both operators follow the same scale shape: EXPLODE terms to rows,
then partial/final hash aggregation — never per-row Python loops and
never a per-document in-memory term table. A 1 M-token document costs
1 M narrow rows through a map-side-combining agg, not 1 M entries in
one executor's hash map, so document length is bounded by the shuffle,
not by executor memory.

Repetition profiling is the Gopher-style quality family (Rae et al.
2021 §A1.1: duplicate n-gram fraction, top n-gram fraction) — the
signals used to drop boilerplate/spam before LLM training.

Reference parity note: the reference has no term-statistics operators;
this module extends its curation surface (BASELINE "text analysis"
north star) with the standard corpus-quality designs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anime_data_pipeline_spark.functions.compat import dround
from anime_data_pipeline_spark.functions.hashing import (
    polyhash,
    shingle_hashes,
    shingle_hashes_spark_expr,
    token_hashes_spark_expr,
    tokens_spark_expr,
)
from anime_data_pipeline_spark.functions.text import tokens


def _exploded_terms(
    df: DataFrame, id_col: str, text_col: str, pretokenized: bool = False
) -> DataFrame:
    """(doc, term) rows — one per token occurrence. With
    ``pretokenized`` the column already holds the token array (a shared
    stage-boundary tokenization — e.g. q104 materializes tokens once
    and feeds both the DSIR featurizer and the LM aggs)."""
    toks = F.col(text_col) if pretokenized else tokens(F.col(text_col))
    return df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("term"))


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    score = tf * ln(N / df) with tf = in-doc occurrences, df = number
    of documents containing the term, N = corpus size.

    Plan shape: ONE explode feeding one (doc, term) partial/final agg;
    document-frequency then derives from the tf aggregate itself
    (df(term) = rows in tf per term — tf's key set IS the distinct
    (doc, term) pairs). tf is consumed twice (the join side and dfreq),
    and ReuseExchange does not unify the two consumers' differing
    parent requirements — so tf persists (MEMORY_AND_DISK, same call
    as the 4×-consumed MinHash signature table): the corpus is
    tokenized and exploded exactly once, and what persists is the
    already-aggregated (doc, term, tf) table, far smaller than the
    exploded stream. The df table is |vocabulary|-sized; the tf ⋈ df
    join shuffles on high-cardinality `term` keys and AQE handles any
    hot stopword-like term.

    Determinism: ties broken by term asc so top-k membership is stable
    across partitionings (registry convention)."""
    from pyspark import StorageLevel

    terms = _exploded_terms(df, id_col, text_col)
    tf = (
        terms.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc", "term", "tf", "df", "tfidf", "rank")
    )


def ngram_repetition_profile(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document n-gram repetition metrics (Gopher §A1.1 family):

    - ``total_ngrams``: n-gram occurrences in the doc;
    - ``distinct_ngrams``;
    - ``top_ngram_frac``: occurrences of the most frequent n-gram /
      total (Gopher's "top n-gram fraction");
    - ``dup_ngram_frac``: fraction of occurrences belonging to n-grams
      seen more than once (Gopher's "duplicate n-gram fraction").

    Token n-grams are hashed (shingle fold over token hashes) so the
    grouped key is an 8-byte long, not a string — the same shuffle-width
    trick as the dedup family. Two-level agg: (doc, gram) counts, then
    per-doc rollup; both partial-aggregate map-side, and no stage ever
    holds a whole document's term table in one hash-map entry."""
    grams = (
        df.select(
            F.col(id_col).alias("doc"),
            F.expr(
                token_hashes_spark_expr(tokens_spark_expr(text_col))
            ).alias("_th"),
        )
        .withColumn("gram", F.explode(F.expr(shingle_hashes_spark_expr("_th", n))))
        .select("doc", "gram")
    )
    per_gram = grams.groupBy("doc", "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc").agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        (F.max("c") / F.sum("c")).alias("top_ngram_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c")
        ).alias("dup_ngram_frac"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    head_k: int = 50_000,
    pretokenized: bool = False,
) -> DataFrame:
    """Per-document mean unigram negative log-likelihood under the
    corpus's own unigram LM — the classic perplexity-proxy quality
    signal (CCNet-style: surprising docs are junk or gems; both
    deserve a look before training).

    p(term) = corpus_count(term) / corpus_tokens, self-estimated so no
    external model ships.

    Scale shape (the skew problem and its fix): a naive token ⋈ vocab
    join shuffles EVERY token occurrence on `term` — a Zipf-skewed key
    space where "the"-class terms pin whole partitions. Two measures
    make the plan skew-proof:

    1. Token occurrences collapse to (doc, term, tf) FIRST (map-side
       combining agg keyed by the pair — no single hot key), so the
       join input carries each term at most once per document.
    2. The Zipf HEAD (top ``head_k`` terms by corpus count — by
       construction the only possible hot keys, and a bounded-size
       table) is broadcast; only (doc, term) pairs whose term falls
       OUTSIDE the head reach the shuffle join, and those keys are
       rare by definition of not being in the head.

    Both paths use the same full-corpus total, so scores are exactly
    the all-shuffle result; head membership only routes rows.
    ``head_k`` bounds broadcast memory (50k terms ≈ low MBs).

    Cache lifecycle: the tf/vocab persists back the RETURNED lazy plan
    (multiple consumers), so this operator cannot unpersist them itself
    without forcing eager evaluation. CALLERS own the lifecycle — after
    materializing the result, ``spark.catalog.clearCache()`` (what
    bench.py does between queries) or unpersist via
    ``spark.catalog.isCached``-listed tables frees the partitions."""
    from pyspark import StorageLevel

    terms = _exploded_terms(df, id_col, text_col, pretokenized=pretokenized)
    tf = (
        terms.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # vocab has three consumers (corpus total, head selection, tail
    # join); persist so the term agg runs once — it's |vocabulary|-sized.
    vocab = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("n_term"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = vocab.agg(F.sum("n_term").alias("n_total"))
    head = (
        vocab.orderBy(F.col("n_term").desc(), F.col("term").asc())
        .limit(head_k)
        .withColumnRenamed("n_term", "_head_n")
    )
    routed = tf.join(F.broadcast(head), "term", "left")
    head_hits = routed.filter(F.col("_head_n").isNotNull()).withColumn(
        "n_term", F.col("_head_n")
    )
    tail_hits = (
        routed.filter(F.col("_head_n").isNull()).drop("n_term").join(vocab, "term")
    )
    scored = (
        head_hits.select("doc", "tf", "n_term")
        .unionByName(tail_hits.select("doc", "tf", "n_term"))
        .join(F.broadcast(total))
        .withColumn("_nll", -F.log(F.col("n_term") / F.col("n_total")))
    )
    return scored.groupBy(F.col("doc")).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        (F.sum(F.col("tf") * F.col("_nll")) / F.sum("tf")).alias("mean_nll"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag-of-terms query.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the lexical-search
    baseline every RAG stack starts from.

    Plan shape: the query-term filter is an `isin` literal pushed
    beneath the explode's aggregation, so the (doc, term) agg only ever
    sees query-term postings — corpus-size-independent state per term.
    Doc lengths are map-side `size(tokens)`; N and avgdl are two scalar
    aggregates broadcast into the scoring join. Ranks order by the
    ROUNDED score (then doc id): ln() may differ in the last ulp
    between engines, and a discrete rank key keeps top-k membership
    engine-exact.
    """
    terms = _exploded_terms(df, id_col, text_col)
    postings = (
        terms.filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    lens = df.select(
        F.col(id_col).alias("doc"), F.size(tokens(F.col(text_col))).alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(lens, "doc")
        .crossJoin(F.broadcast(stats))
        .withColumn("_c", idf * tf_part)
        .groupBy("doc")
        .agg(F.sum("_c").alias("bm25"))
    )
    # TakeOrderedAndProject via orderBy+limit: per-partition top-k heaps,
    # only k rows reach one task; the rank window then runs over the
    # k-row survivor set, never the (corpus-growing) candidate table.
    w = Window.partitionBy().orderBy(F.desc("_r"), F.asc("doc"))
    return (
        scored.withColumn("_r", dround(F.col("bm25"), 6))
        .orderBy(F.desc("_r"), F.asc("doc"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select("doc", F.col("_r").alias("bm25"), "rank")
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information: PMI(a,b) = ln(p(a,b) / (p(a)·p(b))) with bigram and
    unigram probabilities over the corpus token stream — the classic
    collocation-extraction pass (phrase mining for tokenizer vocab
    construction and tag normalization).

    Plan shape: ONE tokenization feeding two partial/final aggs
    (unigrams from the token explode, bigrams from the token-array
    zip-with-next explode); the unigram table is vocabulary-sized and
    broadcasts onto the bigram table twice. ``min_count`` floors
    bigram support so PMI's low-frequency pathology (hapax pairs with
    huge PMI) stays out of the ranking. Ranks order by the ROUNDED
    PMI then the pair, keeping top-k membership engine-exact.
    """
    toks = df.select(tokens(F.col(text_col)).alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_term"))
    )
    big = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("t_a"), F.col("p.b").alias("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    n_uni = uni.agg(F.sum("n_term").alias("n_tokens"))
    n_big = big.agg(F.sum("n_pair").alias("n_bigrams"))
    scored = (
        big.join(F.broadcast(uni.select(F.col("term").alias("t_a"), F.col("n_term").alias("n_a"))), "t_a")
        .join(F.broadcast(uni.select(F.col("term").alias("t_b"), F.col("n_term").alias("n_b"))), "t_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .withColumn(
            "pmi",
            F.log(
                (F.col("n_pair") / F.col("n_bigrams"))
                / ((F.col("n_a") / F.col("n_tokens")) * (F.col("n_b") / F.col("n_tokens")))
            ),
        )
    )
    # Same TakeOrderedAndProject shape as bm25_topk: the min-count-
    # floored bigram table still grows with the corpus vocabulary.
    w = Window.partitionBy().orderBy(F.desc("_r"), F.asc("t_a"), F.asc("t_b"))
    return (
        scored.withColumn("_r", dround(F.col("pmi"), 6))
        .orderBy(F.desc("_r"), F.asc("t_a"), F.asc("t_b"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select("t_a", "t_b", F.col("n_pair").cast("long").alias("n_pair"),
                F.col("_r").alias("pmi"), "rank")
    )
