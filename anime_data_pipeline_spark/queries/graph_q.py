"""Link-graph gate queries (LLM-pipeline extension surface).

q154 — PageRank crawl-frontier prioritization: the classic host/page
quality prior for web-scale corpus curation (pairs with q152's URL
canonicalization — canonicalize, dedup, THEN rank the frontier). A
deterministic link graph is synthesized from `documents` (two affine
edge families mod 97; src 13's out-edges removed so the dangling-mass
path is always exercised), and `operators/graph.pagerank` runs a
fixed 5-round damped power iteration. The DuckDB oracle replays the
identical iterations as unrolled CTE stages (pagerank_oracle_sql), so
every join, out-degree division, dangling redistribution, and
teleport term is hash-checked round-for-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.operators.graph import (
    hits,
    hits_oracle_sql,
    pagerank,
    pagerank_oracle_sql,
)
from anime_data_pipeline_spark.registry import register

_Q154_EDGES_SQL = """
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id % 97 AS src, (doc_id * 31 + 7) % 97 AS dst FROM documents
    UNION ALL
    SELECT (doc_id * 17 + 3) % 97, (doc_id * 53 + 11) % 97 FROM documents
  ) WHERE src <> dst AND src <> 13
"""


def _q154_oracle() -> str:
    inner = pagerank_oracle_sql(_Q154_EDGES_SQL, damping=0.85, n_iter=5)
    return f"""
    SELECT CAST(node AS BIGINT) AS node,
           {dround_sql("pr", 6)} AS pr
    FROM ({inner})
    """


def _q154_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    e1 = docs.select((i % 97).alias("src"), ((i * 31 + 7) % 97).alias("dst"))
    e2 = docs.select(
        ((i * 17 + 3) % 97).alias("src"), ((i * 53 + 11) % 97).alias("dst")
    )
    return (
        e1.unionByName(e2)
        .distinct()
        .filter((F.col("src") != F.col("dst")) & (F.col("src") != 13))
    )


@register("q154_pagerank", oracle=_q154_oracle())
def q154_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(_q154_edges(spark, sf_dir), damping=0.85, n_iter=5)
    return ranks.select(
        F.col("node").cast("long").alias("node"), dround(F.col("pr"), 6).alias("pr")
    )


# ---------------------------------------------------------------------------
# q157 — HITS hubs/authorities: the complementary link-quality prior
# to q154's PageRank (hub pages = link directories worth crawling,
# authority pages = content worth keeping). Distinct deterministic
# edge families (mod 89) so the two graph queries don't share a graph;
# src 7's out-edges removed so zero-hub nodes are exercised. The
# DuckDB oracle unrolls the identical L1-normalized rounds
# (hits_oracle_sql), hash-checking every join, sum, and normalizer.
# ---------------------------------------------------------------------------
_Q157_EDGES_SQL = """
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id % 89 AS src, (doc_id * 29 + 5) % 89 AS dst FROM documents
    UNION ALL
    SELECT (doc_id * 19 + 2) % 89, (doc_id * 41 + 13) % 89 FROM documents
  ) WHERE src <> dst AND src <> 7
"""


def _q157_oracle() -> str:
    inner = hits_oracle_sql(_Q157_EDGES_SQL, n_iter=5)
    return f"""
    SELECT CAST(node AS BIGINT) AS node,
           {dround_sql("hub", 6)} AS hub,
           {dround_sql("auth", 6)} AS auth
    FROM ({inner})
    """


def _q157_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    e1 = docs.select((i % 89).alias("src"), ((i * 29 + 5) % 89).alias("dst"))
    e2 = docs.select(
        ((i * 19 + 2) % 89).alias("src"), ((i * 41 + 13) % 89).alias("dst")
    )
    return (
        e1.unionByName(e2)
        .distinct()
        .filter((F.col("src") != F.col("dst")) & (F.col("src") != 7))
    )


@register("q157_hits", oracle=_q157_oracle())
def q157_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = hits(_q157_edges(spark, sf_dir), n_iter=5)
    return scores.select(
        F.col("node").cast("long").alias("node"),
        dround(F.col("hub"), 6).alias("hub"),
        dround(F.col("auth"), 6).alias("auth"),
    )


# ---------------------------------------------------------------------------
# q163 — hierarchy flatten (recursive-CTE replacement): every node of
# a synthesized forest (node = doc_id; parent = doc_id div 10; ids
# < 10 are roots) resolved to its (root, depth) via
# operators/graph.pointer_jump_roots — path doubling, O(log depth)
# self-join rounds instead of DuckDB's O(depth) recursive walk. The
# oracle IS the recursive CTE, so the hash-match proves the doubling
# algebra equals the textbook recursion.
# ---------------------------------------------------------------------------
# The node SET is the ancestor CLOSURE of the doc_ids (every doc_id
# plus each division-chain ancestor down to the <10 roots) — a
# (node, parent) TABLE walk can only follow pointers through rows
# that exist, so the forest must be well-formed. At the dense gate-SF
# id spaces the closure equals the doc_id set (every div-10 ancestor
# of 0..N-1 is itself < N), which is why three rounds of sf0.01/sf0.1
# sweeps never saw the difference; the r10 100x exact sweep's SPARSE
# rotated ids made every interior ancestor dangle and the inner
# pointer-jump join silently dropped 90% of the rows (5,000 of
# 50,000 survived). Closure in SQL is the nodeset recursion below;
# closure in Spark is one explode over the <=19 decimal levels.
_Q163_ORACLE = """
    WITH RECURSIVE nodeset(n) AS (
      SELECT DISTINCT doc_id FROM documents
      UNION
      SELECT n // 10 FROM nodeset WHERE n >= 10
    ),
    up(node, cur, d) AS (
      SELECT n, n, 0 FROM nodeset
      UNION ALL
      SELECT node, cur // 10, d + 1 FROM up WHERE cur >= 10
    )
    SELECT node, CAST(cur AS BIGINT) AS root, CAST(d AS BIGINT) AS depth
    FROM up WHERE cur < 10
"""


@register("q163_hierarchy_flatten", oracle=_Q163_ORACLE)
def q163_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.graph import pointer_jump_roots

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # ancestor closure: doc_id div 10^k for k=0..18 (10^18 = 2^18*5^18
    # is double-exact and covers the 63-bit id space), keeping level k
    # only while level k-1 had not already reached a root
    closure = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(18))).alias("k"), "doc_id"
        )
        # greatest(k-1, 0): at k=0 the first disjunct already admits
        # the row, but the old `power(10, k - 1)` operand evaluated
        # power(10,-1) -> CAST -> 0, leaving correctness to Or
        # short-circuiting under ANSI mode's DIVIDE_BY_ZERO — fragile
        # against predicate rewrites (ADVICE r10). With the clamp the
        # k=0 operand is `doc_id div 1`, safe under any evaluation
        # order and semantically inert (the k==0 branch wins).
        .filter(
            (F.col("k") == 0)
            | (F.expr("doc_id div CAST(power(10, greatest(k - 1, 0)) AS BIGINT)") >= 10)
        )
        .select(F.expr("doc_id div CAST(power(10, k) AS BIGINT)").alias("node"))
        .distinct()
    )
    nodes = closure.select(
        "node",
        F.when(F.col("node") < 10, F.lit(None).cast("long"))
        .otherwise(F.expr("node div 10"))
        .alias("parent"),
    )
    out = pointer_jump_roots(nodes, "node", "parent", n_rounds=5)
    return out.select(
        "node", F.col("root").cast("long").alias("root"), F.col("depth").alias("depth")
    )
