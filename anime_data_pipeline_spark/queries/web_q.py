"""Web-crawl link-graph gate queries.

Outlink extraction is the step between HTML text extraction (q180)
and the graph analytics family (q154 PageRank / q157 HITS / q148
label propagation): a crawl pipeline derives its domain-level link
graph from the pages themselves (reference behavior parity: the
reference has no web layer at all — this is part of the LLM-pipeline
extension surface, like q152/q153's URL canonicalization).

The corpus is deterministic HTML built from `documents` (the same
closed-form-oracle pattern as q180/q178): page i carries
``1 + i % 4`` anchors whose targets are computed from doc_id
arithmetic, so the oracle predicts every edge WITHOUT running any
extraction regex — a bug anywhere in the href scan, the host parse,
or the explode/aggregate chain breaks the hash.

Scale shape (100 TB): href extraction and host parsing are map-only
codegen expressions; the explode is pipelined (no shuffle); the single
shuffle is the (src_domain, dst_domain) count aggregation, whose
map-side partial aggregation bounds reducer input by the DOMAIN-PAIR
cardinality per task, not the row count — hot domains are absorbed the
same way every count-agg in the repo is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.operators.web import extract_hrefs, url_host
from anime_data_pipeline_spark.registry import register

# ---------------------------------------------------------------------------
# q182 — outlink extraction → domain-level link graph.
# Page i: src URL https://d{i%20}.example.org/page/{i}; anchors j in
# 0..i%4 target t = (i*31 + j*17) % 500 at https://d{t%20}.example.org
# /page/{t}; one relative link (no scheme) that the host parser must
# drop, plus the q180-style footer noise so the href regex has to skip
# a non-anchor tag carrying an href-shaped attribute in a comment.
# ---------------------------------------------------------------------------
_Q182_ORACLE = """
    WITH links AS (
      SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS j
      FROM documents
    ),
    edges AS (
      SELECT 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' AS src_domain,
             'd' || CAST(((doc_id * 31 + j * 17) % 500) % 20 AS VARCHAR)
               || '.example.org' AS dst_domain,
             doc_id
      FROM links
    )
    SELECT src_domain, dst_domain,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
    FROM edges
    GROUP BY src_domain, dst_domain
"""


def _page_html(i):
    """Deterministic page: variable anchor block + a relative link +
    comment noise. Built with native string expressions only."""
    t = lambda j: (i * 31 + j * 17) % 500  # noqa: E731
    anchor = lambda j: F.concat(  # noqa: E731
        F.lit('<a href="https://d'),
        (t(j) % 20).cast("string"),
        F.lit(".example.org/page/"),
        t(j).cast("string"),
        F.lit('">ref '),
        t(j).cast("string"),
        F.lit("</a> "),
    )
    anchors = F.aggregate(
        F.sequence(F.lit(0), (i % 4).cast("int")),
        F.lit(""),
        lambda acc, j: F.concat(acc, anchor(j)),
    )
    return F.concat(
        F.lit("<html><body><h1>Page "),
        i.cast("string"),
        F.lit("</h1><!-- <img href=\"https://fake.example.com/x\"> -->"),
        anchors,
        F.lit('<a href="/local/nav">nav</a>'),
        F.lit("<p>body text</p></body></html>"),
    )


@register("q182_link_graph", oracle=_Q182_ORACLE)
def q182_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    src_url = F.concat(
        F.lit("https://d"),
        (i % 20).cast("string"),
        F.lit(".example.org/page/"),
        i.cast("string"),
    )
    pages = docs.select(
        "doc_id",
        url_host(src_url).alias("src_domain"),
        _page_html(i).alias("raw_html"),
    )
    edges = (
        pages.select(
            "doc_id", "src_domain", F.explode(extract_hrefs(F.col("raw_html"))).alias("url")
        )
        .withColumn("dst_domain", url_host(F.col("url")))
        .filter(F.col("dst_domain") != "")  # relative links have no host
    )
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("doc_id").cast("long").alias("n_pages"),
    )


# ---------------------------------------------------------------------------
# q186 — crawl-prior composition: the q182 extraction pipeline's edge
# list (REAL href scan + host parse, self-loops dropped, distinct)
# feeds operators/graph.pagerank — extract → link graph → host-quality
# prior, the full RefinedWeb-style frontier-prioritization chain in
# one oracle-checked plan (q154 gates PageRank on synthetic integer
# edges; this gates it on string domain nodes reached THROUGH the
# extraction operators). Oracle: closed-form edges + the same unrolled
# power iteration (pagerank_oracle_sql).
# ---------------------------------------------------------------------------
_Q186_EDGES_SQL = """
  SELECT DISTINCT
         'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' AS src,
         'd' || CAST(((doc_id * 31 + j * 17) % 500) % 20 AS VARCHAR)
           || '.example.org' AS dst
  FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS j FROM documents)
  WHERE doc_id % 20 <> ((doc_id * 31 + j * 17) % 500) % 20
"""


def _q186_oracle() -> str:
    from anime_data_pipeline_spark.operators.graph import pagerank_oracle_sql

    inner = pagerank_oracle_sql(_Q186_EDGES_SQL, damping=0.85, n_iter=5)
    return f"""
    SELECT node AS domain, {dround_sql("pr", 6)} AS pr
    FROM ({inner})
    """


@register("q186_domain_pagerank", oracle=_q186_oracle())
def q186_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    src_url = F.concat(
        F.lit("https://d"),
        (i % 20).cast("string"),
        F.lit(".example.org/page/"),
        i.cast("string"),
    )
    pages = docs.select(
        "doc_id",
        url_host(src_url).alias("src"),
        _page_html(i).alias("raw_html"),
    )
    edges = (
        pages.select("src", F.explode(extract_hrefs(F.col("raw_html"))).alias("url"))
        .withColumn("dst", url_host(F.col("url")))
        .filter((F.col("dst") != "") & (F.col("dst") != F.col("src")))
        .select("src", "dst")
        .distinct()
    )
    pr = pagerank(edges, damping=0.85, n_iter=5)
    return pr.select(F.col("node").alias("domain"), dround(F.col("pr"), 6).alias("pr"))
