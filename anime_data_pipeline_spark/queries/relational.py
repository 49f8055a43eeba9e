"""Relational operator suite over the TPC-H-ish test tables.

Each query exercises one or more operators from SURVEY.md §2 (the
reference's dict-lookup joins, hand-rolled aggregations, filters, sorts
and set ops), re-expressed as idiomatic Spark DataFrame plans. Reference
provenance is cited per query (file:line in /root/reference).

Scale notes (100 TB design):
- dimension tables (region/nation/customer/supplier/part) are broadcast —
  no shuffle on the fact side;
- aggregations rely on Spark's partial/final hash agg (the reference
  folds worker dicts by hand, bucket_manager.py:213-226);
- top-k per group uses window + row_number (shuffle by group key only);
- AQE handles skew/coalesce at runtime (enabled in session.py).

Floating-point convention: per-row arithmetic is left unrounded (IEEE
ops are bit-identical across engines); aggregates are rounded with
``dround`` (see functions/compat.py) identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import (
    dround,
    dround_sql,
    money_sum,
    money_sum_sql,
    money_units,
    units_money,
    units_money_sql,
)
from anime_data_pipeline_spark.registry import register

# DuckDB-side spelling of dround (functions/compat.py): identical IEEE ops.
_R2 = "floor(({}) * 100.0 + 0.5) / 100.0"
_R4 = "floor(({}) * 10000.0 + 0.5) / 10000.0"

# DuckDB fragment extracting the integer `k` from events.props JSON strings
# (kept outside the f-string: py3.11 forbids backslashes in expressions).
_K_EXPR = "CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)"


# ---------------------------------------------------------------------------
# Aggregations (SURVEY A1-A4): the reference's hand-rolled partial/final
# count-merge (bucket_manager.py:213-226) generalized to a TPC-H Q1-shaped
# pricing summary. Spark does partial+final hash agg automatically.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {money_sum_sql("l_quantity")}                                       AS sum_qty,
           {money_sum_sql("l_extendedprice")}                                  AS sum_base_price,
           {money_sum_sql("l_extendedprice * (1 - l_discount)")}               AS sum_disc_price,
           {money_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1e6)} AS sum_charge,
           {_R4.format("avg(l_quantity)")}                                       AS avg_qty,
           {_R4.format("avg(l_extendedprice)")}                                  AS avg_price,
           {_R4.format("avg(l_discount)")}                                       AS avg_disc,
           count(*)                                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax")), 1e6).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filter + projection (SURVEY P5 aesthetic threshold, run.py:87-88; P1 key
# derivation). Predicate + column pruning reach the parquet scan. Per-row
# product left unrounded: bit-identical across engines.
# ---------------------------------------------------------------------------
@register(
    "q02_threshold_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_quantity >= 45 AND l_discount > 0.05
    """,
)
def q02_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 45) & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Inner equi-join + group agg (SURVEY J2: metadata ⋈ aesthetic scores,
# run.py:78-91). Customer is a dimension → broadcast, no fact shuffle
# for the join itself.
# ---------------------------------------------------------------------------
@register(
    "q03_inner_join_agg",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*)                                AS n_orders,
           {money_sum_sql("o.o_totalprice")}       AS total_revenue,
           {_R4.format("avg(o.o_totalprice)")}     AS avg_order_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q03_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_revenue"),
            dround(F.avg("o_totalprice"), 4).alias("avg_order_value"),
        )
    )


# ---------------------------------------------------------------------------
# Left join with null handling (SURVEY J1: metadata ⋈ sidecar tags,
# run.py:46-68 — lookup that may miss → left join + coalesce).
# ---------------------------------------------------------------------------
@register(
    "q04_left_join_nulls",
    oracle=f"""
    SELECT c.c_custkey,
           count(o.o_orderkey)                                  AS n_orders,
           {units_money_sql(
               "coalesce(sum(CAST(floor((o.o_totalprice) * 10000.0 + 0.5) AS BIGINT)), 0)"
           )} AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q04_left_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            units_money(
                F.coalesce(F.sum(money_units(F.col("o_totalprice"))), F.lit(0))
            ).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Semi join — membership keep (SURVEY P8: `image_name in aesthetic_scores`,
# run.py:83-85). Spark left_semi = EXISTS without duplication.
# ---------------------------------------------------------------------------
@register(
    "q05_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big_orders = orders.filter(F.col("o_totalprice") > 200000)
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# Anti join — membership drop + error count (SURVEY P8/J2: the reference
# counts keys missing from the aesthetic table, run.py:83-85,90).
# ---------------------------------------------------------------------------
@register(
    "q06_anti_join_count",
    oracle=f"""
    SELECT count(*) AS n_customers_without_orders,
           {units_money_sql(
               "coalesce(sum(CAST(floor((c_acctbal) * 10000.0 + 0.5) AS BIGINT)), 0)"
           )} AS missing_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q06_anti_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_customers_without_orders"),
            # acctbal is SIGNED — units_money floors in double on both
            # sides, so negative sums round identically (see compat.py).
            units_money(
                F.coalesce(F.sum(money_units(F.col("c_acctbal"))), F.lit(0))
            ).alias("missing_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Union + last-write-wins dedup (SURVEY J3/U2: multi-file aesthetic union
# with dict-overwrite semantics, run.py:72-76). Python's implicit
# insertion-order overwrite becomes an explicit row_number over file order.
# ---------------------------------------------------------------------------
@register(
    "q07_union_dedup_last_wins",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_totalprice, 0 AS file_idx FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_orderkey, o_totalprice, 1 AS file_idx FROM orders WHERE o_totalprice > 150000
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY file_idx DESC) AS rn
      FROM src
    )
    SELECT o_orderkey, o_totalprice, file_idx FROM ranked WHERE rn = 1
    """,
)
def q07_union_dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    src0 = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
        .withColumn("file_idx", F.lit(0))
    )
    src1 = (
        orders.filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_totalprice")
        .withColumn("file_idx", F.lit(1))
    )
    w = W.partitionBy("o_orderkey").orderBy(F.col("file_idx").desc())
    return (
        src0.unionByName(src1)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Conditional aggregation audit (SURVEY P9/A3: count records missing
# tags/caption, merge_all_to_metadata.py:111-129) → sum(when(...)).
# ---------------------------------------------------------------------------
@register(
    "q08_conditional_audit",
    oracle=f"""
    SELECT o_orderpriority,
           count(*)                                                               AS n_total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)   AS n_finished,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           {_R4.format("avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)")} AS avg_finished_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q08_conditional_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
        .cast("long")
        .alias("n_large"),
        dround(
            F.avg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 4
        ).alias("avg_finished_price"),
    )


# ---------------------------------------------------------------------------
# Distinct projection (SURVEY A5: global `list(set(...))`,
# prepare_aesthetic_tags_metadata.py:25-26) over a broadcast dim join.
# ---------------------------------------------------------------------------
@register(
    "q09_distinct_pairs",
    oracle="""
    SELECT DISTINCT c.c_mktsegment, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q09_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_mktsegment", "n_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Global top-k (SURVEY O6 limit-N + O4 sort: merge_final_train_metadata.py:19-20).
# Deterministic total order (price desc, key asc) so row membership is
# engine-independent. Spark pushes the limit into a TakeOrdered.
# ---------------------------------------------------------------------------
@register(
    "q10_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q10_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Top-k per group via window (SURVEY O4: per-row sort by confidence,
# run.py:102-104, generalized to partitioned rank). Shuffles once on the
# group key; row_number prunes before any further join.
# ---------------------------------------------------------------------------
@register(
    "q11_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rnk <= 3
    """,
)
def q11_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Argmin / argmax per group (SURVEY J8/O7: nearest-bucket argmin,
# bucket_manager.py:108-110 — the relational shape is "1 row per group by
# extreme value", deterministic tiebreak like np.argmin's first-index).
# ---------------------------------------------------------------------------
@register(
    "q12_argmax_per_group",
    oracle="""
    SELECT * FROM (
      SELECT n.n_name, c.c_custkey, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn = 1
    """,
)
def q12_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )


# ---------------------------------------------------------------------------
# Multi-way star join (SURVEY J4 + J7 composition; TPC-H Q5 shape).
# region/nation/customer broadcast → the only shuffle is the final groupBy.
# ---------------------------------------------------------------------------
@register(
    "q13_star_join_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q13_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Temporal truncation group-by (extension surface; the reference has no
# date functions — SURVEY §2.7 note).
# ---------------------------------------------------------------------------
@register(
    "q14_monthly_orders",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*)                         AS n_orders,
           {money_sum_sql("o_totalprice")} AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def q14_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_month", F.date_trunc("month", F.col("o_orderdate")))
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup / grouping sets (extension; native in both engines).
# grouping_id distinguishes subtotal rows from genuine NULL keys.
# ---------------------------------------------------------------------------
@register(
    "q15_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INTEGER) AS gid,
           count(*)                           AS n,
           {money_sum_sql("l_quantity")}      AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag").cast("int")
            + F.lit(2) * F.grouping("l_linestatus").cast("int")
        ).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("l_quantity")).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Pivot (extension; manual conditional agg keeps both engines identical).
# ---------------------------------------------------------------------------
@register(
    "q16_pivot_status",
    oracle=f"""
    SELECT l_returnflag,
           {money_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_o,
           {money_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_f,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q16_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        money_sum(
            F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)
        ).alias("qty_o"),
        money_sum(
            F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)
        ).alias("qty_f"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# String/array pipeline (SURVEY P2/P3/F1-F4: rating/tag split + tokenize +
# trim + drop-empties + distinct + join back to string, run.py:58-63).
# Applied to `documents.text` since that's the driver's text table.
# ---------------------------------------------------------------------------
@register(
    "q17_tokenize_normalize",
    oracle="""
    SELECT doc_id,
           len(tokens)                                         AS n_tokens,
           len(list_distinct(tokens))                          AS n_distinct,
           array_to_string(list_sort(list_distinct(tokens))[1:3], ',') AS first3
    FROM (
      SELECT doc_id,
             list_filter(list_transform(string_split(replace(text, '_', ' '), ' '),
                                        x -> trim(x)),
                         x -> x <> '') AS tokens
      FROM documents
    )
    """,
)
def q17_tokenize_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.filter(
        F.transform(
            F.split(F.regexp_replace(F.col("text"), "_", " "), " "),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    return docs.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_distinct"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(tokens)), 1, 3)).alias(
            "first3"
        ),
    )


# ---------------------------------------------------------------------------
# Regex extraction (SURVEY F5/F8: regex find over tag strings,
# merge_all_to_metadata.py:58-100) against the events.props JSON strings.
# ---------------------------------------------------------------------------
@register(
    "q18_regex_extract",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           {_R4.format("avg(" + _K_EXPR + ")")} AS avg_k,
           max({_K_EXPR})                       AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q18_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k": (\\d+)', 1).cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Batch sessionization (streaming extension surface in batch form —
# SURVEY §2.9 note; lag + gap + cumulative session id). Microsecond
# arithmetic keeps both engines' gap comparisons identical.
# ---------------------------------------------------------------------------
@register(
    "q19_sessionize",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, {money_sum_sql("value")} AS session_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q19_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        events.withColumn(
            "new_session",
            F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(wsum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("session_value"),
        )
    )


# ---------------------------------------------------------------------------
# Tumbling-window aggregation in batch (streaming extension surface;
# the batch-equivalent of groupBy(window(ts, '5 minutes'))). Window start
# computed by integer micros arithmetic so both engines bucket identically.
# ---------------------------------------------------------------------------
@register(
    "q20_tumbling_window",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
           event_type,
           count(*)                  AS n,
           {money_sum_sql("value")} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket_us = (F.unix_micros(F.col("ts")) / F.lit(300_000_000)).cast("long") * F.lit(
        300_000_000
    )
    return (
        events.withColumn("window_start", F.timestamp_micros(bucket_us))
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value")).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Running window aggregates (extension surface: lag/lead + cumulative
# frames, absent from the reference — its only window-shaped op is the
# per-bucket shuffle, bucket_manager.py:57-59). Partition by customer,
# order by (date, key): the shuffle moves each customer's orders once and
# both the running sum and the lag read the same sorted partition — one
# shuffle, one sort, two window functions. At 100 TB the partition key is
# high-cardinality (customers), so the window state per key stays tiny.
# ---------------------------------------------------------------------------
@register(
    "q47_running_window",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {units_money_sql(
               "sum(CAST(floor((o_totalprice) * 10000.0 + 0.5) AS BIGINT)) OVER ("
               "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
           )} AS running_spend,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    """,
)
def q47_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev_date = F.lag(F.col("o_orderdate")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # running money: exact BIGINT prefix sums — every prefix, not
        # just the final total, is order-insensitive (see compat.py).
        units_money(F.sum(money_units(F.col("o_totalprice"))).over(running)).alias(
            "running_spend"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), prev_date.cast("date"))
        .cast("long")
        .alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# q117 — the SQL API surface (round 5): the classic shipping-priority
# query (TPC-H Q3 shape, adapted to this schema's columns) expressed
# ENTIRELY through spark.sql() over catalog.register_views — the same
# declarative text Catalyst compiles to the broadcast-join +
# partial-agg + TakeOrderedAndProject plan the DataFrame twin queries
# get. The reference has no SQL layer at all (SURVEY §2: imperative
# dict loops); this pins that the engine's SQL entry point works
# end-to-end, dialect differences confined to STRING/VARCHAR casts.
# ---------------------------------------------------------------------------
_Q117_CUT = "1997-03-15"

_Q117_BODY = """
    SELECT o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS {strtype}) AS o_date,
           o.o_orderpriority,
           floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '{cut}'
      AND CAST(l.l_shipdate  AS DATE) > DATE '{cut}'
    GROUP BY o.o_orderkey, CAST(CAST(o.o_orderdate AS DATE) AS {strtype}),
             o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
"""


@register(
    "q117_sql_shipping_priority",
    oracle=_Q117_BODY.format(strtype="VARCHAR", cut=_Q117_CUT),
)
def q117_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q117_BODY.format(strtype="STRING", cut=_Q117_CUT))


# ---------------------------------------------------------------------------
# q119 — JSON property extraction (round 5; SURVEY S5's JSON-source
# semantics as a column function): events.props carries a JSON string;
# get_json_object pulls $.k JVM-side (no UDF), grouped into per-type
# stats. The reference parses whole-file JSON on the driver
# (prepare_aesthetic_tags_metadata.py); at 100 TB per-row JSON columns
# must parse inside the scan stage, which is exactly what this plans.
# ---------------------------------------------------------------------------
@register(
    "q119_json_props_extract",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max,
           {dround_sql("avg(CAST(props->>'$.k' AS BIGINT))", 6)} AS k_avg
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) % 3 <> 1
    GROUP BY event_type
    """,
)
def q119_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("_k"))
        .filter(F.col("_k") % 3 != 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_k").cast("long").alias("k_sum"),
            F.max("_k").cast("long").alias("k_max"),
            dround(F.avg("_k"), 6).alias("k_avg"),
        )
    )


# ---------------------------------------------------------------------------
# q140 — source × lang chi-square independence audit: the contingency-
# table drift check a multi-source corpus runs to catch a source whose
# language mix shifted (scraper regression, upstream re-crawl). One
# (source, lang) count agg (|sources|·|langs| cells — tiny at ANY
# corpus size), marginals as two re-aggregations of the cell table,
# expected counts by broadcast joins on the marginals, per-source
# chi-square contributions + cell counts. Everything after the first
# agg operates on the cell table only.
# ---------------------------------------------------------------------------
_Q140_ORACLE = f"""
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS DOUBLE) AS o
      FROM documents GROUP BY source, lang),
    rowm AS (SELECT source, sum(o) AS rt FROM cells GROUP BY source),
    colm AS (SELECT lang, sum(o) AS ct FROM cells GROUP BY lang),
    n AS (SELECT sum(o) AS total FROM cells),
    contrib AS (
      SELECT cells.source,
             sum((o - rt * ct / total) * (o - rt * ct / total)
                 / (rt * ct / total)) AS chi2,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM cells
      JOIN rowm USING (source) JOIN colm USING (lang) CROSS JOIN n
      GROUP BY cells.source)
    SELECT source, {dround_sql("chi2", 6)} AS chi2_contrib, n_cells
    FROM contrib
"""


@register("q140_source_lang_chi2", oracle=_Q140_ORACLE)
def q140_source_lang_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rowm = cells.groupBy("source").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("lang").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("total"))
    e = F.col("rt") * F.col("ct") / F.col("total")
    return (
        cells.join(F.broadcast(rowm), "source")
        .join(F.broadcast(colm), "lang")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            dround(
                F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6
            ).alias("chi2_contrib"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
    )


# ---------------------------------------------------------------------------
# q143 — JSON schema-inference profile: per (event_type, key), how
# often each key appears in the semi-structured `props` column and how
# its value is typed — the schema-drift audit an event pipeline runs
# before promoting JSON fields to real columns. Keys are enumerated
# DYNAMICALLY (json keys explode — no hard-coded field list), so new
# upstream fields surface without a code change. Deterministic
# mutations plant the drift: event_id % 5 string-types the value,
# % 3 adds a second key. One (type, key) agg over the exploded keys;
# key space is schema-sized, never row-sized.
# ---------------------------------------------------------------------------
_Q143_ORACLE = f"""
    WITH ev AS (
      SELECT event_id, event_type, props,
             json_extract_string(props, '$.k') AS v
      FROM events),
    mut AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 5 = 0 THEN '{{"k": "' || v || '"}}'
                  WHEN event_id % 3 = 0 THEN '{{"k": ' || v || ', "tag": "a"}}'
                  ELSE props END AS m
      FROM ev),
    keyed AS (
      SELECT event_type, m, unnest(json_keys(m)) AS key FROM mut),
    tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
            FROM mut GROUP BY event_type)
    SELECT k.event_type, k.key,
           CAST(count(*) AS BIGINT) AS n_present,
           CAST(count(*) FILTER (
             WHERE contains(m, '"' || k.key || '": "')) AS BIGINT) AS n_string_typed,
           {dround_sql("count(*) / CAST(any_value(t.n_events) AS DOUBLE)", 6)} AS presence_rate
    FROM keyed k JOIN tot t USING (event_type)
    GROUP BY k.event_type, k.key
"""


@register("q143_json_schema_profile", oracle=_Q143_ORACLE)
def q143_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "props",
        F.get_json_object(F.col("props"), "$.k").alias("v"),
    )
    m = (
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(F.lit('{"k": "'), F.col("v"), F.lit('"}')),
        )
        .when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('{"k": '), F.col("v"), F.lit(', "tag": "a"}')),
        )
        .otherwise(F.col("props"))
    )
    mut = ev.select("event_type", m.alias("m"))
    tot = mut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    keyed = mut.select(
        "event_type", "m", F.explode(F.json_object_keys(F.col("m"))).alias("key")
    )
    is_str = F.col("m").contains(
        F.concat(F.lit('"'), F.col("key"), F.lit('": "'))
    )
    return (
        keyed.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_present"),
            F.count(F.when(is_str, 1)).cast("long").alias("n_string_typed"),
            dround(
                F.count(F.lit(1)) / F.first("n_events").cast("double"), 6
            ).alias("presence_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q162 — correlated-subquery decorrelation: customers whose lifetime
# order total exceeds their NATION's average customer total. The
# classic "compare each row to its group's aggregate" correlated
# subquery; the oracle keeps the correlated spelling (DuckDB
# decorrelates it), the engine expresses the decorrelated plan
# directly — a per-customer agg, then a per-nation window aggregate —
# so Spark never sees a per-row subquery. Customers with no orders
# count as 0 (LEFT join). Money is summed in INTEGER CENTS and the
# above-average test is the cross-multiplied integer comparison
# tc·C > S (no double sum-order or rounding-boundary exposure in the
# MEMBERSHIP decision — a first draft that averaged doubles flipped a
# .xx5 dround boundary between engines); the reported average is one
# exact-integer division, bit-identical across engines.
# One agg shuffle + one nation-keyed window.
# ---------------------------------------------------------------------------
_Q162_ORACLE = """
    WITH ct AS (
      SELECT c.c_custkey, c.c_nationkey,
             coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)), 0)
               AS tc
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey)
    SELECT c_custkey, c_nationkey,
           CAST(tc AS DOUBLE) / 100.0 AS total,
           CAST((SELECT sum(c2.tc) FROM ct c2
                 WHERE c2.c_nationkey = ct.c_nationkey) AS DOUBLE)
             / ((SELECT count(*) FROM ct c2
                 WHERE c2.c_nationkey = ct.c_nationkey) * 100.0) AS nation_avg
    FROM ct
    WHERE tc * (SELECT count(*) FROM ct c2
                WHERE c2.c_nationkey = ct.c_nationkey)
          > (SELECT sum(c2.tc) FROM ct c2
             WHERE c2.c_nationkey = ct.c_nationkey)
"""


@register("q162_correlated_above_nation_avg", oracle=_Q162_ORACLE)
def q162_correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("_cents"),
    )
    ct = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("_cents"), F.lit(0)).cast("long").alias("tc"))
    )
    # Nation totals as a |nations|-row agg broadcast back — NOT a
    # window partitioned by nation, whose parallelism collapses to
    # |nations| tasks each scanning customers/nation at scale.
    nat = ct.groupBy("c_nationkey").agg(
        F.sum("tc").alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    out = ct.join(F.broadcast(nat), "c_nationkey").filter(
        F.col("tc") * F.col("_c") > F.col("_s")
    )
    return out.select(
        "c_custkey",
        "c_nationkey",
        (F.col("tc").cast("double") / 100.0).alias("total"),
        (F.col("_s").cast("double") / (F.col("_c") * 100.0)).alias("nation_avg"),
    )


# ---------------------------------------------------------------------------
# q172 — custom GROUPING SETS (the third grouping surface next to
# q15's ROLLUP and q45's CUBE): revenue by (status, priority), by
# (status), and the grand total — but NOT by (priority), which CUBE
# would force and separate queries would triple-scan. Expressed
# through the spark.sql() surface (the DataFrame API exposes only
# rollup/cube); grouping_id() disambiguates the null-key levels in
# both engines. One scan, one partial-agged exchange. Revenue is
# summed as per-row integer cents (order-independent across engines)
# and cast to DOUBLE before the final divide — a raw double sum can
# flip a .xx5-ULP cent boundary between Spark and DuckDB, and a
# decimal literal would type the Spark result DECIMAL(,6) vs the
# oracle's DOUBLE (the r5 driver hash-mismatch).
# ---------------------------------------------------------------------------
_Q172_BODY = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
"""


@register(
    "q172_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
             AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def q172_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q172_BODY)


# ---------------------------------------------------------------------------
# q173 — referential-integrity audit: orphan counts across the star
# schema's foreign keys (orders→customer, lineitem→orders,
# customer→nation) in one result — the ingest health check run before
# any join-based query is trusted (a broken FK silently drops rows
# from every inner join downstream). Three LEFT ANTI joins (q06's
# operator generalized); dimension sides broadcast.
# ---------------------------------------------------------------------------
_Q173_ORACLE = """
    SELECT 'orders->customer' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'customer->nation', CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
"""


@register("q173_referential_integrity", oracle=_Q173_ORACLE)
def q173_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(fact, dim, fk, pk, label, bcast=True):
        # Broadcast only genuine dimension key sets (customer, nation).
        # The lineitem->orders pair is fact-vs-fact: broadcasting the
        # full orders key set would blow driver/executor memory at
        # scale, so that pair stays a shuffled left_anti join.
        dim = F.broadcast(dim) if bcast else dim
        n = (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )
        return n

    return (
        orphans(orders, customer, "o_custkey", "c_custkey", "orders->customer")
        .unionByName(
            orphans(lineitem, orders.select("o_orderkey"), "l_orderkey", "o_orderkey",
                    "lineitem->orders", bcast=False)
        )
        .unionByName(
            orphans(customer, nation, "c_nationkey", "n_nationkey",
                    "customer->nation")
        )
    )


# ---------------------------------------------------------------------------
# q174 — local-supplier volume (TPC-H Q5 shape): revenue from
# lineitems where the supplier and the ordering customer share a
# nation, rolled up by region and nation — the 6-table join-reorder
# stress (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier
# + the same-nation equi constraint). All four dimension sides
# broadcast; the only shuffles are the orders⋈lineitem fact join and
# the final 2-level agg.
#
# MONEY IN INTEGER UNITS (r10 100x-sweep fix): the old per-row
# dround-4 + double-sum + dround-2 convention flipped a .xx5 boundary
# at the 100x tier (463797812.935 summed in different orders lands on
# either side of the half). The per-row product is pinned to integer
# TEN-THOUSANDTHS with dround's own numerator (floor(x*1e4 + 0.5) —
# bit-identical in both engines), summed EXACTLY as BIGINT, and only
# then converted to rounded-cents via integer arithmetic — no
# order-sensitive double sum anywhere. (sum+50) div 100 is
# floor-division on nonnegative revenue, i.e. round-half-up cents.
# ---------------------------------------------------------------------------
_REV_UNITS_SQL = "CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS BIGINT)"

_Q174_ORACLE = f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_items,
           ((CAST(sum({_REV_UNITS_SQL}) AS BIGINT) + 50) // 100) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation n    ON n.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = n.n_regionkey
    WHERE s.s_nationkey = c.c_nationkey
    GROUP BY r.r_name, n.n_name
"""


@register("q174_local_supplier_volume", oracle=_Q174_ORACLE)
def q174_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0)
            + F.lit(0.5)
        ).cast("long").alias("_rev_u"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
    )
    return j.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("_rev_u").alias("_su"),
    ).select(
        "region", "nation", "n_items",
        (F.expr("(_su + 50) div 100") / F.lit(100.0)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q175 — national market share (TPC-H Q8 shape): for each order-month,
# the share of brand-'B1' revenue in total part revenue — the
# conditional-share aggregation (sum(CASE)/sum) over the
# part ⋈ lineitem ⋈ orders chain. Part broadcasts; the share division
# runs AFTER both sums are reduced to rounded cents, so the
# quotient's inputs are identical in both engines. Money rides the
# q174 integer-units convention (r10 100x-sweep fix — the old
# double-sum flipped a .xx5 boundary at the tier).
# ---------------------------------------------------------------------------
_Q175_ORACLE = f"""
    WITH j AS (
      SELECT CAST(substr(CAST(o.o_orderdate AS VARCHAR), 1, 7) AS VARCHAR) AS month,
             p.p_brand,
             {_REV_UNITS_SQL} AS rev_u
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p   ON p.p_partkey = l.l_partkey),
    s AS (SELECT month,
                 ((CAST(sum(CASE WHEN p_brand = 'Brand#1' THEN rev_u ELSE 0 END) AS BIGINT) + 50) // 100) / 100.0 AS brand_rev,
                 ((CAST(sum(rev_u) AS BIGINT) + 50) // 100) / 100.0 AS total_rev
          FROM j GROUP BY month)
    SELECT month, brand_rev, total_rev,
           {dround_sql("brand_rev / total_rev", 6)} AS brand_share
    FROM s
"""


@register("q175_brand_market_share", oracle=_Q175_ORACLE)
def q175_brand_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0)
            + F.lit(0.5)
        ).cast("long").alias("rev_u"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("month")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    s = j.groupBy("month").agg(
        F.sum(
            F.when(F.col("p_brand") == "Brand#1", F.col("rev_u")).otherwise(F.lit(0))
        ).alias("_bu"),
        F.sum("rev_u").alias("_tu"),
    ).select(
        "month",
        (F.expr("(_bu + 50) div 100") / F.lit(100.0)).alias("brand_rev"),
        (F.expr("(_tu + 50) div 100") / F.lit(100.0)).alias("total_rev"),
    )
    return s.select(
        "month", "brand_rev", "total_rev",
        dround(F.col("brand_rev") / F.col("total_rev"), 6).alias("brand_share"),
    )
