"""Temporal join gate queries over `events`: as-of join (vs DuckDB's
native ASOF JOIN — the strongest possible oracle) and bucketed range
join (vs a plain theta join the oracle can afford at gate scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anime_data_pipeline_spark.catalog import load_table
from anime_data_pipeline_spark.functions.compat import dround, dround_sql
from anime_data_pipeline_spark.operators.joins import asof_join, range_join_bucketed
from anime_data_pipeline_spark.registry import register


# ---------------------------------------------------------------------------
# q38 — as-of join: every event gains the user's most recent purchase
# value at-or-before its timestamp.
# ---------------------------------------------------------------------------
@register(
    "q38_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.event_type,
           r.value AS right_value, r.ts AS right_ts
    FROM events l
    ASOF LEFT JOIN (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ) r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    left = events.select("event_id", "user_id", "ts", "event_type")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(left, right, key="user_id", ts_col="ts",
                    value_cols=["value", "ts"])
    return out.select(
        "event_id", "user_id", "event_type",
        F.col("right_value"), F.col("right_ts"),
    )


# ---------------------------------------------------------------------------
# q39 — range join: incidents = 2-minute windows opened by error
# events; every event landing inside any incident window matches.
# No equi key — the bucketed form keeps it off the cartesian path.
# ---------------------------------------------------------------------------
@register(
    "q39_range_join",
    oracle="""
    WITH incidents AS (
      SELECT event_id AS incident_id, ts AS start_ts,
             ts + INTERVAL 2 MINUTE AS end_ts
      FROM events WHERE event_type = 'error'
    )
    SELECT i.incident_id, e.event_id, e.event_type
    FROM events e JOIN incidents i
      ON e.ts >= i.start_ts AND e.ts < i.end_ts
    """,
)
def q39_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    incidents = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start"),
        F.timestamp_micros(F.unix_micros(F.col("ts")) + 120_000_000).alias("end"),
    )
    joined = range_join_bucketed(
        events.select("event_id", "event_type", "ts"),
        incidents,
        ts_col="ts",
        bucket_width_s=120,
    )
    return joined.select("incident_id", "event_id", "event_type")


# ---------------------------------------------------------------------------
# q112 — funnel analysis: view → click → purchase per user with strict
# event-time ordering (each stage's first event at-or-after the
# previous stage's), then the per-stage user counts — the classic
# event-analytics conversion query. Three user-keyed conditional-min
# aggregations; every exchange carries (user, ts) pairs.
# ---------------------------------------------------------------------------
_Q112_ORACLE = """
    WITH tv AS (SELECT user_id, min(ts) AS tv FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    tc AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
           JOIN tv ON tv.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts >= tv.tv
           GROUP BY e.user_id),
    tp AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
           JOIN tc ON tc.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= tc.tc
           GROUP BY e.user_id),
    users AS (SELECT DISTINCT user_id FROM events),
    staged AS (SELECT u.user_id,
                      CASE WHEN tp.user_id IS NOT NULL THEN 3
                           WHEN tc.user_id IS NOT NULL THEN 2
                           WHEN tv.user_id IS NOT NULL THEN 1
                           ELSE 0 END AS stage
               FROM users u
               LEFT JOIN tv ON tv.user_id = u.user_id
               LEFT JOIN tc ON tc.user_id = u.user_id
               LEFT JOIN tp ON tp.user_id = u.user_id)
    SELECT stage, count(*) AS n_users FROM staged GROUP BY stage
"""


@register("q112_funnel", oracle=_Q112_ORACLE)
def q112_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    tc = (
        e.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    tp = (
        e.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    users = e.select("user_id").distinct()
    staged = (
        users.join(tv, "user_id", "left")
        .join(tc.select("user_id", "tc"), "user_id", "left")
        .join(tp.select("user_id", "tp"), "user_id", "left")
        .withColumn(
            "stage",
            F.when(F.col("tp").isNotNull(), 3)
            .when(F.col("tc").isNotNull(), 2)
            .when(F.col("tv").isNotNull(), 1)
            .otherwise(0),
        )
    )
    return staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# q113 — cohort retention matrix: users cohorted by signup day, then
# distinct active users per (cohort, days-since-signup) — the second
# classic event-analytics shape. Day buckets are epoch math (no
# calendar/date_trunc semantics to disagree on between engines).
# ---------------------------------------------------------------------------
_DAY_US = 86_400 * 1_000_000

_Q113_ORACLE = f"""
    WITH signup AS (SELECT user_id, min(ts) AS s_ts FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
    act AS (SELECT e.user_id,
                   epoch_us(s.s_ts) // {_DAY_US} AS cohort_day,
                   (epoch_us(e.ts) // {_DAY_US}) - (epoch_us(s.s_ts) // {_DAY_US})
                     AS period
            FROM events e JOIN signup s ON s.user_id = e.user_id
            WHERE e.ts >= s.s_ts)
    SELECT make_timestamp(cohort_day * {_DAY_US}) AS cohort_start,
           CAST(period AS BIGINT) AS period,
           count(DISTINCT user_id) AS n_users
    FROM act GROUP BY cohort_day, period
"""


@register("q113_cohort_retention", oracle=_Q113_ORACLE)
def q113_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    day = lambda c: F.floor(F.unix_micros(c) / F.lit(_DAY_US))  # noqa: E731
    act = (
        e.join(signup, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .select(
            "user_id",
            day(F.col("s_ts")).alias("cohort_day"),
            (day(F.col("ts")) - day(F.col("s_ts"))).alias("period"),
        )
    )
    return (
        act.groupBy("cohort_day", "period")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.timestamp_micros(F.col("cohort_day") * F.lit(_DAY_US)).alias(
                "cohort_start"
            ),
            F.col("period").cast("long").alias("period"),
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# q144 — A/B-test two-proportion z-test: users hash-split into variants
# (user_id % 2), per event_type the conversion-rate difference is
# tested with the pooled-proportion z statistic — the experiment
# readout an event pipeline serves. All aggregates are
# (event_type, variant)-keyed distinct-user counts; variant totals are
# a 2-row broadcast; the z math is scalar column arithmetic on the
# |event_types|-row result.
# ---------------------------------------------------------------------------
_Q144_ORACLE = f"""
    WITH users AS (SELECT DISTINCT user_id, user_id % 2 AS variant FROM events),
    tot AS (SELECT variant, CAST(count(*) AS BIGINT) AS n FROM users GROUP BY variant),
    conv AS (SELECT event_type, user_id, user_id % 2 AS variant FROM events
             GROUP BY event_type, user_id HAVING count(*) >= 3),
    cc AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS c
           FROM conv GROUP BY event_type, variant),
    wide AS (SELECT event_type,
                    CAST(coalesce(sum(CASE WHEN variant = 0 THEN c END), 0) AS BIGINT) AS conv_a,
                    CAST(coalesce(sum(CASE WHEN variant = 1 THEN c END), 0) AS BIGINT) AS conv_b
             FROM cc GROUP BY event_type),
    n2 AS (SELECT
             CAST(coalesce(sum(CASE WHEN variant = 0 THEN n END), 0) AS BIGINT) AS n_a,
             CAST(coalesce(sum(CASE WHEN variant = 1 THEN n END), 0) AS BIGINT) AS n_b
           FROM tot),
    stats AS (SELECT w.event_type, w.conv_a, w.conv_b, n2.n_a, n2.n_b,
                     w.conv_a / CAST(n2.n_a AS DOUBLE) AS ra,
                     w.conv_b / CAST(n2.n_b AS DOUBLE) AS rb,
                     (w.conv_a + w.conv_b) / CAST(n2.n_a + n2.n_b AS DOUBLE) AS pp
              FROM wide w CROSS JOIN n2)
    SELECT event_type, conv_a, conv_b, n_a, n_b,
           {dround_sql("ra", 6)} AS rate_a,
           {dround_sql("rb", 6)} AS rate_b,
           CASE WHEN pp * (1.0 - pp) = 0 THEN 0.0
                ELSE {dround_sql("(ra - rb) / sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b))", 6)}
           END AS z,
           CASE WHEN pp * (1.0 - pp) = 0 THEN FALSE
                ELSE (abs((ra - rb) / sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b))) > 1.96)
           END AS significant
    FROM stats
"""


@register("q144_ab_test_ztest", oracle=_Q144_ORACLE)
def q144_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.functions.compat import dround

    ev = load_table(spark, sf_dir, "events")
    users = ev.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    tot = users.groupBy("variant").agg(F.count(F.lit(1)).cast("long").alias("n"))
    n2 = tot.agg(
        F.coalesce(F.sum(F.when(F.col("variant") == 0, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("variant") == 1, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_b"),
    )
    conv = (
        ev.groupBy("event_type", "user_id", (F.col("user_id") % 2).alias("variant"))
        .agg(F.count(F.lit(1)).alias("_ne"))
        .filter(F.col("_ne") >= 3)
        .drop("_ne")
    )
    cc = conv.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wide = cc.groupBy("event_type").agg(
        F.coalesce(F.sum(F.when(F.col("variant") == 0, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("conv_a"),
        F.coalesce(F.sum(F.when(F.col("variant") == 1, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("conv_b"),
    )
    ra = F.col("conv_a") / F.col("n_a").cast("double")
    rb = F.col("conv_b") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (ra - rb) / F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return (
        wide.crossJoin(F.broadcast(n2))
        .select(
            "event_type",
            "conv_a",
            "conv_b",
            "n_a",
            "n_b",
            dround(ra, 6).alias("rate_a"),
            dround(rb, 6).alias("rate_b"),
            F.when(pp * (F.lit(1.0) - pp) == 0, F.lit(0.0))
            .otherwise(dround(z, 6))
            .alias("z"),
            F.when(pp * (F.lit(1.0) - pp) == 0, F.lit(False))
            .otherwise(F.abs(z) > 1.96)
            .alias("significant"),
        )
    )


# ---------------------------------------------------------------------------
# q145 — event co-occurrence lift (association rules): for every
# unordered event-type pair, the fraction of users showing both and
# the lift n_ab·N / (n_a·n_b) — the market-basket readout over the
# event log. The per-user fan-out is bounded by |event_types|² (25
# here), so the self-join on user_id is NOT quadratic in events: it
# joins the DISTINCT (user, type) table with itself, ≤ |types| rows
# per user per side.
# ---------------------------------------------------------------------------
_Q145_ORACLE = f"""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS total FROM ut),
    tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY event_type),
    pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM ut a JOIN ut b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY a.event_type, b.event_type)
    SELECT p.type_a, p.type_b, p.n_ab,
           {dround_sql("p.n_ab / CAST(n.total AS DOUBLE)", 6)} AS support,
           {dround_sql("(p.n_ab * n.total) / CAST(ta.n_t * tb.n_t AS DOUBLE)", 6)} AS lift
    FROM pairs p
    JOIN tc ta ON ta.event_type = p.type_a
    JOIN tc tb ON tb.event_type = p.type_b
    CROSS JOIN n
"""


@register("q145_event_cooccurrence_lift", oracle=_Q145_ORACLE)
def q145_event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anime_data_pipeline_spark.functions.compat import dround

    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ut.agg(F.countDistinct("user_id").cast("long").alias("total"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ta = tc.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    tb = tc.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            dround(F.col("n_ab") / F.col("total").cast("double"), 6).alias("support"),
            dround(
                (F.col("n_ab") * F.col("total"))
                / (F.col("na") * F.col("nb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q146 — level-shift changepoint detection: per event_type, compare the
# trailing 3-day mean volume against the 3 days before it and flag
# days where the level jumps by more than the threshold ratio — the
# volume-anomaly monitor an ingest pipeline pages on. Day keys are
# epoch-day integers (no calendar semantics to disagree on); both
# rolling means are frame windows PARTITIONED BY event_type over the
# |types|·|days|-row daily table, so nothing is corpus-sized after the
# first agg.
# ---------------------------------------------------------------------------
_Q146_RATIO = 0.25

_Q146_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day),
    rolled AS (
      SELECT event_type, day, n,
             avg(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS recent3,
             avg(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 5 PRECEDING AND 3 PRECEDING) AS prev3,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily)
    SELECT event_type, CAST(day AS BIGINT) AS day, n,
           {dround_sql("recent3", 6)} AS recent3,
           {dround_sql("prev3", 6)} AS prev3,
           (rn >= 6 AND abs(recent3 - prev3) > {_Q146_RATIO} * prev3) AS level_shift
    FROM rolled
"""


@register("q146_level_shift", oracle=_Q146_ORACLE)
def q146_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from anime_data_pipeline_spark.functions.compat import dround

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_micros(F.col("ts")) / F.lit(_DAY_US)).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    base = W.partitionBy("event_type").orderBy("day")
    recent3 = F.avg("n").over(base.rowsBetween(-2, 0))
    prev3 = F.avg("n").over(base.rowsBetween(-5, -3))
    rn = F.row_number().over(base)
    return daily.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        "n",
        dround(recent3, 6).alias("recent3"),
        dround(prev3, 6).alias("prev3"),
        ((rn >= 6) & (F.abs(recent3 - prev3) > F.lit(_Q146_RATIO) * prev3)).alias(
            "level_shift"
        ),
    )


# ---------------------------------------------------------------------------
# q147 — last-touch attribution: every purchase is attributed to the
# user's most recent PRECEDING marketing touch (view/click), with the
# touch-to-purchase latency — the classic attribution readout. The
# engine computes it in ONE pass: a running `max(struct(ts, id,
# type))` over a per-user frame (unbounded preceding → 1 preceding),
# so no self-join and no per-purchase scan; ties at equal ts resolve
# by event_id in both engines. Window partitions by user — parallelism
# = users.
# ---------------------------------------------------------------------------
_Q147_ORACLE = """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    t AS (SELECT event_id, user_id, ts, event_type FROM events
          WHERE event_type IN ('view', 'click')),
    ranked AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             t.event_id AS touch_id, t.event_type AS touch_type,
             epoch_us(p.ts) - epoch_us(t.ts) AS latency_us,
             row_number() OVER (PARTITION BY p.event_id
               ORDER BY t.ts DESC, t.event_id DESC) AS rn
      FROM p JOIN t ON p.user_id = t.user_id
        AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id)))
    SELECT p.event_id AS purchase_id, p.user_id,
           r.touch_id, r.touch_type,
           CAST(r.latency_us AS BIGINT) AS latency_us
    FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.purchase_id = p.event_id
"""


@register("q147_last_touch_attribution", oracle=_Q147_ORACLE)
def q147_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", F.unix_micros(F.col("ts")).alias("us")
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"),
        F.struct(
            F.col("us").alias("t_us"),
            F.col("event_id").alias("t_id"),
            F.col("event_type").alias("t_type"),
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    attr = F.max(touch).over(w)
    return (
        ev.withColumn("_attr", attr)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("_attr.t_id").alias("touch_id"),
            F.col("_attr.t_type").alias("touch_type"),
            (F.col("us") - F.col("_attr.t_us")).cast("long").alias("latency_us"),
        )
    )


# ---------------------------------------------------------------------------
# q155 — Markov event-transition matrix: per-user event streams ordered
# by (ts, event_id), each consecutive pair is a (from_type, to_type)
# transition; output counts and the row-normalized transition
# probability — the classic next-event/journey model behind session
# simulation and funnel diagnostics. Engine: one per-user lead window
# (parallelism = users; the window never sees more than one user's
# rows) + one (from, to) agg; the per-from normalizer is a window over
# the |types|² aggregated table, which is trivially small at any
# corpus size. Oracle: the identical lead/agg in DuckDB.
# ---------------------------------------------------------------------------
_Q155_ORACLE = f"""
    WITH nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
      FROM events),
    t AS (SELECT from_type, to_type, count(*) AS n FROM nxt
          WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           {dround_sql("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)", 6)} AS p
    FROM t
"""


@register("q155_markov_transitions", oracle=_Q155_ORACLE)
def q155_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from anime_data_pipeline_spark.functions.compat import dround

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = W.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        dround(F.col("n").cast("double") / F.sum("n").over(norm), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# q164 — daily max concurrency (sweep line): incidents = 2-minute
# windows opened by error events (q39's family); per day, the peak
# number of simultaneously-open windows among incidents started that
# day — the classic interval-overlap aggregation (capacity planning /
# rate-limit sizing). Sweep line: ±1 deltas at window edges, running
# sum ordered by (ts, delta) — delta −1 sorts first so windows are
# half-open [start, end) in BOTH engines — then a per-day max. The
# running-sum window partitions by day (parallelism = days; both
# engines use the default RANGE frame, so tie groups aggregate
# identically and the day-max is order-insensitive within ties).
# ---------------------------------------------------------------------------
_Q164_ORACLE = """
    WITH inc AS (
      SELECT CAST(ts AS DATE) AS day, ts AS s,
             ts + INTERVAL 2 MINUTE AS e
      FROM events WHERE event_type = 'error'),
    deltas AS (
      SELECT day, s AS t, 1 AS delta FROM inc
      UNION ALL
      SELECT day, e AS t, -1 AS delta FROM inc),
    swept AS (
      SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY t, delta) AS open
      FROM deltas)
    SELECT day, CAST((SELECT count(*) FROM inc i WHERE i.day = s.day) AS BIGINT)
                  AS n_incidents,
           CAST(max(open) AS BIGINT) AS max_concurrency
    FROM swept s GROUP BY day
"""


@register("q164_daily_max_concurrency", oracle=_Q164_ORACLE)
def q164_daily_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    inc = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").cast("date").alias("day"),
        F.col("ts").alias("s"),
        F.timestamp_micros(F.unix_micros(F.col("ts")) + 120_000_000).alias("e"),
    )
    deltas = inc.select("day", F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        inc.select("day", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = W.partitionBy("day").orderBy("t", "delta")
    swept = deltas.withColumn("open", F.sum("delta").over(w))
    peaks = swept.groupBy("day").agg(F.max("open").cast("long").alias("max_concurrency"))
    counts = inc.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n_incidents"))
    return counts.join(peaks, "day").select("day", "n_incidents", "max_concurrency")


# ---------------------------------------------------------------------------
# q166 — time-decay multi-touch attribution: every purchase splits one
# unit of credit across the user's view/click touches in the 7 days
# before it, weighted exp(−Δt·ln2/24h) (24-hour half-life) — the
# standard marketing-attribution upgrade over q147's last-touch.
# Per-pair weights are dround-ed to 12 digits in BOTH engines before
# the normalization sums (the q150 trick: libm exp() may differ by an
# ULP between engines; rounding the per-pair value first makes every
# downstream sum/divide bit-identical). One user-keyed bounded-range
# join (7-day cap bounds fan-out; AQE absorbs hot users) + one
# purchase-keyed agg.
# ---------------------------------------------------------------------------
_Q166_HALF_LIFE_H = 24.0
_Q166_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def _q166_oracle() -> str:
    lam = f"(ln(2.0) / {_Q166_HALF_LIFE_H!r})"
    dt_h = "((epoch_us(p.ts) - epoch_us(t.ts)) / 3600000000.0)"
    w = dround_sql(f"exp(-{lam} * {dt_h})", 12)
    return f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    t AS (SELECT event_id, user_id, ts, event_type FROM events
          WHERE event_type IN ('view', 'click')),
    pairs AS (
      SELECT p.event_id AS purchase_id, t.event_type AS touch_type,
             {w} AS w
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.ts < p.ts
        AND epoch_us(p.ts) - epoch_us(t.ts) <= {_Q166_WINDOW_US}),
    tot AS (SELECT purchase_id, sum(w) AS sw, count(*) AS n_touches
            FROM pairs GROUP BY purchase_id)
    SELECT pairs.purchase_id, pairs.touch_type,
           CAST(count(*) AS BIGINT) AS n_type_touches,
           {dround_sql("sum(pairs.w) / any_value(tot.sw)", 6)} AS credit
    FROM pairs JOIN tot USING (purchase_id)
    GROUP BY pairs.purchase_id, pairs.touch_type
    """


@register("q166_time_decay_attribution", oracle=_q166_oracle())
def q166_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_pu"),
        F.col("us").alias("_pus"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("_tu"),
        F.col("event_type").alias("touch_type"),
        F.col("us").alias("_tus"),
    )
    lam = math.log(2.0) / _Q166_HALF_LIFE_H
    pairs = p.join(
        t,
        (p["_pu"] == t["_tu"])
        & (t["_tus"] < p["_pus"])
        & (p["_pus"] - t["_tus"] <= _Q166_WINDOW_US),
    ).select(
        "purchase_id",
        "touch_type",
        dround(
            F.exp(-F.lit(lam) * ((F.col("_pus") - F.col("_tus")) / F.lit(3.6e9))), 12
        ).alias("w"),
    )
    tot = pairs.groupBy("purchase_id").agg(F.sum("w").alias("sw"))
    return (
        pairs.join(tot, "purchase_id")
        .groupBy("purchase_id", "touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_type_touches"),
            dround(F.sum("w") / F.first("sw"), 6).alias("credit"),
        )
    )


# ---------------------------------------------------------------------------
# q167 — RFM segmentation: per purchasing user, Recency (days since
# last purchase vs the corpus max event time), Frequency (purchase
# count), Monetary (integer-cents spend), each scored 1–5 on FIXED
# business bands — not quantiles: quantile cuts need a global sort
# (or a bucketed rank) and their ties are parallelism-sensitive,
# while fixed bands are bit-deterministic at any scale. One user agg
# + a 1-row max-ts broadcast; recency arithmetic in integer µs.
# ---------------------------------------------------------------------------
_Q167_R = "CASE WHEN rd <= 3 THEN 5 WHEN rd <= 7 THEN 4 WHEN rd <= 14 THEN 3 WHEN rd <= 21 THEN 2 ELSE 1 END"
_Q167_F = "CASE WHEN np >= 20 THEN 5 WHEN np >= 15 THEN 4 WHEN np >= 10 THEN 3 WHEN np >= 5 THEN 2 ELSE 1 END"
_Q167_M = "CASE WHEN cents >= 100000 THEN 5 WHEN cents >= 70000 THEN 4 WHEN cents >= 40000 THEN 3 WHEN cents >= 15000 THEN 2 ELSE 1 END"

_Q167_ORACLE = f"""
    WITH ref AS (SELECT max(epoch_us(ts)) AS mx FROM events),
    u AS (SELECT user_id,
                 max(epoch_us(ts)) AS last_us,
                 count(*) AS np,
                 sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    m AS (SELECT user_id, np, cents,
                 ((SELECT mx FROM ref) - last_us) // 86400000000 AS rd
          FROM u)
    SELECT user_id, CAST(rd AS BIGINT) AS recency_days,
           CAST(np AS BIGINT) AS n_purchases,
           CAST(cents AS BIGINT) AS spend_cents,
           CAST({_Q167_R} AS BIGINT) AS r_score,
           CAST({_Q167_F} AS BIGINT) AS f_score,
           CAST({_Q167_M} AS BIGINT) AS m_score,
           CAST(({_Q167_R}) * 100 + ({_Q167_F}) * 10 + ({_Q167_M}) AS BIGINT)
             AS rfm
    FROM m
"""


@register("q167_rfm_segmentation", oracle=_Q167_ORACLE)
def q167_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.unix_micros(F.col("ts")).alias("us")
    )
    ref = ev.agg(F.max("us").alias("mx"))
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("us").alias("last_us"),
            F.count(F.lit(1)).alias("np"),
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("cents"),
        )
    )
    m = u.crossJoin(F.broadcast(ref)).withColumn(
        "rd", F.expr("(mx - last_us) div 86400000000")
    )
    m = m.selectExpr(
        "user_id",
        "CAST(rd AS LONG) AS recency_days",
        "CAST(np AS LONG) AS n_purchases",
        "CAST(cents AS LONG) AS spend_cents",
        f"CAST({_Q167_R} AS LONG) AS r_score",
        f"CAST({_Q167_F} AS LONG) AS f_score",
        f"CAST({_Q167_M} AS LONG) AS m_score",
        f"CAST(({_Q167_R}) * 100 + ({_Q167_F}) * 10 + ({_Q167_M}) AS LONG) AS rfm",
    )
    return m


# ---------------------------------------------------------------------------
# q169 — DAU / trailing-7-day WAU / stickiness: per day, distinct
# active users that day and across the trailing 7 days — the
# engagement gauge every event pipeline ships. Distinct (day, user)
# pairs first (one agg), then the 30-row day spine joins its own
# trailing week (day-spine self-join is |days|² at worst — calendar
# table, not event-volume) and re-counts distinct users. Day buckets
# are epoch math (q113's convention — no calendar semantics drift).
# ---------------------------------------------------------------------------
_Q169_ORACLE = f"""
    WITH du AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau
            FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day)
    SELECT make_timestamp(d.day * {_DAY_US}) AS day_start,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           {dround_sql("CAST(dau.dau AS DOUBLE) / wau.wau", 6)} AS stickiness
    FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day
"""


@register("q169_dau_wau_stickiness", oracle=_Q169_ORACLE)
def q169_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.floor(F.unix_micros(F.col("ts")) / F.lit(_DAY_US)).alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    # Trailing-week membership as a ×7 MAP-SIDE explode (u active on
    # day d counts toward every spine day in [d, d+6]) + a broadcast
    # equi-join against the day spine — NOT a theta join of spine ×
    # pairs, whose nested-loop cost multiplies by the CALENDAR size
    # (×3650 at ten years) instead of ×7.
    contrib = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
        "user_id",
    )
    wau = (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.timestamp_micros((F.col("day") * _DAY_US).cast("long")).alias(
                "day_start"
            ),
            "dau",
            "wau",
            dround(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# q171 — top event paths: the 10 most frequent 3-step per-user
# event-type sequences — q155's Markov matrix generalized to path
# mining (journey diagnostics). One per-user double-lead window
# (parallelism = users), one path agg, top-10 via orderBy+limit =
# TakeOrderedAndProject (per-partition heaps — no global sort, no
# unpartitioned window).
# ---------------------------------------------------------------------------
_Q171_K = 10

_Q171_ORACLE = f"""
    WITH seq AS (
      SELECT event_type AS t0,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
              FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
              GROUP BY 1)
    SELECT path, CAST(n AS BIGINT) AS n
    FROM paths ORDER BY n DESC, path LIMIT {_Q171_K}
"""


@register("q171_top_event_paths", oracle=_Q171_ORACLE)
def q171_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "t0", "t1", "t2").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return paths.orderBy(F.desc("n"), F.asc("path")).limit(_Q171_K)


# ---------------------------------------------------------------------------
# q176 — conversion-latency quantiles: per user, the first view and
# the first purchase at-or-after it (q112's stage logic); the
# view→purchase latency distribution summarized as p50/p90 PER signup
# cohort week — the funnel-speed report. Quantiles use q124's
# rank-exact discrete form (value at rank ceil(q·n), (value, user)
# tie order — no percentile interpolation, engine-exact). Two
# user-keyed conditional-min aggs + one per-week rank window over the
# converting users.
# ---------------------------------------------------------------------------
_WEEK_US = 7 * 86_400 * 1_000_000

_Q176_ORACLE = f"""
    WITH tv AS (SELECT user_id, min(epoch_us(ts)) AS tv FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    tp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tp FROM events e
           JOIN tv ON tv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= tv.tv
           GROUP BY e.user_id),
    lat AS (SELECT tv.user_id, tv.tv // {_WEEK_US} AS week,
                   tp.tp - tv.tv AS lat_us
            FROM tv JOIN tp ON tp.user_id = tv.user_id),
    ranked AS (SELECT week, lat_us, user_id,
                      row_number() OVER (PARTITION BY week
                                         ORDER BY lat_us, user_id) AS rn,
                      count(*) OVER (PARTITION BY week) AS n
               FROM lat)
    SELECT CAST(week AS BIGINT) AS week,
           CAST(max(n) AS BIGINT) AS n_converting,
           CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN lat_us END) AS BIGINT) AS p50_latency_us,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN lat_us END) AS BIGINT) AS p90_latency_us
    FROM ranked GROUP BY week
"""


@register("q176_conversion_latency_quantiles", oracle=_Q176_ORACLE)
def q176_conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    tv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("tv"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tv, "user_id")
        .filter(F.col("us") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("us").alias("tp"))
    )
    lat = tv.join(tp, "user_id").select(
        "user_id",
        F.expr(f"tv div {_WEEK_US}").alias("week"),
        (F.col("tp") - F.col("tv")).alias("lat_us"),
    )
    w = W.partitionBy("week").orderBy("lat_us", "user_id")
    wn = W.partitionBy("week")
    ranked = lat.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return ranked.groupBy("week").agg(
        F.max("n").cast("long").alias("n_converting"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"), F.col("lat_us"))
        ).cast("long").alias("p50_latency_us"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"), F.col("lat_us"))
        ).cast("long").alias("p90_latency_us"),
    ).select(
        F.col("week").cast("long").alias("week"),
        "n_converting",
        "p50_latency_us",
        "p90_latency_us",
    )


# ---------------------------------------------------------------------------
# q189 — gap-filled time series with LOCF + linear interpolation (round
# 7: the resample/gapfill operator every time-series engine ships —
# TimescaleDB time_bucket_gapfill + locf/interpolate — absent from the
# family until now). Per user: aggregate events to a sparse DAILY
# series (avg value, dround-12'd per day BEFORE any further math — the
# repo's sum-order rule), generate the dense day grid over the user's
# OBSERVED span (sequence/generate_series), left-join, then fill two
# ways: last-observation-carried-forward, and linear interpolation
# between the surrounding observed days. Both engines run the same
# window plan: partitioned by user (bounded partitions — the span is
# ≤31 days), unbounded-preceding for the prev observation,
# unbounded-following for the next. Scale: the grid explode is
# bounded by span/bucket per entity, windows are per-entity, and the
# one shuffle keys on user_id — the standard gapfill shape at any
# corpus size (hot entities bound by their time span, not row count).
# ---------------------------------------------------------------------------
_Q189_ORACLE = f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {dround_sql("avg(value)", 12)} AS v,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    ),
    joined AS (
      SELECT g.user_id, g.day, d.v, coalesce(d.n_events, 0) AS n_events,
             d.v IS NOT NULL AS is_observed
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    filled AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
             last_value(CASE WHEN is_observed THEN day END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN is_observed THEN day END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      FROM joined
    )
    SELECT user_id, day, is_observed, n_events,
           {dround_sql("locf", 6)} AS locf,
           {dround_sql(
             "CASE WHEN is_observed THEN v "
             "ELSE locf + (next_v - locf) * "
             "CAST(datediff('day', prev_day, day) AS DOUBLE) / "
             "CAST(datediff('day', prev_day, next_day) AS DOUBLE) END", 6)} AS interp
    FROM filled
"""


@register("q189_gapfill_interpolate", oracle=_Q189_ORACLE)
def q189_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    # null measurements are not observations: a day of NULL values must
    # not anchor the span or appear observed-with-no-value
    daily = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            dround(F.avg("value"), 12).alias("v"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        # consumed twice (spans + the grid join): persist or the events
        # scan and the per-day aggregation shuffle run twice
        .persist()
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "v",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("v").isNotNull().alias("is_observed"),
    )
    back = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("is_observed"), F.col("day"))
    filled = (
        joined.withColumn("locf", F.last("v", ignorenulls=True).over(back))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(back))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(fwd))
    )
    # association mirrors the oracle exactly: ((next-prev) * dd1) / dd2 —
    # a * (dd1/dd2) differs by 1 ulp on ~6% of gap rows
    interp = F.when(F.col("is_observed"), F.col("v")).otherwise(
        F.col("locf")
        + (F.col("next_v") - F.col("locf"))
        * F.datediff("day", "prev_day").cast("double")
        / F.datediff("next_day", "prev_day").cast("double")
    )
    return filled.select(
        "user_id",
        "day",
        "is_observed",
        "n_events",
        dround(F.col("locf"), 6).alias("locf"),
        dround(interp, 6).alias("interp"),
    )
