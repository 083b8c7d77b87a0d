"""Event-sequence analytics: ordered funnels, cohort retention, last-touch
attribution.

The reference family (product-analytics engines) exposes these as native
verbs; none is a Spark built-in, but each decomposes into ONE user-keyed
shuffle plus metadata-scale finalization — the shape that survives 100 TB of
events:

  * FUNNEL      — strict ordered view → click → purchase. Chained
    min-over-prefix windows on ONE (user_id) partitioning: stage-k's
    "earliest qualifying ts" window reads stage-(k-1)'s column, so three
    Window operators share a single sort and a single exchange. The per-user
    reduction that follows is co-partitioned (hash(user_id) already
    satisfies it) — no second data-scale shuffle.
  * RETENTION   — classic cohort triangle: distinct (user, day) activity,
    cohort = first activity day, offset = days since cohort. Day-grain
    collapse FIRST (the 100 TB trick: the window runs over ≤ one row per
    user-day, not raw events), then a min-over-user window, then a
    (cohort, offset) count.
  * ATTRIBUTION — last-touch revenue attribution: every purchase credits
    the user's most recent preceding click's channel (else 'direct').
    Same union-then-window carry as q_join_asof (temporal.py:65), finished
    by a channel-grain decimal revenue rollup.

All three share the determinism rules in registry.py: total window orders
(ts, event_id), decimal money aggregation, explicit survivor rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

# The funnel's step sequence over the events table's type vocabulary
# (view/click/purchase/signup/error — TESTDATA.md).
FUNNEL_STEPS = ("view", "click", "purchase")

# Channel derivation for attribution: the synthetic props column is a JSON
# object {"k": <int>}; k mod 4 buckets clicks into four stable channels.
N_CHANNELS = 4


@query(
    "q_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), s1 AS (
      SELECT *,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER w AS view_ts
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s2 AS (
      SELECT *,
             min(CASE WHEN event_type = 'click' AND view_ts IS NOT NULL
                      THEN ts END) OVER w AS click_ts
      FROM s1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s3 AS (
      SELECT *,
             min(CASE WHEN event_type = 'purchase' AND click_ts IS NOT NULL
                      THEN ts END) OVER w AS purchase_ts
      FROM s2
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), per_user AS (
      SELECT user_id, min(view_ts) AS view_ts, min(click_ts) AS click_ts,
             min(purchase_ts) AS purchase_ts
      FROM s3 GROUP BY user_id
    ), tot AS (
      SELECT CAST(count(*) FILTER (WHERE view_ts IS NOT NULL) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE click_ts IS NOT NULL) AS BIGINT) AS n2,
             CAST(count(*) FILTER (WHERE purchase_ts IS NOT NULL) AS BIGINT) AS n3
      FROM per_user
    )
    SELECT 1 AS stage, 'view' AS step, n1 AS n_users FROM tot
    UNION ALL SELECT 2, 'click', n2 FROM tot
    UNION ALL SELECT 3, 'purchase', n3 FROM tot
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view → click → purchase.

    A user reaches stage k when a step-k event occurs strictly after (in the
    total order (ts, event_id)) some event that completed stage k-1 — the
    standard product-analytics "ordered funnel" semantics, deterministic
    because the order is total.

    Plan shape: one hash(user_id) exchange feeds THREE chained Window
    operators (same partitioning + ordering ⇒ one sort) AND the per-user
    aggregate (co-partitioned). The final 3-row stage summary is
    metadata-scale."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        e.withColumn(
            "view_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & F.col("view_ts").isNotNull(),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("click_ts").isNotNull(),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("view_ts").alias("view_ts"),
        F.min("click_ts").alias("click_ts"),
        F.min("purchase_ts").alias("purchase_ts"),
    )
    tot = per_user.agg(
        F.count(F.col("view_ts")).alias("n1"),
        F.count(F.col("click_ts")).alias("n2"),
        F.count(F.col("purchase_ts")).alias("n3"),
    )
    # 3-row unpivot of a 1-row frame: metadata-scale, not a data-scale stack
    return tot.selectExpr(
        "stack(3, 1, 'view', n1, 2, 'click', n2, 3, 'purchase', n3) "
        "AS (stage, step, n_users)"
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), c AS (
      SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort_day
      FROM ud
    )
    SELECT cohort_day, CAST(d - cohort_day AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM c
    GROUP BY cohort_day, day_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted at each day-offset they return.

    Scale posture: collapse to day grain FIRST — the distinct (user, day)
    set is bounded by users × days regardless of raw event volume, so the
    min-over-user window never sees event-scale rows. count(*) at the end
    IS distinct users because (user, day) is unique by construction."""
    ud = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .distinct()
    )
    c = ud.withColumn(
        "cohort_day", F.min("d").over(Window.partitionBy("user_id"))
    )
    return c.groupBy(
        F.col("cohort_day"), F.datediff("d", "cohort_day").alias("day_offset")
    ).agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_attribution",
    oracle=f"""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
             value,
             CAST(json_extract(props, '$.k') AS INT) % {N_CHANNELS} AS ch
      FROM events
    ), u AS (
      SELECT user_id, ts, event_id, 1 AS is_probe, value,
             NULL::INT AS click_ch
      FROM e WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 0, NULL, ch
      FROM e WHERE event_type = 'click'
    ), lv AS (
      SELECT user_id, is_probe, value,
             last_value(click_ch IGNORE NULLS) OVER w AS attr_ch
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT COALESCE('ch' || CAST(attr_ch AS VARCHAR), 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS revenue
    FROM lv WHERE is_probe = 1
    GROUP BY 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most recent
    preceding click's channel; purchases with no prior click are 'direct'.

    Channel = json k mod {N_CHANNELS} (the synthetic props payload). Same
    union-then-window carry as the as-of join (temporal.py:65) — ONE
    hash(user_id) exchange, total tie order (ts, is_probe, event_id) with
    equal-ts clicks sorting BEFORE the purchase (inclusive boundary) — then
    a channel-grain decimal revenue rollup (registry.py rule 1)."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        (F.get_json_object("props", "$.k").cast("int") % N_CHANNELS).alias("ch"),
    )
    probe = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("is_probe"),
        "value",
        F.lit(None).cast("int").alias("click_ch"),
    )
    build = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("double").alias("value"),
        F.col("ch").alias("click_ch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = probe.unionByName(build).select(
        "is_probe",
        "value",
        F.last("click_ch", ignorenulls=True).over(w).alias("attr_ch"),
    )
    return (
        carried.filter(F.col("is_probe") == 1)
        .groupBy(
            F.coalesce(
                F.concat(F.lit("ch"), F.col("attr_ch").cast("string")),
                F.lit("direct"),
            ).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


ROLLING_DAYS = 7  # trailing window width for rolling active users


@query(
    "q_rolling_active_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), days AS (
      SELECT DISTINCT d FROM ud
    ), contrib AS (
      SELECT DISTINCT u.user_id, u.d + CAST(x.i AS INTEGER) AS rd
      FROM ud u CROSS JOIN
           (SELECT unnest(generate_series(0, {ROLLING_DAYS - 1})) AS i) x
    )
    SELECT c.rd AS report_day,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS active_users_7d
    FROM contrib c JOIN days dy ON c.rd = dy.d
    GROUP BY 1
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLLING_DAYS}-day active users per observed day (the WAU
    curve): each report day counts distinct users with any activity in its
    trailing {ROLLING_DAYS}-day window.

    Sliding distinct-count windows have no mergeable exact form, so the
    scalable exact pattern is CONTRIBUTION EXPLODE: collapse to distinct
    (user, day) FIRST (bounded by users x days, map-side combined), fan
    each row out to the ≤{ROLLING_DAYS} report days it can influence
    (bounded explode — never a range join, which would BNLJ), keep only
    observed report days via a broadcast of the calendar-scale day list,
    then one exact count-distinct per report day. Shuffle volume is
    {ROLLING_DAYS} x the user-day frame — independent of raw event count.
    (The approximate twin at larger windows is q_hll_rollup's mergeable
    sketches; this is the exact-answer path.)"""
    ud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        )
        .distinct()
    )
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", ROLLING_DAYS - 1))).alias(
            "rd"
        ),
    )
    return (
        contrib.join(F.broadcast(days), contrib["rd"] == days["d"])
        .groupBy(F.col("rd").alias("report_day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           CAST((1000000::HUGEINT * n_transitions)
                // SUM(n_transitions) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_ppm
    FROM c
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    counts and floor-ppm probabilities for every (from_type → to_type) pair.

    The per-user successor comes from ONE hash(user_id) exchange (lead over
    the total order (ts, event_id) — the same sort the funnel reuses); the
    pair count is a map-side-combined hash agg, and the probability
    normalization window runs over the |types|² ≈ 25-row result —
    metadata-scale. Probabilities are integer floor-ppm ((1e6·n) div total),
    never a FP division, so the result is bit-identical across engines and
    partitionings."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
    )
    c = (
        s.filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    return c.withColumn(
        "p_ppm",
        # 1e6·transition-count passes int64 near 1e13 events — decimal(38,0)/
        # HUGEINT per the q_crosstab_chi2 width rule
        F.expr(
            "(1000000 * cast(n_transitions as decimal(38,0)))"
            " div sum(n_transitions) over (partition by from_type)"
        ).cast("bigint"),
    ).select("from_type", "to_type", "n_transitions", "p_ppm")


@query(
    "q_user_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), r AS (
      SELECT user_id, d,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM ud
    ), islands AS (
      SELECT user_id, d - CAST(rn AS INTEGER) AS anchor,
             count(*) AS streak_len
      FROM r GROUP BY 1, 2
    ), best AS (
      SELECT user_id, max(streak_len) AS best_streak FROM islands GROUP BY 1
    )
    SELECT CAST(best_streak AS BIGINT) AS streak_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM best GROUP BY 1
    """,
)
def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-islands),
    reported as a streak-length histogram (streak_days → n_users).

    Day-grain collapse FIRST (the retention trick — the window never sees
    event-scale rows), then the classic island key d − row_number(): days of
    one unbroken run share an anchor date. Everything after the distinct is
    one hash(user_id) exchange (window + both user-keyed aggs co-partition);
    the histogram is metadata-scale. All arithmetic is date/int exact."""
    ud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        )
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    islands = (
        ud.withColumn("anchor", F.date_sub(F.col("d"), rn))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    best = islands.groupBy("user_id").agg(F.max("streak_len").alias("best_streak"))
    return best.groupBy(F.col("best_streak").alias("streak_days")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


def _rfm_quartile_sql(col: str, tag: str) -> str:
    return ", ".join(
        f"quantile_disc({col}, {q}) AS {tag}{i}"
        for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
    )


@query(
    "q_rfm_segmentation",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             max(CAST(date_trunc('day', o_orderdate) AS DATE)) AS last_d,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS mon_cents
      FROM orders GROUP BY 1
    ), anch AS (
      SELECT max(last_d) AS anchor FROM cust
    ), r AS (
      SELECT c.*, CAST(anch.anchor - c.last_d AS BIGINT) AS rec_days
      FROM cust c CROSS JOIN anch
    ), b AS (
      SELECT {_rfm_quartile_sql("rec_days", "r")},
             {_rfm_quartile_sql("freq", "f")},
             {_rfm_quartile_sql("mon_cents", "m")}
      FROM r
    ), s AS (
      SELECT r.mon_cents,
             4 - (CAST(rec_days > r1 AS INT) + CAST(rec_days > r2 AS INT)
                  + CAST(rec_days > r3 AS INT)) AS r_score,
             1 + CAST(freq > f1 AS INT) + CAST(freq > f2 AS INT)
               + CAST(freq > f3 AS INT) AS f_score,
             1 + CAST(mon_cents > m1 AS INT) + CAST(mon_cents > m2 AS INT)
               + CAST(mon_cents > m3 AS INT) AS m_score
      FROM r CROSS JOIN b
    )
    SELECT 'R' || CAST(r_score AS VARCHAR) || 'F' || CAST(f_score AS VARCHAR)
             || 'M' || CAST(m_score AS VARCHAR) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(mon_cents) AS BIGINT) AS monetary_cents
    FROM s GROUP BY 1
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the canonical CRM behavior model: score
    every customer 1-4 on Recency (days since last order, 4 = most recent),
    Frequency (order count) and Monetary (lifetime revenue), then report
    segment sizes and revenue.

    Scores come from quartile BOUNDARIES (percentile_disc actual data
    values, the q_outlier_mad convention), broadcast back as a 1-row frame:
    score = 1 + #boundaries strictly below — a pure projection. A global
    ntile(4) would be the naive formulation and a SinglePartition sort over
    every customer; boundary comparison keeps ties deterministic (equal
    values always land in the same bucket — ntile splits them by position)
    AND removes the global sort. Data-scale work is ONE customer-grain agg
    over orders; the quartile agg runs on the customer frame (the exact
    anchor — approx_percentile is the 100 TB fast path), and the segment
    rollup is ≤64 rows. Revenue is exact decimal cents throughout."""
    cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.to_date(F.date_trunc("day", F.col("o_orderdate")))
            ).alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("mon_cents"),
        )
        # three consumers (anchor, quartile boundaries, scores) — pin the
        # customer-grain frame once (the q_graph_triangles lesson) or Spark
        # re-runs the orders scan + agg for each
        .localCheckpoint()
    )
    anch = cust.agg(F.max("last_d").alias("anchor"))
    r = cust.crossJoin(F.broadcast(anch)).select(
        "mon_cents",
        "freq",
        F.datediff(F.col("anchor"), F.col("last_d")).cast("bigint").alias(
            "rec_days"
        ),
    )
    b = r.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})"
            ).alias(f"{tag}{i}")
            for col, tag in (
                ("rec_days", "r"),
                ("freq", "f"),
                ("mon_cents", "m"),
            )
            for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def score(col: str, tag: str):
        hits = sum(
            F.when(F.col(col) > F.col(f"{tag}{i}"), 1).otherwise(0)
            for i in (1, 2, 3)
        )
        return (4 - hits) if tag == "r" else (1 + hits)

    s = r.crossJoin(F.broadcast(b)).select(
        "mon_cents",
        score("rec_days", "r").alias("r_score"),
        score("freq", "f").alias("f_score"),
        score("mon_cents", "m").alias("m_score"),
    )
    return s.groupBy(
        F.concat(
            F.lit("R"),
            F.col("r_score").cast("string"),
            F.lit("F"),
            F.col("f_score").cast("string"),
            F.lit("M"),
            F.col("m_score").cast("string"),
        ).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("mon_cents").cast("bigint").alias("monetary_cents"),
    )


@query(
    "q_cohort_ltv",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS m_idx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ), coh AS (
      SELECT o_custkey, min(m_idx) AS cohort FROM om GROUP BY 1
    ), cm AS (
      SELECT c.cohort, CAST(o.m_idx - c.cohort AS INT) AS month_offset,
             SUM(o.cents) AS rev_cents
      FROM om o JOIN coh c USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT cohort, month_offset, CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY month_offset
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
             AS cum_ltv_cents
    FROM cm
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    month, revenue at each month offset, and the cumulative LTV curve per
    cohort — the revenue twin of q_retention_cohorts (that one counts
    users; finance asks for the money).

    Months are integer indices (year·12+month) so offsets are exact int
    subtraction (months_between returns fractional doubles). Scale shape:
    collapse orders to (customer, month) grain FIRST (map-side combined);
    each customer's cohort is a customer-keyed min over a column-pruned
    second scan (custkey + orderdate only — pushdown-asserted pattern)
    that joins back BROADCAST at this scale (billions of customers would
    flip it to a co-partitioned SMJ — both sides key on custkey, so no
    extra exchange either way); then the (cohort, offset) rollup and the
    cumulative window run on the cohort×offset triangle —
    calendar²-bounded, metadata-scale. Revenue is exact decimal cents."""
    om = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("m_idx"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    coh = om.groupBy("o_custkey").agg(F.min("m_idx").alias("cohort"))
    cm = (
        om.join(coh, "o_custkey")
        .groupBy(
            "cohort", (F.col("m_idx") - F.col("cohort")).cast("int").alias("month_offset")
        )
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cm.select(
        "cohort",
        "month_offset",
        F.col("rev_cents").cast("bigint").alias("rev_cents"),
        F.sum("rev_cents").over(w).cast("bigint").alias("cum_ltv_cents"),
    )


@query(
    "q_funnel_latency",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY 1
    ), conv AS (
      SELECT (epoch_us(p) - epoch_us(v)) // 1000000 AS lat_s
      FROM per_user WHERE v IS NOT NULL AND p IS NOT NULL AND p > v
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converts,
           CAST(min(lat_s) AS BIGINT) AS min_s,
           CAST(quantile_disc(lat_s, 0.5) AS BIGINT) AS p50_s,
           CAST(quantile_disc(lat_s, 0.9) AS BIGINT) AS p90_s,
           CAST(max(lat_s) AS BIGINT) AS max_s
    FROM conv
    """,
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency profile: for users whose first purchase follows
    their first view, the seconds between the two — count, min, exact
    median, p90 and max. The companion metric to q_funnel (that one counts
    conversions; growth asks how LONG they take).

    ONE user-keyed conditional-min aggregate (map-side combined — no
    window, no join), then integer microsecond subtraction floored to
    whole seconds (epoch_us both engines; nonneg — p > v — so `div` ≡
    `//`) and exact percentile_disc over the converts frame (the
    q_outlier_mad convention and its cost honesty: exact percentiles
    are the anchor, sketches are the 100 TB fast path)."""
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "p"
            ),
        )
    )
    conv = per_user.filter(
        F.col("v").isNotNull() & F.col("p").isNotNull() & (F.col("p") > F.col("v"))
    ).select(
        F.expr("(unix_micros(p) - unix_micros(v)) div 1000000").alias("lat_s")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converts"),
        F.min("lat_s").cast("bigint").alias("min_s"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_s)")
        .cast("bigint")
        .alias("p50_s"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_s)")
        .cast("bigint")
        .alias("p90_s"),
        F.max("lat_s").cast("bigint").alias("max_s"),
    )


PATH_LEN = 5  # leading event types kept per session path
PATH_TOPN = 20

from finegourmet_spark.operators.temporal import SESSION_GAP_US  # noqa: E402
# single-sourced with q_sessionize so the two session definitions can't drift


@query(
    "q_session_paths",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN us - lag(us) OVER w > {SESSION_GAP_US} OR
                          lag(us) OVER w IS NULL
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS sno
      FROM flagged
    ), paths AS (
      SELECT array_to_string(
               (list(event_type ORDER BY us, event_id))[1:{PATH_LEN}], '>')
               AS path
      FROM sess GROUP BY user_id, sno
    ), counted AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INT)
             AS rank,
           path, n_sessions
    FROM counted
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOPN}
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the top-{PATH_TOPN} most common leading event
    sequences (first {PATH_LEN} event types per 30-minute-gap session,
    joined 'view>click>…') — the product-analytics 'user flows' report,
    built on the same sessionization as q_sessionize (temporal.py).

    One hash(user_id) exchange carries the gap-flag window, the running
    session number AND the per-session path collect (co-partitioned); the
    path string is a sorted-struct collect (the q_string_agg determinism
    rule — collect_list alone is partition-order-nondeterministic) sliced
    to {PATH_LEN} entries, so per-group memory is bounded by session
    length. The path histogram and rank run on the distinct-path frame."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sno",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    paths = sess.groupBy("user_id", "sno").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("us", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                PATH_LEN,
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    top = counted.orderBy(F.col("n_sessions").desc(), "path").limit(PATH_TOPN)
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"), "path", "n_sessions"
    )


FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # conversion deadline: 24h from first view


@query(
    "q_funnel_windowed",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
             event_type
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), s1 AS (
      SELECT *,
             min(CASE WHEN event_type = 'view' THEN us END) OVER w AS v_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s2 AS (
      SELECT *,
             min(CASE WHEN event_type = 'click' AND v_us IS NOT NULL
                      AND us <= v_us + {FUNNEL_WINDOW_US}
                      THEN us END) OVER w AS c_us
      FROM s1
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s3 AS (
      SELECT *,
             min(CASE WHEN event_type = 'purchase' AND c_us IS NOT NULL
                      AND us <= v_us + {FUNNEL_WINDOW_US}
                      THEN us END) OVER w AS p_us
      FROM s2
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), per_user AS (
      SELECT user_id, min(v_us) AS v_us, min(c_us) AS c_us, min(p_us) AS p_us
      FROM s3 GROUP BY 1
    ), tot AS (
      SELECT CAST(count(v_us) AS BIGINT) AS n1,
             CAST(count(c_us) AS BIGINT) AS n2,
             CAST(count(p_us) AS BIGINT) AS n3
      FROM per_user
    )
    SELECT 1 AS stage, 'view' AS step, n1 AS n_users,
           CAST(1000000 AS BIGINT) AS conv_ppm FROM tot
    UNION ALL SELECT 2, 'click', n2,
           CAST(CASE WHEN n1 = 0 THEN 0
                ELSE (1000000 * n2) // n1 END AS BIGINT) FROM tot
    UNION ALL SELECT 3, 'purchase', n3,
           CAST(CASE WHEN n1 = 0 THEN 0
                ELSE (1000000 * n3) // n1 END AS BIGINT) FROM tot
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED ordered funnel (the ClickHouse windowFunnel /
    Amplitude 'conversion window' semantics, anchored): view → click →
    purchase where every later stage must land within 24h of the user's
    FIRST view. q_funnel answers 'did they ever convert'; this answers
    'did they convert while the intent was live' — the number growth
    teams actually quote, with per-stage conversion in floor-ppm.

    Same single-exchange plan as q_funnel (three chained min-over-prefix
    windows + co-partitioned per-user reduction); the deadline is one
    integer-µs comparison inside each window's CASE, so the plan shape is
    unchanged. The anchored (first-view) deadline keeps the semantics
    deterministic and window-expressible — a per-chain sliding deadline
    (restart the clock at every view) needs the sessionize machinery
    instead, which is what q_session_paths exercises."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id", "event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        e.withColumn(
            "v_us",
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
        )
        .withColumn(
            "c_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & F.col("v_us").isNotNull()
                    & (F.col("us") <= F.col("v_us") + FUNNEL_WINDOW_US),
                    F.col("us"),
                )
            ).over(w),
        )
        .withColumn(
            "p_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("c_us").isNotNull()
                    & (F.col("us") <= F.col("v_us") + FUNNEL_WINDOW_US),
                    F.col("us"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("v_us").alias("v_us"),
        F.min("c_us").alias("c_us"),
        F.min("p_us").alias("p_us"),
    )
    tot = per_user.agg(
        F.count("v_us").alias("n1"),
        F.count("c_us").alias("n2"),
        F.count("p_us").alias("n3"),
    )
    return tot.selectExpr(
        "stack(3,"
        " 1, 'view', n1, cast(1000000 as bigint),"
        " 2, 'click', n2,"
        "    cast(if(n1 = 0, 0, (1000000 * n2) div n1) as bigint),"
        " 3, 'purchase', n3,"
        "    cast(if(n1 = 0, 0, (1000000 * n3) div n1) as bigint))"
        " AS (stage, step, n_users, conv_ppm)"
    )


@query(
    "q_order_gaps",
    oracle="""
    WITH o AS (
      SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             o_orderkey
      FROM orders
    ), gaps AS (
      SELECT CAST(d - lag(d) OVER (PARTITION BY o_custkey
                                   ORDER BY d, o_orderkey) AS BIGINT) AS gap_days
      FROM o
    )
    SELECT gap_days, CAST(count(*) AS BIGINT) AS n_gaps
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
)
def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap histogram: days between a customer's consecutive
    orders (total order (day, orderkey) — same-day reorders are 0-day
    gaps), rolled up corpus-wide — the purchase-cadence profile behind
    replenishment and churn-risk models (a customer 3× past their modal
    gap is drifting).

    ONE hash(o_custkey) exchange for the lag window; the histogram agg is
    map-side combined and gap-cardinality-bounded. Pure date/int
    arithmetic."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.select(
        F.datediff(F.col("d"), F.lag("d").over(w)).cast("bigint").alias("gap_days")
    )
    return (
        gaps.filter(F.col("gap_days").isNotNull())
        .groupBy("gap_days")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


AB_SALT = "exp1"  # experiment id mixed into the assignment hash


@query(
    "q_ab_experiment",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN ascii(substring(md5('{AB_SALT}' ||
                    CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT v.variant, c.converted
      FROM (VALUES ('A'), ('B')) v(variant),
           (VALUES (0), (1)) c(converted)
    ), cells AS (
      SELECT g.variant, g.converted,
             CAST(count(a.user_id) AS HUGEINT) AS o
      FROM grid g
      LEFT JOIN assign a ON a.variant = g.variant
                        AND a.converted = g.converted AND a.exposed = 1
      GROUP BY 1, 2
    ), rows_ AS (SELECT variant, SUM(o) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT converted, SUM(o) AS cl FROM cells GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM cells),
    chi AS (
      SELECT ce.variant,
             SUM(CASE WHEN r.r * cl.cl = 0 THEN 0
                 ELSE (1000000 * (t.n * ce.o - r.r * cl.cl)
                               * (t.n * ce.o - r.r * cl.cl))
                      // (t.n * r.r * cl.cl) END) AS chi2_ppm
      FROM cells ce
      JOIN rows_ r USING (variant) JOIN cols_ cl USING (converted)
      CROSS JOIN tot t GROUP BY 1
    )
    SELECT a.variant,
           CAST(count(*) AS BIGINT) AS n_exposed,
           CAST(SUM(a.converted) AS BIGINT) AS n_converted,
           CAST((1000000 * SUM(a.converted)) // count(*) AS BIGINT)
             AS conv_ppm,
           CAST(min(c.chi2_ppm) AS BIGINT) AS chi2_ppm
    FROM assign a JOIN chi c USING (variant)
    WHERE a.exposed = 1
    GROUP BY 1
    """,
)
def q_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned to
    variants (md5 of salt+user_id — the cross-engine-stable assignment
    q_split_train_eval's key arithmetic established; the salt is the
    experiment id, so concurrent experiments get independent splits),
    exposure = any view, conversion = any purchase; per-variant conversion
    in floor-ppm plus each variant's share of the 2×2 chi-square
    independence statistic (q_crosstab_chi2's cleared-denominator integer
    form — the significance screen before anyone trusts the lift).

    Scale shape: ONE user-keyed conditional-max aggregate (map-side
    combined — assignment is a projection of the group key, not a join);
    everything after runs on the 2×2 cell frame — metadata-scale."""
    assign = (
        t(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.when(
                F.ascii(
                    F.substring(
                        F.md5(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))),
                        1,
                        1,
                    )
                )
                % 2
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("variant"),
        )
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "exposed"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
        .filter(F.col("exposed") == 1)
    )
    # complete the 2×2 grid before the chi² pass: an unobserved cell (no
    # converts in a variant) still contributes (R·C/N in expectation), and
    # a ZERO marginal would divide by zero — guarded to 0 (the standard
    # drop-empty-expectation convention), identically in both engines
    grid = spark.createDataFrame(
        [(v, c) for v in ("A", "B") for c in (0, 1)], "variant string, converted int"
    )
    cells = (
        grid.join(assign, ["variant", "converted"], "left")
        .groupBy("variant", "converted")
        .agg(F.count("user_id").cast("decimal(38,0)").alias("o"))
    )
    rows_ = cells.groupBy("variant").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("converted").agg(F.sum("o").alias("cl"))
    tot = cells.agg(F.sum("o").alias("n"))
    chi = (
        cells.join(rows_, "variant")
        .join(cols_, "converted")
        .crossJoin(F.broadcast(tot))
        .groupBy("variant")
        .agg(
            F.sum(
                F.expr(
                    "case when r * cl = 0 then 0 else"
                    " (1000000 * (n * o - r * cl) * (n * o - r * cl))"
                    " div (n * r * cl) end"
                )
            ).alias("chi2_ppm")
        )
    )
    return (
        assign.groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_exposed"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.expr("(1000000 * sum(converted)) div count(*)")
            .cast("bigint")
            .alias("conv_ppm"),
        )
        .join(chi, "variant")
        .select(
            "variant",
            "n_exposed",
            "n_converted",
            "conv_ppm",
            F.col("chi2_ppm").cast("bigint").alias("chi2_ppm"),
        )
    )


MAU_DAYS = 28  # trailing window for the stickiness denominator


@query(
    "q_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    ), contrib AS (
      SELECT DISTINCT u.user_id, u.d + CAST(x.i AS INTEGER) AS rd
      FROM ud u,
           (SELECT unnest(generate_series(0, {MAU_DAYS - 1})) AS i) x
    ), mau AS (
      SELECT c.rd, CAST(count(DISTINCT c.user_id) AS BIGINT) AS mau
      FROM contrib c JOIN days dy ON c.rd = dy.d GROUP BY 1
    )
    SELECT dau.d AS report_day, dau.dau, mau.mau,
           CAST((1000000 * dau.dau) // mau.mau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN mau ON mau.rd = dau.d
    """,
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness curve: per observed day, daily actives over
    trailing-{MAU_DAYS}-day actives in floor-ppm — THE canonical
    engagement ratio (a 200k-DAU product with 1M MAU is 'sticky 20%').

    Both counts are EXACT: DAU is the day-grain distinct collapse; MAU
    reuses the q_rolling_active_users contribution explode (each
    user-day fans to the ≤{MAU_DAYS} report days it influences — bounded
    explode, never a sliding distinct window), joined on the observed-day
    spine. The ratio is integer floor-ppm; DAU ≤ MAU by construction so
    it lands in (0, 1e6]."""
    ud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        )
        .distinct()
    )
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", MAU_DAYS - 1))).alias(
            "rd"
        ),
    )
    mau = (
        contrib.join(F.broadcast(days), contrib["rd"] == days["d"])
        .groupBy("rd")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, dau["d"] == mau["rd"])
        .select(
            F.col("d").alias("report_day"),
            "dau",
            "mau",
            F.expr("(1000000 * dau) div mau").cast("bigint").alias(
                "stickiness_ppm"
            ),
        )
    )


@query(
    "q_bitmap_distinct_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT monthly distinct users per event type via mergeable Roaring-style
    bitmaps (Spark 3.5+ ``bitmap_*`` built-ins) — the Snowflake/ClickHouse
    pattern for exact COUNT(DISTINCT) that still rolls up.

    Why it matters at 100 TB: a plain count-distinct re-shuffles the RAW
    user ids at every rollup grain, and sketches (q_hll_rollup) trade
    exactness for mergeability. Bitmaps give BOTH: the day grain reduces
    each (type, day, bucket) group to one fixed-width bitmap (map-side
    combined), the month grain merges day bitmaps with bitmap_or_agg —
    a pure OR, associative and re-aggregatable like any sketch — and
    bitmap_count reads off the EXACT cardinality. Shuffle volume after the
    first agg is bitmaps, never ids; a week/quarter/year rollup would reuse
    the same day-level bitmaps unchanged.

    The bucket column (bitmap_bucket_number) shards the id space so each
    bitmap spans a bounded range — cardinality per group is then
    Σ buckets bitmap_count, summed in the final metadata-scale agg.

    Oracle = plain exact COUNT(DISTINCT): the bitmap path must reproduce it
    bit-for-bit, which is the whole claim."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        "user_id",
    )
    day = ev.groupBy(
        "event_type",
        "d",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    month = day.groupBy(
        "event_type",
        F.trunc("d", "month").alias("month_start"),
        "bkt",
    ).agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
    return month.groupBy("event_type", "month_start").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("distinct_users")
    )


FC_HORIZON = 7  # days forecast past the last observed day
# Monday anchor for the engine-portable weekday: weekday = (d − 1970-01-05)
# mod 7 — pure date arithmetic, avoiding the dayofweek/isodow convention
# mismatch between engines (Spark Sunday=1, DuckDB isodow Monday=1).
# Domain assumption: dates ≥ 1970-01-05 (both engines' % takes the dividend's
# sign, so a pre-epoch date would land in a negative residue class; here the
# residue is only used as an opaque join/group key over post-1970 order
# dates, so the bare `% 7` form is correct — predicates that RANGE-compare
# the residue must use the non-negative form, see temporal.EPOCH_MONDAY).
FC_EPOCH_MONDAY = "1970-01-05"


@query(
    "q_seasonal_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), wk AS (
      SELECT event_type,
             (d - DATE '{FC_EPOCH_MONDAY}') % 7 AS wd,
             CAST(SUM(cents) // count(*) AS BIGINT) AS mean_cents
      FROM daily GROUP BY 1, 2
    ), last_ AS (
      SELECT event_type, MAX(d) AS dmax FROM daily GROUP BY 1
    ), future AS (
      SELECT l.event_type, l.dmax + CAST(g.i AS INTEGER) AS fd
      FROM last_ l
      CROSS JOIN (SELECT unnest(generate_series(1, {FC_HORIZON})) AS i) g
    )
    SELECT f.event_type, f.fd AS forecast_day, w.mean_cents AS forecast_cents
    FROM future f
    JOIN wk w ON w.event_type = f.event_type
             AND w.wd = (f.fd - DATE '{FC_EPOCH_MONDAY}') % 7
    """,
)
def q_seasonal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive revenue forecast: the next FC_HORIZON days per event
    type, each day predicted as the historical mean of its weekday's daily
    revenue (the same-day-last-weeks forecaster — the standard baseline
    every fancier model must beat, and the shape of a production forecast
    feature pipeline: per-key seasonal index + calendar spine).

    Integer-exact: daily revenue collapses to decimal→cents, the weekday
    mean is one floor division of two longs (nonneg, so Spark div ==
    DuckDB //), and the weekday key is (d − epoch-Monday) mod 7 — pure
    date subtraction, immune to the engines' dayofweek convention split.
    Weekdays never observed for a type yield no forecast row (inner join,
    documented).

    Scale shape: one day-grain collapse (map-side combined; bounded by
    types × days), then everything downstream — weekday index, per-type
    max day, ×FC_HORIZON spine explode, fusion join — is calendar/type
    scale, broadcastable metadata."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    wd = (F.datediff(F.col("d"), F.lit(FC_EPOCH_MONDAY).cast("date")) % 7).alias(
        "wd"
    )
    wk = daily.groupBy("event_type", wd).agg(
        F.expr("sum(cents) div count(*)").cast("bigint").alias("mean_cents")
    )
    future = (
        daily.groupBy("event_type")
        .agg(F.max("d").alias("dmax"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.date_add("dmax", 1), F.date_add("dmax", FC_HORIZON))
            ).alias("fd"),
        )
    )
    fwd = (F.datediff(F.col("fd"), F.lit(FC_EPOCH_MONDAY).cast("date")) % 7).alias(
        "fwd"
    )
    sel = future.select("event_type", "fd", fwd)
    return (
        sel.join(
            F.broadcast(wk),
            on=[
                sel["event_type"] == wk["event_type"],
                sel["fwd"] == wk["wd"],
            ],
        )
        .select(
            sel["event_type"],
            F.col("fd").alias("forecast_day"),
            F.col("mean_cents").alias("forecast_cents"),
        )
    )


AOV_A = "view"  # audience A event type
AOV_B = "purchase"  # audience B event type


@query(
    "q_bitmap_audience_overlap",
    oracle=f"""
    WITH base AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month_start,
             event_type, user_id
      FROM events WHERE event_type IN ('{AOV_A}', '{AOV_B}')
    )
    SELECT month_start,
           CAST(count(DISTINCT user_id)
                FILTER (WHERE event_type = '{AOV_A}') AS BIGINT) AS n_a,
           CAST(count(DISTINCT user_id)
                FILTER (WHERE event_type = '{AOV_B}') AS BIGINT) AS n_b,
           CAST(count(DISTINCT user_id)
                FILTER (WHERE event_type = '{AOV_A}') AS BIGINT)
           + CAST(count(DISTINCT user_id)
                  FILTER (WHERE event_type = '{AOV_B}') AS BIGINT)
           - CAST(count(DISTINCT user_id) AS BIGINT) AS n_both,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_either
    FROM base GROUP BY 1
    """,
)
def q_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT monthly audience overlap — viewers ∩ purchasers — via
    mergeable bitmaps: the set-expression report (|A|, |B|, |A∩B|,
    |A∪B|) behind every audience/segment dashboard, computed without
    ever re-shuffling raw user ids.

    Per (month, bucket) one pass builds BOTH audience bitmaps with
    FILTERed bitmap_construct_agg; |A∪B| is the bitmap_count of their
    per-bucket OR-merge (F.bitmap_or_agg over the conditional bitmaps
    after stacking would lose pairing, so the union bitmap is built
    directly from the unfiltered positions), and the intersection comes
    by inclusion–exclusion |A∩B| = |A| + |B| − |A∪B| — every term exact,
    no scalar bitmap-AND needed. The oracle is three filtered exact
    COUNT(DISTINCT)s. Extends q_bitmap_distinct_rollup from one-set
    cardinality to set algebra; the same day→month re-aggregation
    property holds because OR-merge is associative."""
    base = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(AOV_A, AOV_B)
    ).select(
        F.to_date(F.date_trunc("month", F.col("ts"))).alias("month_start"),
        "event_type",
        "user_id",
    )
    bkt = base.groupBy(
        "month_start", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr(
            f"bitmap_construct_agg(bitmap_bit_position(user_id))"
            f" FILTER (WHERE event_type = '{AOV_A}')"
        ).alias("bm_a"),
        F.expr(
            f"bitmap_construct_agg(bitmap_bit_position(user_id))"
            f" FILTER (WHERE event_type = '{AOV_B}')"
        ).alias("bm_b"),
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm_u"
        ),
    )
    return (
        bkt.groupBy("month_start")
        .agg(
            F.sum(F.expr("bitmap_count(bm_a)")).cast("bigint").alias("n_a"),
            F.sum(F.expr("bitmap_count(bm_b)")).cast("bigint").alias("n_b"),
            F.sum(F.expr("bitmap_count(bm_u)")).cast("bigint").alias("n_either"),
        )
        .select(
            "month_start",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_either")).alias("n_both"),
            "n_either",
        )
    )


LINATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback in microseconds


@query(
    "q_attribution_linear",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pus,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS cus,
             CAST(json_extract_string(props, '$.k') AS BIGINT) % {N_CHANNELS}
               AS channel
      FROM events WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.pid, p.cents, c.cid, c.channel,
             row_number() OVER (PARTITION BY p.pid ORDER BY c.cus, c.cid)
               AS rnk,
             count(*) OVER (PARTITION BY p.pid) AS n
      FROM p JOIN c ON p.user_id = c.user_id
                   AND c.cus < p.pus
                   AND c.cus >= p.pus - {LINATTR_WINDOW_US}
    ), credited AS (
      SELECT CAST(channel AS VARCHAR) AS channel,
             cents // n + CASE WHEN rnk <= cents % n THEN 1 ELSE 0 END
               AS credit
      FROM pairs
      UNION ALL
      SELECT 'direct', cents FROM p
      WHERE NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = p.user_id
                          AND c.cus < p.pus
                          AND c.cus >= p.pus - {LINATTR_WINDOW_US})
    )
    SELECT channel, CAST(SUM(credit) AS BIGINT) AS credited_cents,
           CAST(count(*) AS BIGINT) AS n_credits
    FROM credited GROUP BY 1
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: every purchase's cents
    divide equally across ALL the user's clicks in the trailing 7 days,
    largest-remainder style (the q_udtf_installments distribution — floor
    share to everyone, +1 cent to the earliest clicks) so each purchase's
    credits sum back to its cents EXACTLY; purchases with no qualifying
    click credit 'direct'. The multi-touch counterpart of last-touch
    q_attribution — last-touch needs only a window carry, linear
    genuinely needs the purchase × prior-clicks pair set.

    Scale shape: ONE user-keyed equi-join produces that pair set —
    fan-out bounded by clicks-per-user-per-week, the same
    bounded-activity argument as q_funnel_windowed, never a cross
    product — then per-purchase rank/count windows ride the SAME
    hash(pid ⊂ user) locality and a channel-grain rollup finishes
    metadata-scale. Time bounds compare integer microseconds
    (epoch_us/unix_micros), no interval-type semantics."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.unix_micros(F.col("ts")).alias("pus"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias(
            "cents"
        ),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cu"),
        F.unix_micros(F.col("ts")).alias("cus"),
        (
            F.get_json_object("props", "$.k").cast("bigint") % N_CHANNELS
        ).alias("channel"),
    )
    pairs = p.join(
        c,
        (p["pu"] == c["cu"])
        & (c["cus"] < p["pus"])
        & (c["cus"] >= p["pus"] - LINATTR_WINDOW_US),
    )
    wp = Window.partitionBy("pid")
    ranked = pairs.select(
        "pid",
        "cents",
        "channel",
        F.row_number().over(wp.orderBy("cus", "cid")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    credited = ranked.select(
        F.col("channel").cast("string").alias("channel"),
        (
            F.expr("cents div n")
            + F.when(F.col("rnk") <= F.expr("cents % n"), 1).otherwise(0)
        ).alias("credit"),
    )
    direct = (
        p.join(
            c,
            (p["pu"] == c["cu"])
            & (c["cus"] < p["pus"])
            & (c["cus"] >= p["pus"] - LINATTR_WINDOW_US),
            "left_anti",
        )
        .select(F.lit("direct").alias("channel"), F.col("cents").alias("credit"))
    )
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.sum("credit").cast("bigint").alias("credited_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        )
    )


# Event-type → single-char alphabet for the pattern-match sequence
CEP_INITIALS = {"view": "v", "click": "c", "purchase": "p",
                "signup": "s", "error": "e"}
CEP_FUNNEL_RE = "v.*c.*p"  # ordered-funnel as a regex over the sequence
CEP_RUN_RE = "vc+p"  # tight view→clicks→purchase runs


@query(
    "q_event_pattern_match",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                  WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                  ELSE 'e' END AS i
      FROM events
    ), seqs AS (
      SELECT user_id,
             string_agg(i, '' ORDER BY ts, event_id) AS seq
      FROM e GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE regexp_matches(seq, '{CEP_FUNNEL_RE}'))
                AS BIGINT) AS n_funnel_users,
           CAST(SUM(len(regexp_extract_all(seq, '{CEP_RUN_RE}'))) AS BIGINT)
             AS total_tight_runs,
           CAST(MAX(length(seq)) AS BIGINT) AS max_seq_len
    FROM seqs
    """,
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing via regex over per-user event sequences —
    MATCH_RECOGNIZE-lite: each user's events compress to a one-char-per-
    event string in the total (ts, event_id) order, and patterns become
    plain regexes (ordered funnel = 'v.*c.*p'; tight runs = 'vc+p'
    counted per user with regexp_count). The full-sequence regex answers
    questions the chained-window funnel can't express cheaply
    (non-greedy runs, counts of repeated motifs) at the cost of
    materializing the per-user sequence — bounded by events-per-user,
    the q_session_paths bound, and built with the same
    sort_array(collect_list(struct)) discipline (deterministic, ONE
    user-keyed exchange). Final reduction is a 1-row summary.

    Oracle: DuckDB ordered string_agg + regexp_matches /
    regexp_extract_all over identical sequences."""
    mapping = F.create_map(
        *[F.lit(x) for kv in CEP_INITIALS.items() for x in kv]
    )
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        # coalesce mirrors the oracle's CASE ... ELSE 'e': an event_type
        # outside CEP_INITIALS must map to 'e', not NULL (array_join would
        # silently drop a NULL char and the engines would diverge — r3 ADVICE)
        F.coalesce(mapping[F.col("event_type")], F.lit("e")).alias("i"),
    )
    seqs = (
        e.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "i"))
            ).alias("evs")
        )
        .select(
            F.array_join(F.expr("transform(evs, x -> x.i)"), "").alias("seq")
        )
    )
    return seqs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count(F.when(F.col("seq").rlike(CEP_FUNNEL_RE), 1))
        .cast("bigint")
        .alias("n_funnel_users"),
        F.sum(F.expr(f"regexp_count(seq, '{CEP_RUN_RE}')"))
        .cast("bigint")
        .alias("total_tight_runs"),
        F.max(F.length("seq")).cast("bigint").alias("max_seq_len"),
    )


# ---------------------------------------------------------------------------
# Round-4 wave 32: set-completion (unordered) funnel
# ---------------------------------------------------------------------------

UFUNNEL_STEPS = ["view", "click", "purchase"]


@query(
    "q_funnel_unordered",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = '{UFUNNEL_STEPS[0]}' THEN 1 ELSE 0 END)
               AS has_view,
             MAX(CASE WHEN event_type = '{UFUNNEL_STEPS[1]}' THEN 1 ELSE 0 END)
               AS has_click,
             MAX(CASE WHEN event_type = '{UFUNNEL_STEPS[2]}' THEN 1 ELSE 0 END)
               AS has_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(has_view) AS BIGINT) AS n_view,
           CAST(SUM(has_view * has_click) AS BIGINT) AS n_view_click,
           CAST(SUM(has_view * has_click * has_purchase) AS BIGINT)
             AS n_all_three,
           CAST(SUM(CASE WHEN has_purchase = 1 AND has_view = 0 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_purchase_no_view
    FROM per_user
    """,
)
def q_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-COMPLETION funnel: which users performed each step set in ANY
    order — the companion to the ordered funnel (q_funnel requires
    view→click→purchase as a subsequence; this only requires membership).
    The gap between the two IS the insight (how many buyers never saw the
    ordered path), surfaced here directly as n_purchase_no_view. One
    user-keyed map-side-combined rollup of boolean flags, then a 1-row
    reduction — no sequence materialization, no windows, the cheapest
    funnel money can buy at 100 TB."""
    flags = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("event_type") == s, 1).otherwise(0)
                ).alias(f"has_{s}")
                for s in UFUNNEL_STEPS
            ]
        )
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("has_view").cast("bigint").alias("n_view"),
        F.sum(F.col("has_view") * F.col("has_click"))
        .cast("bigint")
        .alias("n_view_click"),
        F.sum(F.col("has_view") * F.col("has_click") * F.col("has_purchase"))
        .cast("bigint")
        .alias("n_all_three"),
        F.sum(
            F.when((F.col("has_purchase") == 1) & (F.col("has_view") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_purchase_no_view"),
    )
