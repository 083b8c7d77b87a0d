"""Event-time operators Spark lacks as built-ins: as-of join, range
(interval) join, sessionization — each expressed as a composition of
DataFrame ops with a scale-safe shuffle shape (no per-key loops, no
cross products, no Python in the row path).

The reference engine family exposes these as native operators; on Spark the
right formulations are:

  * AS-OF JOIN  — the union-then-window trick: tag probe/build rows, union,
    one window partitioned by the join key ordered by (ts, tag, id), and a
    `last(ignorenulls)` carries the most recent build attributes forward to
    each probe row. ONE shuffle on the key; never a per-row lookup. (Same
    algorithm pandas.merge_asof runs per-group, distributed.)
  * RANGE JOIN — equi-join on (key, time-bucket) with the probe side
    exploded to the buckets its interval can reach, then an exact residual
    filter. Bounded fan-out (interval/bucket + 1 copies), co-partitioned
    shuffle; Catalyst alone would pick BroadcastNestedLoopJoin or a
    cross-product for a pure theta join.
  * SESSIONIZE  — gap-based session ids per user: lag → gap flag →
    running sum, all inside one user-partitioned window stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

RANGE_WINDOW_US = 300_000_000  # 5 minutes, in microseconds
SESSION_GAP_US = 1_800_000_000  # 30 minutes


@query(
    "q_join_asof",
    oracle="""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
      FROM events
    ), u AS (
      SELECT user_id, ts, event_id AS probe_id,
             NULL::BIGINT AS bld_id, NULL::DOUBLE AS bld_value, 1 AS is_probe
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, NULL, event_id, value, 0
      FROM e WHERE event_type = 'purchase'
    ), lv AS (
      SELECT user_id, ts, probe_id, is_probe,
             last_value(bld_id IGNORE NULLS) OVER w AS purchase_id,
             last_value(bld_value IGNORE NULLS) OVER w AS purchase_value,
             last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER w
               AS purchase_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, is_probe, COALESCE(bld_id, probe_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT probe_id AS click_id, user_id, ts AS click_ts,
           purchase_id, purchase_value, purchase_ts
    FROM lv WHERE is_probe = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click is joined to the user's most recent purchase
    at-or-before it (left as-of — clicks with no prior purchase keep NULLs).

    Union-then-window: ONE shuffle on user_id; the window order
    (ts, is_probe, event_id) is total, so ties (same-timestamp events, or a
    purchase exactly at the click time) resolve deterministically —
    equal-ts purchases sort BEFORE the click (is_probe 0 < 1), i.e. the
    boundary is inclusive; equal-ts purchases resolve to the highest
    event_id."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    probe = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("long").alias("bld_id"),
        F.lit(None).cast("double").alias("bld_value"),
        F.lit(1).alias("is_probe"),
    )
    build = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("probe_id"),
        F.col("event_id").alias("bld_id"),
        F.col("value").alias("bld_value"),
        F.lit(0).alias("is_probe"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", F.coalesce("bld_id", "probe_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = probe.unionByName(build).select(
        "user_id",
        "ts",
        "probe_id",
        "is_probe",
        F.last("bld_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.last("bld_value", ignorenulls=True).over(w).alias("purchase_value"),
        F.last(F.when(F.col("is_probe") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("purchase_ts"),
    )
    return carried.filter(F.col("is_probe") == 1).select(
        F.col("probe_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        "purchase_id",
        "purchase_value",
        "purchase_ts",
    )


@query(
    "q_join_range",
    oracle=f"""
    WITH e AS (
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, user_id, event_type
      FROM events
    )
    SELECT a.event_id AS error_id, b.event_id AS click_id, a.user_id,
           a.us - b.us AS gap_us
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND a.event_type = 'error' AND b.event_type = 'click'
     AND b.us BETWEEN a.us - {RANGE_WINDOW_US} AND a.us
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval) join: every click by the same user in the 5 minutes
    before an error — the "what led up to this?" query.

    Scale shape: both sides bucket time at the window width; the ERROR side
    explodes to the two buckets its lookback interval spans, the click side
    keeps its single bucket, and the join is an EQUI-join on
    (user_id, bucket) with an exact residual range filter. Each matching
    pair meets in exactly one bucket (the click's), so no dedup pass is
    needed. Fan-out is bounded at 2× the probe side; a pure theta join
    would be a per-user cross product."""
    e = t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us"), "user_id", "event_type"
    )
    bucket = (F.col("us") / F.lit(RANGE_WINDOW_US)).cast("long")
    err = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("us").alias("err_us"),
            "user_id",
            F.explode(F.array(bucket - 1, bucket)).alias("bucket"),
        )
    )
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("us").alias("clk_us"),
        "user_id",
        bucket.alias("bucket"),
    )
    return (
        err.join(clk, ["user_id", "bucket"])
        .filter(
            (F.col("clk_us") >= F.col("err_us") - F.lit(RANGE_WINDOW_US))
            & (F.col("clk_us") <= F.col("err_us"))
        )
        .select(
            "error_id",
            "click_id",
            "user_id",
            (F.col("err_us") - F.col("clk_us")).alias("gap_us"),
        )
    )


@query(
    "q_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, user_id
      FROM events
    ), flagged AS (
      SELECT event_id, user_id, us,
             CASE WHEN us - lag(us) OVER w > {SESSION_GAP_US} OR
                       lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sessions AS (
      SELECT event_id, user_id, us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           MIN(us) AS session_start_us,
           MAX(us) - MIN(us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user session ids from a 30-minute
    inactivity gap — lag → new-session flag → running sum, one shuffle on
    user_id, everything else window-local. (The streaming twin is
    q_stream_session's native session window; this is the backfill/batch
    path over historical events.) Output is one row per session."""
    e = t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us"), "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "event_id",
        "user_id",
        "us",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.select(
        "user_id",
        "us",
        F.sum("is_new").over(wsum).cast("bigint").alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("session_start_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@query(
    "q_timeseries_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             SUM(CAST(floor(value * 100) AS BIGINT)) AS c
      FROM events
      WHERE event_type = 'purchase' AND user_id % 2 = 0
      GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ), spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
      FROM spans
    ), j AS (
      SELECT s.user_id, s.h, hr.c
      FROM spine s LEFT JOIN hourly hr USING (user_id, h)
    ), w AS (
      SELECT user_id, h, c,
             last_value(c IGNORE NULLS) OVER wb AS pc,
             last_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
               OVER wb AS ph,
             first_value(c IGNORE NULLS) OVER wf AS nc,
             first_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
               OVER wf AS nh
      FROM j
      WINDOW wb AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h AS hour,
           CAST(CASE WHEN c IS NOT NULL THEN c
                ELSE (pc * datediff('hour', h, nh) + nc * datediff('hour', ph, h))
                     // datediff('hour', ph, nh)
                END AS BIGINT) AS cents,
           (c IS NULL) AS interpolated
    FROM w
    """,
)
def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly purchase-revenue series per user with LINEAR INTERPOLATION of
    missing hours — the hypertable `interpolate()`/`time_bucket_gapfill`
    verb (reference family: continuous-aggregate gap fill), distributed.

    Pipeline: hour-grain decimal-free totals (integer cents via
    floor(value·100) — exact in both engines) → per-user hour spine
    (sequence/explode, bounded by the user's own observed span, never a
    global calendar cross-product) → LOCF carry (last ignorenulls) and
    next-observation carry (first ignorenulls over the forward frame) →
    integer linear interpolation.

    Cross-engine exactness: the interpolated value is
    (prev·(nh−h) + next·(h−ph)) ÷ (nh−ph) in integer arithmetic; the
    numerator is nonnegative (cents ≥ 0), so Spark's truncating `div` and
    DuckDB's flooring `//` agree — the negative-operand divergence between
    the two engines (BASELINE.md round-3 notes) can't occur by
    construction.

    Scale shape: ONE hash(user_id) exchange carries the hourly frame
    through the spine join and both windows (all user-partitioned); the
    spine explode fans out to span-hours per user, linear in output size.
    The even-user sample keeps the driver compare at tens of k rows — the
    operator itself has no scale-dependent constant."""
    hourly = (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0))
        .groupBy(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("c"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    j = spine.join(hourly, ["user_id", "h"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = j.select(
        "user_id",
        "h",
        "c",
        F.last("c", ignorenulls=True).over(wb).alias("pc"),
        F.last(F.when(F.col("c").isNotNull(), F.col("h")), ignorenulls=True)
        .over(wb)
        .alias("ph"),
        F.first("c", ignorenulls=True).over(wf).alias("nc"),
        F.first(F.when(F.col("c").isNotNull(), F.col("h")), ignorenulls=True)
        .over(wf)
        .alias("nh"),
    )
    return carried.select(
        "user_id",
        F.col("h").alias("hour"),
        F.when(F.col("c").isNotNull(), F.col("c"))
        .otherwise(
            F.expr(
                "(pc * timestampdiff(HOUR, h, nh) + nc * timestampdiff(HOUR, ph, h)) "
                "div timestampdiff(HOUR, ph, nh)"
            )
        )
        .cast("bigint")
        .alias("cents"),
        F.col("c").isNull().alias("interpolated"),
    )


# Trailing-EWMA window width and the power-of-two weight of the most recent
# day (w_j = 2^(EWMA_DAYS-1-j) for lag j — halving weights, integer-exact).
EWMA_DAYS = 7


@query(
    "q_concurrency_peak",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderpriority AS pri,
             CAST(date_trunc('day', o.o_orderdate) AS DATE) AS open_d,
             CAST(date_trunc('day', s.ship_max) AS DATE) + 1 AS close_d
      FROM orders o
      JOIN (SELECT l_orderkey, max(l_shipdate) AS ship_max
            FROM lineitem GROUP BY 1) s
        ON s.l_orderkey = o.o_orderkey
    ), deltas AS (
      SELECT pri, open_d AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT pri, close_d, -1 FROM iv
    ), g AS (
      SELECT pri, d, SUM(delta) AS delta FROM deltas GROUP BY 1, 2
    ), r AS (
      SELECT pri, d,
             SUM(delta) OVER (PARTITION BY pri ORDER BY d) AS inflight
      FROM g
    ), ranked AS (
      SELECT pri, d, inflight,
             row_number() OVER (PARTITION BY pri
                                ORDER BY inflight DESC, d) AS rk
      FROM r
    )
    SELECT pri AS o_orderpriority, CAST(inflight AS BIGINT) AS peak_inflight,
           d AS peak_day
    FROM ranked WHERE rk = 1
    """,
)
def q_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders per priority class — the interval-overlap
    maximum (orders count as open from order day through their last lineitem
    ship day, inclusive).

    The sweep-line formulation that scales: intervals become ±1 boundary
    deltas, collapsed per (priority, day) BEFORE the running sum, so the
    prefix-sum window runs over ≤ priorities × days rows — bounded by the
    calendar, not the order count. Data-scale work is the per-order
    max-shipdate agg and its orderkey-co-keyed join with orders; the
    (inflight DESC, day) rank picks the earliest peak day deterministically.
    Never materializes the O(N²) overlap pairs a naive theta join would."""
    ship = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_max"))
    )
    iv = (
        t(spark, sf_dir, "orders")
        .join(ship, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("open_d"),
            F.date_add(
                F.to_date(F.date_trunc("day", F.col("ship_max"))), 1
            ).alias("close_d"),
        )
    )
    deltas = iv.select(
        "pri", F.col("open_d").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select("pri", F.col("close_d").alias("d"), F.lit(-1).alias("delta"))
    )
    g = deltas.groupBy("pri", "d").agg(F.sum("delta").alias("delta"))
    run = Window.partitionBy("pri").orderBy("d")
    r = g.withColumn("inflight", F.sum("delta").over(run))
    rk = Window.partitionBy("pri").orderBy(F.col("inflight").desc(), F.col("d"))
    return (
        r.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.col("inflight").cast("bigint").alias("peak_inflight"),
            F.col("d").alias("peak_day"),
        )
    )


@query(
    "q_ewma_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS pri,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1, 2
    ), contrib AS (
      SELECT pri, d + CAST(x.j AS INTEGER) AS rd,
             (1 << ({EWMA_DAYS - 1} - x.j)) * rev_cents AS wrev,
             (1 << ({EWMA_DAYS - 1} - x.j)) AS w
      FROM daily,
           (SELECT unnest(generate_series(0, {EWMA_DAYS - 1})) AS j) x
    ), agg AS (
      SELECT pri, rd, SUM(wrev) AS num, SUM(w) AS den
      FROM contrib GROUP BY 1, 2
    )
    SELECT d.pri AS o_orderpriority, d.d,
           CAST(d.rev_cents AS BIGINT) AS rev_e4,
           CAST(a.num // a.den AS BIGINT) AS ewma_e4
    FROM daily d JOIN agg a ON a.pri = d.pri AND a.rd = d.d
    """,
)
def q_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-true trailing EWMA of daily revenue per order priority:
    report day t averages the revenues of days t−j (j < {EWMA_DAYS}) with
    weight 2^({EWMA_DAYS}−1−j) — a CALENDAR day with no orders contributes
    nothing to numerator or denominator (a row-based lag formulation would
    silently compress gaps and weight a weeks-old observation as
    yesterday's; caught in self-review).

    Same contribution-explode pattern as q_rolling_active_users: each
    (priority, day) revenue fans out to the ≤{EWMA_DAYS} report days it can
    influence (bounded explode — never a range join), the per-report-day
    weighted sums are one co-keyed agg, and observed report days are kept
    by the equi-join back to the daily spine. Integer-exact end to end:
    exact decimal daily sums in 1e-4 units, power-of-two int64 weights,
    floor division. Scale: everything after the first map-side-combined
    (priority, day) collapse is calendar-bounded."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 10000)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    contrib = (
        daily.withColumn(
            "j", F.explode(F.sequence(F.lit(0), F.lit(EWMA_DAYS - 1)))
        )
        .select(
            "pri",
            F.date_add(F.col("d"), F.col("j")).alias("rd"),
            F.expr(f"shiftleft(1, {EWMA_DAYS - 1} - j)")
            .cast("bigint")
            .alias("w"),
            "rev_cents",
        )
    )
    agg = contrib.groupBy(
        F.col("pri").alias("apri"), F.col("rd")
    ).agg(
        F.sum(F.col("w") * F.col("rev_cents")).alias("num"),
        F.sum("w").alias("den"),
    )
    return daily.join(
        agg, (F.col("pri") == F.col("apri")) & (F.col("rd") == F.col("d"))
    ).select(
        F.col("pri").alias("o_orderpriority"),
        "d",
        F.col("rev_cents").cast("bigint").alias("rev_e4"),
        F.expr("num div den").cast("bigint").alias("ewma_e4"),
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour, ts, event_id,
             value
      FROM events
    ), f AS (
      SELECT event_type, bar_hour, value,
             first_value(value) OVER w AS open,
             last_value(value) OVER w AS close
      FROM e
      WINDOW w AS (PARTITION BY event_type, bar_hour ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bar_hour,
           min(open) AS open,
           max(value) AS high,
           min(value) AS low,
           min(close) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume,
           CAST(count(*) AS BIGINT) AS n_events
    FROM f GROUP BY 1, 2
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open-high-low-close) bars per event type — the
    time-series downsampling verb every metrics/finance engine exposes as a
    native rollup.

    Open/close are the values at the total-order (ts, event_id) endpoints
    of each bar, carried by first_value/last_value over ONE full-frame
    window (one sort per (type, hour) partition); high/low/volume/count
    come from the hash agg that co-partitions with it. Volume goes through
    the decimal-cast sum (money.py rule 1) so the double total is
    order-independent. The min(open)/min(close) in the final agg collapse a
    per-partition constant — no second sort."""
    w = (
        Window.partitionBy("event_type", "bar_hour")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "ts",
        "event_id",
        "value",
    )
    f = e.select(
        "event_type",
        "bar_hour",
        "value",
        F.first("value").over(w).alias("open"),
        F.last("value").over(w).alias("close"),
    )
    return f.groupBy("event_type", "bar_hour").agg(
        F.min("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min("close").alias("close"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_e2
      FROM events
    ), iv AS (
      SELECT user_id, v_e2,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS span_us,
           CAST(CAST(SUM(v_e2 * dt_us) AS BIGINT) // CAST(SUM(dt_us) AS BIGINT)
                AS BIGINT) AS twa_e2
    FROM iv WHERE dt_us IS NOT NULL GROUP BY 1
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user under last-observation-
    carried-forward (the hypertable `time_weight(\'LOCF\')` verb): each
    observation counts for the microseconds until the user\'s next event,
    and the average is the LOCF step-function integral over the user\'s
    span.

    Pure int64 end to end — value in 1e-2 units (exact decimal(18,2) cast,
    the shared HALF_UP semantics), durations in epoch microseconds, floor
    division at the end (nonnegative operands ⇒ Spark `div` == DuckDB
    `//`). Wide-decimal arithmetic is deliberately avoided: DuckDB silently
    degrades >38-digit decimal products to DOUBLE, which cost an off-by-one
    here in development. Overflow bound: Σ v·dt ≤ max(v_e2)·span_us —
    ~1.5e17 for this data, int64-safe independent of event COUNT (the sum
    telescopes over the span); re-scale durations to ms if a deployment\'s
    value·span exceeds ~9e18. One user-keyed exchange serves the lead
    window and the per-user agg; single-event users have no interval and
    are excluded by definition."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v_e2"),
    )
    iv = e.select(
        "user_id",
        "v_e2",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias(
            "dt_us"
        ),
    ).filter(F.col("dt_us").isNotNull())
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.sum(F.col("v_e2") * F.col("dt_us")).cast("bigint").alias("wsum"),
        )
        .select(
            "user_id",
            "n_intervals",
            "span_us",
            F.expr("wsum div span_us").cast("bigint").alias("twa_e2"),
        )
    )


CUSUM_K = 4  # flag days where |cusum of n-scaled deviations| > K·mean|dev|·n


@query(
    "q_cusum_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    ), c AS (
      SELECT d, rev_cents,
             count(*) OVER () * rev_cents - SUM(rev_cents) OVER () AS dev_n
      FROM daily
    ), r AS (
      SELECT d, rev_cents, dev_n,
             SUM(dev_n) OVER (ORDER BY d) AS cusum_n,
             SUM(abs(dev_n)) OVER () // count(*) OVER () AS mean_abs_dev
      FROM c
    )
    SELECT d, rev_cents, CAST(cusum_n AS BIGINT) AS cusum_n,
           abs(cusum_n) > {CUSUM_K} * mean_abs_dev AS drifted
    FROM r
    """,
)
def q_cusum_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection on daily revenue — the change-point screen of
    the monitoring family: accumulate deviations from the series mean and
    flag days where the running sum exceeds {CUSUM_K}× the mean absolute
    deviation (a sustained shift integrates; day-level noise cancels).

    Division-free deviations via the n-scaling trick (q_outlier_zscore's):
    dev_n = n·x − Σx is exact integer and may go NEGATIVE — safe, because
    the only divisions (mean |dev|, the threshold) have nonnegative
    operands, where Spark's truncating `div` equals DuckDB's flooring `//`;
    the cusum itself is pure addition. Magnitudes stay in int64: at sf1,
    n·x ≈ 4e13 and the worst-case cusum ≈ 7e15. Scale shape: one
    map-side-combined day collapse, then every window runs over the
    calendar-bounded daily frame — metadata-scale."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = daily.select(
        "d",
        "rev_cents",
        (
            F.count(F.lit(1)).over(everything) * F.col("rev_cents")
            - F.sum("rev_cents").over(everything)
        ).alias("dev_n"),
    )
    r = c.select(
        "d",
        "rev_cents",
        F.sum("dev_n").over(Window.orderBy("d")).alias("cusum_n"),
        F.expr("sum(abs(dev_n)) over () div count(*) over ()").alias(
            "mean_abs_dev"
        ),
    )
    return r.select(
        "d",
        "rev_cents",
        F.col("cusum_n").cast("bigint").alias("cusum_n"),
        (F.abs(F.col("cusum_n")) > CUSUM_K * F.col("mean_abs_dev")).alias(
            "drifted"
        ),
    )


ACF_MAX_LAG = 7  # autocorrelation lags reported by q_autocorr_lag


@query(
    "q_autocorr_lag",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), idx AS (
      SELECT x, row_number() OVER (ORDER BY d) AS i,
             CAST(count(*) OVER () * x - SUM(x) OVER () AS HUGEINT) AS c
      FROM daily
    ), den AS (
      SELECT SUM(c * c) AS den FROM idx
    ), pairs AS (
      SELECT k.k, a.c * b.c AS prod
      FROM (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS k) k
      JOIN idx a ON TRUE
      JOIN idx b ON b.i = a.i + k.k
    ), num AS (
      SELECT k, SUM(prod) AS num, CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS INT) AS lag, n_pairs,
           CAST(CASE WHEN num >= 0 THEN (1000000 * num) // den
                ELSE -((1000000 * -num) // den) END AS BIGINT) AS r_ppm
    FROM num CROSS JOIN den
    """,
)
def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..{ACF_MAX_LAG} autocorrelation of the daily event-count series
    — the seasonality probe of the time-series family (a weekly cycle shows
    up as a lag-7 peak).

    The estimator r_k = Σ(x_t−μ)(x_t+k−μ) / Σ(x_t−μ)² is made integer-exact
    by clearing μ = S/n through n-scaling: c_t = n·x_t − S, giving
    r_k = Σ c_t·c_t+k / Σ c_t² with every term an exact integer. Products
    reach ~4e18 at sf1 (past int64's comfort) so they ride decimal(38,0) /
    HUGEINT like q_crosstab_chi2. Numerators go NEGATIVE, and Spark `div`
    truncates while DuckDB `//` floors — so the ppm ratio is computed as
    sign·((1e6·|num|) div den), which both engines agree on. Scale shape:
    one map-side-combined day collapse; the lag self-join and every window
    run over the calendar-bounded daily frame — metadata-scale."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("i"),
        (
            F.count(F.lit(1)).over(everything) * F.col("x")
            - F.sum("x").over(everything)
        )
        .cast("decimal(38,0)")
        .alias("c"),
    )
    den = idx.agg(F.sum(F.col("c") * F.col("c")).alias("den"))
    ks = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = idx.select(F.col("i"), F.col("c").alias("ca")).crossJoin(F.broadcast(ks))
    b = idx.select(F.col("i").alias("j"), F.col("c").alias("cb"))
    pairs = a.join(b, F.col("j") == F.col("i") + F.col("k"))
    num = pairs.groupBy("k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("num"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("k").alias("lag"),
            "n_pairs",
            F.when(
                F.col("num") >= 0, F.expr("(1000000 * num) div den")
            )
            .otherwise(-F.expr("(1000000 * -num) div den"))
            .cast("bigint")
            .alias("r_ppm"),
        )
    )


ROLL_MED_DAYS = 7  # trailing window width for the rolling median


@query(
    "q_rolling_median",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), days AS (SELECT d FROM daily),
    contrib AS (
      SELECT daily.d + CAST(x.j AS INTEGER) AS rd, daily.cents
      FROM daily,
           (SELECT unnest(generate_series(0, {ROLL_MED_DAYS - 1})) AS j) x
    )
    SELECT c.rd AS report_day,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(quantile_disc(c.cents, 0.5) AS BIGINT) AS med_cents
    FROM contrib c JOIN days dy ON c.rd = dy.d
    GROUP BY 1
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {ROLL_MED_DAYS}-day rolling MEDIAN of daily revenue — the
    robust smoother dashboards want where a rolling mean chases outlier
    days. Exact sliding medians have no mergeable incremental form, so the
    scalable exact pattern is the q_rolling_active_users contribution
    explode: collapse to day grain FIRST (map-side combined, exact decimal
    cents), fan each day's value to the ≤{ROLL_MED_DAYS} report days it
    influences (bounded explode — never a range join), keep observed days
    via a broadcast of the calendar-scale day list, then one exact
    percentile_disc per report day over ≤{ROLL_MED_DAYS} values. Shuffle
    volume is {ROLL_MED_DAYS}× the calendar frame — independent of order
    count."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    days = daily.select("d")
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add("d", ROLL_MED_DAYS - 1))
        ).alias("rd"),
        "cents",
    )
    return (
        contrib.join(F.broadcast(days), contrib["rd"] == days["d"])
        .groupBy(F.col("rd").alias("report_day"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
            .cast("bigint")
            .alias("med_cents"),
        )
    )


@query(
    "q_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01'
                  AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), pairs AS (
      SELECT CASE WHEN b.y >= a.y
                  THEN (1000000 * (b.y - a.y)) // (b.x - a.x)
                  ELSE -((1000000 * (a.y - b.y)) // (b.x - a.x)) END AS s
      FROM daily a JOIN daily b ON b.x > a.x
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(quantile_disc(s, 0.5) AS BIGINT) AS slope_e6_per_day
    FROM pairs
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily event-count series: the median
    of all pairwise slopes — the estimator that shrugs off the outlier
    days a least-squares fit pivots on (and, unlike OLS, needs no FP
    sums-of-squares).

    Each pairwise slope is integer micro-units via sign-split floor
    division ((1e6·Δy) div Δx with Δy's sign factored out — Spark `div`
    truncates, DuckDB `//` floors, they agree only on nonneg operands:
    the q_autocorr_lag rule); the median is exact percentile_disc.
    Scale shape: the day-grain collapse is the only event-scale work; the
    pairwise self-join is calendar²-bounded (≤ days² rows — ~80k pairs
    for a year), i.e. metadata-scale by construction, NOT an O(N²) blowup
    over events."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))), F.lit("1970-01-01")
            )
            .cast("bigint")
            .alias("x")
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("xb") > F.col("xa")).select(
        F.when(
            F.col("yb") >= F.col("ya"),
            F.expr("(1000000 * (yb - ya)) div (xb - xa)"),
        )
        .otherwise(-F.expr("(1000000 * (ya - yb)) div (xb - xa)"))
        .alias("s")
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY s)")
            .cast("bigint")
            .alias("slope_e6_per_day"),
        )
        .crossJoin(F.broadcast(n_days))
        .select("n_days", "n_pairs", "slope_e6_per_day")
    )


@query(
    "q_ols_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(date_trunc('day', o_orderdate) AS DATE)
                  - DATE '1970-01-01' AS BIGINT) AS xd,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS y
      FROM orders GROUP BY 1
    ), zeroed AS (
      SELECT CAST(xd - min(xd) OVER () AS HUGEINT) AS x,
             CAST(y AS HUGEINT) AS y
      FROM daily
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM zeroed
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(CASE WHEN n * sxy - sx * sy >= 0
                THEN (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                ELSE -((1000000 * (sx * sy - n * sxy))
                       // (n * sxx - sx * sx)) END AS BIGINT)
             AS slope_e6_cents_per_day
    FROM s
    """,
)
def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares revenue trend — the classical counterpart to
    q_theil_sen's robust slope (report both; a large gap between them IS
    the outlier diagnostic): slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with
    every moment an exact integer.

    x is re-based to days-from-series-start (epoch-day x would push nΣxy
    past 1e20); even re-based, products reach ~1e18-1e19 at sf1, so the
    moments ride decimal(38,0)/HUGEINT (the q_crosstab_chi2 rule). The
    numerator goes negative on a declining series → sign-split floor
    division (the q_autocorr_lag rule). Scale shape: one
    map-side-combined day collapse; the re-base window and the moment
    aggregate run on the calendar-bounded daily frame."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("o_orderdate"))),
                F.lit("1970-01-01"),
            )
            .cast("bigint")
            .alias("xd")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("y")
        )
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    zeroed = daily.select(
        (F.col("xd") - F.min("xd").over(everything))
        .cast("decimal(38,0)")
        .alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    s = zeroed.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.when(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy") >= 0,
            F.expr(
                "(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
            ),
        )
        .otherwise(
            -F.expr("(1000000 * (sx * sy - n * sxy)) div (n * sxx - sx * sx)")
        )
        .cast("bigint")
        .alias("slope_e6_cents_per_day"),
    )


@query(
    "q_growth_rates",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    ), lagged AS (
      SELECT month_start, rev_cents,
             lag(rev_cents) OVER (ORDER BY month_start) AS prev_cents,
             lag(rev_cents, 12) OVER (ORDER BY month_start) AS yoy_cents
      FROM m
    )
    SELECT month_start, rev_cents, prev_cents,
           CAST(CASE WHEN prev_cents IS NULL THEN NULL
                WHEN rev_cents >= prev_cents
                  THEN (1000000::HUGEINT * (rev_cents - prev_cents))
                       // prev_cents
                ELSE -((1000000::HUGEINT * (prev_cents - rev_cents))
                       // prev_cents)
           END AS BIGINT) AS mom_growth_ppm,
           CAST(CASE WHEN yoy_cents IS NULL THEN NULL
                WHEN rev_cents >= yoy_cents
                  THEN (1000000::HUGEINT * (rev_cents - yoy_cents))
                       // yoy_cents
                ELSE -((1000000::HUGEINT * (yoy_cents - rev_cents))
                       // yoy_cents)
           END AS BIGINT) AS yoy_growth_ppm
    FROM lagged
    """,
)
def q_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth in floor-ppm —
    the trend-report verb behind dashboard axis 4 (monthly revenue,
    SURVEY §2C) extended with the deltas an analyst actually reads.

    Sign-split floor division (the q_autocorr_lag rule): growth can be
    negative, and Spark's ``div`` truncates toward zero while DuckDB's
    ``//`` floors — they disagree exactly on negative quotients, so the
    magnitude is floored on the nonnegative side and the sign re-applied,
    making both engines compute the identical integer. NULL for months
    with no comparison point (first month / first year), kept NULL in
    both engines.

    Scale shape: one map-side-combined month collapse (calendar-scale
    output), then the lag windows run on the ≤ |months| frame — the
    global ORDER BY window is metadata-scale by construction, the
    documented exception to the no-SinglePartition rule (same as the
    other calendar-spine ops)."""
    m = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "month_start"
            )
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = Window.orderBy("month_start")
    lagged = m.select(
        "month_start",
        "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_cents"),
        F.lag("rev_cents", 12).over(w).alias("yoy_cents"),
    )

    def signed_ppm(cur: str, base: str) -> F.Column:
        # 1e6 · a-month-of-cents passes int64 near sf1000 — ride
        # decimal(38,0)/HUGEINT (the q_crosstab_chi2 width rule)
        pos = F.expr(
            f"(1000000 * cast(({cur} - {base}) as decimal(38,0))) div {base}"
        )
        neg = -F.expr(
            f"(1000000 * cast(({base} - {cur}) as decimal(38,0))) div {base}"
        )
        return (
            F.when(F.col(base).isNull(), F.lit(None).cast("bigint"))
            .when(F.col(cur) >= F.col(base), pos)
            .otherwise(neg)
        )

    return lagged.select(
        "month_start",
        "rev_cents",
        "prev_cents",
        signed_ppm("rev_cents", "prev_cents").cast("bigint").alias(
            "mom_growth_ppm"
        ),
        signed_ppm("rev_cents", "yoy_cents").cast("bigint").alias(
            "yoy_growth_ppm"
        ),
    )


PIT_WINDOW_DAYS = 90  # trailing feature window (strictly before the order day)


@query(
    "q_pit_features",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             (CAST(date_trunc('day', o_orderdate) AS DATE) - DATE '1970-01-01')
               AS dday,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey,
           CAST(COALESCE(count(*) OVER w, 0) AS BIGINT) AS prior_orders_90d,
           CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT)
             AS prior_rev_cents_90d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY dday
                 RANGE BETWEEN {PIT_WINDOW_DAYS} PRECEDING AND 1 PRECEDING)
    """,
)
def q_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training features (the feature-store correctness
    verb): for every order, the SAME customer's order count and revenue
    over the trailing PIT_WINDOW_DAYS days STRICTLY BEFORE the order's
    day — the leakage-free construction ML training tables need (a
    same-day or later event must never leak into its own feature row;
    the RANGE frame ends at 1 PRECEDING on the day key, so all of the
    current day is excluded and same-day orders see identical features —
    deterministic under ties by construction).

    The frame key is integer days-since-epoch, so the RANGE bound is
    pure integer arithmetic in both engines (no interval-type frame
    semantics to reconcile). Plan shape: ONE customer-keyed exchange
    carries both window aggregates; revenue is exact decimal cents.
    At 100 TB this is the shape that replaces the notorious per-feature
    point-in-time self-join: N features over the same entity key ride
    one sort, one shuffle."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))),
            F.lit("1970-01-01").cast("date"),
        ).alias("dday"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("dday")
        .rangeBetween(-PIT_WINDOW_DAYS, -1)
    )
    return o.select(
        "o_orderkey",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0))
        .cast("bigint")
        .alias("prior_orders_90d"),
        F.coalesce(F.sum("cents").over(w), F.lit(0))
        .cast("bigint")
        .alias("prior_rev_cents_90d"),
    )


COVER_HOLD_DAYS = 14  # each order holds capacity for 14 days from order date


@query(
    "q_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT DISTINCT o_orderpriority AS pri,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS s,
             CAST(date_trunc('day', o_orderdate) AS DATE)
               + {COVER_HOLD_DAYS} AS e
      FROM orders
    ), ordered AS (
      SELECT pri, s, e,
             MAX(e) OVER (PARTITION BY pri ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ), flagged AS (
      SELECT pri, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END AS is_new_island
      FROM ordered
    ), islands AS (
      SELECT pri, s, e,
             SUM(is_new_island) OVER (PARTITION BY pri ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS island
      FROM flagged
    ), merged AS (
      SELECT pri, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY 1, 2
    )
    SELECT pri AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(SUM(me - ms) AS BIGINT) AS covered_days,
           CAST(MAX(me - ms) AS BIGINT) AS longest_span_days
    FROM merged GROUP BY 1
    """,
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union / coverage per key (hypertable `range_agg`): each
    order holds capacity for COVER_HOLD_DAYS days; overlapping holds
    merge into busy spans and the report is spans / total covered days /
    longest span per priority — the interval-UNION twin of
    q_concurrency_peak's sweep-line MAX (peak asks "how many at once",
    coverage asks "how much of the timeline is busy at all").

    Classic gaps-and-islands on intervals: a running MAX(end) over the
    start-ordered frame flags island starts (start > furthest end seen),
    a prefix sum numbers the islands, and a grouped MIN/MAX merges each.
    All three windows + the island rollup ride ONE priority-keyed
    exchange and one sort; arithmetic is integer days end to end."""
    iv = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("s"),
            F.date_add(
                F.to_date(F.date_trunc("day", F.col("o_orderdate"))),
                COVER_HOLD_DAYS,
            ).alias("e"),
        )
        # DISTINCT makes (s, e) a TOTAL order per key: with duplicate
        # intervals at an island boundary, the new-island flag attaches to
        # ONE arbitrary physical peer and peers ordered before it would
        # join the PREVIOUS island — both engines then disagree (found by
        # the sf0.001 oracle compare: covered_days drifted 16 days).
        # Duplicates can't change an interval union, so collapsing them
        # first is both the determinism fix and a frame reduction.
        .distinct()
    )
    w = Window.partitionBy("pri").orderBy("s", "e")
    flagged = iv.select(
        "pri",
        "s",
        "e",
        F.when(
            F.max("e")
            .over(w.rowsBetween(Window.unboundedPreceding, -1))
            .isNull()
            | (
                F.col("s")
                > F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new_island"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = islands.groupBy("pri", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.datediff("me", "ms")).cast("bigint").alias("covered_days"),
        F.max(F.datediff("me", "ms")).cast("bigint").alias("longest_span_days"),
    )


# Monday anchor for the engine-portable weekday (same convention as
# eventflow.FC_EPOCH_MONDAY; duplicated here because eventflow imports
# from this module — a reverse import would cycle). Both engines' `%` takes
# the dividend's sign, so pre-epoch dates need the non-negative form
# ((diff % 7) + 7) % 7 wherever the remainder is compared to a range
# (r3 ADVICE: a bare `% 7 < 5` counts every pre-1970 day as a weekday).
EPOCH_MONDAY = "1970-01-05"


@query(
    "q_business_days_sla",
    oracle=f"""
    WITH fs AS (
      SELECT l_orderkey,
             MIN(CAST(date_trunc('day', l_shipdate) AS DATE)) AS sd
      FROM lineitem GROUP BY 1
    ), lat AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month_start,
             CASE WHEN fs.sd > CAST(date_trunc('day', o.o_orderdate) AS DATE)
             THEN len(list_filter(
                   generate_series(CAST(date_trunc('day', o.o_orderdate)
                                        AS DATE) + 1,
                                   fs.sd, INTERVAL 1 DAY),
                   d -> (((CAST(d AS DATE) - DATE '{EPOCH_MONDAY}') % 7) + 7)
                        % 7 < 5))
             ELSE 0 END AS busdays
      FROM orders o
      JOIN fs ON fs.l_orderkey = o.o_orderkey
    )
    SELECT month_start,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(busdays) // count(*) AS BIGINT) AS avg_busdays,
           CAST(MAX(busdays) AS BIGINT) AS max_busdays
    FROM lat GROUP BY 1
    """,
)
def q_business_days_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day SLA latency: order date → first line's ship date
    measured in WEEKDAYS (the unit ops teams actually promise), per
    order month. The business-day count is a bounded date-range explode
    filtered by the portable weekday — (d − epoch-Monday) mod 7 < 5, the
    q_seasonal_forecast recipe, immune to the engines' dayofweek split —
    kept as a JVM higher-order filter (no row explosion: the sequence
    lives inside one array expression per row, bounded by the ship-lag
    span). Floor-division monthly average (nonneg ⇒ div == //).

    Plan: one co-keyed fact join (orderkey), pure projections, one
    map-side-combined month rollup."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("od"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month_start"
        ),
    )
    # "first ship" = MIN ship date per order — robust to the duplicate
    # (orderkey, linenumber) rows this synthetic data contains (a
    # linenumber=1 filter alone would fan the join out 1:N)
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.min(F.to_date(F.date_trunc("day", F.col("l_shipdate")))).alias(
                "sd"
            )
        )
    )
    # GUARD: this synthetic data contains sd ≤ od rows (min lag −2361 d);
    # Spark's sequence(start, stop) with stop < start silently generates a
    # DESCENDING range while DuckDB's generate_series returns empty — the
    # CASE pins both engines to "0 business days for non-positive lags".
    lat = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "month_start",
        F.when(
            F.col("sd") > F.col("od"),
            F.size(
                F.expr(
                    "filter(sequence(date_add(od, 1), sd),"
                    " d -> ((datediff(d,"
                    f" DATE '{EPOCH_MONDAY}') % 7) + 7) % 7 < 5)"
                )
            ),
        )
        .otherwise(0)
        .alias("busdays"),
    )
    return lat.groupBy("month_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("sum(busdays) div count(*)").cast("bigint").alias("avg_busdays"),
        F.max("busdays").cast("bigint").alias("max_busdays"),
    )


# ---------------------------------------------------------------------------
# Round-4 wave 26: calendar-spine gap fill
# ---------------------------------------------------------------------------

# Sparse weekly series: only every 251st customer's orders, so the weekly
# calendar genuinely has revenue gaps for the zero-fill to prove itself on.
SPINE_CUST_MOD = 251


@query(
    "q_date_spine_fill",
    oracle=f"""
    WITH src AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders WHERE o_custkey % {SPINE_CUST_MOD} = 0
    ), weekly AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM src GROUP BY wk
    ), bounds AS (
      SELECT MIN(wk) AS lo, MAX(wk) AS hi FROM weekly
    ), spine AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 7 DAY)) AS DATE) AS wk
      FROM bounds
    )
    SELECT s.wk AS week_start,
           COALESCE(w.n_orders, 0) AS n_orders,
           COALESCE(w.rev_cents, 0) AS rev_cents,
           w.wk IS NULL AS gap_filled
    FROM spine s LEFT JOIN weekly w ON w.wk = s.wk
    """,
)
def q_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill — the business-report contract that every
    period appears even when it had zero activity (a bare GROUP BY
    silently skips empty weeks and charts lie). A sparse weekly revenue
    series (every 251st customer) joins against a generated continuous
    week spine between its own min/max; missing weeks come back
    zero-filled and flagged.

    Scale shape: the spine generates from a 1-ROW min/max aggregate via
    sequence+explode (never a driver-side loop, never a global
    cross-product — the spine is |weeks| rows, metadata-scale), then one
    broadcast-able left join back to the weekly rollup. Contrast with
    q_timeseries_interpolate, which builds PER-KEY spines inside the
    user partition; this is the single-series/global-report variant."""
    src = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % SPINE_CUST_MOD == 0)
        .select(
            F.to_date(F.date_trunc("week", F.col("o_orderdate"))).alias("wk"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    weekly = src.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )
    bounds = weekly.agg(F.min("wk").alias("lo"), F.max("wk").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 7 days)")
        ).alias("week_start")
    )
    return (
        spine.join(
            weekly, weekly["wk"] == spine["week_start"], "left"
        ).select(
            "week_start",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("rev_cents"), F.lit(0)).cast("bigint").alias("rev_cents"),
            F.col("wk").isNull().alias("gap_filled"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 wave 27: timezone normalization + tolerance-bounded as-of join
# ---------------------------------------------------------------------------

TZ_REPORT_ZONES = ["America/New_York", "Europe/Paris", "Asia/Tokyo"]


@query(
    "q_timezone_normalize",
    oracle=f"""
    WITH zones AS (
      SELECT unnest(['{TZ_REPORT_ZONES[0]}', '{TZ_REPORT_ZONES[1]}',
                     '{TZ_REPORT_ZONES[2]}']) AS tz
    ), localized AS (
      SELECT z.tz,
             CAST(timezone(z.tz, timezone('UTC', e.ts)) AS DATE) AS local_date,
             extract(hour FROM timezone(z.tz, timezone('UTC', e.ts)))
               AS local_hour
      FROM events e CROSS JOIN zones z
    )
    SELECT tz, local_date,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(MIN(local_hour) AS BIGINT) AS first_hour,
           CAST(MAX(local_hour) AS BIGINT) AS last_hour
    FROM localized GROUP BY tz, local_date
    """,
)
def q_timezone_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-normalized daily report: UTC event instants rendered as
    wall-clock time in each business timezone (IANA rules, DST-correct —
    pytest pins the 2024 US spring-forward boundary on constructed
    instants), then the canonical "daily counts by local date" rollup.
    The per-zone date boundaries genuinely differ (Tokyo is +9, New York
    −5: the same UTC instant lands on different local dates), which is
    exactly the discrepancy this op exists to make auditable.

    Cross-engine exactness: Spark `from_utc_timestamp(ts, tz)` ==
    DuckDB `timezone(tz, timezone('UTC', ts))` — the double-application
    form is deliberately session-TZ-independent on the DuckDB side (a bare
    `::TIMESTAMPTZ` would inherit the harness session zone). Both engines
    use the IANA tzdb.

    Scale shape: a 3-row zone explode (bounded constant fan-out), pure
    projections, one map-side-combined rollup keyed (tz, date)."""
    zones = F.array(*[F.lit(z) for z in TZ_REPORT_ZONES])
    localized = (
        t(spark, sf_dir, "events")
        .select("ts", F.explode(zones).alias("tz"))
        .select(
            "tz",
            F.to_date(F.from_utc_timestamp("ts", F.col("tz"))).alias("local_date"),
            F.hour(F.from_utc_timestamp("ts", F.col("tz"))).alias("local_hour"),
        )
    )
    return localized.groupBy("tz", "local_date").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("local_hour").cast("bigint").alias("first_hour"),
        F.max("local_hour").cast("bigint").alias("last_hour"),
    )


ASOF_TOL_HOURS = 2


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
      FROM events
    ), u AS (
      SELECT user_id, ts, event_id AS probe_id,
             NULL::BIGINT AS bld_id, NULL::DOUBLE AS bld_value, 1 AS is_probe
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, NULL, event_id, value, 0
      FROM e WHERE event_type = 'purchase'
    ), lv AS (
      SELECT user_id, ts, probe_id, is_probe,
             last_value(bld_id IGNORE NULLS) OVER w AS purchase_id,
             last_value(bld_value IGNORE NULLS) OVER w AS purchase_value,
             last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER w
               AS purchase_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, is_probe, COALESCE(bld_id, probe_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tol AS (
      SELECT probe_id AS click_id, user_id, ts AS click_ts,
             CASE WHEN purchase_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(purchase_ts)
                       <= CAST({ASOF_TOL_HOURS} AS BIGINT) * 3600 * 1000000
                  THEN purchase_id END AS purchase_id,
             CASE WHEN purchase_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(purchase_ts)
                       <= CAST({ASOF_TOL_HOURS} AS BIGINT) * 3600 * 1000000
                  THEN purchase_value END AS purchase_value
      FROM lv WHERE is_probe = 1
    )
    SELECT click_id, user_id, click_ts, purchase_id, purchase_value,
           purchase_id IS NOT NULL AS within_tolerance
    FROM tol
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join WITH TOLERANCE (pandas merge_asof's `tolerance=` on the
    q_join_asof machinery): each click matches the user's most recent
    purchase only if it happened within the last {2} hours — stale matches
    null out but the click row survives (left semantics). The tolerance
    test compares INTEGER MICROSECONDS (unix_micros vs epoch_us, the
    portable time-bound recipe) — never interval arithmetic.

    Same single user-keyed exchange as q_join_asof; the tolerance is a
    post-window projection, costing nothing extra."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    probe = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("long").alias("bld_id"),
        F.lit(None).cast("double").alias("bld_value"),
        F.lit(1).alias("is_probe"),
    )
    build = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("probe_id"),
        F.col("event_id").alias("bld_id"),
        F.col("value").alias("bld_value"),
        F.lit(0).alias("is_probe"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", F.coalesce("bld_id", "probe_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = probe.unionByName(build).select(
        "user_id",
        "ts",
        "probe_id",
        "is_probe",
        F.last("bld_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.last("bld_value", ignorenulls=True).over(w).alias("purchase_value"),
        F.last(F.when(F.col("is_probe") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("purchase_ts"),
    )
    in_tol = F.col("purchase_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("purchase_ts")
        <= ASOF_TOL_HOURS * 3600 * 1000000
    )
    return carried.filter(F.col("is_probe") == 1).select(
        F.col("probe_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.when(in_tol, F.col("purchase_id")).alias("purchase_id"),
        F.when(in_tol, F.col("purchase_value")).alias("purchase_value"),
        F.when(in_tol, F.col("purchase_id")).isNotNull().alias("within_tolerance"),
    )
