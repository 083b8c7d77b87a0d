"""Event-time windowing: tumbling / sliding / session + stateful dedup.

Two forms of every operator:
  * the **batch-equivalent** registered in the query registry (DuckDB-oracle
    checkable — Spark's `window`/`session_window` work identically in batch);
  * the **streaming** form (`readStream` → `withWatermark` → windowed agg)
    built by the `stream_*` constructors below, smoke-tested in
    tests/test_streaming.py with a file source and availableNow trigger.

No reference precedent (the ref is batch-only, SURVEY.md §2B streaming rows);
this is the Structured-Streaming-native generalization of its event data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.functions.money import SQL_DSUM, dec
from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

# ---------------------------------------------------------------------------
# batch-equivalent forms (oracle-checked)
# ---------------------------------------------------------------------------


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {val} AS total_value
    FROM events
    GROUP BY 1, 2
    """.format(val=SQL_DSUM("value")),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window count/sum per event_type. Same expression
    runs unchanged under readStream + withWatermark (stream_tumbling)."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes")
    return (
        e.groupBy(w, "event_type")
        .agg(F.count("*").alias("n_events"), F.sum(dec("value")).cast("double").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket, value
      FROM events
    ), expanded AS (
      SELECT bucket - INTERVAL (o.off) MINUTE AS window_start, value
      FROM b CROSS JOIN (VALUES (0), (5)) AS o(off)
    )
    SELECT window_start, COUNT(*) AS n_events, {val} AS total_value
    FROM expanded
    GROUP BY window_start
    """.format(val=SQL_DSUM("value")),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): every event lands in
    exactly two windows; the oracle expands the same two starts per event."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(w)
        .agg(F.count("*").alias("n_events"), F.sum(dec("value")).cast("double").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "q_stream_session",
    oracle="""
    WITH evt AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ), ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM evt
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM ordered
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user. Spark's session_window works
    in batch; the oracle is the classic gap-and-islands formulation —
    session_end follows Spark's semantics (last event + gap)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_stream_watermark_dedup",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, ts AS first_ts,
           CAST(value AS DOUBLE) AS first_value
    FROM ranked WHERE rn = 1
    """,
)
def q_stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest event — batch equivalent of
    withWatermark+dropDuplicates (streaming form: stream_dedup). Explicit
    earliest-first survivor rule instead of arbitrary-survivor."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("value").alias("first_value"),
        )
    )


# ---------------------------------------------------------------------------
# true streaming constructors (smoke-tested in tests/test_streaming.py)
# ---------------------------------------------------------------------------

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of JSON-lines events (swap for kafka/rate in prod —
    the downstream plan is source-agnostic)."""
    return spark.readStream.schema(EVENT_SCHEMA).json(path)


def stream_tumbling(events: DataFrame, watermark: str = "20 minutes") -> DataFrame:
    """Tumbling-window counts with late-data handling via watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )


def stream_sliding(events: DataFrame, watermark: str = "20 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def stream_session(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", "20 minutes")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "20 minutes",
    window: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each click joins
    purchases by the same user within [click_ts - window, click_ts]. Both
    sides carry watermarks so Spark can BOUND the join state (unmatched rows
    older than watermark+window are evicted) — without the time bound the
    state grows forever. The batch twin of this shape is
    operators/temporal.py::q_join_range."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("purchase_ts") <= F.col("click_ts")),
    ).select("click_id", "purchase_id", F.col("c_user").alias("user_id"), "click_ts", "purchase_ts", "value")


def stream_dedup(events: DataFrame, watermark: str = "20 minutes") -> DataFrame:
    """Exactly-once event delivery: dedup on event_id ALONE within the
    watermark horizon — a replay with a re-stamped timestamp is still
    dropped (plain dropDuplicates(['event_id','ts']) would pass it through).
    State for ids older than the watermark is evicted (bounded state at
    100 TB/day event volumes)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


@query(
    "q_stream_join",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, p.purchase_id, c.user_id, c.click_ts, p.purchase_ts,
           p.value
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND epoch_us(p.purchase_ts) >= epoch_us(c.click_ts)
         - CAST(10 AS BIGINT) * 60 * 1000000
     AND epoch_us(p.purchase_ts) <= epoch_us(c.click_ts)
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of ``stream_stream_join``: clicks join purchases by
    user within the 10-minute event-time bound — column-for-column the
    plan the streaming form produces per micro-batch, so the oracle checks
    the streaming operator's JOIN SEMANTICS (the watermark/state-eviction
    half is exercised by tests/test_streaming.py on a real readStream).
    Time bounds compare integer microseconds (the portable recipe), and
    the streaming twin's interval arithmetic is equivalent because both
    sides are µs-precision timestamps.

    Scale shape: one user-keyed co-shuffle; in streaming the same shape
    keeps bounded state because both sides carry watermarks."""
    e = t(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    bound_us = 10 * 60 * 1_000_000
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.unix_micros("purchase_ts") >= F.unix_micros("click_ts") - bound_us)
        & (F.unix_micros("purchase_ts") <= F.unix_micros("click_ts")),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "value",
    )
