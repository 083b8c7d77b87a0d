"""Declarative data-quality audit — the expectations/constraint-check suite
(Great-Expectations / Deequ family) every production 100 TB pipeline runs
before publishing a table.

`q_data_quality_audit` evaluates a fixed check catalog over the TPC-H-ish
tables and returns one row per check: (check_name, n_violations, passed);
`q_outlier_zscore` is the statistical sibling — distributional anomaly
flagging. The catalog exercises the four constraint families that matter
at scale:

  * uniqueness   — primary-key duplicate count (orders.o_orderkey)
  * completeness — NOT NULL violation count (orders.o_custkey)
  * referential  — FK orphan count (lineitem.l_orderkey ∉ orders)
  * domain/range — value-set and bound violations (o_orderstatus,
                   l_quantity, events.value sign)

Scale shape: every check is either a map-side-combined aggregate (the
conditional counts collapse to one partial row per partition before the
single metadata-scale exchange) or a co-keyed anti-join (the FK check —
the same shuffle a production Deequ run pays). The final result unions
1-row frames: metadata-scale by construction. No check ever materializes
data-scale rows to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t


def _check(name: str, violations_col: DataFrame) -> DataFrame:
    """Normalize a 1-row violations frame to (check_name, n_violations,
    passed)."""
    return violations_col.select(
        F.lit(name).alias("check_name"),
        F.col("v").cast("bigint").alias("n_violations"),
        (F.col("v") == 0).alias("passed"),
    )


@query(
    "q_data_quality_audit",
    oracle="""
    WITH checks AS (
      SELECT 'orders_pk_unique' AS check_name,
             CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
      FROM (SELECT o_orderkey, count(*) AS n FROM orders
            GROUP BY 1 HAVING count(*) > 1)
      UNION ALL
      SELECT 'orders_custkey_complete',
             CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem_fk_orders',
             CAST(count(*) AS BIGINT)
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'orders_status_domain',
             CAST(count(*) FILTER
                  (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem_qty_range',
             CAST(count(*) FILTER
                  (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'events_value_nonnegative',
             CAST(count(*) FILTER (WHERE value < 0) AS BIGINT)
      FROM events
    )
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM checks
    """,
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the constraint catalog; one row per check, ordered by the union
    construction (the driver compare is order-insensitive)."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    events = t(spark, sf_dir, "events")

    pk_dupes = _check(
        "orders_pk_unique",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("v")),
    )
    custkey_nulls = _check(
        "orders_custkey_complete",
        orders.agg(
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("v")
        ),
    )
    fk_orphans = _check(
        "lineitem_fk_orders",
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("v")),
    )
    status_domain = _check(
        "orders_status_domain",
        orders.agg(
            F.count(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            ).alias("v")
        ),
    )
    qty_range = _check(
        "lineitem_qty_range",
        lineitem.agg(
            F.count(
                F.when(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                )
            ).alias("v")
        ),
    )
    value_sign = _check(
        "events_value_nonnegative",
        events.agg(F.count(F.when(F.col("value") < 0, 1)).alias("v")),
    )
    return reduce(
        DataFrame.unionByName,
        [pk_dupes, custkey_nulls, fk_orphans, status_domain, qty_range, value_sign],
    )


@query(
    "q_outlier_zscore",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ), s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                  AS HUGEINT) AS s2
      FROM c GROUP BY event_type
    )
    SELECT c.event_id, c.event_type, c.cents
    FROM c JOIN s ON c.event_type = s.event_type
    WHERE (s.n * c.cents - s.s1) * (s.n * c.cents - s.s1)
          > 9 * (s.n * s.s2 - s.s1 * s.s1)
    """,
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3-sigma outliers, DIVISION-FREE: flag x where
    (x − mean)² > 9·variance, algebraically cleared of denominators —

        (n·x − Σx)²  >  9·(n·Σx² − (Σx)²)

    — so the whole predicate is exact integer arithmetic (decimal(38,0)
    here, HUGEINT in the oracle): no mean/variance division, no sqrt, no
    IEEE rounding anywhere, hence bit-identical row sets across engines.
    The usual z-score formulation ((x−μ)/σ > 3) computes two divisions
    and a square root per group in floating point — boundary rows can
    flip between engines; this form cannot.

    Scale shape: one map-side-combined stats aggregate per group
    (metadata-scale output), broadcast back onto the stream (group-count
    rows — always broadcastable), predicate evaluated scan-side. ONE
    data-scale shuffle total (the stats partial agg), output only the
    outlier rows."""
    c = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    d = F.col("cents").cast("decimal(38,0)")
    s = c.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d).cast("decimal(38,0)").alias("s1"),
        F.sum(d * d).cast("decimal(38,0)").alias("s2"),
    )
    joined = c.join(
        F.broadcast(s), c["event_type"] == s["et"]
    )
    dev = F.col("n") * F.col("cents").cast("decimal(38,0)") - F.col("s1")
    spread9 = F.lit(9).cast("decimal(38,0)") * (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    return joined.filter(dev * dev > spread9).select(
        "event_id", "event_type", "cents"
    )


MAD_K = 3  # flag rows with |x - median| > MAD_K * MAD


@query(
    "q_outlier_mad",
    oracle=f"""
    WITH med AS (
      SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY 1
    ), dev AS (
      SELECT l.l_returnflag, m.med,
             abs(l.l_extendedprice - m.med) AS dev
      FROM lineitem l JOIN med m USING (l_returnflag)
    ), mad AS (
      SELECT l_returnflag, quantile_disc(dev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.l_returnflag,
           CAST(min(d.med) AS DOUBLE) AS median_price,
           CAST(min(m.mad) AS DOUBLE) AS mad_price,
           CAST(count(*) FILTER (WHERE d.dev > {MAD_K} * m.mad) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY 1
    """,
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier audit per group — the heavy-tail-safe
    sibling of q_outlier_zscore: flag rows whose absolute deviation from the
    group median exceeds {MAD_K}× the median absolute deviation.

    percentile_disc picks an ACTUAL data value (same lower-median convention
    in Spark and DuckDB — the q_agg_percentile_exact anchor), so med/mad and
    every |x−med| comparison are reproductions of identical IEEE doubles,
    never interpolated arithmetic. Cost honesty: exact percentiles are NOT
    partially aggregatable, so this plan pays THREE data-scale passes over
    lineitem (med agg, mad agg over the re-derived dev lineage, final
    conditional count) — two to three l_returnflag shuffles of full rows,
    not one. That is the price of the exactness anchor; the 100 TB fast
    path swaps in approx_percentile sketches (q_agg_approx), which combine
    map-side and collapse this to one pass."""
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "dev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min("med").cast("double").alias("median_price"),
            F.min("mad").cast("double").alias("mad_price"),
            F.count(F.when(F.col("dev") > MAD_K * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


CHI2_CHANNELS = 4  # contingency columns: props k mod 4 (the channel buckets)


@query(
    "q_crosstab_chi2",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INT) % {CHI2_CHANNELS}
               AS channel
      FROM events
    ), cells AS (
      SELECT event_type, channel, CAST(count(*) AS HUGEINT) AS o
      FROM c GROUP BY 1, 2
    ), rows_ AS (
      SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1
    ), cols_ AS (
      SELECT channel, SUM(o) AS cl FROM cells GROUP BY 1
    ), tot AS (
      SELECT SUM(o) AS n FROM cells
    )
    SELECT ce.event_type, ce.channel, CAST(ce.o AS BIGINT) AS n_obs,
           CAST((1000000
                 * (tot.n * ce.o - r.r * cl.cl)
                 * (tot.n * ce.o - r.r * cl.cl))
                // (tot.n * r.r * cl.cl) AS BIGINT) AS contrib_ppm
    FROM cells ce
    JOIN rows_ r ON r.event_type = ce.event_type
    JOIN cols_ cl ON cl.channel = ce.channel
    CROSS JOIN tot
    """,
)
def q_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency profile of event_type × channel — the
    statistical-dependence audit of the data-profiling family (is the
    channel mix independent of the event type?), division-free in spirit of
    q_outlier_zscore.

    Per-cell χ² contribution (O − E)²/E with E = R·C/N is cleared of inner
    denominators:  contrib = (N·O − R·C)² / (N·R·C)  — every term an exact
    integer (decimal(38,0) here, HUGEINT in the oracle; N·O products reach
    ~1e24 at sf1, far past int64), with ONE floor division per cell at the
    reported 1e-6 scale. The statistic is defined as the sum of the
    floored per-cell ppm values — deterministic and engine-identical,
    whereas floating χ² sums vary in the last ulps. Scale shape: one
    map-side-combined cell count (|types|×|channels| rows — metadata-scale
    from there), row/col/total sums and joins all run on the tiny cell
    frame."""
    c = t(spark, sf_dir, "events").select(
        "event_type",
        (F.get_json_object("props", "$.k").cast("int") % CHI2_CHANNELS).alias(
            "channel"
        ),
    )
    cells = c.groupBy("event_type", "channel").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("channel").agg(F.sum("o").alias("cl"))
    tot = cells.agg(F.sum("o").alias("n"))
    return (
        cells.join(rows_, "event_type")
        .join(cols_, "channel")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "channel",
            F.col("o").cast("bigint").alias("n_obs"),
            F.expr(
                "cast((1000000 * (n * o - r * cl) * (n * o - r * cl))"
                " div (n * r * cl) as bigint)"
            ).alias("contrib_ppm"),
        )
    )


# Benford expected first-digit frequencies, floor-ppm: floor(1e6·log10(1+1/d)).
# Precomputed constants (not runtime floats) so both engines compare against
# identical integer literals.
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
) + " END"


@query(
    "q_benford_profile",
    oracle=f"""
    WITH fd AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders
    ), c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM fd GROUP BY 1
    )
    SELECT digit, n,
           CAST((1000000 * n) // SUM(n) OVER () AS BIGINT) AS observed_ppm,
           CAST({_BENFORD_CASE} AS BIGINT) AS expected_ppm,
           CAST((1000000 * n) // SUM(n) OVER ()
                - {_BENFORD_CASE} AS BIGINT) AS delta_ppm
    FROM c
    """,
)
def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the classic
    fraud/synthetic-data screen in the audit family: compare the observed
    leading-digit distribution against log10(1+1/d).

    The leading digit comes from floor→bigint→string (explicit floor in
    BOTH engines — DuckDB CAST(DOUBLE AS BIGINT) rounds half-away while
    Spark truncates, so the floor is load-bearing). Observed shares are
    floor-ppm over the 9-row digit frame (metadata-scale window); expected
    shares are precomputed integer literals, so delta_ppm is pure integer
    subtraction — engine-identical even though it goes negative (no
    division touches a negative operand). Scale shape: one
    map-side-combined digit count; everything after is 9 rows."""
    fd = t(spark, sf_dir, "orders").select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = fd.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "digit",
        "n",
        F.expr("(1000000 * n) div sum(n) over ()").cast("bigint").alias(
            "observed_ppm"
        ),
        F.expr(_BENFORD_CASE).cast("bigint").alias("expected_ppm"),
        F.expr(f"(1000000 * n) div sum(n) over () - ({_BENFORD_CASE})")
        .cast("bigint")
        .alias("delta_ppm"),
    )


# Columns profiled by q_column_profile: integer keys and low-cardinality
# enums only — min/max stringification of doubles/timestamps is
# engine-formatting-sensitive, so those stay out of the catalog.
PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "q_column_profile",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM orders"""
        for c in PROFILE_COLS
    ),
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile (the pandas-profiling / Glue-crawler
    shape): one row per column with row/null/distinct counts and min/max —
    the first artifact a data catalog computes for every landed table.

    ONE pass over the table computes every column's statistics in a single
    multi-aggregate (Spark plans the n_distinct set via Expand — partial
    aggregation still applies per column); the per-column rows come from
    stack() over the single 1-row result — metadata-scale, unlike the
    oracle's UNION ALL of four scans, which states the semantics, not the
    plan. min/max are computed in the column's NATIVE type and cast to
    string after (string-min of an int column would order '10' < '9')."""
    o = t(spark, sf_dir, "orders").select(*PROFILE_COLS)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


HIST_BINS = 10  # equi-depth bins for q_histogram_equidepth


@query(
    "q_histogram_equidepth",
    oracle=f"""
    WITH b AS (
      SELECT {", ".join(
        f"quantile_disc(l_extendedprice, {i / HIST_BINS}) AS b{i}"
        for i in range(1, HIST_BINS)
      )}
      FROM lineitem
    ), binned AS (
      SELECT {" + ".join(
        f"CASE WHEN l.l_extendedprice > b.b{i} THEN 1 ELSE 0 END"
        for i in range(1, HIST_BINS)
      )} AS bin,
             l.l_extendedprice AS x
      FROM lineitem l CROSS JOIN b
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(x) AS min_price, max(x) AS max_price
    FROM binned GROUP BY 1
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of l_extendedprice ({HIST_BINS} quantile bins)
    — the optimizer-statistics / data-profiling shape where each bin holds
    ~equal row counts (equi-width bins hide skew in long-tailed prices).

    A global ntile() would be the naive formulation — and a SinglePartition
    sort over the whole fact table, the classic scale-killer. Instead the
    {HIST_BINS - 1} exact decile boundaries come from ONE percentile_disc
    aggregate (actual data values, same lower convention both engines —
    the q_outlier_mad anchor), broadcast back as a 1-row frame, and each
    row's bin is just the count of boundaries strictly below it — a pure
    projection. Bin counts/extremes are then one map-side-combined agg.
    min/max are untouched stored doubles — no FP arithmetic anywhere."""
    li = t(spark, sf_dir, "lineitem").select("l_extendedprice")
    b = li.agg(
        *[
            F.expr(
                f"percentile_disc({i / HIST_BINS}) WITHIN GROUP "
                "(ORDER BY l_extendedprice)"
            ).alias(f"b{i}")
            for i in range(1, HIST_BINS)
        ]
    )
    bin_expr = reduce(
        lambda acc, i: acc
        + F.when(F.col("l_extendedprice") > F.col(f"b{i}"), 1).otherwise(0),
        range(2, HIST_BINS),
        F.when(F.col("l_extendedprice") > F.col("b1"), 1).otherwise(0),
    )
    return (
        li.crossJoin(F.broadcast(b))
        .select(bin_expr.cast("int").alias("bin"), F.col("l_extendedprice"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@query(
    "q_out_of_order_events",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             max(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_us
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE us < prev_max_us) AS BIGINT)
             AS n_late,
           CAST((1000000::HUGEINT * count(*) FILTER (WHERE us < prev_max_us))
                // count(*) AS BIGINT) AS late_ppm,
           CAST(COALESCE(max(prev_max_us - us) FILTER
                         (WHERE us < prev_max_us), 0) AS BIGINT)
             AS max_disorder_us
    FROM seq
    """,
)
def q_out_of_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit: treating event_id as the per-user
    ARRIVAL sequence, count events whose event time precedes the running
    maximum of everything that arrived before them — the measurement that
    SIZES A STREAMING WATERMARK (q_stream_watermark_dedup's lateness
    bound should dominate max_disorder_us, or the pipeline silently drops
    events).

    One hash(user_id) exchange for the running-max window (strict
    1-PRECEDING frame so an event never compares against itself), then a
    map-side-combined global reduction. late_ppm is integer floor-ppm;
    max_disorder is the watermark sizing number in exact microseconds."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .withColumn("prev_max_us", F.max("us").over(w))
    )
    late = F.col("us") < F.col("prev_max_us")
    return seq.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(late, 1)).alias("n_late"),
        # 1e6·event-count passes int64 near 1e13 events — decimal(38,0)/
        # HUGEINT per the q_crosstab_chi2 width rule
        F.expr(
            "(1000000 * cast(count(case when us < prev_max_us then 1 end)"
            " as decimal(38,0))) div count(*)"
        )
        .cast("bigint")
        .alias("late_ppm"),
        F.coalesce(
            F.max(F.when(late, F.col("prev_max_us") - F.col("us"))), F.lit(0)
        )
        .cast("bigint")
        .alias("max_disorder_us"),
    )


# Deterministic synthetic "second snapshot" of the customer dimension for
# the CDC diff: keys divisible by CDC_DEL vanish, keys divisible by CDC_UPD
# get a balance bump, keys divisible by CDC_INS reappear shifted into a new
# key range. Derived from the same scan, so the diff is self-verifying.
CDC_DEL = 50
CDC_UPD = 7
CDC_INS = 97
CDC_KEYSHIFT = 10_000_000
CDC_BUMP_CENTS = 100


@query(
    "q_snapshot_diff_cdc",
    oracle=f"""
    WITH v1 AS (
      SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nk,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
      FROM customer
    ), v2 AS (
      SELECT k,
             nm,
             nk,
             bal + CASE WHEN k % {CDC_UPD} = 0 THEN {CDC_BUMP_CENTS}
                        ELSE 0 END AS bal
      FROM v1 WHERE k % {CDC_DEL} <> 0
      UNION ALL
      SELECT k + {CDC_KEYSHIFT}, nm, nk, bal
      FROM v1 WHERE k % {CDC_INS} = 0
    ), diff AS (
      SELECT COALESCE(v2.k, v1.k) AS c_custkey,
             CASE WHEN v1.k IS NULL THEN 'insert'
                  WHEN v2.k IS NULL THEN 'delete'
                  WHEN v1.nm <> v2.nm OR v1.nk <> v2.nk OR v1.bal <> v2.bal
                    THEN 'update'
                  ELSE 'unchanged' END AS change_type,
             v1.bal AS old_bal_cents, v2.bal AS new_bal_cents
      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    )
    SELECT c_custkey, change_type, old_bal_cents, new_bal_cents
    FROM diff WHERE change_type <> 'unchanged'
    """,
)
def q_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing / change-data-capture audit: given two
    versions of the customer dimension, classify every key as
    insert / delete / update (unchanged rows drop out) with the old and
    new balances carried for the updates — the table-diff verb behind
    CDC validation, sync reconciliation, and SCD feed derivation (the
    update/delete stream this emits is exactly what star/load.py's
    merge_by_key and q_scd2 consume).

    Version 2 is synthesized deterministically from the same scan
    (CDC_DEL deletes, CDC_UPD balance bumps, CDC_INS key-shifted
    inserts), so both engines diff identical snapshots with no fixture
    files. Plan shape: ONE co-keyed full-outer sort-merge join on the
    key (the canonical diff shuffle — both sides hash-partition by key);
    the row-compare is a projection. Balances compare as exact decimal
    cents, never doubles."""
    v1 = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nk"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("bal"),
    )
    v2 = (
        v1.filter(F.col("k") % CDC_DEL != 0)
        .select(
            "k",
            "nm",
            "nk",
            (
                F.col("bal")
                + F.when(F.col("k") % CDC_UPD == 0, CDC_BUMP_CENTS).otherwise(0)
            ).alias("bal"),
        )
        .unionByName(
            v1.filter(F.col("k") % CDC_INS == 0).select(
                (F.col("k") + CDC_KEYSHIFT).alias("k"), "nm", "nk", "bal"
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    diff = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer").select(
        F.coalesce(F.col("b.k"), F.col("a.k")).alias("c_custkey"),
        F.when(F.col("a.k").isNull(), "insert")
        .when(F.col("b.k").isNull(), "delete")
        .when(
            (F.col("a.nm") != F.col("b.nm"))
            | (F.col("a.nk") != F.col("b.nk"))
            | (F.col("a.bal") != F.col("b.bal")),
            "update",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        F.col("a.bal").alias("old_bal_cents"),
        F.col("b.bal").alias("new_bal_cents"),
    )
    return diff.filter(F.col("change_type") != "unchanged")


@query(
    "q_mask_pii",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT masked) AS BIGINT) AS distinct_patterns,
           MIN(masked) AS sample_pattern
    FROM m GROUP BY 1
    """,
)
def q_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking / redaction surface: Spark's built-in ``mask()``
    (upper→X, lower→x, digit→n, punctuation kept) applied to the customer
    name — the governance verb behind view-level column redaction, here
    summarized as per-segment pattern cardinality (how much FORMAT
    structure survives masking — low distinct_patterns means the masked
    column is safe AND still join-able on shape). Complements
    q_text_scrub_pii (regex scrubbing inside free text); mask() is the
    structured-column twin.

    The oracle rebuilds mask() from three character-class
    regexp_replaces, pinning the exact masking alphabet. Pure projection
    + one map-side-combined rollup."""
    m = t(spark, sf_dir, "customer").select(
        "c_mktsegment", F.expr("mask(c_name)").alias("masked")
    )
    return m.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.countDistinct("masked").cast("bigint").alias("distinct_patterns"),
        F.min("masked").alias("sample_pattern"),
    )


JSONQ_CORRUPT_MOD = 13  # event ids divisible by this get their JSON truncated


@query(
    "q_json_quarantine",
    oracle=f"""
    WITH src AS (
      SELECT event_type,
             CASE WHEN event_id % {JSONQ_CORRUPT_MOD} = 0
                  THEN substring(props, 1, length(props) - 1)
                  ELSE props END AS s
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE NOT json_valid(s)) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN json_valid(s)
                         THEN CAST(json_extract_string(s, '$.k') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_k_clean
    FROM src GROUP BY 1
    """,
)
def q_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine for semi-structured ingest: malformed
    JSON payloads are DETECTED (``try_parse_json`` → NULL, the VARIANT
    twin of PERMISSIVE-mode's _corrupt_record column) and counted into a
    quarantine channel while clean rows aggregate normally — the
    row-level error-isolation verb (the star pipeline's file-level
    quarantine in star/sources.py is the same policy one level up; the
    reference silently coerces instead, SURVEY §1.3).

    Corruption is synthesized deterministically (truncate the closing
    brace for event ids ≡ 0 mod {JSONQ_CORRUPT_MOD}), so both engines
    judge the identical byte strings — Spark through try_parse_json,
    DuckDB through json_valid."""
    src = t(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_id") % JSONQ_CORRUPT_MOD == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        )
        .otherwise(F.col("props"))
        .alias("s"),
    )
    parsed = src.select(
        "event_type",
        F.expr("try_parse_json(s)").alias("v"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count(F.when(F.col("v").isNull(), 1)).cast("bigint").alias(
            "n_quarantined"
        ),
        F.sum(
            F.coalesce(
                F.expr("variant_get(v, '$.k', 'bigint')"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("sum_k_clean"),
    )


# Table-checksum canonicalization: 15 md5 hex chars → int64 (< 2^60), then
# an order-insensitive XOR fold per partition-month.
CHECKSUM_HEX_CHARS = 15


@query(
    "q_table_checksum",
    oracle=f"""
    WITH rows_ AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(('0x' || substring(md5(concat_ws('|',
                    CAST(o_orderkey AS VARCHAR),
                    CAST(o_custkey AS VARCHAR),
                    o_orderstatus,
                    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS VARCHAR),
                    CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
                    o_orderpriority)), 1, {CHECKSUM_HEX_CHARS}))
                  AS BIGINT) AS digest
      FROM orders
    )
    SELECT month_start,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(digest) AS BIGINT) AS checksum
    FROM rows_ GROUP BY 1
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum per partition-month — the
    sync-validation verb (pt-table-checksum / replication audit): two
    copies of a table match iff every partition's (n_rows, checksum)
    pair matches, and because XOR is commutative/associative the
    checksum is independent of row order, partitioning, and merge
    history — comparable across ANY two engines or clusters that agree
    on the canonical row string. The natural companion of
    q_snapshot_diff_cdc: checksums say WHETHER partitions diverged,
    the diff says HOW.

    Row canonicalization pins every cross-engine trap the repo has
    catalogued: decimal cents (not float repr), CAST-to-DATE string
    form, explicit '|' separator. The digest keeps {CHECKSUM_HEX_CHARS}
    md5 hex chars (< 2^60, portable via the conv / '0x'-cast recipe).
    Map-side combined; shuffle carries (month, digest-xor partials)."""
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.col("o_orderstatus"),
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                    .cast("bigint")
                    .cast("string"),
                    F.col("o_orderdate").cast("date").cast("string"),
                    F.col("o_orderpriority"),
                )
            ),
            1,
            CHECKSUM_HEX_CHARS,
        ),
        16,
        10,
    ).cast("long")
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "month_start"
            ),
            digest.alias("digest"),
        )
        .groupBy("month_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(digest)").cast("bigint").alias("checksum"),
        )
    )


KEYGAP_BUCKET = 1000  # keyspace bucket width for the density audit
KEYGAP_TOPN = 20


@query(
    "q_keyspace_gaps",
    oracle=f"""
    WITH k AS (
      SELECT DISTINCT o_orderkey AS key FROM orders
    ), b AS (
      SELECT key // {KEYGAP_BUCKET} AS bucket,
             CAST(count(*) AS BIGINT) AS n_present,
             CAST(MIN(key) AS BIGINT) AS lo,
             CAST(MAX(key) AS BIGINT) AS hi
      FROM k GROUP BY 1
    ), scored AS (
      SELECT CAST(bucket AS BIGINT) AS bucket, n_present, lo, hi,
             CAST(hi - lo + 1 - n_present AS BIGINT) AS n_missing
      FROM b
    )
    SELECT bucket, n_present, lo, hi, n_missing
    FROM scored
    ORDER BY n_missing DESC, bucket LIMIT {KEYGAP_TOPN}
    """,
)
def q_keyspace_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyspace density audit: the {KEYGAP_TOPN} sparsest
    {KEYGAP_BUCKET}-wide buckets of the order-key space, each reporting
    how many keys are missing inside its own observed [lo, hi] span —
    the ingestion-hole / deletion-storm detector (a bucket whose span
    far exceeds its count lost rows). Bucketing is what makes the audit
    scale: the exact global gap LIST needs adjacent-key pairs (a total
    order — one serial pass), while bucket-local density is one
    map-side-combined aggregate whose output is keyspace/{KEYGAP_BUCKET}
    rows, then TakeOrderedAndProject for the worst offenders.
    Cross-bucket boundary gaps are intentionally out of scope
    (documented): each bucket audits its own span."""
    k = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("key")).distinct()
    b = k.groupBy(F.expr(f"key div {KEYGAP_BUCKET}").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.min("key").cast("bigint").alias("lo"),
        F.max("key").cast("bigint").alias("hi"),
    )
    return (
        b.select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_present",
            "lo",
            "hi",
            (F.col("hi") - F.col("lo") + 1 - F.col("n_present"))
            .cast("bigint")
            .alias("n_missing"),
        )
        .orderBy(F.desc("n_missing"), F.asc("bucket"))
        .limit(KEYGAP_TOPN)
    )


WILSON_MIN_N = 20  # minimum trials before a rate is rankable
WILSON_TOPN = 20


@query(
    "q_rank_wilson",
    oracle=f"""
    WITH s AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS r
      FROM lineitem GROUP BY 1
      HAVING count(*) >= {WILSON_MIN_N}
    ), w AS (
      SELECT l_partkey, n, r,
             ((CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) + 1.9208 / CAST(n AS DOUBLE)
              - 1.96 * sqrt(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                             * (1.0 - (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)))
                             + 0.9604 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
             / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS lb
      FROM s
    )
    SELECT l_partkey, n, r, lb
    FROM w ORDER BY lb DESC, l_partkey LIMIT {WILSON_TOPN}
    """,
)
def q_rank_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound ranking of per-part return rates — the
    small-sample-safe way to rank success/failure rates (the
    sort-by-lower-confidence-bound verb behind review rankings and
    defect dashboards; a 2/2 rate must NOT outrank 95/100).

    Floating point, deliberately and safely: the bound uses ONLY
    IEEE-correctly-rounded operations (+ − × ÷ sqrt — no ln/exp, the
    q_lm_bigram_score trap), the z-constants are pre-folded decimal
    literals (1.96, 1.9208 = z², 0.9604 = z²/2... all exact at parse),
    and BOTH engines evaluate the identical parenthesized expression
    tree from identical integer inputs — so the doubles match
    BIT-FOR-BIT and the full-precision hash comparison passes without
    any rounding step. One part-grain aggregate, then
    TakeOrderedAndProject."""
    s = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1))
            .cast("bigint")
            .alias("r"),
        )
        .filter(F.col("n") >= WILSON_MIN_N)
    )
    lb = F.expr(
        "((CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) + 1.9208 / CAST(n AS DOUBLE)"
        " - 1.96 * sqrt(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
        "                * (1.0 - (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)))"
        "                + 0.9604 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))"
        " / (1.0 + 3.8416 / CAST(n AS DOUBLE))"
    )
    return (
        s.select("l_partkey", "n", "r", lb.alias("lb"))
        .orderBy(F.desc("lb"), F.asc("l_partkey"))
        .limit(WILSON_TOPN)
    )


# ---------------------------------------------------------------------------
# Round-4 wave 23/25: exact distribution statistics (drift + nonparametrics)
# ---------------------------------------------------------------------------


@query(
    "q_ks_drift",
    oracle="""
    WITH tagged AS (
      SELECT n_chars AS v,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
      FROM documents
    ), merged AS (
      SELECT v,
             SUM(is_a) AS ca,
             SUM(1 - is_a) AS cb
      FROM tagged GROUP BY v
    ), cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v) AS cuma,
             SUM(cb) OVER (ORDER BY v) AS cumb,
             SUM(ca) OVER () AS na,
             SUM(cb) OVER () AS nb
      FROM merged
    ), diffs AS (
      SELECT na, nb, v,
             ABS(nb * cuma - na * cumb) AS d,
             row_number() OVER (ORDER BY ABS(nb * cuma - na * cumb) DESC, v)
               AS rk
      FROM cum
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(d AS BIGINT) AS ks_scaled,
           CAST(v AS BIGINT) AS ks_at
    FROM diffs WHERE rk = 1
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic between two
    corpus snapshots (doc_id parity splits `documents` into snapshot A and
    B; the variable is document length). Everything stays in INTEGERS —
    ks_scaled = max_v |n_b·cumA(v) − n_a·cumB(v)| never forms a float ECDF,
    so D = ks_scaled / (n_a·n_b) is recoverable exactly and the oracle
    hash-matches bit-for-bit (the same two-level-integer discipline as the
    ppm recipes). ks_at reports the smallest value attaining the max.

    Scale shape: one value-keyed rollup (map-side combined — the shuffle
    carries ≤ |support| rows, not documents), then windows over the
    support, which for any real drift monitor is metadata-scale (distinct
    lengths / bucketed scores). The drift-monitor production shape."""
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"),
        F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    merged = d.groupBy("v").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = merged.select(
        "v",
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    diff = F.abs(F.col("nb") * F.col("cuma") - F.col("na") * F.col("cumb"))
    w_rank = Window.orderBy(F.col("d").desc(), F.col("v"))
    diffs = cum.select("na", "nb", "v", diff.alias("d")).withColumn(
        "rk", F.row_number().over(w_rank)
    )
    return diffs.filter(F.col("rk") == 1).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("d").cast("bigint").alias("ks_scaled"),
        F.col("v").cast("bigint").alias("ks_at"),
    )


@query(
    "q_mann_whitney_ab",
    oracle="""
    WITH assigned AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN CAST('0x' || substring(md5('mw-' ||
                    CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), per_value AS (
      SELECT cents,
             SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS c2
      FROM assigned GROUP BY cents
    ), ranked AS (
      SELECT c1, c2,
             SUM(c1 + c2) OVER (ORDER BY cents) - (c1 + c2) AS below,
             c1 + c2 AS cnt
      FROM per_value
    ), sums AS (
      SELECT SUM(c1) AS n1, SUM(c2) AS n2,
             SUM(c1 * (2 * below + cnt + 1)) AS r1_x2
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n_a,
           CAST(n2 AS BIGINT) AS n_b,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u_a_x2,
           CAST(2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u_b_x2
    FROM sums
    """,
)
def q_mann_whitney_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U for an A/B experiment readout — the nonparametric
    twin of q_ab_experiment (which tests a rate; this tests the whole
    purchase-value DISTRIBUTION, robust to outliers). Users are hash-
    assigned to variants (portable md5 recipe); values go to integer cents;
    tied values get average ranks. Everything stays integer: with per-value
    counts, each member's doubled rank is (2·below + cnt + 1), so the
    doubled rank-sum Σ c1·(2·below+cnt+1) and doubled U-statistics are
    exact BIGINTs (u_a_x2 + u_b_x2 = 2·n_a·n_b by construction — the
    built-in self-check). No normal approximation (that would need exp/erf;
    the judge-facing number is the exact U).

    NULL purchase values are filtered on BOTH sides before ranking: Spark
    windows sort NULL cents first ascending while DuckDB sorts NULLs last,
    so an unfiltered NULL would silently shift every rank between the two
    engines (r4 ADVICE; latent — fixtures carry no NULL purchase values).

    Scale shape: one value-keyed rollup (map-side combined), windows over
    the value support only, 1-row output."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    assigned = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
        F.when(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("mw-"), F.col("user_id").cast("string"))), 1, 8),
                16, 10,
            ).cast("bigint") % 2 == 0,
            "A",
        ).otherwise("B").alias("variant"),
    )
    per_value = assigned.groupBy("cents").agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("c2"),
    )
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_value.select(
        "c1",
        "c2",
        (F.sum(F.col("c1") + F.col("c2")).over(w_cum) - (F.col("c1") + F.col("c2"))).alias("below"),
        (F.col("c1") + F.col("c2")).alias("cnt"),
    )
    sums = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("below") + F.col("cnt") + 1)).alias("r1_x2"),
    )
    u_a_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return sums.select(
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        u_a_x2.cast("bigint").alias("u_a_x2"),
        (2 * F.col("n1") * F.col("n2") - u_a_x2).cast("bigint").alias("u_b_x2"),
    )


@query(
    "q_gini_revenue",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS k,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents
      FROM orders GROUP BY 1
    ), indexed AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, k) AS i,
             count(*) OVER () AS n
      FROM rev
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST((1000000 * SUM(CAST((2 * i - n - 1) * cents AS HUGEINT)))
                // (MAX(n) * SUM(CAST(cents AS HUGEINT)))
                AS BIGINT) AS gini_ppm
    FROM indexed
    """,
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer revenue — the inequality audit a
    marketplace runs on GMV (and a data pipeline runs on shard sizes).
    Exact rational core: with revenues sorted ascending, Gini =
    Σ(2i−n−1)·x_i / (n·Σx) over integer cents; numerator and denominator
    are computed in DECIMAL(38,0) (n·Σcents reaches ~2.25e18 at sf1, so
    int64 would wrap at sf10 — r4 ADVICE), but the CONTRACT BOUNDARY is
    BIGINT floor-ppm: gini_ppm = (10⁶·num) div den. Top-level
    DECIMAL(38,0) was the one output shape in the registry that
    driver-env decimal canonicalization could flake on (r9's sole red
    row: n·Σcents always carries trailing zeros, and
    Decimal('5.6e14').normalize() renders E-notation while ints render
    plain); 0 ≤ ppm ≤ 10⁶ is int-safe in every engine. Within a tie
    block the coefficient sum is order-invariant, and the
    (cents, custkey) ORDER BY makes row_number deterministic anyway
    (total-order window rule).

    Scale note: the global-sort window over per-customer rollups is
    support-sized (customers, not orders); at 100 TB the same statistic
    computes from a value-bucketed histogram exactly like q_ks_drift."""
    rev = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")).alias("cents")
        )
    )
    w_idx = Window.orderBy("cents", "k")
    w_all = Window.partitionBy()
    indexed = rev.select(
        "cents",
        F.row_number().over(w_idx).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return (
        indexed.agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.sum(
                ((2 * F.col("i") - F.col("n") - 1) * F.col("cents")).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("gini_num"),
            (F.max("n").cast("decimal(38,0)") * F.sum(F.col("cents").cast("decimal(38,0)")))
            .cast("decimal(38,0)")
            .alias("gini_den"),
        )
        .select(
            "n_customers",
            F.expr("(gini_num * 1000000) div gini_den").cast("bigint").alias("gini_ppm"),
        )
    )


@query(
    "q_km_risk_table",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             date_diff('day',
                       CAST(date_trunc('day', MIN(ts)) AS DATE),
                       CAST(date_trunc('day', MAX(ts)) AS DATE)) AS lifespan
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT lifespan, count(*) AS n_event FROM spans GROUP BY lifespan
    )
    SELECT CAST(lifespan AS BIGINT) AS lifespan_days,
           CAST(n_event AS BIGINT) AS n_events,
           CAST(SUM(n_event) OVER (ORDER BY lifespan DESC) AS BIGINT)
             AS n_at_risk
    FROM per_day
    """,
)
def q_km_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table over user lifetimes (first event → last
    event, in days): one row per observed lifespan with the number of
    users "dying" at that age and the number still at risk — the exact
    integer core of a survival/retention curve (the float product
    Π(1 − d/r) is downstream arithmetic on these two columns; emitting it
    engine-side would hash-flake, the post-transcendental rule).

    Scale shape: user-keyed rollup (map-side min/max combine), then a
    lifespan-keyed rollup, then one window over the ≤ max-age support."""
    spans = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.to_date(F.date_trunc("day", F.max("ts"))),
                F.to_date(F.date_trunc("day", F.min("ts"))),
            ).alias("lifespan")
        )
    )
    per_day = spans.groupBy("lifespan").agg(F.count(F.lit(1)).alias("n_event"))
    w_risk = Window.orderBy(F.col("lifespan").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_day.select(
        F.col("lifespan").cast("bigint").alias("lifespan_days"),
        F.col("n_event").cast("bigint").alias("n_events"),
        F.sum("n_event").over(w_risk).cast("bigint").alias("n_at_risk"),
    )


@query(
    "q_histogram_log_bins",
    oracle="""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM orders
      WHERE o_totalprice > 0
    )
    SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bin_exp,
           CAST(CAST(1 AS BIGINT) << (length(bin(c)) - 1) AS BIGINT) AS bin_lo,
           CAST((CAST(1 AS BIGINT) << (length(bin(c)))) - 1 AS BIGINT) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS cents_total
    FROM cents GROUP BY 1, 2, 3
    """,
)
def q_histogram_log_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (log₂) histogram of order values — the binning every
    latency/size/cost distribution monitor uses (linear bins, the
    q_seqlen_histogram shape, can't cover 6 orders of magnitude).
    floor(log₂ x) computes EXACTLY as length(bin(x)) − 1 — binary-string
    length, no floating log whose last-ulp could flip a power-of-two
    boundary between engines (the transcendental ban). Bin bounds come
    from integer shifts.

    Scale shape: pure projections + one map-side-combined rollup over
    ≤ 64 bins — metadata-scale output at any input size."""
    cents = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("c")
        )
    )
    joined = cents.select(F.length(F.bin("c")).alias("blen"), "c").select(
        (F.col("blen") - 1).cast("bigint").alias("bin_exp"),
        F.expr(
            "cast(shiftleft(cast(1 as bigint), cast(blen - 1 as int)) as bigint)"
        ).alias("bin_lo"),
        F.expr(
            "cast(shiftleft(cast(1 as bigint), cast(blen as int)) - 1 as bigint)"
        ).alias("bin_hi"),
        "c",
    )
    return joined.groupBy("bin_exp", "bin_lo", "bin_hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("c").cast("bigint").alias("cents_total"),
    )


# Winsorization percentile bounds, in percent (nearest-rank definition).
WINSOR_LO_PCT, WINSOR_HI_PCT = 1, 99


@query(
    "q_winsorize",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
    ), ranked AS (
      SELECT g, cents,
             row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM c
    ), bounds AS (
      SELECT g,
             MAX(n) AS n_rows,
             MAX(CASE WHEN rn = (n * {WINSOR_LO_PCT} + 99) // 100
                      THEN cents END) AS p_lo,
             MAX(CASE WHEN rn = (n * {WINSOR_HI_PCT} + 99) // 100
                      THEN cents END) AS p_hi
      FROM ranked GROUP BY g
    )
    SELECT c.g AS l_returnflag,
           CAST(MAX(b.n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(b.p_lo) AS BIGINT) AS p_lo_cents,
           CAST(MAX(b.p_hi) AS BIGINT) AS p_hi_cents,
           CAST(count(*) FILTER (WHERE c.cents < b.p_lo) AS BIGINT)
             AS n_clipped_low,
           CAST(count(*) FILTER (WHERE c.cents > b.p_hi) AS BIGINT)
             AS n_clipped_high,
           CAST(SUM(c.cents) AS BIGINT) AS raw_sum_cents,
           CAST(SUM(least(greatest(c.cents, b.p_lo), b.p_hi)) AS BIGINT)
             AS winsorized_sum_cents
    FROM c JOIN bounds b ON c.g = b.g
    GROUP BY 1
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust metrics: per group, clip values to the exact
    [p1, p99] nearest-rank percentiles and report the clipped aggregate
    beside the raw one — the outlier-robust revenue metric every
    experimentation platform reports (a single whale order can't move it).
    Percentile extraction is EXACT nearest-rank over integer cents:
    rank ceil(p·n/100) via the (n·p + 99) div 100 identity — no float
    percentile, no interpolation, engine-identical. The rank window
    orders by cents alone: row_number among equal cents is engine-
    arbitrary, but the VALUE at any rank inside a tie block is that tie's
    cents — deterministic by construction (the only thing read is the
    value, never the rank).

    Scale shape: one per-group sort window (the price of exactness —
    same posture as q_percentile_cont_exact), then the group-keyed
    bounds broadcast back for the clip pass; two scans, zero driver
    logic."""
    c = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w_rn = Window.partitionBy("g").orderBy("cents")
    w_all = Window.partitionBy("g")
    ranked = c.select(
        "g",
        "cents",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    bounds = ranked.groupBy("g").agg(
        F.max("n").alias("n_rows"),
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {WINSOR_LO_PCT} + 99) div 100"),
                F.col("cents"),
            )
        ).alias("p_lo"),
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {WINSOR_HI_PCT} + 99) div 100"),
                F.col("cents"),
            )
        ).alias("p_hi"),
    )
    joined = c.join(F.broadcast(bounds), "g")
    clipped = F.least(F.greatest(F.col("cents"), F.col("p_lo")), F.col("p_hi"))
    return joined.groupBy(F.col("g").alias("l_returnflag")).agg(
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.max("p_lo").cast("bigint").alias("p_lo_cents"),
        F.max("p_hi").cast("bigint").alias("p_hi_cents"),
        F.count(F.when(F.col("cents") < F.col("p_lo"), 1))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.count(F.when(F.col("cents") > F.col("p_hi"), 1))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.sum("cents").cast("bigint").alias("raw_sum_cents"),
        F.sum(clipped).cast("bigint").alias("winsorized_sum_cents"),
    )


# ---------------------------------------------------------------------------
# Round-4 wave 31: distributed uncertainty + causal readouts
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds scaled to the [0, 1e6) hash-uniform domain —
# literal integers so BOTH engines evaluate the identical CASE ladder (no
# per-row exp(); the ladder IS the distribution). P(w=k) = e⁻¹/k!.
POISSON1_THRESHOLDS = [
    367879,  # P(0)
    735758,  # P(<=1)
    919698,  # P(<=2)
    981011,  # P(<=3)
    996340,  # P(<=4)
    999405,  # P(<=5)
    999916,  # P(<=6)
    999989,  # P(<=7)
    999998,  # P(<=8); else w = 9 (cap)
]
BOOTSTRAP_B = 32  # number of Poisson resamples


def _poisson_case(u_expr: str) -> str:
    """SQL CASE ladder mapping a [0,1e6) uniform to a Poisson(1) draw."""
    arms = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}"
        for k, t in enumerate(POISSON1_THRESHOLDS)
    )
    return f"CASE {arms} ELSE 9 END"


@query(
    "q_bootstrap_poisson",
    oracle=f"""
    WITH draws AS (
      SELECT b.b,
             {_poisson_case(
                 "CAST('0x' || substring(md5('pb-' || CAST(b.b AS VARCHAR)"
                 " || '-' || CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT)"
                 " % 1000000"
             )} AS w,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
      CROSS JOIN (SELECT unnest(generate_series(1, {BOOTSTRAP_B})) AS b) b
    )
    SELECT CAST(b AS BIGINT) AS resample,
           CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * cents) AS BIGINT) AS sum_cents
    FROM draws GROUP BY b
    """,
)
def q_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap — THE distributed bootstrap (each row draws an
    independent Poisson(1) replication count per resample, so resamples
    stream with no global n and no multinomial coordination; the classic
    large-scale estimator-uncertainty recipe). Draws are deterministic:
    md5(resample, orderkey) → uniform in [0,1e6) → literal CDF ladder,
    so both engines replicate identically and the {BOOTSTRAP_B} resample
    sums are exact BIGINTs. Downstream arithmetic (CI from the spread of
    sum_cents/n_eff) is a {BOOTSTRAP_B}-row problem.

    Scale shape: a bounded ×B explode (constant fan-out, map-side), one
    resample-keyed combine — B partial sums per partition, never a data
    copy per resample."""
    b = F.explode(F.sequence(F.lit(1), F.lit(BOOTSTRAP_B))).alias("b")
    d = t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderkey"),
    ).select("cents", "o_orderkey", b)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("pb-"),
                        F.col("b").cast("string"),
                        F.lit("-"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    w = F.lit(9)
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < POISSON1_THRESHOLDS[k], k).otherwise(w)
    return (
        d.select("b", w.alias("w"), "cents")
        .groupBy(F.col("b").cast("bigint").alias("resample"))
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("sum_cents"),
        )
    )


DID_CUTOFF = "1996-01-01"  # pre/post boundary


@query(
    "q_diff_in_diff",
    oracle=f"""
    WITH cells AS (
      SELECT CAST('0x' || substring(md5('did-' || CAST(o_custkey AS VARCHAR)),
                                    1, 8) AS BIGINT) % 2 = 0 AS is_treat,
             o_orderdate >= TIMESTAMP '{DID_CUTOFF}' AS is_post,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ), agg AS (
      SELECT is_treat, is_post,
             count(*) AS n, CAST(SUM(cents) AS BIGINT) AS s
      FROM cells GROUP BY 1, 2
    ), means AS (
      SELECT
        MAX(CASE WHEN is_treat AND is_post THEN s // n END) AS t_post,
        MAX(CASE WHEN is_treat AND NOT is_post THEN s // n END) AS t_pre,
        MAX(CASE WHEN NOT is_treat AND is_post THEN s // n END) AS c_post,
        MAX(CASE WHEN NOT is_treat AND NOT is_post THEN s // n END) AS c_pre,
        CAST(SUM(n) AS BIGINT) AS n_orders
      FROM agg
    )
    SELECT CAST(t_pre AS BIGINT) AS treat_pre_avg_cents,
           CAST(t_post AS BIGINT) AS treat_post_avg_cents,
           CAST(c_pre AS BIGINT) AS control_pre_avg_cents,
           CAST(c_post AS BIGINT) AS control_post_avg_cents,
           CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT) AS did_cents,
           n_orders
    FROM means
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: customers hash-split into
    treatment/control (portable md5 assignment, the q_ab_experiment
    recipe), order dates split pre/post at {DID_CUTOFF}; the DiD estimate
    is (ΔTreat − ΔControl) of the four cell means — the workhorse causal
    design for rollouts without randomization. Cell means are
    floor-divided integer cents (nonneg ⇒ Spark div == DuckDB //), so the
    estimate is exact; a production readout wraps it with
    q_bootstrap_poisson for the CI.

    Scale shape: one map-side-combined 4-cell aggregate, 1-row output."""
    cells = t(spark, sf_dir, "orders").select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("did-"), F.col("o_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0
        ).alias("is_treat"),
        (F.col("o_orderdate") >= F.lit(DID_CUTOFF).cast("timestamp")).alias(
            "is_post"
        ),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    agg = cells.groupBy("is_treat", "is_post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    cell = lambda tr, po: F.max(  # noqa: E731
        F.when(
            (F.col("is_treat") == tr) & (F.col("is_post") == po),
            F.expr("s div n"),
        )
    )
    means = agg.agg(
        cell(True, False).alias("t_pre"),
        cell(True, True).alias("t_post"),
        cell(False, False).alias("c_pre"),
        cell(False, True).alias("c_post"),
        F.sum("n").cast("bigint").alias("n_orders"),
    )
    return means.select(
        F.col("t_pre").cast("bigint").alias("treat_pre_avg_cents"),
        F.col("t_post").cast("bigint").alias("treat_post_avg_cents"),
        F.col("c_pre").cast("bigint").alias("control_pre_avg_cents"),
        F.col("c_post").cast("bigint").alias("control_post_avg_cents"),
        ((F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")))
        .cast("bigint")
        .alias("did_cents"),
        "n_orders",
    )


# Nearest-rank percentiles for the grouped report (percent values).
REPORT_PCTS = [25, 50, 75, 90, 99]


@query(
    "q_grouped_percentiles",
    oracle=f"""
    WITH c AS (
      SELECT event_type AS g,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL
    ), ranked AS (
      SELECT g, cents,
             row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM c
    )
    SELECT g AS event_type,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           {", ".join(
               f"CAST(MAX(CASE WHEN rn = (n * {p} + 99) // 100 "
               f"THEN cents END) AS BIGINT) AS p{p}_cents"
               for p in REPORT_PCTS
           )}
    FROM ranked GROUP BY g
    """,
)
def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-percentile report (p25/p50/p75/p90/p99 per event
    type) — the latency/value-distribution dashboard row, EXACT: all five
    percentiles come from ONE per-group sort window via the nearest-rank
    identity rank = (n·p + 99) div 100 (the q_winsorize machinery widened
    to a percentile vector; one window + one rollup regardless of how
    many percentiles the report wants — never one sort per percentile).
    Integer cents, engine-identical. NULL values are filtered on BOTH
    sides before the rank window — Spark sorts NULLs first ascending,
    DuckDB last, so an unfiltered NULL would shift every rank (r4
    ADVICE; latent, fixtures carry no NULL values)."""
    c = t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    w_rn = Window.partitionBy("g").orderBy("cents")
    w_all = Window.partitionBy("g")
    ranked = c.select(
        "g",
        "cents",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return ranked.groupBy(F.col("g").alias("event_type")).agg(
        F.max("n").cast("bigint").alias("n_rows"),
        *[
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"(n * {p} + 99) div 100"),
                    F.col("cents"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}_cents")
            for p in REPORT_PCTS
        ],
    )
