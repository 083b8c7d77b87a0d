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
