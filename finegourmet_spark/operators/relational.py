"""Relational operator inventory (SURVEY.md §2B) as named, oracle-checked queries.

Each query generalizes one reference operator family (citations inline) to
its full Spark-native form over the driver test tables. All run declaratively
through Catalyst — filters/projections push down to the parquet scans, small
dims broadcast, aggregates use partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.functions.ids import dense_ids
from finegourmet_spark.functions.money import SQL_DAVG, SQL_DSUM, davg, dec, dsum
from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

# ---------------------------------------------------------------------------
# scan / projection / cast   (generalizes ref S1-S5, P1-P7: etl/extract.py:55-153,
# etl/transform.py:124-137 — explicit schema scans + rename/cast/select)
# ---------------------------------------------------------------------------


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey AS order_key,
           CAST(l_quantity AS INT) AS qty,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           l_returnflag AS flag,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + projection + cast + rename. Column pruning reaches the parquet
    scan: only 5 of 11 lineitem columns are read (ref reads 11-col CSVs and
    keeps ~7 — etl/extract.py:70-86).

    price_dec proves the decimal cast surface but is emitted as DOUBLE per the
    repo money policy (functions/money.py): Decimal('103580.80') vs DuckDB's
    float 103580.8 hash-mismatch even though numerically equal (VERDICT r1 #2)."""
    return t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_quantity > 30
      AND l_returnflag IN ('A','N')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND (l_linestatus = 'F' OR l_discount < 0.05)
      AND l_tax IS NOT NULL
      AND regexp_matches(l_returnflag, '^[AN]$')
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface: comparison, isin, range, boolean algebra, null test,
    regex (ref F1-F7: etl/transform.py:84,140-149,223-251,333). All predicates
    reach PushedFilters in the parquet scan except the rlike residual."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & ((F.col("l_linestatus") == "F") | (F.col("l_discount") < 0.05))
        & F.col("l_tax").isNotNull()
        & F.col("l_returnflag").rlike("^[AN]$")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN 'unknown'
                WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS size_band,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'partial' END AS status_label,
           CASE WHEN starts_with(o_orderpriority, '1') THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch conditional derivation (ref F7/X6/X7/P8 `when` ladders:
    etl/transform.py:140-149,184-251; etl/loader.py:55-57)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice").isNull(), "unknown")
        .when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_label"),
        F.when(F.col("o_orderpriority").startswith("1"), 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           trim(c_name) AS name_trim,
           length(c_name) AS name_len,
           substring(c_name, 1, 8) AS name_prefix,
           concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
           coalesce(nullif(regexp_extract(c_name, '([0-9]+)', 1), ''), '') AS name_digits,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           len(string_split(c_name, '#')) AS name_parts
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (ref X1-X10: etl/transform.py:53-87,181-261 —
    scrub/normalize/substring/concat/regex repair)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim("c_name").alias("name_trim"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.size(F.split("c_name", "#")).cast("bigint").alias("name_parts"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function surface (ref P4 to_date: etl/extract.py:86; dashboard
    month rollup SURVEY §2C #4)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("bigint").alias("days_to_y2k"),
        F.last_day(d).alias("month_end"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0) AS dist_from_50k,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_kilo,
           sqrt(l_quantity) AS qty_sqrt,
           l_orderkey % 97 AS key_mod,
           power(CAST(l_linenumber AS DOUBLE), 2) AS line_sq,
           CAST(round(CAST(l_discount AS DECIMAL(18,4)) * 100, 0) AS DOUBLE) AS disc_pct
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface. Only IEEE-exact ops feed the hash (abs/floor/ceil/mod;
    sqrt is correctly-rounded per IEEE-754; round happens in decimal) —
    transcendentals would differ between libm implementations in last ulps."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_50k"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_kilo"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.pow(F.col("l_linenumber").cast("double"), 2).alias("line_sq"),
        F.round(dec("l_discount") * 100, 0).cast("double").alias("disc_pct"),
    )


# ---------------------------------------------------------------------------
# joins   (ref J1-J5: etl/transform.py:96-103,152-165,395-406 — all broadcast
# left equi-joins of a fact against small dims)
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (ref J1). No broadcast hint: customer scales with sf,
    so the broadcast-vs-shuffle call must come from AQE's runtime size check
    (session threshold 64 MB), not a forced hint that OOMs at 100×. At small
    sf AQE still picks BroadcastHashJoin (pinned in test_plan_shapes)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (ref J1-J5 are all left)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000),
         rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000)
    SELECT b.o_custkey AS buyer_key, r.c_custkey AS rich_key, r.c_acctbal
    FROM buyers b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sets."""
    buyers = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select("o_custkey")
        .distinct()
    )
    rich = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    return buyers.join(rich, buyers.o_custkey == rich.c_custkey, "full").select(
        F.col("o_custkey").alias("buyer_key"),
        F.col("c_custkey").alias("rich_key"),
        "c_acctbal",
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (cartesian) of two small dims — the one join type
    that must stay opt-in (`crossJoin`) at scale; planned as a broadcast
    nested loop here."""
    r = t(spark, sf_dir, "region").select("r_name")
    n = t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus <> 'F'
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery through the SQL API — Catalyst rewrites it to a left-semi
    join (same plan family as q_join_semi, different authoring surface)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_in")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_in")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders_in
        WHERE o_custkey IN (SELECT c_custkey FROM customer_in
                            WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus <> 'F'
        """
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one big order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: the ref's null-FK audit (etl/transform.py:173-178) is
    exactly an anti-join routed to a quarantine channel."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_theta",
    oracle="""
    WITH bands AS (
      SELECT * FROM (VALUES (0.0, 10.0, 'tiny'), (10.0, 25.0, 'small'),
                            (25.0, 40.0, 'medium'), (40.0, 1e9, 'big'))
             AS b(lo, hi, band)
    )
    SELECT b.band, COUNT(*) AS n_lines,
           {dsum} AS band_revenue
    FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """.format(dsum=SQL_DSUM("l.l_extendedprice")),
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: banded join against a tiny broadcast table —
    planned as BroadcastNestedLoopJoin, the right physical strategy when one
    side is rows-small (engine extension; no ref precedent)."""
    li = t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "tiny"), (10.0, 25.0, "small"), (25.0, 40.0, "medium"), (40.0, 1e9, "big")],
        "lo double, hi double, band string",
    )
    cond = (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi)
    return (
        li.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice", "band_revenue"))
    )


# ---------------------------------------------------------------------------
# aggregation   (ref A1-A3: etl/transform.py:98,174,334-340; dashboard SUM(Price))
# ---------------------------------------------------------------------------


@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty} AS sum_qty,
           {sum_base} AS sum_base_price,
           {sum_disc} AS sum_disc_price,
           {avg_qty} AS avg_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           COUNT(*) AS count_order,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=SQL_DSUM("l_quantity"),
        sum_base=SQL_DSUM("l_extendedprice"),
        sum_disc=SQL_DSUM(
            "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
        ),
        avg_qty=SQL_DAVG("l_quantity"),
    ),
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the q_agg_basic family
    (sum/avg/min/max/count/count_distinct) with partial+final hash agg.
    Generalizes the dashboard's SUM(Price) measures (SURVEY §2C #1-#4)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(dec(disc_price, 18, 4)).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count("*").alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "q_agg_first_nonnull",
    oracle="""
    WITH src AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS prio,
             o_orderdate, o_orderkey
      FROM orders
    ), ranked AS (
      SELECT o_custkey, prio,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY (prio IS NULL), o_orderdate, o_orderkey) AS rn
      FROM src
    )
    SELECT o_custkey, prio AS first_prio FROM ranked WHERE rn = 1
    """,
)
def q_agg_first_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first-non-null collapse per key. The reference uses
    groupBy().agg(first(ignorenulls=True)) whose survivor depends on partition
    order (etl/transform.py:334-340) — here the survivor rule is an explicit
    total order (non-null first, then earliest date, then key)."""
    o = t(spark, sf_dir, "orders")
    src = o.select(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("prio").isNull().asc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        src.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("prio").alias("first_prio"))
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_cust,
           {bal} AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """.format(bal=SQL_DSUM("c_acctbal")),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region → nation → grand total (dashboard per-
    category/per-store/total cards, SURVEY §2C #1-#3 generalized)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_cust"), dsum("c_acctbal", "total_bal")
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {rev} AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """.format(rev=SQL_DSUM("l_extendedprice")),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_extendedprice", "revenue")
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (exercises the engine's SQL entry path)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sx} AS sum_x,
           {sxx} AS sum_xx,
           ({sxx} - {sx} * {sx} / COUNT(*)) / (COUNT(*) - 1) AS variance,
           sqrt(({sxx} - {sx} * {sx} / COUNT(*)) / (COUNT(*) - 1)) AS stddev
    FROM lineitem
    GROUP BY l_returnflag
    """.format(
        sx="CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)",
        sxx=(
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)))"
            " AS DOUBLE)"
        ),
    ),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (variance/stddev) from exact decimal moments.

    Built-in stddev/var use merge-order-dependent FP accumulation
    (nondeterministic across partitionings — unusable for reproducible
    pipelines); deriving them from exact Σx and Σx² gives bit-stable results
    at any cluster size, in the same fixed IEEE expression both engines
    evaluate."""
    li = t(spark, sf_dir, "lineitem")
    sx = F.sum(dec("l_quantity")).cast("double")
    sxx = F.sum(dec("l_quantity") * dec("l_quantity")).cast("double")
    n = F.count("*")
    var = (sxx - sx * sx / n) / (n - F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        sx.alias("sum_x"),
        sxx.alias("sum_xx"),
        var.alias("variance"),
        F.sqrt(var).alias("stddev"),
    )


@query(
    "q_agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS median_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (sort-based, so deterministic — unlike FP sums):
    continuous (interpolated) and discrete variants. The exact form is the
    correctness anchor for q_agg_approx's sketches."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)").alias(
            "median_qty_disc"
        ),
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT {avg} FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """.format(avg=SQL_DAVG("i.o_totalprice")),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders > 2× their customer's average) via
    the SQL API — Catalyst de-correlates it into an aggregate + join, the
    planning path subqueries exercise that raw DataFrame code doesn't."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders_sq o
        WHERE o.o_totalprice > 2 * (
            SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(i.o_totalprice)
            FROM orders_sq i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH counted AS (
      SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
      FROM orders GROUP BY o_custkey, o_orderpriority
    ), ranked AS (
      SELECT o_custkey, o_orderpriority, cnt,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM counted
    )
    SELECT o_custkey, o_orderpriority AS modal_priority, cnt AS n_occurrences
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per key: most frequent value with an explicit
    smallest-value tie-break (built-in `mode()` picks an arbitrary value on
    ties in both engines — unusable under the engine's reproducibility
    policy). Count → rank → take: two hash shuffles on small (key, value)
    pairs."""
    o = t(spark, sf_dir, "orders")
    counted = o.groupBy("o_custkey", "o_orderpriority").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("o_custkey").orderBy(F.col("cnt").desc(), F.col("o_orderpriority"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("cnt").alias("n_occurrences"),
        )
    )


@query("q_agg_approx")  # rows-only: sketch internals differ between engines
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB posture: HLL++ count-distinct and
    GK-sketch percentiles avoid the exact-distinct shuffle that dominates at
    scale. Sketch values are engine-specific → rows-only driver check; exact
    bounds are asserted in tests/test_approx_and_lsh.py (and the exact
    anchors live in q_agg_percentile_exact).

    Percentiles project to scalar price_p50/price_p95 columns — the driver's
    canonicalizer cannot hash an array<double> cell (VERDICT r1 #3)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            # one sketch pass; projecting items inside agg() would build the
            # GK sketch once per output column
            F.percentile_approx("l_extendedprice", [0.5, 0.95], 2000).alias("_pcts"),
        )
        .select(
            "l_returnflag",
            "approx_orders",
            F.col("_pcts").getItem(0).alias("price_p50"),
            F.col("_pcts").getItem(1).alias("price_p95"),
        )
    )


# ---------------------------------------------------------------------------
# windows   (ref W1/W2: etl/transform.py:253-261,341-342)
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned ranking (ref W1 dup-repair window, etl/transform.py:253-261)
    with a unique tie-break so every rank is deterministic."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           first_value(o_orderkey) OVER w AS first_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions + running frame (trend deltas / running
    revenue — dashboard §2C #4 generalized). Running sum goes through decimal
    so the cumulative value is exact at every row."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.sum(dec("o_totalprice")).over(wrun).cast("double").alias("running_spend"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag(F.col("o_orderdate").cast("date")).over(w)
        )
        .cast("bigint")
        .alias("days_since_prev"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey
                ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d,
           COUNT(*) OVER (
                PARTITION BY o_custkey
                ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
             AS orders_30d
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): 30-day trailing spend per customer.
    rangeBetween operates on the ORDER BY value, so same-day orders share one
    frame — the rolling-metric semantics rowsBetween can't express."""
    o = t(spark, sf_dir, "orders")
    day_number = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_number)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
        F.count("*").over(w).alias("orders_30d"),
    )


@query(
    "q_dedup_rownum",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_shipdate, l_linenumber, l_quantity) AS rn
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with an explicit survivor rule (earliest shipdate, then
    linenumber, then quantity) — replaces the ref's arbitrary-survivor
    dropDuplicates (etl/transform.py:98,296) and its W1 suffix workaround.

    The ordering covers EVERY output column: the testdata generator emits
    duplicate (orderkey, linenumber, shipdate) rows at sf0.1, so any rows
    still tying after the full ordering are identical in the output —
    deterministic by construction, at every scale."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber", "l_quantity")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )


# ---------------------------------------------------------------------------
# ordering / limits / set ops / distinct
# ---------------------------------------------------------------------------


@query(
    "q_topk",
    oracle="""
    SELECT p.p_partkey, p.p_name, {rev} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY revenue DESC, p.p_partkey
    LIMIT 10
    """.format(rev=SQL_DSUM("l.l_extendedprice")),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (dashboard top-products §2C #7). Catalyst plans
    TakeOrderedAndProject — no global sort materialization. Tie-break on
    p_partkey keeps the k-boundary deterministic."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(dsum("l_extendedprice", "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
        .limit(10)
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
           row_number() OVER (ORDER BY s_nationkey ASC,
                              s_acctbal DESC NULLS LAST, s_suppkey ASC) AS pos
    FROM supplier
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with null placement; the observable artifact is the
    rank under that total order (value hashing is order-insensitive, so the
    sort itself must be witnessed by a column)."""
    s = t(spark, sf_dir, "supplier")
    w = Window.orderBy(
        F.col("s_nationkey").asc(), F.col("s_acctbal").desc_nulls_last(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal", F.row_number().over(w).alias("pos")
    ).orderBy("pos")


@query(
    "q_union",
    oracle="""
    SELECT c_custkey AS entity_key, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (ref U1: etl/extract.py:88-92, etl/transform.py:332,387)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("kind"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_suppkey").alias("entity_key"), F.lit("supplier").alias("kind"))
    )
    return c.unionByName(s)


@query(
    "q_union_missing_cols",
    oracle="""
    SELECT c_custkey AS entity_key, c_acctbal AS balance, NULL AS region_hint
    FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT n_nationkey AS entity_key, NULL AS balance, n_regionkey AS region_hint
    FROM nation
    """,
)
def q_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the ref's U1 union of frames
    with different column sets — absent columns null-padded by NAME, not by
    position (etl/extract.py:88-92, etl/transform.py:332)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("entity_key"),
        F.col("n_regionkey").alias("region_hint"),
    )
    return c.unionByName(n, allowMissingColumns=True).select(
        "entity_key",
        "balance",
        F.col("region_hint").cast("int").alias("region_hint"),
    )


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both finished and open orders."""
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(op)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who never ordered (≡ anti-join, planned
    differently — both surfaces supported)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


@query(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# star / repair / keys / pivot   (the engine-grade versions of the ref's core)
# ---------------------------------------------------------------------------


@query(
    "q_star_join",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lines,
           {rev} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r.r_name, n.n_name
    """.format(
        rev=SQL_DSUM(
            "CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))"
        )
    ),
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: full star query — fact ⋈ order ⋈ 3 broadcast dims,
    date-range filter, grouped revenue (SURVEY §2C #5-#9 on TPC-H shape).
    lineitem⋈orders co-shuffles on orderkey; every dim side is broadcast,
    so the star adds zero extra shuffles at any scale."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    disc_rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(dec(disc_rev, 18, 4)).cast("double").alias("revenue"),
        )
    )


@query(
    "q_null_repair",
    oracle="""
    WITH damaged AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_extendedprice END AS price
      FROM lineitem
    )
    SELECT d.l_orderkey, d.l_linenumber,
           coalesce(d.price, p.p_retailprice) AS repaired_price,
           (d.price IS NULL) AS was_repaired
    FROM damaged d JOIN part p ON d.l_partkey = p.p_partkey
    """,
)
def q_null_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-coalesce lookup repair (ref X8/X9: CEGID missing price ← product
    reference, etl/transform.py:158-170,405) — one broadcast join + coalesce,
    folding the ref's two joins against the same dim into one (SURVEY §4.4)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    damaged = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.when(F.col("l_orderkey") % 97 == 0, None).otherwise(F.col("l_extendedprice")).alias(
            "price"
        ),
    )
    return damaged.join(p, damaged.l_partkey == p.p_partkey).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce("price", "p_retailprice").alias("repaired_price"),
        F.col("price").isNull().alias("was_repaired"),
    )


@query(
    "q_surrogate_keys",
    oracle="""
    SELECT c_custkey,
           row_number() OVER (ORDER BY c_name, c_custkey) AS client_sk
    FROM customer
    """,
)
def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense surrogate keys under an explicit total order (ref W2:
    row_number over a GLOBAL window, etl/transform.py:341-342 — a single-task
    bottleneck). Kept here for oracle parity; the scale-safe variant is
    q_surrogate_keys_scalable."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_name", "c_custkey")
    return c.select("c_custkey", F.row_number().over(w).alias("client_sk"))


@query(
    "q_surrogate_keys_scalable",
    oracle="""
    SELECT c_custkey,
           row_number() OVER (ORDER BY c_name, c_custkey) AS client_sk
    FROM customer
    """,
)
def q_surrogate_keys_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe dense surrogate keys: two-phase range-partition assignment
    (functions/ids.py::dense_ids — range shuffle → local sort → per-partition
    counts → offsets → local row_number). No global window, no single-task
    stage, fully JVM-side; the only cross-node traffic beyond the shuffles is
    one metadata-sized count-per-partition collect. Because (c_name,
    c_custkey) is a total order, the values are deterministic and the oracle
    is the exact global row_number — same answer as q_surrogate_keys, scale-
    safe plan."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return dense_ids(c, ["c_name", "c_custkey"], "client_sk").select(
        "c_custkey", "client_sk"
    )


@query(
    "q_pivot",
    oracle="""
    SELECT month(l_shipdate) AS ship_month,
           {a} AS rev_A, {n} AS rev_N, {r} AS rev_R
    FROM lineitem
    GROUP BY month(l_shipdate)
    """.format(
        a="CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) FILTER (WHERE l_returnflag='A') AS DOUBLE)",
        n="CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) FILTER (WHERE l_returnflag='N') AS DOUBLE)",
        r="CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) FILTER (WHERE l_returnflag='R') AS DOUBLE)",
    ),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot month × return-flag revenue matrix (dashboard month×type,
    SURVEY §2C #4). Pivot values are declared explicitly — no extra distinct
    scan to discover them, and stable output column order.

    r13 measured-and-rejected: rewriting as single-pass conditional
    aggregation (sum(when(flag=V, x)) per flag) removes one Exchange from
    the plan (2 → 1) but the removed exchange carries only
    months × flags × tasks partial rows — metadata-sized at EVERY scale —
    while the conditional form updates 3 aggregation buffers per input row
    where .pivot()'s first stage updates 1. Measured at sf0.1
    (min-of-3, same session, A/B/A/B): exec 0.564-0.659 s (.pivot) vs
    0.601-0.738 s (conditional) — no win, slight per-row regression. The
    canonical .pivot() plan stays. (OPTIMIZATION_r13.md §q_pivot.)"""
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy(F.month("l_shipdate").alias("ship_month"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(dec("l_extendedprice")).cast("double"))
    )
    return piv.select(
        "ship_month",
        F.col("A").alias("rev_A"),
        F.col("N").alias("rev_N"),
        F.col("R").alias("rev_R"),
    )


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT n_nationkey,
             CAST(n_nationkey * 10 AS DOUBLE) AS metric_a,
             CAST(length(n_name) AS DOUBLE) AS metric_b,
             CAST(n_regionkey + 1 AS DOUBLE) AS metric_c
      FROM nation
    )
    SELECT n_nationkey, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (metric_a, metric_b, metric_c))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of q_pivot: wide metric columns → long
    (key, metric, value) rows, the shape feature stores and tidy-data
    pipelines ingest. Spark's native `unpivot` (= SQL UNPIVOT / stack()):
    pure per-row expansion, no shuffle, fixed 3× fan-out."""
    n = t(spark, sf_dir, "nation")
    wide = n.select(
        "n_nationkey",
        (F.col("n_nationkey") * 10).cast("double").alias("metric_a"),
        F.length("n_name").cast("double").alias("metric_b"),
        (F.col("n_regionkey") + 1).cast("double").alias("metric_c"),
    )
    return wide.unpivot(
        ids=["n_nationkey"],
        values=["metric_a", "metric_b", "metric_c"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'P') AS any_partial,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_rev
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregate surface: count_if, FILTER clauses, bool_and/
    bool_or — one pass, partial+final hash agg, no CASE-expression
    contortions. (FILTER'd sums keep the decimal-cast determinism policy.)"""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_partial"),
        F.sum(F.when(F.col("o_orderstatus") == "O", dec("o_totalprice")))
        .cast("double")
        .alias("open_rev"),
    )


@query(
    "q_scd2",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, c_name, c_acctbal, DATE '2024-01-01' AS eff_date
      FROM customer
    ), v2 AS (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal,
             DATE '2024-06-01' AS eff_date
      FROM customer WHERE c_custkey % 2 = 0
    ), allv AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    ), versioned AS (
      SELECT c_custkey, c_name, c_acctbal, eff_date,
             lead(eff_date) OVER (PARTITION BY c_custkey ORDER BY eff_date)
               AS next_eff,
             row_number() OVER (PARTITION BY c_custkey ORDER BY eff_date DESC)
               AS rn_desc
      FROM allv
    )
    SELECT c_custkey, c_name, c_acctbal,
           eff_date AS valid_from,
           COALESCE(CAST(next_eff - INTERVAL 1 DAY AS DATE), DATE '9999-12-31')
             AS valid_to,
           (rn_desc = 1) AS is_current
    FROM versioned
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: every attribute change becomes a
    new effective-dated row; [valid_from, valid_to] intervals tile each
    key's timeline and exactly one row per key is current. Built from a
    deterministic simulated update wave (even keys change balance) so both
    engines derive identical versions. Shape: union snapshots → one window
    pass per key (lead + reverse rank) — no self-join, one shuffle on the
    dimension key; at 100 TB the update wave is the daily delta and the
    union prunes to changed keys first (merge_by_key's month scoping,
    applied to keys)."""
    c = t(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey", "c_name", "c_acctbal", F.lit("2024-01-01").cast("date").alias("eff_date")
    )
    v2 = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit("2024-06-01").cast("date").alias("eff_date"),
        )
    )
    allv = v1.unionByName(v2)
    w = Window.partitionBy("c_custkey").orderBy("eff_date")
    wd = Window.partitionBy("c_custkey").orderBy(F.col("eff_date").desc())
    return allv.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.col("eff_date").alias("valid_from"),
        F.coalesce(
            F.date_sub(F.lead("eff_date").over(w), 1), F.lit("9999-12-31").cast("date")
        ).alias("valid_to"),
        (F.row_number().over(wd) == 1).alias("is_current"),
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE spine(dt) AS (
      SELECT DATE '1996-01-01'
      UNION ALL
      SELECT dt + INTERVAL 1 DAY FROM spine WHERE dt < DATE '1996-03-31'
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dt, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT CAST(s.dt AS DATE) AS dt,
           COALESCE(d.n, 0) AS n_orders,
           COALESCE(d.rev, 0.0) AS revenue
    FROM spine s LEFT JOIN daily d ON CAST(s.dt AS DATE) = d.dt
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) generating a Q1-1996 date
    spine, left-joined to daily order counts — the zero-filled-time-series
    ("gap fill") pattern dashboards need, where missing days must appear
    with 0 rather than vanish. Runs through the engine's SQL API path
    (register_views + spark.sql) — the spine is 91 driver-side rows, the
    orders aggregation is the usual pushed-filter partial agg."""
    from finegourmet_spark.sources.testdata import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(dt) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT dt + INTERVAL '1' DAY FROM spine WHERE dt < DATE '1996-03-31'
        ), daily AS (
          SELECT CAST(o_orderdate AS DATE) AS dt, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1996-04-01'
          GROUP BY 1
        )
        SELECT s.dt AS dt,
               COALESCE(d.n, 0) AS n_orders,
               COALESCE(d.rev, 0.0) AS revenue
        FROM spine s LEFT JOIN daily d ON s.dt = d.dt
        """
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING)
             AS second_best_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank/cume_dist/nth_value) —
    the remaining ANSI window surface beside q_window_rank's ranking tier
    and q_window_analytic's offset tier. Unique tie-break keeps every value
    deterministic; percent_rank/cume_dist are single IEEE divisions of
    integer counts (engine-portable)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(wall).alias("second_best_order"),
    )


# ---------------------------------------------------------------------------
# semi-structured: JSON / arrays / maps   (ref S3 multiline JSON scan → engine
# extension to JSON scalar functions and collection types)
# ---------------------------------------------------------------------------


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0) AS k_round,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_parsed,
           '{"k":' || json_extract_string(props, '$.k') || '}' AS rebuilt
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-a-column surface (ref S3 reads JSON files; the engine also
    processes embedded JSON): get_json_object path extraction, from_json to
    a typed struct, to_json round-trip (compact serialization in both
    engines)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    parsed = F.from_json("props", "k bigint")
    return e.select(
        "event_id",
        k.alias("k_value"),
        ((k % 10) == 0).alias("k_round"),
        parsed["k"].alias("k_parsed"),
        F.to_json(parsed).alias("rebuilt"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           string_split(text, ' ')[1] AS first_tok,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab
    FROM documents
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: split/size/contains/element_at/distinct/sort/join."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
    )


@query(
    "q_explode_wordcount",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    HAVING COUNT(*) >= 5
    """,
)
def q_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + aggregate (the canonical lateral-view shape)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT doc_id,
           'lang' AS first_key,
           lang AS lang_val,
           2 AS n_keys
    FROM documents
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access (map_from_arrays/element_at/map_keys).
    The oracle sees through the map — DuckDB checks the extracted values."""
    d = t(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, F.lit("lang")).alias("lang_val"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           string_agg(o_orderpriority, ',' ORDER BY o_orderpriority, o_orderkey)
             AS priorities
    FROM orders
    WHERE o_custkey % 50 = 0
    GROUP BY o_custkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ANSI LISTAGG / STRING_AGG): per-key
    concatenation in an EXPLICIT total order — collect_list alone is
    partition-order-nondeterministic, so the list is built as
    (sort_key, value) structs, array_sort'ed (struct comparison is
    field-order lexicographic), then projected and joined. One hash agg;
    the per-group sort is bounded by group size, not corpus size."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    pairs = F.collect_list(F.struct("o_orderpriority", "o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.array_join(
            F.transform(F.array_sort(pairs), lambda s: s["o_orderpriority"]), ","
        ).alias("priorities"),
    )


@query(
    "q_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 customers
    per nation) — the ANSI lateral-join surface, via the SQL API.

    Catalyst decorrelates the per-row subquery into a window/rank over ONE
    customer shuffle (never a per-nation re-scan) — the planner path this
    exercises is distinct from both q_scalar_subquery (scalar decorrelation)
    and the DataFrame window formulation of top-k-per-group
    (q_window_rank). Ties are impossible: c_custkey is in the sort."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation_lat n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_lat
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        """
    )


@query(
    "q_skyline_pareto",
    oracle="""
    SELECT a.p_partkey, a.p_size, a.p_retailprice
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_size <= a.p_size AND b.p_retailprice >= a.p_retailprice
        AND (b.p_size < a.p_size OR b.p_retailprice > a.p_retailprice))
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over parts: maximize p_retailprice,
    minimize p_size. A part survives iff no other part is at least as good
    on both axes and strictly better on one — the SKYLINE OF verb of
    preference-query engines; the oracle states raw dominance (NOT EXISTS
    anti-join), the engine uses the scalable decomposition.

    Scale shape: per-size max-price candidates first (ONE map-side-combined
    agg — only per-size champions can be on the frontier; any same-size
    cheaper part is strictly dominated by its champion). The frontier test
    "best(size) > max best over strictly smaller sizes" then runs as a
    running-max window over the |distinct sizes| frame — metadata-scale
    (50 rows here; bounded by the attribute's cardinality, not row count).
    Survivors broadcast back to pick up ALL parts achieving the champion
    price (double equality on untouched stored values — no arithmetic, so
    bit-exact in both engines). Never an all-pairs dominance join."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    cand = p.groupBy("p_size").agg(F.max("p_retailprice").alias("best"))
    # metadata-scale global window (|distinct p_size| rows, like the
    # PageRank top-N rank) — NOT a data-scale SinglePartition stage
    w = Window.orderBy("p_size").rowsBetween(Window.unboundedPreceding, -1)
    surv = (
        cand.withColumn("prev_best", F.max("best").over(w))
        .filter(F.col("prev_best").isNull() | (F.col("best") > F.col("prev_best")))
        .select(F.col("p_size").alias("s_size"), "best")
    )
    return p.join(
        F.broadcast(surv),
        (p["p_size"] == surv["s_size"]) & (p["p_retailprice"] == surv["best"]),
    ).select("p_partkey", "p_size", "p_retailprice")


ALLOC_UNITS = 1_000_000  # budget apportioned across nations


@query(
    "q_allocation_largest_remainder",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), sh AS (
      SELECT n_name, rev_cents,
             ({ALLOC_UNITS}::HUGEINT * rev_cents)
               // SUM(rev_cents) OVER () AS fl,
             ({ALLOC_UNITS}::HUGEINT * rev_cents)
               % SUM(rev_cents) OVER () AS rem
      FROM rev
    ), rk AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, n_name) AS rnk,
             {ALLOC_UNITS} - SUM(fl) OVER () AS leftover
      FROM sh
    )
    SELECT n_name, rev_cents,
           CAST(fl + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_units
    FROM rk
    """,
)
def q_allocation_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional apportionment: split a fixed budget of {ALLOC_UNITS}
    units across nations in proportion to revenue, via the
    LARGEST-REMAINDER (Hamilton) method — floor shares first, then the
    leftover units go to the largest fractional remainders (ties broken by
    name). The standard way to turn fractional quotas into integers that
    sum EXACTLY to the budget — naive per-row rounding drifts.

    All arithmetic is integer (revenue as exact decimal cents; floor
    share and remainder via div/%, nonneg operands so Spark `div` equals
    DuckDB `//`). Scale shape: one fact-side agg keyed by nation; nation is
    hint-broadcast (bounded 25 rows), customer is left to AQE's size check
    since it scales with sf. Every window after that runs over the
    |nations| frame — metadata-scale."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sh = rev.select(
        "n_name",
        "rev_cents",
        # ALLOC_UNITS·national-cents passes int64 near sf10 — decimal(38,0)/
        # HUGEINT per the q_crosstab_chi2 width rule
        F.expr(
            f"({ALLOC_UNITS} * cast(rev_cents as decimal(38,0)))"
            " div sum(rev_cents) over ()"
        ).alias("fl"),
        (F.lit(ALLOC_UNITS) * F.col("rev_cents").cast("decimal(38,0)"))
        .__mod__(F.sum("rev_cents").over(everything))
        .alias("rem"),
    )
    rk = sh.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "n_name"))
        .alias("rnk"),
        (F.lit(ALLOC_UNITS) - F.sum("fl").over(everything)).alias("leftover"),
    )
    return rk.select(
        "n_name",
        "rev_cents",
        (
            F.col("fl") + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_units"),
    )


# ABC revenue-class boundaries as exact rationals of total revenue:
# class A = parts up to 80% cumulative share, B to 95%, C the tail.
ABC_A_NUM, ABC_A_DEN = 4, 5
ABC_B_NUM, ABC_B_DEN = 19, 20


@query(
    "q_abc_analysis",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT l_partkey, rev_cents,
             SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
             SUM(rev_cents) OVER () AS total
      FROM rev
    ), classed AS (
      SELECT CASE WHEN {ABC_A_DEN}::HUGEINT * cum
                       <= {ABC_A_NUM}::HUGEINT * total THEN 'A'
                  WHEN {ABC_B_DEN}::HUGEINT * cum
                       <= {ABC_B_NUM}::HUGEINT * total THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_cents
      FROM cum
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY 1
    """,
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: rank parts by revenue, class
    A = the head covering 80% of cumulative revenue, B to 95%, C the tail
    — the classic operations-analytics cut ('which 20% of SKUs make 80% of
    the money').

    The cumulative share needs a GLOBAL prefix sum in revenue order — the
    naive window is a SinglePartition sort over every part, so the engine
    uses the hierarchical running_total (functions/ids.py: range-partition
    on (−revenue, partkey), per-partition sums, driver offsets) — the
    q_sample_weighted / q_surrogate_keys_scalable machinery; the oracle
    states the same semantics as one window. Class tests are integer
    cross-multiplications ({ABC_A_DEN}·cum ≤ {ABC_A_NUM}·total), never a
    share division; revenue is exact decimal cents. The final class
    rollup is 3 rows."""
    from finegourmet_spark.functions.ids import running_total

    rev = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
        .withColumn("neg_rev", -F.col("rev_cents"))
    )
    tot = rev.agg(F.sum("rev_cents").alias("total"))
    cum = running_total(rev, ["neg_rev", "l_partkey"], "rev_cents", "cum")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            # 20·total-cents has only ~2x headroom in int64 at 100 TB —
            # cross-multiply in decimal(38,0)/HUGEINT (the width rule)
            F.when(
                ABC_A_DEN * F.col("cum").cast("decimal(38,0)")
                <= ABC_A_NUM * F.col("total").cast("decimal(38,0)"),
                "A",
            )
            .when(
                ABC_B_DEN * F.col("cum").cast("decimal(38,0)")
                <= ABC_B_NUM * F.col("total").cast("decimal(38,0)"),
                "B",
            )
            .otherwise("C")
            .alias("abc_class"),
            "rev_cents",
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
        )
    )


# Incremental-maintenance split: rows before this date are the "already
# aggregated" snapshot, the rest arrive as the delta batch.
IVM_SPLIT = "1999-01-01"


@query(
    "q_incremental_agg_maintenance",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
           l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS rev_cents
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-view maintenance: a monthly revenue snapshot
    aggregated from history (ship dates before IVM_SPLIT) is brought up to
    date by MERGING the delta batch's partial aggregates — never by
    re-scanning history. The oracle is the full recompute over all rows;
    the claim is merge(partial(base), partial(delta)) == full, exactly.

    This is the maintenance step behind every materialized rollup at
    100 TB: count and decimal-sum are distributive, so the snapshot and
    the delta each reduce map-side to (key, n, cents) partials and the
    merge is a union + re-sum on the PARTIAL frames — key-cardinality
    scale, not data scale. The daily refresh cost is O(delta), while the
    oracle's formulation costs O(history) every run. (avg/stddev would
    store (n, Σx, Σx²) the same way; MIN/MAX are also mergeable; exact
    COUNT DISTINCT is the one that needs a bitmap —
    q_bitmap_distinct_rollup.) Parquet-level MERGE mechanics live in
    star/load.py::merge_by_key; this is the algebraic core."""
    li = t(spark, sf_dir, "lineitem").select(
        F.to_date(F.date_trunc("month", F.col("l_shipdate"))).alias("month_start"),
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_shipdate"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("month_start", "l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").alias("cents_dec"),
        )

    base = partial(li.filter(F.col("l_shipdate") < IVM_SPLIT))
    delta = partial(li.filter(F.col("l_shipdate") >= IVM_SPLIT))
    return (
        base.unionByName(delta)
        .groupBy("month_start", "l_returnflag")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            (F.sum("cents_dec") * 100).cast("bigint").alias("rev_cents"),
        )
    )


# Weighted-median bucket width (cents): price domain is bounded, so the
# bucket frame is metadata-scale no matter how many rows feed it.
WM_BUCKET = 100_000  # $1000


@query(
    "q_weighted_median",
    oracle="""
    WITH vw AS (
      SELECT l_returnflag AS f,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT f, v,
             SUM(w) OVER (PARTITION BY f ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c,
             SUM(w) OVER (PARTITION BY f) AS tot
      FROM vw
    )
    SELECT f AS l_returnflag,
           CAST(MIN(CASE WHEN 2 * c >= tot THEN v END) AS BIGINT)
             AS w_median_cents,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM cum GROUP BY 1
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag (lower-median
    convention: the smallest price v with 2·cumweight(≤v) ≥ totalweight),
    integer cents end-to-end.

    The naive form is one cumulative-sum window per flag — with 3 flags
    that is 3 near-global sorted partitions, the SinglePartition shape the
    engine bans. The scalable exact pattern is TWO-PHASE BUCKETING (the
    classic distributed exact-quantile): (1) collapse to value grain
    (map-side combined), (2) roll value weights up to $1000 buckets — the
    bucket frame is PRICE-DOMAIN-scale, metadata no matter the row count —
    and prefix-sum it to locate the unique bucket that straddles the
    half-weight point, (3) prefix-sum value-grain weights ONLY inside that
    one bucket (a ≤ WM_BUCKET-cent slice) with the straddle bucket's prior
    cumweight carried in. Every comparison is the integer cross-product
    2·c ≥ tot — no halving division. The oracle states the same semantics
    as one direct window; equality proves the bucket decomposition is
    lossless."""
    vw = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("f"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    wb = vw.groupBy("f", F.expr(f"v div {WM_BUCKET}").alias("b")).agg(
        F.sum("w").alias("wb")
    )
    bwin = Window.partitionBy("f").orderBy("b")
    cumb = wb.withColumn("cumb", F.sum("wb").over(bwin))
    tot = wb.groupBy("f").agg(F.sum("wb").alias("tot"))
    target = (
        cumb.join(tot, "f")
        .filter(2 * F.col("cumb") >= F.col("tot"))
        .groupBy("f")
        .agg(
            F.min_by(F.struct("b", "cumb", "wb"), "b").alias("t"),
            F.first("tot").alias("tot"),
        )
        .select(
            "f",
            F.col("t.b").alias("b"),
            (F.col("t.cumb") - F.col("t.wb")).alias("prior"),
            "tot",
        )
    )
    vwin = Window.partitionBy("f").orderBy("v")
    inside = (
        vw.join(F.broadcast(target), ["f"])
        .filter(F.expr(f"v div {WM_BUCKET}") == F.col("b"))
        .withColumn("cumv", F.sum("w").over(vwin))
        .filter(2 * (F.col("prior") + F.col("cumv")) >= F.col("tot"))
    )
    return inside.groupBy(F.col("f").alias("l_returnflag")).agg(
        F.min("v").cast("bigint").alias("w_median_cents"),
        F.first("tot").cast("bigint").alias("total_weight"),
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_SCALE = 1_000_000_000  # per-term floor scale (nano-units)
RRF_TOPN = 10


@query(
    "q_rrf_fusion",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_partkey,
             row_number() OVER (ORDER BY rev_cents DESC, l_partkey) AS ra,
             row_number() OVER (ORDER BY n_orders DESC, l_partkey) AS rb
      FROM rev
    ), fused AS (
      SELECT l_partkey, CAST(ra AS BIGINT) AS rank_revenue,
             CAST(rb AS BIGINT) AS rank_orders,
             {RRF_SCALE} // ({RRF_K} + ra) + {RRF_SCALE} // ({RRF_K} + rb)
               AS score
      FROM ranked
    )
    SELECT l_partkey, rank_revenue, rank_orders,
           CAST(score AS BIGINT) AS rrf_score_nano
    FROM fused ORDER BY score DESC, l_partkey LIMIT {RRF_TOPN}
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two part rankings — by revenue and by
    order count — the standard hybrid-retrieval combiner (BM25 ⊕ vector
    ranks in search stacks; here two purchase signals on the same
    catalog). score = Σ floor(1e9/(K+rank)) with K = RRF_K: each term is
    floored at nano scale BEFORE the sum, so the fused ordering is
    integer-exact across engines.

    Both rankings are GLOBAL row_numbers over the part-grain aggregate —
    at catalog scale that is the single-task window the engine bans, so
    ranks come from the hierarchical dense_ids assigner (range-partition
    on (−measure, key) → per-partition counts → driver offsets), the
    q_abc_analysis machinery; the oracle states the same ranks as two
    plain windows. Final top-{RRF_TOPN} is orderBy+limit
    (TakeOrderedAndProject — no global sort materialization)."""
    from finegourmet_spark.functions.ids import dense_ids

    rev = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .withColumn("neg_rev", -F.col("rev_cents"))
        .withColumn("neg_cnt", -F.col("n_orders"))
    )
    ra = dense_ids(rev, ["neg_rev", "l_partkey"], "ra").select("l_partkey", "ra")
    rb = dense_ids(rev, ["neg_cnt", "l_partkey"], "rb").select("l_partkey", "rb")
    return (
        ra.join(rb, "l_partkey")
        .select(
            "l_partkey",
            F.col("ra").cast("bigint").alias("rank_revenue"),
            F.col("rb").cast("bigint").alias("rank_orders"),
            (
                F.expr(f"{RRF_SCALE} div ({RRF_K} + ra)")
                + F.expr(f"{RRF_SCALE} div ({RRF_K} + rb)")
            )
            .cast("bigint")
            .alias("rrf_score_nano"),
        )
        .orderBy(F.desc("rrf_score_nano"), F.asc("l_partkey"))
        .limit(RRF_TOPN)
    )


@query(
    "q_variant_funcs",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS distinct_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 1
    GROUP BY 1
    """,
)
def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path over semi-structured payloads: parse_json lifts
    ``events.props`` into the binary VARIANT encoding once, variant_get
    extracts a TYPED long (no per-access string re-parse — the point of
    VARIANT vs get_json_object at 100 TB: parse once, then typed
    sub-linear field reads), and the filter/aggregate run on the extracted
    column. The oracle reads the same field through DuckDB's JSON path —
    typed equality across two completely different semi-structured
    encodings.

    Plan shape: pure projection + one map-side-combined hash agg; the
    VARIANT column itself never shuffles (only the extracted long does)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return (
        ev.filter(F.col("k") % 2 == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("distinct_k"),
        )
    )


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS rev_cents
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY 1, 2
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 ``|>`` operators, the
    FROM-first/ZetaSQL composable form): the same filtered revenue rollup
    the classic oracle states, written as a left-to-right pipeline —
    FROM |> WHERE |> AGGREGATE ... GROUP BY. One registered query proves
    the engine's SQL surface accepts the pipe dialect and that Catalyst
    plans it identically to the classic form (same pushdown, same
    partial/final agg — the syntax desugars before optimization, so the
    100 TB posture is unchanged)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_quantity > 10
        |> AGGREGATE count(*) AS n_lines,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                          AS BIGINT) AS rev_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus,
                  CAST(n_lines AS BIGINT) AS n_lines, rev_cents
        """
    )


LATE_DIM_MOD = 13  # part keys divisible by this are "late" (absent from dim)


@query(
    "q_late_arriving_dim",
    oracle=f"""
    WITH dim AS (
      SELECT p_partkey, p_name FROM part WHERE p_partkey % {LATE_DIM_MOD} <> 0
    ), inferred AS (
      SELECT DISTINCT l.l_partkey AS p_partkey
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.p_partkey = l.l_partkey)
    )
    SELECT p_partkey, p_name, FALSE AS is_inferred FROM dim
    UNION ALL
    SELECT p_partkey, 'UNKNOWN' AS p_name, TRUE AS is_inferred FROM inferred
    """,
)
def q_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling (inferred members): facts may
    reference dimension keys the dim feed hasn't delivered yet; instead of
    dropping or failing those fact rows, the load emits PLACEHOLDER dim
    members for every fact key missing from the dimension, flagged
    is_inferred so the real attributes overwrite them when the late feed
    lands (the q_scd2 / merge_by_key update path). The reference silently
    leaves such facts with NULL FKs (its missing-product audit,
    reference etl/transform.py:173-178, just prints them); this is the
    warehouse-correct alternative.

    The late feed is simulated by withholding part keys divisible by
    {LATE_DIM_MOD}. Plan shape: distinct fact keys (map-side combined,
    key-grain) → ONE co-keyed LEFT ANTI join against the dim → union with
    the dim itself. Nothing data-scale shuffles except (partkey) pairs."""
    dim = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % LATE_DIM_MOD != 0)
        .select("p_partkey", "p_name")
    )
    inferred = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
        .join(dim, "p_partkey", "left_anti")
        .select(
            "p_partkey",
            F.lit("UNKNOWN").alias("p_name"),
            F.lit(True).alias("is_inferred"),
        )
    )
    return dim.withColumn("is_inferred", F.lit(False)).unionByName(inferred)


# SQL-defined scalar function (Spark 4 SQL UDF surface): price banding used
# by the q_sql_scalar_function rollup. Bands in whole cents so the function
# body is pure integer CASE logic.
SQLF_BANDS = ((100_000, "low"), (400_000, "mid"))  # upper cent bounds


@query(
    "q_sql_scalar_function",
    oracle=f"""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    )
    SELECT CASE WHEN cents < {SQLF_BANDS[0][0]} THEN '{SQLF_BANDS[0][1]}'
                WHEN cents < {SQLF_BANDS[1][0]} THEN '{SQLF_BANDS[1][1]}'
                ELSE 'high' END AS price_band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM c GROUP BY 1
    """,
)
def q_sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 ``CREATE FUNCTION … RETURN
    expr``): business logic declared ONCE in the catalog as a SQL UDF and
    reused across queries — the governed alternative to copy-pasted CASE
    ladders, and (unlike a Python UDF) fully visible to Catalyst: the
    function body inlines into the plan, so pushdown/codegen treat it as
    a native expression and the Python slow path never enters.

    The oracle states the inlined body directly; equality proves the
    catalog indirection changes nothing. The function body is integer
    CASE logic over exact cents — nothing engine-specific."""
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION fg_price_band(cents BIGINT)
        RETURNS STRING
        RETURN CASE WHEN cents < {SQLF_BANDS[0][0]} THEN '{SQLF_BANDS[0][1]}'
                    WHEN cents < {SQLF_BANDS[1][0]} THEN '{SQLF_BANDS[1][1]}'
                    ELSE 'high' END
        """
    )
    t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    ).createOrReplaceTempView("orders_sqlf")
    return spark.sql(
        """
        SELECT fg_price_band(cents) AS price_band,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS rev_cents
        FROM orders_sqlf GROUP BY 1
        """
    )


@query(
    "q_share_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), shares AS (
      SELECT r_name, n_name, rev_cents,
             SUM(rev_cents) OVER (PARTITION BY r_name) AS region_cents,
             SUM(rev_cents) OVER () AS total_cents
      FROM rev
    )
    SELECT r_name, n_name, rev_cents,
           CAST((1000000::HUGEINT * rev_cents) // region_cents AS BIGINT)
             AS nation_share_ppm,
           CAST((1000000::HUGEINT * region_cents) // total_cents AS BIGINT)
             AS region_share_ppm
    FROM shares
    """,
)
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent hierarchy report: nation revenue as a fraction of
    its region, region as a fraction of the grand total — the '% of
    parent' OLAP verb every drill-down dashboard shows next to the raw
    measure (dashboard queries 5-8 are its leaves, SURVEY §2C). Shares
    are floor-ppm over exact decimal cents (nonneg ⇒ div == //); the ppm
    numerator 1e6·cents rides decimal(38,0)/HUGEINT (the q_crosstab_chi2
    rule) — region sums pass int64's 9.2e18 ceiling near sf10
    (~1.5e13 cents · 1e6), where BIGINT wraps silently in Spark and
    errors in DuckDB (caught by the round-6 sf10 parity spot-check).

    Scale shape: the data-scale work is ONE map-side-combined aggregate
    over orders joined to nation/region (hint-broadcast, bounded) and
    customer (size-aware via AQE — it scales with sf); everything after runs on
    the (region × nation) frame — ≤ 25 rows of metadata, where the
    parent-sum windows are free. The 100 TB cost is the fact scan,
    exactly as it should be."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cdim = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(cdim, o["o_custkey"] == cdim["c_custkey"])
        .join(F.broadcast(n), cdim["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    return rev.select(
        "r_name",
        "n_name",
        "rev_cents",
        F.expr(
            "cast((1000000 * cast(rev_cents as decimal(38,0)))"
            " div sum(rev_cents) over (partition by r_name) as bigint)"
        ).alias("nation_share_ppm"),
        F.expr(
            "cast((1000000 * cast(sum(rev_cents) over (partition by r_name)"
            " as decimal(38,0))) div sum(rev_cents) over () as bigint)"
        ).alias("region_share_ppm"),
    )


TOPN_OTHERS_N = 5


@query(
    "q_topn_others",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY 1
    ), top AS (
      SELECT l_partkey, rev_cents,
             row_number() OVER (ORDER BY rev_cents DESC, l_partkey) AS rnk
      FROM rev
      ORDER BY rev_cents DESC, l_partkey LIMIT {TOPN_OTHERS_N}
    ), tot AS (SELECT SUM(rev_cents) AS total FROM rev)
    SELECT CAST(rnk AS INT) AS rank, CAST(l_partkey AS VARCHAR) AS label,
           rev_cents
    FROM top
    UNION ALL
    SELECT {TOPN_OTHERS_N} + 1, 'OTHER',
           CAST(tot.total - (SELECT SUM(rev_cents) FROM top) AS BIGINT)
    FROM tot
    """,
)
def q_topn_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Top N + Other' rollup: the {TOPN_OTHERS_N} highest-revenue parts as
    named rows plus one OTHER row absorbing the entire tail — the
    chart-legend verb every dashboard pie/bar uses (SURVEY §2C rows 7-8
    show exactly this shape with the tail implicit; production charts
    must make it explicit or the shares lie).

    Scale shape: one part-grain aggregate; the head via
    TakeOrderedAndProject (never a global sort), ranked AFTER the limit on
    a {TOPN_OTHERS_N}-row frame; OTHER = grand total − head total, two
    scalar aggregates — so the tail is never ranked, only summed. Exact
    decimal cents; head ties broken by part key."""
    rev = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    top = rev.orderBy(F.desc("rev_cents"), F.asc("l_partkey")).limit(
        TOPN_OTHERS_N
    )
    # rank the 5-row head (metadata-scale window, documented)
    wr = Window.orderBy(F.desc("rev_cents"), F.asc("l_partkey"))
    head = top.select(
        F.row_number().over(wr).cast("int").alias("rank"),
        F.col("l_partkey").cast("string").alias("label"),
        "rev_cents",
    )
    tot = rev.agg(F.sum("rev_cents").alias("total"))
    head_sum = top.agg(F.sum("rev_cents").alias("head_total"))
    other = (
        tot.crossJoin(head_sum)
        .select(
            F.lit(TOPN_OTHERS_N + 1).cast("int").alias("rank"),
            F.lit("OTHER").alias("label"),
            (F.col("total") - F.col("head_total")).cast("bigint").alias(
                "rev_cents"
            ),
        )
    )
    return head.unionByName(other)


@query(
    "q_try_arithmetic",
    oracle="""
    WITH li AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE qty = 10) AS BIGINT) AS n_div_null,
           CAST(SUM(CAST(FLOOR(cents / NULLIF(qty - 10, 0)) AS BIGINT))
                AS BIGINT) AS sum_floor_ratio,
           CAST(count(TRY_CAST(l_returnflag AS INTEGER)) AS BIGINT)
             AS n_castable
    FROM li GROUP BY 1
    """,
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety surface: ``try_divide`` / ``try_cast`` return NULL
    where strict ANSI arithmetic would ABORT THE JOB (division by zero,
    invalid cast). The engine runs ANSI-on (Spark 4 default, and the
    driver's vanilla session) — at 100 TB one poisoned row must not kill
    a 10-hour job, and silently-wrong legacy coercion is worse; try_* is
    the deliberate middle: errors become NULLs that aggregate visibly
    (n_div_null counts them).

    The oracle expresses the same semantics with NULLIF guards and
    TRY_CAST. Per-row floor(cents/(qty−10)) is one IEEE division + floor
    — both engines compute the identical double, so the bigint sum is
    exact; the qty=10 rows contribute NULL (dropped by SUM) and are
    counted separately."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("qty") == 10, 1)).cast("bigint").alias(
            "n_div_null"
        ),
        F.sum(
            F.floor(F.expr("try_divide(cents, qty - 10)")).cast("bigint")
        )
        .cast("bigint")
        .alias("sum_floor_ratio"),
        F.count(F.expr("try_cast(l_returnflag AS INT)"))
        .cast("bigint")
        .alias("n_castable"),
    )


@query(
    "q_bitwise_agg",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
    )
    SELECT l_returnflag,
           CAST(bit_and(qty) AS BIGINT) AS and_qty,
           CAST(bit_or(qty) AS BIGINT) AS or_qty,
           CAST(bit_xor(qty) AS BIGINT) AS xor_qty,
           CAST(SUM(1 << CAST(qty % 8 AS INTEGER)) AS BIGINT) AS sum_flags
    FROM li GROUP BY 1
    """,
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate surface (ANSI BIT_AND/BIT_OR/BIT_XOR + shifts):
    the flag-mask verbs behind permission rollups, feature-bit unions,
    and XOR checksums. All three aggregates are associative and
    commutative, so they partial-combine map-side and are
    partitioning-invariant by algebra — the cheapest kind of exactness.
    sum_flags folds a shifted bit per row (the bitmap-building primitive
    in miniature)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    )
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_and(qty)").cast("bigint").alias("and_qty"),
        F.expr("bit_or(qty)").cast("bigint").alias("or_qty"),
        F.expr("bit_xor(qty)").cast("bigint").alias("xor_qty"),
        F.sum(F.expr("shiftleft(1L, cast(qty % 8 as int))"))
        .cast("bigint")
        .alias("sum_flags"),
    )



LAMBDA_MIN_LEN = 4  # token-length threshold exercised by the lambda chain


@query(
    "q_lambda_funcs",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             list_filter(string_split(text, ' '), w -> w <> '') AS toks
      FROM documents
    ), per AS (
      SELECT lang,
             len(list_filter(toks, w -> len(w) >= {LAMBDA_MIN_LEN}))
               AS n_long,
             list_aggregate(list_transform(toks, w -> len(w)), 'sum')
               AS total_chars,
             CASE WHEN len(list_filter(toks, w -> len(w) >= 10)) > 0
                  THEN 1 ELSE 0 END AS has_10
      FROM d
    )
    SELECT lang,
           CAST(SUM(n_long) AS BIGINT) AS long_tokens,
           CAST(SUM(total_chars) AS BIGINT) AS total_chars,
           CAST(SUM(has_10) AS BIGINT) AS docs_with_10plus
    FROM per GROUP BY 1
    """,
)
def q_lambda_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — lambda filter / transform /
    aggregate / exists — the collection-processing surface that keeps
    nested-data logic INSIDE the JVM expression engine (the alternatives
    are exploding to rows or dropping to Python; HOFs do neither: no
    Generate, no shuffle, no Arrow boundary for the per-doc math —
    plan-asserted). All lambda bodies here are integer (token lengths),
    so cross-engine equality is exact; DuckDB's list_* family states the
    same semantics.

    Composes per doc: filter empties → length-filter count / transform-
    to-lengths + sequential integer fold / exists flag — then one
    map-side-combined language rollup."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.expr("filter(split(text, ' '), w -> w != '')").alias("toks"),
    ).select(
        "lang",
        F.size(
            F.expr(f"filter(toks, w -> length(w) >= {LAMBDA_MIN_LEN})")
        ).alias("n_long"),
        F.expr(
            "aggregate(transform(toks, w -> length(w)), 0L, (a, x) -> a + x)"
        ).alias("total_chars"),
        F.expr(
            "CASE WHEN exists(toks, w -> length(w) >= 10) THEN 1 ELSE 0 END"
        ).alias("has_10"),
    )
    return d.groupBy("lang").agg(
        F.sum("n_long").cast("bigint").alias("long_tokens"),
        F.sum("total_chars").cast("bigint").alias("total_chars"),
        F.sum("has_10").cast("bigint").alias("docs_with_10plus"),
    )


@query(
    "q_xml_funcs",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY 1
    """,
)
def q_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (Spark 4 native XML): each order serializes to an XML
    fragment, then ``from_xml`` parses it back to a typed struct and
    ``xpath_int`` reads a field through the XPath route — the legacy-feed
    ingestion path (B2B/EDI, config exports) exercised end-to-end. The
    oracle aggregates the ORIGINAL columns directly: equality proves
    parse(serialize(row)) is lossless through both the schema route and
    the XPath route, typed values included.

    Pure projection work — the XML never shuffles; the rollup is
    map-side-combined on the extracted columns."""
    o = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("<o><k>"),
            F.col("o_orderkey").cast("string"),
            F.lit("</k><p>"),
            F.col("o_orderpriority"),
            F.lit("</p><c>"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("string"),
            F.lit("</c></o>"),
        ).alias("xml")
    )
    parsed = o.select(
        F.expr("from_xml(xml, 'k BIGINT, p STRING, c BIGINT')").alias("s"),
        F.expr("xpath_long(xml, '/o/k')").alias("xk"),
    )
    return parsed.groupBy(F.col("s.p").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("s.c").cast("bigint").alias("sum_cents"),
        F.max("xk").cast("bigint").alias("max_key"),
    )


@query(
    "q_collation_compare",
    oracle="""
    WITH m AS (
      SELECT c_nationkey,
             CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg2
      FROM customer
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT seg2) AS BIGINT) AS distinct_binary,
           CAST(count(DISTINCT lower(seg2)) AS BIGINT) AS distinct_ci
    FROM m GROUP BY 1
    """,
)
def q_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): the same distinct-count under binary
    vs UTF8_LCASE collation — entity counting where casing varies by
    source (the reference's email-normalization bug class,
    etl/transform.py:372 vs :393, solved at the TYPE level instead of
    scattered lower() calls). Mixed casing is synthesized
    deterministically over the low-cardinality segment column (even keys
    upper, odd lower), so case variants of the SAME value really collide:
    distinct_binary counts up to 2× distinct_ci, and the collated count
    provably matches the oracle's lower()-normalized one.

    Collation comparison happens inside the hash aggregate — no
    normalization projection materializes the lowercased string for the
    pipeline; the collated column carries its comparison semantics."""
    m = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper(F.col("c_mktsegment"))
        )
        .otherwise(F.lower(F.col("c_mktsegment")))
        .alias("seg2"),
    )
    return m.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("seg2").cast("bigint").alias("distinct_binary"),
        F.countDistinct(F.expr("collate(seg2, 'UTF8_LCASE')"))
        .cast("bigint")
        .alias("distinct_ci"),
    )


IVM_RETRACT_MOD = 10  # order keys ≡ 3 (mod this) are retracted post-snapshot


@query(
    "q_incremental_agg_retraction",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
           l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS rev_cents
    FROM lineitem
    WHERE l_orderkey % {IVM_RETRACT_MOD} <> 3
    GROUP BY 1, 2
    """,
)
def q_incremental_agg_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware aggregate-view maintenance (the Flink changelog
    model): the monthly snapshot was built over ALL rows, then the rows
    with l_orderkey ≡ 3 (mod {IVM_RETRACT_MOD}) were DELETED upstream.
    Instead of recomputing, the view merges the snapshot with the deleted
    rows' partials carrying sign −1 — counts and decimal sums are groups
    (they have inverses), so deletion is addition of negated partials;
    groups whose count reaches zero drop out of the view entirely (the
    empty-group retraction every changelog consumer must handle). The
    oracle recomputes over the surviving rows; equality proves
    merge(partial(all), −partial(deleted)) == full recompute — together
    with q_incremental_agg_maintenance (insert-only) this is the complete
    +/− maintenance algebra. MIN/MAX have no inverse — THOSE need the
    recompute path or a heap per group, which is why production IVM
    engines special-case them.

    Scale: the retraction delta costs O(deleted), the snapshot is not
    re-scanned; both partial frames merge at key-cardinality scale."""
    li = t(spark, sf_dir, "lineitem").select(
        F.to_date(F.date_trunc("month", F.col("l_shipdate"))).alias("month_start"),
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        "l_orderkey",
    )

    def partial(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("month_start", "l_returnflag").agg(
            (F.count(F.lit(1)) * sign).alias("n_rows"),
            (F.sum("price") * sign).alias("price_sum"),
        )

    snapshot = partial(li, 1)  # built before the deletion happened
    retract = partial(li.filter(F.col("l_orderkey") % IVM_RETRACT_MOD == 3), -1)
    return (
        snapshot.unionByName(retract)
        .groupBy("month_start", "l_returnflag")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            (F.sum("price_sum") * 100).cast("bigint").alias("rev_cents"),
        )
        .filter(F.col("n_rows") > 0)  # empty groups retract out of the view
    )


PCTC_BUCKET = 100_000  # $1000 buckets — price-domain-scale, like WM_BUCKET


@query(
    "q_percentile_cont_exact",
    oracle=f"""
    WITH vw AS (
      SELECT l_returnflag AS f,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT f, v,
             SUM(c) OVER (PARTITION BY f ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumr
      FROM vw
    ), tot AS (
      SELECT f, SUM(c) AS n FROM vw GROUP BY f
    ), pos AS (
      SELECT t.f, g.r, t.n,
             ((t.n - 1) * g.r) // 4 + 1 AS p1,
             ((t.n - 1) * g.r) % 4 AS rem,
             CASE WHEN ((t.n - 1) * g.r) % 4 = 0
                  THEN ((t.n - 1) * g.r) // 4 + 1
                  ELSE ((t.n - 1) * g.r) // 4 + 2 END AS p2
      FROM tot t CROSS JOIN (VALUES (1), (2), (3)) g(r)
    ), lo AS (
      SELECT p.f, p.r, MIN(c.v) AS vlo
      FROM pos p JOIN cum c ON c.f = p.f AND c.cumr >= p.p1
      GROUP BY 1, 2
    ), hi AS (
      SELECT p.f, p.r, MIN(c.v) AS vhi
      FROM pos p JOIN cum c ON c.f = p.f AND c.cumr >= p.p2
      GROUP BY 1, 2
    )
    SELECT p.f AS l_returnflag, CAST(p.r AS INT) AS quarter,
           CAST(p.n AS BIGINT) AS n_rows,
           CAST((4 - p.rem) * lo.vlo + p.rem * hi.vhi AS BIGINT)
             AS q_quarter_cents
    FROM pos p
    JOIN lo ON lo.f = p.f AND lo.r = p.r
    JOIN hi ON hi.f = p.f AND hi.r = p.r
    """,
)
def q_percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed PERCENTILE_CONT: the three quartiles of the price
    distribution per return flag with LINEAR interpolation, integer-exact
    in quarter-cents — 4·PERCENTILE_CONT(r/4) = (4−rem)·v[I] + rem·v[I+1]
    where I = ((n−1)·r) div 4 and rem its remainder, so the interpolated
    value never touches floating point (percentile_disc is already
    covered; this is the CONT semantics engines like numpy('linear') and
    ANSI PERCENTILE_CONT define, made hash-portable by the ×4 scaling).

    Scale shape — the q_weighted_median two-phase generalized from ONE
    half-weight threshold to SIX order statistics: value-grain collapse
    (map-side combined) → $1000-bucket row counts + per-flag bucket
    prefix sum (price-domain-scale frame) → each (flag, quartile, lo/hi)
    position finds its straddle bucket on that metadata frame → the
    value-grain prefix sum runs ONLY inside the ≤6 targeted bucket
    slices. No SinglePartition pass over values; the oracle states the
    same positions with one direct window."""
    vw = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("f"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wb = vw.groupBy("f", F.expr(f"v div {PCTC_BUCKET}").alias("b")).agg(
        F.sum("c").alias("wb")
    )
    bwin = Window.partitionBy("f").orderBy("b")
    cumb = wb.withColumn("cumb", F.sum("wb").over(bwin))
    tot = wb.groupBy("f").agg(F.sum("wb").alias("n"))
    pos = (
        tot.select("f", "n", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("r"))
        .select(
            "f",
            "n",
            "r",
            F.expr("((n - 1) * r) div 4 + 1").alias("p1"),
            F.expr("((n - 1) * r) % 4").alias("rem"),
            F.expr(
                "CASE WHEN ((n - 1) * r) % 4 = 0 THEN ((n - 1) * r) div 4 + 1"
                " ELSE ((n - 1) * r) div 4 + 2 END"
            ).alias("p2"),
        )
    )
    # one row per (flag, quartile, which-endpoint) with its target position
    thresholds = pos.selectExpr(
        "f", "n", "r", "rem", "stack(2, 'lo', p1, 'hi', p2) AS (which, pos)"
    )
    # straddle bucket per threshold on the metadata-scale bucket frame
    pick = (
        cumb.join(thresholds, "f")
        .filter(F.col("cumb") >= F.col("pos"))
        .groupBy("f", "r", "which")
        .agg(
            F.min_by(F.struct("b", "cumb", "wb"), "b").alias("tb"),
            F.first("pos").alias("pos"),
            F.first("rem").alias("rem"),
            F.first("n").alias("n"),
        )
        .select(
            "f",
            "r",
            "which",
            "pos",
            "rem",
            "n",
            F.col("tb.b").alias("b"),
            (F.col("tb.cumb") - F.col("tb.wb")).alias("prior"),
        )
    )
    vwin = Window.partitionBy("f", "r", "which").orderBy("v")
    inside = (
        vw.withColumn("b", F.expr(f"v div {PCTC_BUCKET}"))
        .join(F.broadcast(pick), ["f", "b"])
        .withColumn("cumv", F.sum("c").over(vwin))
        .filter(F.col("prior") + F.col("cumv") >= F.col("pos"))
        .groupBy("f", "r", "which")
        .agg(
            F.min("v").alias("val"),
            F.first("rem").alias("rem"),
            F.first("n").alias("n"),
        )
    )
    wide = (
        inside.groupBy("f", "r")
        .agg(
            F.min(F.when(F.col("which") == "lo", F.col("val"))).alias("vlo"),
            F.min(F.when(F.col("which") == "hi", F.col("val"))).alias("vhi"),
            F.first("rem").alias("rem"),
            F.first("n").alias("n"),
        )
    )
    return wide.select(
        F.col("f").alias("l_returnflag"),
        F.col("r").cast("int").alias("quarter"),
        F.col("n").cast("bigint").alias("n_rows"),
        ((4 - F.col("rem")) * F.col("vlo") + F.col("rem") * F.col("vhi"))
        .cast("bigint")
        .alias("q_quarter_cents"),
    )


SCD2_LKP_V1 = "1997-01-01"  # first dimension snapshot becomes effective
SCD2_LKP_V2 = "1999-01-01"  # balance-bump snapshot for even customer keys


@query(
    "q_scd2_lookup",
    oracle=f"""
    WITH v1 AS (
      SELECT c_custkey, DATE '{SCD2_LKP_V1}' AS eff
      FROM customer
    ), v2 AS (
      SELECT c_custkey, DATE '{SCD2_LKP_V2}' AS eff
      FROM customer WHERE c_custkey % 2 = 0
    ), allv AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    ), versioned AS (
      SELECT c_custkey, eff AS valid_from,
             COALESCE(CAST(lead(eff) OVER (PARTITION BY c_custkey
                                           ORDER BY eff) - INTERVAL 1 DAY
                           AS DATE), DATE '9999-12-31') AS valid_to
      FROM allv
    ), joined AS (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             v.valid_from
      FROM orders o
      LEFT JOIN versioned v
        ON v.c_custkey = o.o_custkey
       AND CAST(date_trunc('day', o.o_orderdate) AS DATE)
             BETWEEN v.valid_from AND v.valid_to
    )
    SELECT COALESCE(CAST(valid_from AS VARCHAR), 'pre-history') AS dim_version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM joined GROUP BY 1
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 dimension lookup — the warehouse join verb that
    q_scd2 (version construction) exists to serve: each fact row joins
    the dimension VERSION that was valid on its transaction date, never
    today's attributes (joining current attributes to historical facts is
    the classic retroactive-truth bug). Facts predating the first
    snapshot keep a NULL version and are reported as 'pre-history' — the
    unversioned channel a real load must surface, not drop.

    The validity intervals are non-overlapping per key BY CONSTRUCTION
    (lead() tiling, same as q_scd2), so the interval predicate matches at
    most one version per fact — the join stays 1:1 and needs no dedup.
    Plan shape: ONE co-keyed equi-join on the customer key with the date
    predicate as a residual filter (each customer's version list is tiny,
    so the residual scan is bounded per key — the q_join_range argument
    without even needing buckets), then a version-grain rollup."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    v1 = cust.select("c_custkey", F.lit(SCD2_LKP_V1).cast("date").alias("eff"))
    v2 = (
        cust.filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", F.lit(SCD2_LKP_V2).cast("date").alias("eff"))
    )
    wv = Window.partitionBy("c_custkey").orderBy("eff")
    versioned = (
        v1.unionByName(v2)
        .select(
            "c_custkey",
            F.col("eff").alias("valid_from"),
            F.coalesce(
                F.date_sub(F.lead("eff").over(wv), 1),
                F.lit("9999-12-31").cast("date"),
            ).alias("valid_to"),
        )
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("od"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    joined = o.join(
        versioned,
        (o["o_custkey"] == versioned["c_custkey"])
        & (F.col("od") >= F.col("valid_from"))
        & (F.col("od") <= F.col("valid_to")),
        "left",
    )
    return joined.groupBy(
        F.coalesce(
            F.col("valid_from").cast("string"), F.lit("pre-history")
        ).alias("dim_version")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )


# ---------------------------------------------------------------------------
# Round-4 wave 26: SQL-semantics corners (null-safe equality, outer explode,
# GROUP BY ALL)
# ---------------------------------------------------------------------------


@query(
    "q_join_null_safe",
    oracle="""
    WITH o AS (
      SELECT NULLIF(o_custkey % 25, 0) AS k FROM orders
    ), n AS (
      SELECT NULLIF(n_nationkey, 0) AS k, n_name FROM nation
    )
    SELECT o.k AS k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT n.n_name) AS BIGINT) AS n_dims
    FROM o JOIN n ON o.k IS NOT DISTINCT FROM n.k
    GROUP BY 1
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics MERGE
    keys and late-arriving dimensions need when the natural key is
    nullable. Orders bucket to a nullable key (NULLIF(custkey % 25, 0)),
    nation provides a dimension with one NULL-keyed member; the NULL
    group's presence in the output is the proof the join is null-safe
    (a plain inner join would lose it).

    Plan note: Spark compiles `<=>` to a hash join on a
    coalesce-wrapped key (NULLs hash to one bucket) — still an equi-join,
    NOT a cartesian fallback; the dimension side broadcasts."""
    o = t(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_custkey") % 25, F.lit(0)).alias("k")
    )
    n = t(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey"), F.lit(0)).alias("nk"), "n_name"
    )
    joined = o.join(F.broadcast(n), o["k"].eqNullSafe(n["nk"]))
    return joined.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("n_name").cast("bigint").alias("n_dims"),
    )


EXPLODE_OUTER_MIN_LEN = 8


@query(
    "q_explode_outer",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                             w -> length(w) >= {EXPLODE_OUTER_MIN_LEN}))
               AS n_long
      FROM documents
    )
    SELECT doc_id,
           CAST(greatest(n_long, 1) AS BIGINT) AS n_rows,
           CAST(n_long AS BIGINT) AS n_long_words,
           n_long = 0 AS kept_as_null
    FROM per_doc
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: documents explode into their long words
    (≥ 8 chars), but docs with NO long words must SURVIVE as one
    NULL-token row — the outer-generator contract that a plain explode
    violates (it silently drops the parent row, the classic
    fan-out-then-lost-rows bug). The result re-aggregates per doc so the
    oracle can pin the row-count arithmetic: n_rows = max(n_long, 1) and
    the kept_as_null flag marks rows that exist ONLY because the
    generator is outer.

    Scale shape: generator + re-rollup on the parent key, map-side
    combined; token text never shuffles (only counts)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split("text", " "),
            lambda w: F.length(w) >= EXPLODE_OUTER_MIN_LEN,
        ).alias("long_words"),
    )
    exploded = d.select(
        "doc_id", F.explode_outer("long_words").alias("w")
    )
    return exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("w").cast("bigint").alias("n_long_words"),
        (F.count("w") == 0).alias("kept_as_null"),
    )


@query(
    "q_group_by_all",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM orders
    GROUP BY ALL
    """,
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 / modern-SQL surface): the grouping keys are
    inferred as every non-aggregate select item — the report-authoring
    shorthand both engines now share, here run as literal SQL text on the
    Spark side too (not DataFrame API) so the SQL surface itself is what's
    verified. Decimal-cents revenue per (month, priority); plan is the
    standard partial+final hash aggregate."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders_gba
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# Round-4 wave 31: multiset set-operation semantics (ALL variants)
# ---------------------------------------------------------------------------


@query(
    "q_except_all",
    oracle="""
    WITH diff AS (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT custkey, CAST(count(*) AS BIGINT) AS surviving_copies
    FROM diff GROUP BY custkey
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — MULTISET difference: each right-side occurrence cancels
    ONE left-side occurrence, survivors keep their remaining multiplicity
    (the distinct EXCEPT of q_except would collapse them — a genuinely
    different answer whenever duplicates carry meaning, e.g. per-order
    rows). Result re-aggregated to (key, surviving_copies) so the
    multiplicity arithmetic itself is what the oracle pins:
    survivors = max(left_count − right_count, 0) per key.

    Plan note: Spark compiles exceptAll to a count-aggregate + generator
    (replicate rows sum(left)−sum(right) times) — one key-shuffle, no
    join explosion; semantically the greatest-lower-bound on bag algebra
    both engines share."""
    o = t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    right = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        left.exceptAll(right)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("surviving_copies"))
    )


@query(
    "q_intersect_all",
    oracle="""
    WITH common AS (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT custkey, CAST(count(*) AS BIGINT) AS common_copies
    FROM common GROUP BY custkey
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection: per key the result carries
    min(left_count, right_count) copies (the bag greatest-lower-bound);
    the distinct INTERSECT collapses to one. Same count-aggregate plan
    shape as q_except_all."""
    o = t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    right = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        left.intersectAll(right)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_copies"))
    )


# ---------------------------------------------------------------------------
# Round-4 wave 33: applying a CDC batch to an SCD2 dimension
# ---------------------------------------------------------------------------

SCD2_APPLY_EFF = "2024-06-01"  # effective date of the CDC batch
SCD2_APPLY_T0 = "2024-01-01"  # initial load date


@query(
    "q_scd2_apply_cdc",
    oracle=f"""
    WITH dim0 AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             DATE '{SCD2_APPLY_T0}' AS valid_from
      FROM customer
    ), cdc AS (
      SELECT k, 'U' AS op, 'WEB' AS new_seg FROM dim0 WHERE k % 7 = 0
      UNION ALL
      SELECT k, 'D', NULL FROM dim0 WHERE k % 13 = 0 AND k % 7 <> 0
      UNION ALL
      SELECT k + 1000000, 'I', 'NEW'
      FROM dim0 WHERE k % 11 = 0
    ), closed AS (
      SELECT d.k, d.seg, d.valid_from,
             CASE WHEN c.op IN ('U', 'D') THEN DATE '{SCD2_APPLY_EFF}'
                  END AS valid_to
      FROM dim0 d LEFT JOIN cdc c ON c.k = d.k AND c.op <> 'I'
    ), opened AS (
      SELECT k, new_seg AS seg, DATE '{SCD2_APPLY_EFF}' AS valid_from,
             CAST(NULL AS DATE) AS valid_to
      FROM cdc WHERE op IN ('U', 'I')
    )
    SELECT k AS custkey, seg, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM (SELECT * FROM closed UNION ALL SELECT * FROM opened)
    """,
)
def q_scd2_apply_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY a CDC batch to an SCD2 dimension — the production maintenance
    verb that consumes what q_snapshot_diff_cdc produces: updates CLOSE the
    current version (valid_to = effective date) and OPEN a new one,
    deletes close without reopening (the key's history survives — SCD2
    never physically forgets), inserts open fresh versions. The result is
    the complete post-batch version table; q_scd2_lookup then reads it
    point-in-time. Derived-key inserts (k + 1e6) keep the synthetic batch
    disjoint from existing keys by construction.

    Plan: one dim⋈cdc key join (CDC batches are small → broadcast) + a
    union of two projections — exactly the plan a Delta MERGE with
    whenMatched/whenNotMatched clauses compiles to for SCD2, expressed on
    plain DataFrames."""
    dim0 = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(SCD2_APPLY_T0).cast("date").alias("valid_from"),
    )
    upd = dim0.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("U").alias("op"), F.lit("WEB").alias("new_seg")
    )
    dels = dim0.filter((F.col("k") % 13 == 0) & (F.col("k") % 7 != 0)).select(
        "k", F.lit("D").alias("op"), F.lit(None).cast("string").alias("new_seg")
    )
    ins = dim0.filter(F.col("k") % 11 == 0).select(
        (F.col("k") + 1000000).alias("k"),
        F.lit("I").alias("op"),
        F.lit("NEW").alias("new_seg"),
    )
    cdc = upd.unionByName(dels).unionByName(ins)
    closed = dim0.join(
        F.broadcast(cdc.filter(F.col("op") != "I")).withColumnRenamed("k", "ck"),
        F.col("k") == F.col("ck"),
        "left",
    ).select(
        "k",
        "seg",
        "valid_from",
        F.when(
            F.col("op").isin("U", "D"), F.lit(SCD2_APPLY_EFF).cast("date")
        ).alias("valid_to"),
    )
    opened = cdc.filter(F.col("op").isin("U", "I")).select(
        "k",
        F.col("new_seg").alias("seg"),
        F.lit(SCD2_APPLY_EFF).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return closed.unionByName(opened).select(
        F.col("k").alias("custkey"),
        "seg",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
