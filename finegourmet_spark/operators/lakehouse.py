"""Lakehouse table-maintenance verbs as registered queries: MERGE upsert
semantics, GDPR erasure propagation, join-key skew diagnosis, and
small-file compaction planning.

The star layer already *executes* MERGE and compaction against parquet
(star/load.py:71,152 — the reference's loader has no equivalent; its JDBC
sink is replace-only, reference: etl/loader.py:46-96). This module exposes
the same semantics as oracle-checked, side-effect-free queries: each one
returns the decision/action table a lakehouse engine (Delta/Iceberg) would
derive, so the semantics are hash-verified against DuckDB without needing
a table format the container doesn't ship.

Scale postures, per op:
  * MERGE readout — one full-outer co-shuffle on the key (exactly the
    join a Delta MERGE plans); actions derived by CASE, no driver logic.
  * GDPR erasure — broadcast the (small) deletion-request key set against
    each fact table: LEFT SEMI/ANTI per table, map-side, no fact shuffle.
  * Skew diagnosis — per-key counts (map-side combined), then
    support-sized windows; emits the salting factor the engine's own
    salted-join ops (q_join_salted) would consume.
  * Compaction planning — the sorted cumulative-sum bin assignment every
    table-maintenance service runs over its file manifest; windows over
    the manifest, which is metadata-scale by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t


@query(
    "q_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT c_custkey AS k, c_name AS name, c_acctbal
      FROM customer WHERE c_custkey % 3 <> 0
    ), source AS (
      SELECT c_custkey AS k, 'upd:' || c_name AS name
      FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(t.k, s.k) AS k,
           CASE WHEN t.k IS NULL THEN 'insert'
                WHEN s.k IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           CASE WHEN s.k IS NULL THEN t.name ELSE s.name END AS final_name
    FROM target t FULL OUTER JOIN source s ON t.k = s.k
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a pure query: target (customers with
    custkey % 3 ≠ 0) merged with a source batch (custkey % 2 = 0, renamed)
    → WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT, with
    untouched target rows kept. This is exactly the full-outer-join plan a
    Delta/Iceberg MERGE compiles to — one co-shuffle on the merge key,
    actions as CASE projections — and what star/load.py's parquet MERGE
    executes for real (merge_upsert, star/load.py:71). At 100 TB the same
    plan holds: AQE splits skewed merge keys, and file-level pruning
    (zorder_write) bounds the rewrite set."""
    cust = t(spark, sf_dir, "customer")
    target = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        "c_acctbal",
    )
    source = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        F.concat(F.lit("upd:"), F.col("c_name")).alias("name"),
    )
    merged = target.alias("t").join(
        source.alias("s"), F.col("t.k") == F.col("s.k"), "full_outer"
    )
    return merged.select(
        F.coalesce(F.col("t.k"), F.col("s.k")).alias("k"),
        F.when(F.col("t.k").isNull(), "insert")
        .when(F.col("s.k").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.when(F.col("s.k").isNull(), F.col("t.name"))
        .otherwise(F.col("s.name"))
        .alias("final_name"),
    )


# Deletion-request predicate: every 97th user/customer has filed a GDPR
# right-to-be-forgotten request.
GDPR_MOD = 97


@query(
    "q_gdpr_erasure",
    oracle=f"""
    SELECT 'events' AS table_name,
           CAST(count(*) FILTER (WHERE user_id % {GDPR_MOD} = 0) AS BIGINT)
             AS n_erased,
           CAST(count(*) FILTER (WHERE user_id % {GDPR_MOD} <> 0) AS BIGINT)
             AS n_retained
    FROM events
    UNION ALL
    SELECT 'orders',
           CAST(count(*) FILTER (WHERE o_custkey % {GDPR_MOD} = 0) AS BIGINT),
           CAST(count(*) FILTER (WHERE o_custkey % {GDPR_MOD} <> 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           CAST(count(*) FILTER (WHERE o.o_custkey % {GDPR_MOD} = 0) AS BIGINT),
           CAST(count(*) FILTER (WHERE o.o_custkey % {GDPR_MOD} <> 0) AS BIGINT)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten propagation audit: given a deletion-
    request set (user/customer keys ≡ 0 mod 97), report per table how many
    rows the cascade erases vs retains — events directly by user_id,
    orders by custkey, and lineitem transitively through its order. The
    transitive hop is the real content: erasure must follow FOREIGN KEYS,
    not just matching column names.

    Scale shape: the direct tables are pure map-side conditional counts
    (no shuffle beyond the 1-row aggregate); the transitive table pays the
    one lineitem⋈orders co-shuffle any lineage walk costs — in production
    the request set is a broadcast bloom/set and fact tables never
    shuffle. Counts-only by design: the audit precedes the rewrite (the
    rewrite itself is star/load.py compaction machinery)."""
    ev = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    def _counts(df: DataFrame, key: Column, name: str) -> DataFrame:
        return df.agg(
            F.count(F.when(key % GDPR_MOD == 0, 1)).cast("bigint").alias("n_erased"),
            F.count(F.when(key % GDPR_MOD != 0, 1)).cast("bigint").alias("n_retained"),
        ).select(F.lit(name).alias("table_name"), "n_erased", "n_retained")

    events_part = _counts(ev, F.col("user_id"), "events")
    orders_part = _counts(orders, F.col("o_custkey"), "orders")
    li_joined = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    li_part = _counts(li_joined, F.col("o_custkey"), "lineitem")
    return events_part.unionByName(orders_part).unionByName(li_part)


@query(
    "q_skew_diagnose",
    oracle="""
    WITH keyed AS (
      SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1
    ), ranked AS (
      SELECT k, cnt,
             row_number() OVER (ORDER BY cnt DESC, k) AS rk,
             SUM(cnt) OVER () AS total,
             count(*) OVER () AS n_keys,
             MAX(cnt) OVER () AS max_cnt
      FROM keyed
    )
    SELECT CAST(total AS BIGINT) AS total_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(k AS BIGINT) AS hottest_key,
           CAST(max_cnt AS BIGINT) AS max_key_rows,
           CAST((1000000::HUGEINT * max_cnt) // total AS BIGINT)
             AS top_share_ppm,
           CAST((CAST(max_cnt AS HUGEINT) * n_keys + total - 1) // total
                AS BIGINT) AS suggested_salt
    FROM ranked WHERE rk = 1
    """,
)
def q_skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the pre-flight check before any big
    shuffle: per-key counts on orders.o_custkey, then the hot-key profile
    (hottest key, its row share in ppm) and the salting factor
    ceil(max_cnt / avg_cnt) that q_join_salted / q_agg_salted would apply.
    This is the measurement half of the engine's skew story (AQE's
    runtime skew-join split is the reactive half; diagnosing ahead lets a
    pipeline pick salts deterministically).

    Integer-exact throughout: shares in floor-ppm, the salt via the
    ceil-div identity (a·b + t − 1) div t. One key rollup (map-side
    combined — the shuffle carries keys, not rows), support-sized windows,
    1-row output."""
    keyed = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("k"))
    ranked = keyed.select(
        "k",
        "cnt",
        F.row_number().over(w_rank).alias("rk"),
        F.sum("cnt").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_keys"),
        F.max("cnt").over(w_all).alias("max_cnt"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("total").cast("bigint").alias("total_rows"),
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("k").cast("bigint").alias("hottest_key"),
        F.col("max_cnt").cast("bigint").alias("max_key_rows"),
        # 1e6·max_cnt and max_cnt·n_keys both multiply data-scaling counts —
        # ride decimal(38,0)/HUGEINT (the q_crosstab_chi2 width rule): a
        # diagnosed-hot key on a trillion-row fact is exactly when this runs
        F.expr("(1000000 * cast(max_cnt as decimal(38,0))) div total")
        .cast("bigint")
        .alias("top_share_ppm"),
        F.expr(
            "(cast(max_cnt as decimal(38,0)) * n_keys + total - 1) div total"
        )
        .cast("bigint")
        .alias("suggested_salt"),
    )


# Compaction target: bins of ~4000 "rows" (standing in for the 128 MB-1 GB
# file-size target a real compactor uses).
COMPACT_TARGET_ROWS = 4000


@query(
    "q_compaction_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS file_month,
             o_orderpriority AS file_pri,
             count(*) AS n_rows
      FROM orders GROUP BY 1, 2
    ), planned AS (
      SELECT file_month, file_pri, n_rows,
             (SUM(n_rows) OVER (ORDER BY file_month, file_pri)
              - n_rows) // {COMPACT_TARGET_ROWS} AS bin_id
      FROM manifest
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
           MIN(file_month) AS first_month,
           MAX(file_month) AS last_month
    FROM planned GROUP BY 1
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: treat each (month, priority) slice
    of orders as a "file" in a table manifest, then assign files to merge
    bins by sorted cumulative size div target — the deterministic binning
    every OPTIMIZE/rewrite-data-files service runs (sort-preserving, so
    merged files stay clustered on the table's sort key and zorder/minmax
    pruning still works after compaction; star/load.py:152 executes the
    same plan against real parquet partitions).

    Scale shape: the manifest rollup map-side combines; the planning
    windows run over the manifest (metadata-scale — files, not rows);
    output is one row per merge task, ready to drive a rewrite job."""
    manifest = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("file_month"),
            F.col("o_orderpriority").alias("file_pri"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w_cum = Window.orderBy("file_month", "file_pri").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum_before = F.sum("n_rows").over(w_cum) - F.col("n_rows")
    planned = manifest.select(
        "file_month",
        "file_pri",
        "n_rows",
        cum_before.alias("cum_before"),
    ).select(
        "file_month",
        "file_pri",
        "n_rows",
        F.expr(f"cum_before div {COMPACT_TARGET_ROWS}").alias("bin_id"),
    )
    return planned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("bin_rows"),
        F.min("file_month").alias("first_month"),
        F.max("file_month").alias("last_month"),
    )
