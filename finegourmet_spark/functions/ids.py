"""Scale-safe dense surrogate-key assignment.

The reference assigns surrogate keys with ``row_number()`` over a GLOBAL
window (reference etl/transform.py:341-342) — on Spark that is a single-task
stage: every row funnels through one partition, which caps the operator at
one core and one executor's memory no matter the cluster size.

``dense_ids`` produces the SAME values (dense 1..N in the total order of
``order_cols``, provided that order is total — e.g. includes a unique
tie-break column) with no single-task stage:

1. ``repartitionByRange(order_cols)`` — parallel range shuffle; partition i
   holds a contiguous slice of the global order.
2. ``sortWithinPartitions(order_cols)`` — parallel local sort.
3. per-partition row counts → one tiny driver collect (#partitions rows) →
   exclusive prefix-sum offsets.
4. id = offset[partition] + partition-local row_number — the local window is
   partitioned by ``spark_partition_id()`` so it parallelizes.

Total cost: two shuffles of the keyed rows + one metadata-sized action.
Equivalent single-node semantics, linear cluster scale-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _two_phase(
    df: DataFrame,
    order_cols: list[str],
    partial_agg,
    local_window_expr,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Shared two-phase scan: range-partition + local sort, per-partition
    ``partial_agg`` totals → driver-side exclusive prefix sums → per-row
    ``local_window_expr`` + partition offset. One metadata-sized action."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Materialized ONCE via eager localCheckpoint — load-bearing for
    # correctness, not a cache optimization: repartitionByRange samples its
    # boundaries with a per-RDD-id seed, so re-evaluating this plan in the
    # totals job and again in the output job can pick DIFFERENT boundaries,
    # desynchronizing _pid from the collected offsets (observed at sf0.1).
    # localCheckpoint (vs .persist) keeps the blocks at RDD level, where the
    # ContextCleaner reclaims them once the result is unreachable — no
    # session-lifetime CacheManager pin (r2 review finding).
    sorted_df = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = sorted_df.groupBy("_pid").agg(partial_agg.alias("_t")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_t"]
    # metadata-sized literal map (one entry per partition) — no join needed
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        ).cast("map<int,long>"),
        F.col("_pid"),
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return sorted_df.withColumn(
        out_col, (local_window_expr.over(w_local) + off_expr).cast("long")
    ).drop("_pid")


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 1..N ``id_col`` in the total order of ``order_cols``.

    Values are deterministic and identical to
    ``row_number() OVER (ORDER BY order_cols)`` whenever ``order_cols`` is a
    total order (unique rows under that key) — but with no global-window
    single-task stage. The range-partitioned form is materialized once
    (eager localCheckpoint — see _two_phase for why that is load-bearing)
    and reclaimed by the ContextCleaner when the result is unreachable.
    """
    return _two_phase(
        df, order_cols, F.count(F.lit(1)), F.row_number(), id_col, num_partitions
    )


def running_total(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global cumulative sum: identical values to ``SUM(value_col) OVER
    (ORDER BY order_cols ROWS UNBOUNDED PRECEDING..CURRENT ROW)`` under a
    total order, computed hierarchically (per-partition sums → offsets →
    partition-local cumsum). Integral value types only (offsets travel as a
    driver-side literal long map)."""
    return _two_phase(
        df, order_cols, F.sum(value_col), F.sum(value_col), out_col, num_partitions
    )
