"""Bucketed (pre-shuffled) tables: co-located large-large joins.

At 100 TB the biggest recurring cost is re-shuffling the same fact tables on
the same keys every query. Bucketing pays the shuffle ONCE at write time:
`bucketBy(n, keys)` + `sortBy` persists hash-partitioned, sorted files, and
every subsequent equi-join or aggregation on those keys runs with NO
Exchange (asserted in tests/test_plan_shapes.py::test_bucketed_join_no_shuffle).

Not a registered driver query — bucketing is a catalog property, so it lives
as a library + plan test rather than a stateless (spark, sf_dir) query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed catalog table (one-time shuffle investment)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys — planned
    as a zero-Exchange sort-merge join (bucket-local merge of pre-sorted
    files). ``force_sort_merge`` pins the SMJ strategy (the hint goes on a
    join INPUT — on the joined result it is ignored) for when the optimizer
    would otherwise broadcast a side that only looks small."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on)
