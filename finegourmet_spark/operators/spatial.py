"""Spatial operators: grid-bucketed nearest-neighbor join.

The reference's dashboard has a geographic axis (two map visuals over
``Dim_Store.Address`` — SURVEY.md §2C row 9) but no spatial compute; this
module supplies the engine-grade primitive behind such views: a
bounded-radius nearest-neighbor join between two point sets, bucketed on a
uniform grid so the pair space is NEVER the cross product.

Points are synthesized deterministically from the driver tables (the
testdata carries no coordinates): each customer / supplier gets an integer
(x, y) in a G×G toroid-free grid via the portable md5→hex→int recipe every
portable-permutation operator here uses (e.g. q_sample_stratified,
textops.py:383). Distances are squared-Euclidean INTEGERS, so both engines
rank candidates identically — no sqrt, no floats, no ulp drift.

Scale shape (the point of the operator): each supplier is replicated into
its 3×3 neighboring cells (a bounded ×9 explode — the same bounded-fan-out
argument as the rolling-window contribution explode, eventflow.py), then ONE
equi-join on the cell id pairs every customer with exactly the suppliers
that can possibly lie within Chebyshev radius CELL — candidate count is
(points per cell)², locally bounded, never |C|×|S|. The exact residual
predicate |dx|≤CELL ∧ |dy|≤CELL then makes the semantics precise:

    "nearest supplier within Chebyshev distance CELL, ties broken by the
     smaller supplier key; customers with no such supplier are absent."

This is the grid variant of the bucketed range join (temporal.py
q_join_range) lifted to two dimensions — the same plan shape DuckDB's
spatial extension and Sedona use for KNN-with-radius.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

GRID = 4096  # coordinate space is [0, GRID) on both axes
CELL = 256  # cell width == the Chebyshev search radius


def _coord_sql(salt: str, key: str) -> str:
    """DuckDB: deterministic coordinate in [0, GRID) from md5(salt||key).
    7 hex chars (< 2^28) keep the intermediate far inside int64."""
    return (
        f"CAST(('0x' || substring(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 7))"
        f" AS BIGINT) % {GRID}"
    )


def _coord_col(salt: str, key) -> F.Column:
    """Spark twin of :func:`_coord_sql` — conv() parses the same 7 hex chars
    to the same integer, so both engines place every point identically."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % GRID


@query(
    "q_geo_nearest_grid",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_sql("gx", "c_custkey")} AS cx,
             {_coord_sql("gy", "c_custkey")} AS cy
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_coord_sql("gx", "s_suppkey")} AS sx,
             {_coord_sql("gy", "s_suppkey")} AS sy
      FROM supplier
    ), se AS (
      SELECT s.*, (sx // {CELL}) + gx.i AS bx, (sy // {CELL}) + gy.i AS by
      FROM s
      CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS i) gx
      CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS i) gy
    ), cand AS (
      SELECT c.c_custkey, se.s_suppkey,
             (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
      FROM c JOIN se ON cx // {CELL} = se.bx AND cy // {CELL} = se.by
      WHERE abs(cx - sx) <= {CELL} AND abs(cy - sy) <= {CELL}
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY d2, s_suppkey) AS rn
      FROM cand
    )
    SELECT c_custkey, s_suppkey, CAST(d2 AS BIGINT) AS d2
    FROM ranked WHERE rn = 1
    """,
)
def q_geo_nearest_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed nearest supplier per customer within Chebyshev radius
    {CELL} (see module docstring for the exact semantics and scale shape).

    Plan: two narrow projections → a ×9 bounded explode on the SMALL side
    (suppliers) → one (bx, by) equi-join → residual filter → per-customer
    row_number window. The join key is the composite cell id, so skew is
    bounded by points-per-cell; the window partitions by customer — one
    keyed shuffle each, nothing quadratic anywhere."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord_col("gx", F.col("c_custkey")).alias("cx"),
        _coord_col("gy", F.col("c_custkey")).alias("cy"),
    )
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord_col("gx", F.col("s_suppkey")).alias("sx"),
        _coord_col("gy", F.col("s_suppkey")).alias("sy"),
    )
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    se = (
        supp.withColumn("i", off)
        .withColumn("j", off)
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.expr(f"sx div {CELL}") + F.col("i")).alias("bx"),
            (F.expr(f"sy div {CELL}") + F.col("j")).alias("by"),
        )
    )
    cand = (
        cust.join(
            se,
            (F.expr(f"cx div {CELL}") == se["bx"])
            & (F.expr(f"cy div {CELL}") == se["by"]),
        )
        .filter(
            (F.abs(F.col("cx") - F.col("sx")) <= CELL)
            & (F.abs(F.col("cy") - F.col("sy")) <= CELL)
        )
        .select(
            "c_custkey",
            "s_suppkey",
            (
                (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
                + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", F.col("d2").cast("bigint").alias("d2"))
    )
