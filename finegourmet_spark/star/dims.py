"""Dimension builders (ref etl/transform.py:283-376) with deterministic
survivor policies and scale-conscious key assignment."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.functions.ids import dense_ids
from finegourmet_spark.star.schemas import PRODUCT_RENAMES


def build_dim_product(raw_products: DataFrame) -> DataFrame:
    """Product dimension from the unioned yearly reference files.

    Survivor policy for duplicate Product_IDs across files: the LATEST source
    file wins (deterministic) — the reference's dropDuplicates keeps an
    arbitrary row (etl/transform.py:296; SURVEY.md §2A A3)."""
    renamed = raw_products.select(
        *[F.col(c).alias(PRODUCT_RENAMES[c]) for c in PRODUCT_RENAMES],
        F.col("_src_file"),
    )
    typed = renamed.select(
        "Product_ID",
        "Name",
        "Category",
        F.col("Price").try_cast("double").alias("Price"),
        "_src_file",
    )
    # recency = the numeric year prefix of the FILE NAME (2025_... > 2024_...),
    # not the raw path string — lexicographic path ordering would mis-rank
    # multi-digit prefixes or files spread across sibling directories
    file_year = F.regexp_extract(
        F.element_at(F.split(F.col("_src_file"), "/"), -1), r"^(\d+)", 1
    ).try_cast("long")
    w = Window.partitionBy("Product_ID").orderBy(
        file_year.desc_nulls_last(), F.col("_src_file").desc()
    )
    return (
        typed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("Product_ID", "Name", "Category", "Price")
    )


def build_dim_store(boutiques: DataFrame) -> DataFrame:
    """Store dimension (13 rows; ref transform_boutiques + seed DDL
    Dim_Store(Store_ID, Name, Address))."""
    return boutiques.select(
        F.col("store_id").alias("Store_ID"),
        F.col("store_name").alias("Name"),
        F.col("address").alias("Address"),
    )


def build_dim_client(sfcc: DataFrame, cegid: DataFrame) -> DataFrame:
    """Client dimension: one row per distinct non-null (normalized) email
    (ref create_dim_clients etl/transform.py:319-376).

    Deterministic collapse: rows are ordered (source priority SFCC→CEGID,
    then Sale_ID) and each attribute takes its first NON-NULL value under
    that order via a window `first(ignorenulls)` — the reference's
    groupBy+first(ignorenulls) depends on partition arrival order
    (SURVEY.md §4.2). Emails were normalized at conform time, upstream of
    both dim and fact (fixes the §3.3.2 ordering bug).

    Client_ID is a dense surrogate assigned by the scale-safe two-phase
    range-partition assigner (functions/ids.py::dense_ids) — value-identical
    to ``row_number() OVER (ORDER BY Email)`` (Email is unique after the
    collapse) but with no global-window single-task stage, so the dim build
    survives an unbounded key space.
    """
    s = sfcc.select(
        "Email", "Last_Name", "First_Name", "Phone", "Address",
        F.lit(0).alias("_prio"), "Sale_ID",
    )
    c = cegid.select(
        "Email",
        F.lit(None).cast("string").alias("Last_Name"),
        F.lit(None).cast("string").alias("First_Name"),
        F.lit(None).cast("string").alias("Phone"),
        F.lit(None).cast("string").alias("Address"),
        F.lit(1).alias("_prio"),
        "Sale_ID",
    )
    both = s.unionByName(c).filter(F.col("Email").isNotNull() & (F.col("Email") != ""))
    w = Window.partitionBy("Email").orderBy("_prio", "Sale_ID")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    collapsed = (
        both.select(
            "Email",
            *[
                F.first(col, ignorenulls=True).over(wall).alias(col)
                for col in ("Last_Name", "First_Name", "Phone", "Address")
            ],
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return dense_ids(collapsed, ["Email"], "Client_ID").select(
        "Client_ID",
        "Email",
        "Last_Name",
        "First_Name",
        "Phone",
        "Address",
    )
