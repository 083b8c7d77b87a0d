"""The dashboard's query catalog (SURVEY.md §2C — reverse-engineered from
power-bi/dashboard.pbix Report/Layout): 10 analytic queries over the star
schema, as functions of the built star frames.

Money aggregates use the decimal-exact pattern (functions/money.py) so every
revenue figure is reproducible across partitionings."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finegourmet_spark.functions.money import dsum


def total_revenue(fact: DataFrame) -> DataFrame:
    """§2C #1 — card: SUM(Price)."""
    return fact.agg(dsum("Price", "revenue"))


def revenue_by_type(fact: DataFrame) -> DataFrame:
    """§2C #2/#3 — online vs store cards (one grouped pass, not two scans)."""
    return fact.groupBy("Type").agg(dsum("Price", "revenue"))


def revenue_by_month(fact: DataFrame) -> DataFrame:
    """§2C #4 — monthly trend."""
    return (
        fact.groupBy(F.date_trunc("month", "Date").cast("date").alias("month"))
        .agg(dsum("Price", "revenue"))
        .orderBy("month")
    )


def revenue_by_category(fact: DataFrame, dim_product: DataFrame) -> DataFrame:
    """§2C #5/#6 — revenue per product category, descending."""
    p = dim_product.select(F.col("Product_ID").alias("_pid"), "Category")
    return (
        fact.join(F.broadcast(p), fact.FK_Product_ID == F.col("_pid"), "left")
        .groupBy("Category")
        .agg(dsum("Price", "revenue"))
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("Category").asc_nulls_last())
    )


def top_products(fact: DataFrame, dim_product: DataFrame, k: int = 10) -> DataFrame:
    """§2C #7 — top products by revenue (TakeOrderedAndProject)."""
    p = dim_product.select(F.col("Product_ID").alias("_pid"), "Name")
    return (
        fact.join(F.broadcast(p), fact.FK_Product_ID == F.col("_pid"))
        .groupBy("Name")
        .agg(dsum("Price", "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("Name").asc())
        .limit(k)
    )


def store_share(fact: DataFrame, dim_store: DataFrame) -> DataFrame:
    """§2C #8 — pie: revenue per store, named stores only."""
    s = dim_store.select(F.col("Store_ID").alias("_sid"), "Name")
    return (
        fact.join(F.broadcast(s), fact.FK_Store_ID == F.col("_sid"))
        .filter(F.col("Name").isNotNull())
        .groupBy("Name")
        .agg(dsum("Price", "revenue"))
    )


def revenue_by_store_address(fact: DataFrame, dim_store: DataFrame) -> DataFrame:
    """§2C #9 — geo maps: revenue per store address."""
    s = dim_store.select(F.col("Store_ID").alias("_sid"), "Address")
    return (
        fact.join(F.broadcast(s), fact.FK_Store_ID == F.col("_sid"))
        .groupBy("Address")
        .agg(dsum("Price", "revenue"))
    )


def client_ranking(fact: DataFrame, dim_client: DataFrame) -> DataFrame:
    """§2C #10 — most loyal clients: revenue per named client, descending."""
    c = dim_client.select(F.col("Client_ID").alias("_cid"), "First_Name", "Last_Name")
    # dim_client scales with the fact (unlike product/store): no broadcast
    # hint — AQE makes the size-aware call.
    return (
        fact.join(c, fact.FK_Client_ID == F.col("_cid"))
        .filter(F.col("Last_Name").isNotNull())
        .groupBy("First_Name", "Last_Name")
        .agg(dsum("Price", "revenue"), F.count("*").alias("n_purchases"))
        .orderBy(F.col("revenue").desc(), F.col("Last_Name").asc(), F.col("First_Name").asc())
    )


ALL = {
    "total_revenue": total_revenue,
    "revenue_by_type": revenue_by_type,
    "revenue_by_month": revenue_by_month,
    "revenue_by_category": revenue_by_category,
    "top_products": top_products,
    "store_share": store_share,
    "revenue_by_store_address": revenue_by_store_address,
    "client_ranking": client_ranking,
}
