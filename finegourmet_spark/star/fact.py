"""Fact_Sales builder (ref create_fact_sales etl/transform.py:381-420 +
loader Type derivation etl/loader.py:55-57)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_fact_sales(
    sfcc: DataFrame, cegid: DataFrame, dim_client: DataFrame, dim_product: DataFrame
) -> DataFrame:
    """Union both channels, resolve FK_Client_ID / FK_Product_ID via
    broadcast joins, derive Type from store presence.

    Grain: one row per sale line; Price is the LINE amount (SFCC = unit
    price × qty 1; CEGID arrives quantity-extended — SURVEY.md §1.1)."""
    s = sfcc.select(
        "Sale_ID",
        "Quantity",
        "Price",
        F.col("Transaction_Date").alias("Date"),
        "Email",
        "Product_ID",
        F.lit(None).cast("string").alias("FK_Store_ID"),
    )
    c = cegid.select(
        "Sale_ID", "Quantity", "Price",
        F.col("Transaction_Date").alias("Date"),
        "Email", "Product_ID", "FK_Store_ID",
    )
    both = s.unionByName(c)

    clients = dim_client.select(F.col("Email").alias("_cemail"), "Client_ID")
    products = dim_product.select(F.col("Product_ID").alias("_pid"))
    # dim_client SCALES with fact volume (one row per distinct shopper), so
    # its join is left size-aware — AQE broadcasts while it fits and shuffles
    # past the threshold. dim_product is a bounded catalog: hint kept.
    return (
        both.join(clients, both.Email == F.col("_cemail"), "left")
        .join(F.broadcast(products), both.Product_ID == F.col("_pid"), "left")
        .select(
            "Sale_ID",
            "Quantity",
            F.col("Price").cast("decimal(10,2)").alias("Price"),
            F.when(F.col("FK_Store_ID").isNull(), "Online").otherwise("Store").alias("Type"),
            "Date",
            F.col("Client_ID").alias("FK_Client_ID"),
            # keep the sale's product id even when absent from the dim — the
            # orphan set IS the missing-product audit (anti-join semantics)
            F.col("Product_ID").alias("FK_Product_ID"),
            "FK_Store_ID",
        )
    )
