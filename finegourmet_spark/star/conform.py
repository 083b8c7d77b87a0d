"""Conform raw source frames to canonical cleaned frames.

Engine re-expression of the reference's transform layer
(etl/transform.py:17-279) with the fixes catalogued in SURVEY.md §4:
single-select cleaning (not chained withColumn), one consolidated product
join (ref joins the same dim twice, §4.4), email normalization upstream of
every consumer (§3.3.2 ordering bug), explicit-survivor dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.functions.cleaning import (
    dedup_suffix,
    derive_store_id,
    normalize_email,
    normalize_phone_fr,
    price_validity,
    repair_sale_id,
    scrub_control_chars,
    unquote,
)
from finegourmet_spark.star.schemas import CEGID_RENAMES, SFCC_RENAMES


def conform_sfcc(raw: DataFrame, dim_product: DataFrame) -> DataFrame:
    """Online sales → canonical rows (ref transform_sfcc etl/transform.py:30-110).

    Quantity is forced to 1 and unit Price joined from the product dimension
    (broadcast — the dim is ≤ thousands of rows while sales are unbounded),
    preserving the 'fact Price = line revenue' semantics (SURVEY.md §1.1)."""
    scrubbed = raw.select(
        *[scrub_control_chars(F.col(c)).alias(SFCC_RENAMES[c]) for c in SFCC_RENAMES]
    )
    cleaned = scrubbed.select(
        "Sale_ID",
        F.to_date("Transaction_Date", "yyyy-MM-dd").alias("Transaction_Date"),
        "Product_ID",
        F.col("Customer_ID").try_cast("int").alias("Customer_ID"),
        "Last_Name",
        "First_Name",
        normalize_email(F.col("Email")).alias("Email"),
        unquote(F.col("Address")).alias("Address"),
        normalize_phone_fr(F.col("Phone")).alias("Phone"),
        F.lower(F.col("Email_Optin")).try_cast("boolean").alias("Email_Optin"),
        F.lower(F.col("Sms_Optin")).try_cast("boolean").alias("Sms_Optin"),
        F.lit(1).cast("int").alias("Quantity"),
    )
    price_lookup = dim_product.select(
        F.col("Product_ID").alias("_pid"), F.col("Price").alias("Price")
    )
    return cleaned.join(
        F.broadcast(price_lookup), cleaned.Product_ID == F.col("_pid"), "left"
    ).drop("_pid")


def conform_cegid(raw: DataFrame, dim_product: DataFrame) -> DataFrame:
    """Store sales → canonical rows (ref transform_cegid etl/transform.py:113-279).

    ONE broadcast join against the product dim yields both the name→ID
    resolution and the repair price (the reference performs two separate
    joins on the same key, etl/transform.py:152-165 — SURVEY.md §4.4)."""
    renamed = raw.select(
        *[scrub_control_chars(F.col(c)).alias(CEGID_RENAMES[c]) for c in CEGID_RENAMES]
    )
    typed = renamed.select(
        "Sale_ID",
        normalize_email(F.col("Email")).alias("Email"),
        F.to_date("Transaction_Date", "yyyy-MM-dd").alias("Transaction_Date"),
        "Product_Name",
        F.col("Quantity").try_cast("int").alias("Quantity"),
        price_validity(F.col("Price")).alias("Price"),
    )
    prod = dim_product.select(
        F.col("Name").alias("_pname"),
        F.col("Product_ID").alias("_pid"),
        F.col("Price").alias("_ref_price"),
    )
    joined = typed.join(F.broadcast(prod), typed.Product_Name == F.col("_pname"), "left")
    repaired = joined.select(
        repair_sale_id(F.col("Sale_ID")).alias("Sale_ID"),
        "Email",
        "Transaction_Date",
        "Product_Name",
        F.col("_pid").alias("Product_ID"),
        "Quantity",
        # ref repairs a NULL line price with the UNIT reference price even
        # when Quantity > 1 (etl/transform.py:158-170) — semantics preserved
        F.coalesce(F.col("Price"), F.col("_ref_price")).alias("Price"),
    )
    with_store = repaired.withColumn("FK_Store_ID", derive_store_id(F.col("Sale_ID")))
    # duplicate sale-id disambiguation (ref W1, etl/transform.py:253-261):
    # deterministic order — earliest transaction first, then enough columns
    # that the ordering is TOTAL over the row content (rows still tying are
    # identical), so the suffix assignment is partition-invariant
    w = Window.partitionBy("Sale_ID", "FK_Store_ID").orderBy(
        F.col("Transaction_Date").asc_nulls_last(),
        F.col("Email").asc_nulls_last(),
        F.col("Product_Name").asc_nulls_last(),
        F.col("Price").asc_nulls_last(),
        F.col("Quantity").asc_nulls_last(),
    )
    return with_store.withColumn(
        "Sale_ID", dedup_suffix(F.col("Sale_ID"), F.row_number().over(w))
    )


def audit_missing_products(conformed_cegid: DataFrame) -> DataFrame:
    """CEGID rows whose product name resolved to no Product_ID — the ref's
    eager count()+show() audit (etl/transform.py:173-178) as a lazy
    quarantine frame the pipeline can sink or alert on."""
    return conformed_cegid.filter(F.col("Product_ID").isNull())
