"""Explicit source schemas + canonical rename maps for the delicatessen
pipeline (replaces inferSchema double-scans, ref etl/extract.py:67,101,119;
SURVEY.md §1.3).

Renames are data, not code: one map per source instead of 12 chained
withColumnRenamed calls (ref etl/extract.py:70-81)."""

from __future__ import annotations

from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)


def _s(*names: str) -> StructType:
    """All-string staging schema: sources are dirty, so every column lands as
    string and is cast by a validity expression (quarantine-friendly), never
    by inference."""
    return StructType([StructField(n, StringType(), True) for n in names])


SFCC_SCHEMA = _s(
    "sale_id",
    "transaction_date",
    "product_id",
    "customer_id",
    "customer_last_name",
    "customer_first_name",
    "customer_email",
    "customer_address",
    "customer_phone",
    "email_optin",
    "sms_optin",
)

#: corrupt-record rescue column appended to SFCC reads (the reference
#: silently mangles shifted rows — engine quarantines; SURVEY.md §5 item 2)
CORRUPT_COL = "_corrupt_record"

CEGID_SCHEMA = _s(
    "sale_id", "email", "transaction_date", "product_name", "quantity", "price"
)

PRODUCT_SCHEMA = _s("product_id", "product_name", "price", "category")

SFCC_RENAMES = {
    "sale_id": "Sale_ID",
    "transaction_date": "Transaction_Date",
    "product_id": "Product_ID",
    "customer_id": "Customer_ID",
    "customer_last_name": "Last_Name",
    "customer_first_name": "First_Name",
    "customer_email": "Email",
    "customer_address": "Address",
    "customer_phone": "Phone",
    "email_optin": "Email_Optin",
    "sms_optin": "Sms_Optin",
}

CEGID_RENAMES = {
    "sale_id": "Sale_ID",
    "email": "Email",
    "transaction_date": "Transaction_Date",
    "product_name": "Product_Name",
    "quantity": "Quantity",
    "price": "Price",
}

PRODUCT_RENAMES = {
    "product_id": "Product_ID",
    "product_name": "Name",
    "price": "Price",
    "category": "Category",
}
