"""Source readers for the delicatessen pipeline — single glob scans with
explicit schemas and a quarantine channel.

vs the reference (SURVEY.md §2A S1-S5, §4.3):
  * one glob scan per source family instead of a driver-side os.listdir loop
    unioning per-file scans (ref etl/extract.py:55-93) — at 100 TB the
    listing/planning is catalog work, not a Python loop;
  * no inferSchema (ref triggers an extra Spark job per file);
  * PERMISSIVE mode + _corrupt_record rescue column: malformed rows (e.g.
    the leading-space-before-quote rows the reference silently column-shifts,
    data/salesforces/202403_sfcc_sales.csv:8) are quarantined, not mangled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from finegourmet_spark.star.schemas import (
    CEGID_SCHEMA,
    CORRUPT_COL,
    PRODUCT_SCHEMA,
    SFCC_SCHEMA,
)


def read_sfcc(spark: SparkSession, pattern: str) -> DataFrame:
    """All SFCC monthly CSVs in one scan (``pattern`` like
    ``dir/*_sfcc_sales.csv``). Returns raw staging columns + _corrupt_record
    + _src_file provenance (replaces the per-file union loop,
    ref etl/extract.py:55-93)."""
    # fresh StructType — StructType.add would mutate the shared module schema
    schema = StructType(list(SFCC_SCHEMA.fields) + [StructField(CORRUPT_COL, StringType(), True)])
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(pattern)
        .withColumn("_src_file", F.input_file_name())
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined rows keep the raw record for audit
    (engine replacement for the ref's silent mangling / show() audits).

    The parsed frame is cached first: Spark refuses plans that reference
    ONLY the internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    — e.g. a pruned quarantine count()), and the cache also means the source
    is parsed once for the clean/quarantine fan-out."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantined


def read_cegid(spark: SparkSession, path: str) -> DataFrame:
    """CEGID yearly multiline-JSON array (ref etl/extract.py:95-104), explicit
    all-string schema (price arrives as number OR the literal 'x' — inference
    would make the column a string some years and a double others)."""
    return spark.read.schema(CEGID_SCHEMA).option("multiline", "true").json(path)


def read_products(spark: SparkSession, pattern: str) -> DataFrame:
    """Product reference CSVs in one glob scan, with file provenance for the
    survivor policy (latest file wins — ref dropDuplicates keeps an arbitrary
    one, etl/transform.py:296)."""
    return (
        spark.read.schema(PRODUCT_SCHEMA)
        .option("header", "true")
        .csv(pattern)
        .withColumn("_src_file", F.input_file_name())
    )


def read_boutiques(spark: SparkSession, path: str) -> DataFrame:
    """Pipe-delimited store file with a misleading .csv extension, a
    comma-separated header line, and quoted comma-containing addresses
    (data/boutiques/2025_boutiques.csv:1-3).

    Spark-first replacement for the ref's text-scan + first() + regex
    (etl/extract.py:134-153): read with sep='|' and no header — the comma
    header parses into a single-field row (store_name IS NULL) and is
    filtered declaratively, no driver-side first() materialization."""
    df = (
        spark.read.schema("store_id string, store_name string, address string")
        .option("sep", "|")
        .option("quote", "")
        .csv(path)
    )
    from finegourmet_spark.functions.cleaning import unquote

    return df.filter(F.col("store_name").isNotNull()).select(
        F.col("store_id"),
        F.col("store_name"),
        unquote(F.col("address")).alias("address"),
    )
