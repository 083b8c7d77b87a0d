"""File-format breadth: uniform read/write across the formats a lake
actually contains (parquet, ORC, JSON-lines, CSV), with the engine's
schema-explicit discipline (never inferSchema — the reference double-scans
every CSV for inference, reference etl/extract.py:67; SURVEY.md §4 item 3).

Format choice is a STORAGE decision, not a plan decision: every reader
returns the same DataFrame shape, and downstream operators are untouched.
Columnar formats (parquet/ORC) keep predicate pushdown + column pruning;
row formats (JSON/CSV) are read-everything — the round-trip tests document
exactly which formats preserve which types (ORC/parquet: full fidelity;
JSON: no date/ts distinction without explicit schema; CSV: strings +
declared schema only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str, **options: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType | str, **options: str
) -> DataFrame:
    """Schema is REQUIRED — self-describing formats (parquet/ORC) validate
    against it via schema-on-read; text formats (JSON/CSV) need it to avoid
    the inference scan entirely."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
