"""Exact (engine-portable) aggregation of money/double columns.

The reference mixes ``double`` with MySQL ``DECIMAL(10,2)`` (SURVEY.md §1.2);
this engine standardizes on decimal arithmetic for every aggregate over
monetary values.  Beyond semantics, decimals make aggregation **order
independent**, which is what lets a distributed Spark plan hash-match a
single-threaded DuckDB oracle — and what makes results reproducible across
cluster sizes at 100 TB (FP sums change with partitioning; decimal sums
don't).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Cast a (money-like) column to decimal for exact arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column, returned as double.

    Pattern: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) — matches the
    DuckDB oracle expression of the same shape bit-for-bit.
    """
    out = F.sum(dec(col)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG as double: exact decimal sum / count.

    (Decimal division semantics differ between engines; dividing the exact
    double-cast sum by the count is one IEEE op → identical everywhere.)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(dec(c)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def SQL_DSUM(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr})"
