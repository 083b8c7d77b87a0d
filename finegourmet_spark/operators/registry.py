"""Query registry shared by every operator module.

Each operator module registers named queries (callable ``(spark, sf_dir) ->
DataFrame``) and, where SQL-expressible, a DuckDB oracle twin.  The driver
contract (``__spark_entry__.py``) merges all module registries.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches the oracle bit-for-bit):

1. **Money/double aggregation** goes through decimal: cast inputs to
   ``DECIMAL`` → exact decimal arithmetic (order-independent) → cast the final
   aggregate to ``DOUBLE``.  Plain ``SUM(double)`` differs between engines
   (and between Spark runs!) in the last ulps because FP addition is not
   associative and shuffle order is nondeterministic.
2. **Top-k / ranking** always carries a unique tie-break key in the ORDER BY.
3. **Survivor choice** (dedup, first-non-null) is always an explicit
   ``row_number() == 1`` rule, never Spark's arbitrary-survivor
   ``dropDuplicates`` (reference nondeterminism: etl/transform.py:98,296,334-340).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
