"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``finegourmet_spark.operators.*`` /
``finegourmet_spark.streaming`` (registered via the shared registry);
this module just re-exports the merged registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing the operator modules populates the registry
import finegourmet_spark.operators.relational  # noqa: F401
import finegourmet_spark.operators.python_udfs  # noqa: F401
import finegourmet_spark.operators.textops  # noqa: F401
import finegourmet_spark.operators.dedup  # noqa: F401
import finegourmet_spark.operators.similarity  # noqa: F401
import finegourmet_spark.operators.skew  # noqa: F401
import finegourmet_spark.operators.multimodal  # noqa: F401
import finegourmet_spark.streaming.windows  # noqa: F401
from finegourmet_spark.operators.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full star query (fact ⋈ orders ⋈ 3 broadcast dims →
    grouped revenue) on sf0.001 — SURVEY.md §2B q_star_join."""
    return QUERIES["q_star_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
