"""Skew mitigation: salted two-phase aggregation and salted broadcast-side
replication join.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
automatically; these operators cover the cases AQE can't: hash-aggregate hot
keys (a single reducer owns the hot key's partition) and non-AQE-eligible
join shapes. Salting is deterministic here (salt = key-hash of a unique
column) so results stay reproducible — at 100 TB a hot key (think: the empty
string, a default user id, a null-like sentinel) otherwise pins one task at
100% while 999 executors idle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finegourmet_spark.functions.money import SQL_DSUM, dec
from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

N_SALTS = 16


@query(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, {rev} AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """.format(rev=SQL_DSUM("l_extendedprice")),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a LOW-CARDINALITY key (3 return
    flags ≪ cluster parallelism — the degenerate skew case: at most 3
    reducers do all the work however large the cluster).

    Phase 1 groups by (key, salt) — `salt = pmod(xxhash64(unique col), 16)`
    spreads each hot key over 16 reducers with map-side partial combine;
    phase 2 re-aggregates the 3×16 partials. Oracle = the plain single-phase
    group-by, proving the decomposition is exact (decimal sums are
    associative, counts sum)."""
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    phase1 = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("_n"), F.sum(dec("l_extendedprice")).alias("_rev")
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("_n").alias("n"), F.sum("_rev").cast("double").alias("revenue")
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT l.l_returnflag, COUNT(*) AS n_lines, {rev} AS revenue
    FROM lineitem l JOIN (SELECT DISTINCT l_returnflag AS flag, 'bucket-' || l_returnflag AS flag_label
                          FROM lineitem) d
      ON l.l_returnflag = d.flag
    GROUP BY l.l_returnflag
    """.format(rev=SQL_DSUM("l.l_extendedprice")),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join against a hot-keyed dimension: the big side gets
    `salt = pmod(hash(unique), N)`, the small side is replicated N× with an
    exploded salt column, and the join key becomes (key, salt) — every hot
    key now spreads over N reducers. (When the small side fits in memory a
    broadcast join is strictly better — this is the pattern for when it
    doesn't; here the dim is built from lineitem's 3 flags to make the skew
    extreme.)"""
    li = t(spark, sf_dir, "lineitem")
    dim = (
        li.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .withColumn("flag_label", F.concat(F.lit("bucket-"), F.col("flag")))
    )
    big = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    small = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    joined = big.join(
        small.hint("shuffle_hash"),
        (big.l_returnflag == small.flag) & (big._salt == small._salt),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
    )
