"""Semantic bounds for the rows-only queries the DuckDB oracle can't check:
approximate aggregates vs exact values, and cosine-LSH bucket sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as contract

QUERIES = contract.queries()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in QUERIES["q_agg_approx"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, n in exact.items():
        # HLL++ default rsd = 5%; allow 4 sigma
        assert abs(approx[flag] - n) <= max(0.2 * n, 10), (flag, approx[flag], n)


def test_percentile_approx_brackets_exact(spark, sf_dir):
    rows = {
        r["l_returnflag"]: r["price_p50_p95"]
        for r in QUERIES["q_agg_approx"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mins = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for flag, (p50, p95) in rows.items():
        lo, hi = mins[flag]
        assert lo <= p50 <= p95 <= hi


def test_cosine_lsh_buckets_partition_corpus(spark, sf_dir):
    emb_count = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = QUERIES["q_similarity_lsh"](spark, sf_dir).collect()
    assert sum(r["n_vectors"] for r in rows) == emb_count  # exact partition
    assert 1 < len(rows) <= emb_count


def test_salted_agg_matches_plain(spark, sf_dir):
    """The salted two-phase decomposition is exact (also oracle-checked; here
    against Spark's own single-phase plan for engine-internal consistency)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from finegourmet_spark.functions.money import dec

    plain = {
        r["l_returnflag"]: (r["n"], r["revenue"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["revenue"])
        for r in QUERIES["q_agg_salted"](spark, sf_dir).collect()
    }
    assert plain == salted
