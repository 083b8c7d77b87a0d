"""The custom Python DataSource connector behaves like any planned source:
partitioned reads, option plumbing, deterministic content at any parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from finegourmet_spark.sources.python_datasource import register


def _read(spark, rows, partitions, seed=42):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", partitions)
        .option("seed", seed)
        .load()
    )


def test_rowcount_and_schema(spark):
    df = _read(spark, 500, 4)
    assert df.count() == 500
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    assert df.select("event_id").distinct().count() == 500


def test_partitioning_matches_option(spark):
    assert _read(spark, 1000, 8).rdd.getNumPartitions() == 8


def test_deterministic_across_parallelism(spark):
    """Same (rows, seed) at different partition counts ⇒ identical dataset —
    per-row seeding, the reproducibility property the engine requires of all
    its sources."""
    a = sorted(map(tuple, _read(spark, 300, 3).collect()))
    b = sorted(map(tuple, _read(spark, 300, 7).collect()))
    assert a == b


def test_composes_with_engine_operators(spark):
    """The connector output is a first-class DataFrame: windows and
    aggregations plan over it like over parquet."""
    df = _read(spark, 2000, 4)
    agg = (
        df.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    assert agg.count() > 0
    assert agg.agg(F.sum("n")).collect()[0][0] == 2000


def test_jsonlines_sink_roundtrip(spark, tmp_path):
    """Writer half of the connector API: per-partition JSON-lines files,
    readable back with the standard json reader."""
    out = str(tmp_path / "sink_out")
    df = _read(spark, 400, 4)
    df.write.format("jsonlines_sink").option("path", out).mode("append").save()
    back = spark.read.json(f"{out}/*.jsonl")
    assert back.count() == 400
    assert back.select("event_id").distinct().count() == 400
    import glob

    assert len(glob.glob(f"{out}/part-*.jsonl")) == 4  # one file per partition
