"""Z-order layout: file-level min/max statistics must let a filter on
EITHER clustered column skip most files — measured from real parquet
footers, vs a single-column-sorted baseline layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from finegourmet_spark.operators.zorder import zorder_write

N_FILES = 16


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(n_overlapping, n_total) files whose [min,max] for `col` intersects
    [lo, hi] — the file-skipping decision a reader makes from footers."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, len(files)


def test_zorder_skips_files_on_both_columns(spark, sf_dir, tmp_path_factory):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    base = str(tmp_path_factory.mktemp("layouts"))
    # baseline: sorted by orderkey only (the usual single-key layout)
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(f"{base}/by_orderkey")
    )
    zorder_write(li, ("l_orderkey", "l_partkey"), f"{base}/zorder", N_FILES)

    # identical content
    assert (
        spark.read.parquet(f"{base}/zorder").count()
        == spark.read.parquet(f"{base}/by_orderkey").count()
        == li.count()
    )

    bounds = li.agg(
        F.max("l_orderkey").alias("ok_max"), F.max("l_partkey").alias("pk_max")
    ).collect()[0]
    # a 5%-wide range on each column
    ok_hi = int(bounds["ok_max"] * 0.05)
    pk_hi = int(bounds["pk_max"] * 0.05)

    # filter on the SECONDARY column: single-key layout prunes nothing,
    # z-order prunes most files
    pk_plain, n = _files_overlapping(f"{base}/by_orderkey", "l_partkey", 0, pk_hi)
    pk_z, _ = _files_overlapping(f"{base}/zorder", "l_partkey", 0, pk_hi)
    assert pk_plain == n  # every file overlaps: no skipping possible
    assert pk_z <= n // 2  # z-order: at least half the files skipped

    # filter on the PRIMARY column: z-order still prunes (√N locality),
    # though less than the dedicated single-key sort
    ok_plain, _ = _files_overlapping(f"{base}/by_orderkey", "l_orderkey", 0, ok_hi)
    ok_z, _ = _files_overlapping(f"{base}/zorder", "l_orderkey", 0, ok_hi)
    assert ok_plain <= 2  # dedicated sort: near-perfect pruning
    assert ok_z <= n // 2  # z-order keeps useful pruning on A too
