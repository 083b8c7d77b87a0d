"""Z-order (Morton-curve) clustering for multi-column data skipping.

A table sorted by column A prunes scans filtered on A (parquet min/max per
file/row-group) but not on B. Interleaving the bits of A and B and sorting
by the interleaved value clusters the data so that BOTH columns' value
ranges are locality-preserved — every file covers a small rectangle of the
(A, B) space, so a filter on EITHER column overlaps only ~√N of N files.
This is what Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
do; here it is expressed on plain parquet with JVM-side bit arithmetic
(shift/mask expressions — no UDF, whole-stage codegen).

Layout cost: one metadata-scale min/max agg + one range shuffle + write.
Query benefit is permanent until the next rewrite. Verified by reading
parquet footer statistics in tests/test_zorder.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(x: Column) -> Column:
    """Spread a 32-bit value's bits to even positions of a 64-bit value
    (classic Morton magic-mask sequence, as shift/and expressions)."""
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(a: Column, b: Column, a_min: int, a_max: int, b_min: int, b_max: int) -> Column:
    """Morton z-value of two integral columns, min/max-normalized to 31-bit
    grid coordinates first (z-order needs comparable bit-weights per
    dimension; raw domains of different magnitudes would let one column
    dominate). Nulls map to grid 0 (sort first, prune like a value).

    31-bit (not 32-bit) grid: b's spread bits are shifted left by 1, so a
    32-bit grid would park b's top bit on bit 63 — the long sign bit — and
    signed ordering would sort b's upper half before its lower half. With 31
    bits the highest occupied bit is 61 and signed sort == unsigned Morton."""
    scale = (1 << 31) - 1

    def norm(c: Column, lo: int, hi: int) -> Column:
        if hi <= lo:
            return F.lit(0).cast("long")
        return F.coalesce(
            ((c.cast("double") - lo) / (hi - lo) * scale).cast("long"), F.lit(0)
        )

    return _spread_bits(norm(a, a_min, a_max)).bitwiseOR(
        F.shiftleft(_spread_bits(norm(b, b_min, b_max)), 1)
    )


def zorder_write(
    df: DataFrame, cols: tuple[str, str], path: str, n_files: int = 16
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the Morton
    curve of the two columns. (k>2 columns generalize by spreading to every
    k-th bit; two dimensions cover the dominant filter-pair case.)"""
    a, b = cols
    bounds = df.agg(
        F.min(a).alias("a_min"), F.max(a).alias("a_max"),
        F.min(b).alias("b_min"), F.max(b).alias("b_max"),
    ).collect()[0]  # metadata-scale: one row
    z = zvalue(
        F.col(a), F.col(b),
        int(bounds["a_min"]), int(bounds["a_max"]),
        int(bounds["b_min"]), int(bounds["b_max"]),
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
