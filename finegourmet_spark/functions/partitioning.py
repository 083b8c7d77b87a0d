"""Partition-shape helpers.

``spread`` fixes the small-input/big-expansion mismatch: operators that
EXPLODE each row into hundreds (shingles, n-grams, frame sampling) inherit
the SCAN's partitioning — and a small parquet file scans as 1-2 splits, so
the expensive expansion runs on 1-2 cores no matter how many the cluster
has. AQE cannot help (it only re-plans after a shuffle; the skew is on the
map side of the first stage).

The fix is one cheap shuffle of the SMALL pre-explode rows up to the
session's parallelism. It is deliberately conditional: when the input
already has >= cores partitions (any realistically-sized table — at 100 TB
every scan has thousands of splits) it is a no-op, so the helper never
costs a shuffle at scale; it only widens the degenerate small-file case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the default parallelism IF the plan
    currently has fewer partitions (else unchanged). Call immediately before
    a high-fan-out projection (explode of shingles/n-grams/frames).

    The ``df.rdd.getNumPartitions()`` probe costs one extra driver-side
    physical-planning pass (no job runs). It is the only public way to see
    the split count: a file scan's ``outputPartitioning`` is
    ``UnknownPartitioning`` unless bucketed, so plan inspection can't
    answer "how many splits". Acceptable because spread() is only ever
    called on the SMALL pre-explode frame right after a scan — the plan
    being re-planned is a leaf or near-leaf, not a deep tree."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
