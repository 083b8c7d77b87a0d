"""Measure bounded_bipartite_cell_join under a city-skewed cell.

The testdata's md5-uniform coordinates never skew a grid cell, so the
DBSCAN stencil guard's hot path can't be exercised by the fixtures —
this bench builds the adversarial shape directly: N points in ONE grid
cell (a downtown), stencil-replicated ×9 exactly as q_geo_dbscan's pb
side, then times the eps-neighbor count through the helper at a forced
cap vs the plain single-task path. Total candidate work is N² either
way (DBSCAN in a dense eps-cell is inherently quadratic); the guard's
claim is TASK GRANULARITY — the plain path puts all N² rows through one
task, the blocked path spreads them over ceil(N/cap)² tasks. The wall
clock ratio, not the absolutes, is the signal (run it on a quiet box
for absolutes).

Usage: python tools/stencil_skew_bench.py [n_points] [cap]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from finegourmet_spark.operators.cellpairs import (  # noqa: E402
    bounded_bipartite_cell_join,
)
from finegourmet_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 4_096
CELL = 256
EPS2 = 80 * 80


def main() -> int:
    spark = get_spark(app_name="stencil_skew_bench")
    # N points jittered inside one CELL×CELL box → all share grid cell
    # (4, 4); integer coords via xxhash so runs are deterministic.
    pts = (
        spark.range(N)
        .select(
            F.col("id"),
            (F.lit(4 * CELL) + F.pmod(F.xxhash64("id"), F.lit(CELL))).alias("x"),
            (
                F.lit(4 * CELL)
                + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(CELL))
            ).alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    pa = pts.select(
        "id", "x", "y",
        F.expr(f"x div {CELL}").alias("gcx"),
        F.expr(f"y div {CELL}").alias("gcy"),
    )
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    pb = (
        pts.withColumn("i", off)
        .withColumn("j", off)
        .select(
            "id", "x", "y",
            (F.expr(f"x div {CELL}") + F.col("i")).alias("gcx"),
            (F.expr(f"y div {CELL}") + F.col("j")).alias("gcy"),
        )
    )
    d2 = (F.col("a_x") - F.col("b_x")) * (F.col("a_x") - F.col("b_x")) + (
        F.col("a_y") - F.col("b_y")
    ) * (F.col("a_y") - F.col("b_y"))

    results = {}
    for label, cap in (("blocked", CAP), ("plain", 2**31)):
        t0 = time.time()
        n = (
            bounded_bipartite_cell_join(pa, pb, ("gcx", "gcy"), "id", "id", cap)
            .filter((F.col("a_id") != F.col("b_id")) & (d2 <= EPS2))
            .count()
        )
        results[label] = (n, time.time() - t0)
        print(f"{label} (cap={cap}): {n} eps-pairs in {results[label][1]:.1f}s",
              flush=True)
    assert results["blocked"][0] == results["plain"][0], results
    print(f"N={N} one-cell skew, cap={CAP}: "
          f"plain {results['plain'][1]:.1f}s -> "
          f"blocked {results['blocked'][1]:.1f}s "
          f"({results['plain'][1] / results['blocked'][1]:.1f}x)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
