"""One-shot runner for the exact q_graph_jaccard_neighbors sf10 row — the
last box-limited scale row (BASELINE.md round-7/8 notes: ~13e9 unoriented
wedges make the one-pass pair-evidence exchange a ~325 GB spill; the grace
slices turn it into K full enumerations of ~budget-sized spill each, a
multi-hour single-box run).

Run detached (nohup) early in a round; progress lines come from the
operator's SPARK_GRAFT_GRACE_VERBOSE per-slice log. The result is 20
metadata-scale rows, printed at the end for BASELINE.md.

Usage: python tools/jaccard_exact_sf10.py [sf_dir] [scratch_gb]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF10 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
SCRATCH_GB = sys.argv[2] if len(sys.argv) > 2 else "16"

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
os.environ["SPARK_GRAFT_CLOSURE_SCRATCH_GB"] = SCRATCH_GB
os.environ["SPARK_GRAFT_GRACE_VERBOSE"] = "1"

import __spark_entry__ as contract  # noqa: E402
from finegourmet_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(app_name="jaccard_exact_sf10")
    q = contract.queries()["q_graph_jaccard_neighbors"]
    t0 = time.time()
    rows = q(spark, SF10).collect()
    dt = time.time() - t0
    print(f"q_graph_jaccard_neighbors @ {SF10}: {len(rows)} rows in "
          f"{dt:.1f}s (scratch budget {SCRATCH_GB} GB)")
    for r in rows:
        print(dict(r.asDict()))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
