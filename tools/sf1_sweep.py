"""Round-4 full-registry sf1 (10x t2 scale) sweep: oracle compare where
feasible, Spark-side rows-only for the documented pair-bound carve-outs
(DuckDB's unbucketed pair/wedge oracles OOM or explode at sf1 — the Spark
side is the scalable plan, which is the point)."""

from __future__ import annotations

import sys
import time

import __spark_entry__ as contract
from finegourmet_spark.session import get_spark
from tests.oracle_harness import compare

SF1 = "/root/repo/.scratch/sf1"

# Oracle-compare feasible but DOMINATED by the DuckDB side at sf1 — the
# sweep wall time for these rows is mostly oracle cost, not Spark cost
# (measured r11 for q_graph_jaccard_capped: Spark 99.6 s vs compare()
# 1160.9 s — the wedge-bound oracle enumerates what the Spark plan
# slices; VERDICT r10 item 6). Annotated in the log line so the row is
# never read as a Spark regression.
ORACLE_DOMINATED = {"q_graph_jaccard_capped"}

# DuckDB-infeasible at sf1 (pair/wedge-bound oracles; documented r3+r4):
SPARK_SIDE_ONLY = {
    "q_graph_jaccard_neighbors", "q_setsim_join_prefix",
    "q_containment_dedup", "q_item_item_cf", "q_dedup_clusters",
    "q_dedup_semantic_clusters", "q_fuzzy_join_levenshtein",
    "q_graph_triangles", "q_golden_record", "q_dedup_chunks",
    "q_dedup_ngram_jaccard", "q_dedup_embedding",
}


# Checkpoint blocks (minhash/CC/DBSCAN localCheckpoints) accumulate in the
# block manager across queries; ~80 queries into a single sf1 session the
# driver-executor heap OOMs. Restart the session every SESSION_CHUNK
# queries to bound the accumulation — the ~15 s JVM restart is noise
# against the sweep wall time.
SESSION_CHUNK = 25


def main() -> int:
    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    q = contract.queries()
    o = contract.oracle_sql()
    names = sorted(q)
    if len(sys.argv) > 2 and sys.argv[1] == "--names-file":
        # one query name per line (the sf10_sweep form) — swept in the
        # file's own order, e.g. registry order (ADVICE r10)
        wanted = [ln.strip() for ln in open(sys.argv[2]) if ln.strip()]
        unknown = sorted(set(wanted) - set(names))
        if unknown:
            print(f"unknown query names in {sys.argv[2]}: {unknown}")
            return 2
        # order-preserving dedupe (ADVICE r11): a duplicated line must not
        # sweep the query twice
        names = list(dict.fromkeys(wanted))
    else:
        start_at = sys.argv[1] if len(sys.argv) > 1 else None
        if start_at:
            names = [n for n in names if n >= start_at]
    t_start = time.time()
    fails = []
    spark = None
    for i, name in enumerate(names):
        if i % SESSION_CHUNK == 0:
            if spark is not None:
                spark.stop()
            spark = get_spark(app_name="sf1_sweep")
        t0 = time.time()
        try:
            df = q[name](spark, SF1)
            if name in o and name not in SPARK_SIDE_ONLY:
                problems = compare(df, o[name], SF1)
                status = "OK" if not problems else f"FAIL {problems[0][:200]}"
                if name in ORACLE_DOMINATED and not problems:
                    status += " (oracle-compare-dominated wall time)"
            else:
                n = df.count()
                status = f"rows-only {n}"
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {str(ex)[:200]}"
        if status.startswith(("FAIL", "ERROR")):
            fails.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)",
              flush=True)
    print(f"DONE {len(names) - len(fails)}/{len(names)} ok in "
          f"{(time.time() - t_start) / 60:.1f} min; failures: {fails}",
          flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
