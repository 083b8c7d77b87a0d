"""Round-6 full-registry sf10 (100x t2 scale) sweep.

The sf10 decade caught a real class (q_share_of_parent's int64 ppm wrap),
so the whole registry earns a pass at it. Oracle compare where feasible;
Spark-side rows-only when either (a) the oracle is pair/wedge-bound
(documented r3/r4 carve-outs, worse at sf10), or (b) the RESULT is
data-scale wide — the harness collects+canonicalizes both sides in Python,
which at sf10 means multi-GB driver lists (the q_null_repair lesson:
60M-row compare is the harness's cost, the query runs in 4.9 s). The cap
is on output rows: metadata-scale results (aggregates, top-k, profiles —
the shapes that can hide width bugs) still get the full cross-engine hash.

Usage: python tools/sf10_sweep.py [start_at_name] [end_before_name]
(bounds let two sweep halves run in parallel — Spark stages, DuckDB, and
the single-threaded Python canonicalization overlap across processes)
"""

from __future__ import annotations

import sys
import time

import __spark_entry__ as contract
from finegourmet_spark.session import get_spark
from tests.oracle_harness import compare

SF10 = "/root/repo/.scratch/sf10"
ROW_CAP = 300_000  # compare only results the harness can collect twice

# DuckDB-infeasible (pair/wedge-bound oracles; documented r3+r4, worse at
# sf10):
SPARK_SIDE_ONLY = {
    "q_graph_jaccard_neighbors", "q_setsim_join_prefix",
    "q_containment_dedup", "q_item_item_cf", "q_dedup_clusters",
    "q_dedup_semantic_clusters", "q_fuzzy_join_levenshtein",
    "q_graph_triangles", "q_golden_record", "q_dedup_chunks",
    "q_dedup_ngram_jaccard", "q_dedup_embedding",
}

# Skipped entirely at sf10: ops that pair documents/names on CONTENT. The
# replicator gives every document 100 exact copies (same text, new ids), so
# per-cluster candidate pairs grow C(100,2)=4950 — a fixture-quadratic
# stress (the q_dedup_minhash decade-curve note), not a scale signal. On a
# real corpus near-dup rates stay ~constant and these are bucketed/bounded.
SF10_FIXTURE_QUADRATIC = {
    "q_containment_dedup", "q_setsim_join_prefix", "q_dedup_ngram_jaccard",
    "q_dedup_chunks", "q_dedup_clusters", "q_dedup_semantic_clusters",
    "q_golden_record", "q_fuzzy_join_levenshtein", "q_dedup_embedding",
    # ML twin of q_dedup_minhash: approxSimilarityJoin rows carry sparse
    # vectors, so even counting the quadratic pair set trips the driver
    # result-size cap; the custom q_dedup_minhash (32 longs/doc) is the
    # sf10-capable path and DID complete (65.8 s, decade-curve note).
    "q_dedup_minhash_ml",
    # DENSITY-quadratic (round-6 sweep catch, distinct class from the
    # content-pair ops above): the grid NN join uses a FIXED 4096^2 space
    # with CELL=256 == the search radius, so the replicated fixture packs
    # 1000x the points into the same cells — each customer's radius then
    # holds ~1.5k suppliers and the candidate join is ~2.4e9 rows (>9 min
    # observed; result is still 1 row/customer). On real data the cell
    # size is chosen from density; the density-adaptive variant (finer
    # cells + expanding-ring search) is the queued r7 fix — see ROADMAP.
    "q_geo_nearest_grid",
}

# Checkpoint blocks accumulate across queries (the sf1_sweep lesson);
# restart the session periodically.
SESSION_CHUNK = 25


def main() -> int:
    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    q = contract.queries()
    o = contract.oracle_sql()
    names = sorted(q)
    start_at = sys.argv[1] if len(sys.argv) > 1 else None
    end_before = sys.argv[2] if len(sys.argv) > 2 else None
    if start_at:
        names = [n for n in names if n >= start_at]
    if end_before:
        names = [n for n in names if n < end_before]
    t_start = time.time()
    fails = []
    spark = None
    for i, name in enumerate(names):
        if i % SESSION_CHUNK == 0:
            if spark is not None:
                spark.stop()
            spark = get_spark(app_name="sf10_sweep")
        t0 = time.time()
        if name in SF10_FIXTURE_QUADRATIC:
            print(f"[{i + 1}/{len(names)}] {name}: skipped "
                  "[fixture-quadratic content pairs at 100-copy duplication]",
                  flush=True)
            continue
        try:
            df = q[name](spark, SF10)
            n = df.count()
            if name in o and name not in SPARK_SIDE_ONLY and n <= ROW_CAP:
                problems = compare(df, o[name], SF10)
                status = "OK" if not problems else f"FAIL {problems[0][:200]}"
            else:
                why = "carve-out" if name in SPARK_SIDE_ONLY or name not in o \
                    else f"wide ({n} rows > cap)"
                status = f"rows-only {n} [{why}]"
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
