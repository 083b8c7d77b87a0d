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
   or: python tools/sf10_sweep.py --names-file <path>
(bounds let two sweep halves run in parallel — Spark stages, DuckDB, and
the single-threaded Python canonicalization overlap across processes; the
names-file form takes one query name per line, for resuming a sweep whose
remaining set is name-sparse — r6 left gaps, not a prefix)
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
    # r7 sweep catch: every oracle built on the part-graph _EDGE_SQL CTE
    # (DISTINCT over the order self-join) materializes ~1e9 pair rows in
    # DuckDB temp at sf10 — q_graph_bfs_hops filled 44 GB of temp and died
    # (399 s), q_graph_jaccard_capped's weighted-wedge CTE repeated it.
    # The Spark sides run fine (partial aggs + spill); rows-only here.
    # q_graph_lpa_users is NOT in this set: its user-graph edges come from
    # an events-scale lag window (~10M rows at sf10), DuckDB-feasible.
    "q_graph_bfs_hops", "q_graph_pagerank", "q_graph_label_propagation",
    "q_graph_jaccard_capped",
    # r7 catch: the skyline oracle states raw dominance as a NOT EXISTS
    # anti-join with two range predicates — quadratic over 2M parts in
    # DuckDB at sf10 (ground >15 min; the Spark side is the scalable
    # per-size-champion decomposition and returns in seconds).
    "q_skyline_pareto",
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
    # r7 catch, same class on the EMBEDDINGS side: the sf10 fixture
    # replicates every embedding 100x byte-identically, so every LSH
    # bucket holds >=100 equal vectors and the candidate-PAIR output is
    # C(100,2) per identity cluster (~250M pairs; a single straggler task
    # ground >15 min before the kill). Real corpora collide at ~constant
    # rates; the probe-based q_similarity_topk / ivf / pq routes are the
    # sf10-capable ANN paths and all completed.
    "q_similarity_lsh",
    # q_geo_nearest_grid was here through r6 (density-quadratic: fixed
    # CELL=256 grid packed 1000x points/cell → ~2.4e9 candidates, run
    # killed). Fixed in r7: density-adaptive fine cells + expanding-ring
    # search (spatial.py module docstring) — now swept like everything else.
}

# Checkpoint blocks accumulate across queries (the sf1_sweep lesson);
# restart the session periodically.
SESSION_CHUNK = 25


def main() -> int:
    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    # per-host scratch budget for the grace-partitioned triangle closure
    # (r8: the one-pass wedge shuffle is ~78 GB at sf10 and filled this
    # host's disk; 12 GB/pass keeps ~65 GB of headroom for everything else)
    os.environ.setdefault("SPARK_GRAFT_CLOSURE_SCRATCH_GB", "12")
    q = contract.queries()
    o = contract.oracle_sql()
    names = sorted(q)
    if len(sys.argv) > 2 and sys.argv[1] == "--names-file":
        wanted = [ln.strip() for ln in open(sys.argv[2]) if ln.strip()]
        unknown = sorted(set(wanted) - set(names))
        if unknown:
            print(f"unknown query names in {sys.argv[2]}: {unknown}")
            return 2
        names = [n for n in names if n in set(wanted)]
    else:
        start_at = sys.argv[1] if len(sys.argv) > 1 else None
        end_before = sys.argv[2] if len(sys.argv) > 2 else None
        if start_at:
            names = [n for n in names if n >= start_at]
        if end_before:
            names = [n for n in names if n < end_before]
    t_start = time.time()
    fails = []
    skips = []
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
            skips.append(name)
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
            # a fatal executor event (disk-full spill, OOM) can stop the
            # whole local SparkContext — without a restart every later
            # query in the chunk ERRORs spuriously (the r7 cascade)
            try:
                alive = not spark.sparkContext._jsc.sc().isStopped()
            except Exception:  # noqa: BLE001
                alive = False
            if not alive:
                try:
                    spark.stop()
                except Exception:  # noqa: BLE001
                    pass
                spark = get_spark(app_name="sf10_sweep")
                status += " [stopped context: session restarted]"
        if status.startswith(("FAIL", "ERROR")):
            fails.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)",
              flush=True)
    n_ok = len(names) - len(fails) - len(skips)
    print(f"DONE {n_ok}/{len(names)} ok, {len(skips)} skipped {skips}, "
          f"{len(fails)} failed {fails} in "
          f"{(time.time() - t_start) / 60:.1f} min",
          flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
