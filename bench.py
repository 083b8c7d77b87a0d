"""Benchmark harness: times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Each query is materialized with a noop-format write so every output column is
computed (a bare .count() would let Catalyst prune the projections we're
trying to measure) while sink cost stays zero.
"""

from __future__ import annotations

import json
import os
import sys
import time

def _host_canary() -> tuple[float, float]:
    """Fixed ~2 s machine-state microbench (VERDICT r11 item 4): a
    single-thread integer loop (CPU/interpreter speed) and a 256 MiB-
    buffer numpy memcpy sweep (memory bandwidth, ~2 GiB copied per
    direction), both constant work by construction.
    Two rounds each paid a worktree-bisect session to adjudicate
    wedge-class wall-time drift (282.7→1330 s) as host state; recording
    these next to loadavg_prerun makes that a one-number read against the
    BASELINE.md host reference values. Loadavg misses the relevant state:
    the r11 drift happened at loadavg < 3 (cgroup/CPU-steal/thermal class
    effects), which a fixed workload's wall time exposes directly."""
    t0 = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(3_000_000):  # xorshift64*, pure-Python single core
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    cpu_s = time.perf_counter() - t0
    try:
        import numpy as np

        a = np.zeros(1 << 25, dtype=np.float64)  # 256 MiB
        b = np.empty_like(a)
        b[:] = a  # fault both buffers in before timing
        t0 = time.perf_counter()
        for _ in range(8):
            b[:] = a
            a[:] = b
        membw_s = time.perf_counter() - t0  # 8×256 MiB ≈ 2 GiB each way
        del a, b
    except Exception:
        membw_s = -1.0
    return round(cpu_s, 3), round(membw_s, 3)


HEADLINE = [
    "q_star_join",
    "q_agg_basic",
    "q_topk",
    "q_window_rank",
    "q_join_inner",
    "q_pivot",
    "q_stream_tumbling",
    "q_stream_session",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_similarity_topk",
    "q_text_stats",
    "q_explode_wordcount",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # pre-run 1/5/15-min loadavg: makes every BENCH json self-describing
    # about box quietness, so cross-round comparisons on re-provisioned /
    # shared hosts can be normalized (VERDICT r10 item 2)
    loadavg = [round(x, 2) for x in os.getloadavg()]
    cpu_canary, membw_canary = _host_canary()
    from finegourmet_spark.session import get_spark

    import __spark_entry__ as contract

    # local-bench override: the sf0.1 inputs are single ~1-10 MB parquet
    # files, which the default 128 MB split size turns into 1-3 scan tasks on
    # 32 cores; smaller splits parallelize the scans (~10% on scan-heavy
    # queries). On a real cluster files exceed the default split size and
    # these knobs stay at their cluster-appropriate defaults (session.py).
    spark = get_spark(
        app_name="finegourmet_bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    queries = contract.queries()

    # Session-wide warmup BEFORE any timed loop: touch every input table
    # (parquet footers + OS page cache) and run one tiny shuffle so
    # whole-stage-codegen JIT, shuffle machinery, and AQE paths are compiled
    # before the first query's own warmup run. Without this the first
    # headline query silently absorbs the JVM cold-start (r3 VERDICT item 7:
    # q_agg_basic measured 10.9 s in a cold sf1 sweep vs 2.72 s isolated).
    from finegourmet_spark.sources.testdata import load_table

    for table in ("lineitem", "orders", "customer", "part", "supplier",
                  "nation", "region", "events", "documents", "embeddings"):
        try:
            df = load_table(spark, sf_dir, table)
            df.groupBy(df.columns[0]).count().write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # missing optional table: warm what exists

    # decade-protocol knob: skip named queries at fixture scales where they
    # are fixture-quadratic (e.g. q_dedup_minhash at factor-1000 replication:
    # C(1000,2) pairs per exact-duplicate cluster). Unset in the driver's
    # per-round run — the headline list is unchanged there.
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",") if s
    }
    timings: dict[str, float] = {}
    plan_builds: dict[str, float] = {}
    for name in HEADLINE:
        if name in skip:
            continue
        fn = queries[name]
        # plan_build_s (r14, VERDICT r13 item 6 — ADDITIONS-ONLY
        # observability): DataFrame construction + Catalyst analysis
        # seconds, measured on a separate warm build OUTSIDE every timed
        # region. The r13 decomposition showed 30-50% of each sf0.1
        # reading is driver-side planning; recording the per-query
        # planning term next to now_sec lets future PERF deltas separate
        # planning noise from execution signal. The timed loop below is
        # UNCHANGED (same rebuild-per-run methodology, same noop sink).
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        _ = df.schema  # forces analysis (not execution)
        plan_builds[name] = round(time.perf_counter() - t0, 3)
        df.write.format("noop").mode("overwrite").save()  # warm: JIT+IO cache
        best = float("inf")
        for _ in range(2):  # min-of-2 damps JIT/GC noise
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "plan_build_s": plan_builds,  # additions-only key (r14): per-query
        # construction+analysis seconds, measured outside the timed runs
        "loadavg_prerun": loadavg,
        "cpu_canary_s": cpu_canary,
        "membw_canary_s": membw_canary,
    }
    skipped = sorted(s for s in skip if s in HEADLINE)
    if skipped:
        # mark reduced query sets so a skipped-run total is never silently
        # compared against a full-run total (ADVICE r8)
        result["skipped"] = skipped
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
