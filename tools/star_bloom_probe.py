"""q_star_join runtime-Bloom-filter probe (guide §3.2; OPTIMIZATION_r13.md).

At sf10+ the lineitem⋈orders leg flips broadcast → co-shuffle, making it
the textbook candidate for a runtime Bloom filter on o_orderkey (the
orders date filter keeps ~30%). This probe measures the three states on
one op in a fresh session each:

    python tools/star_bloom_probe.py base     # stock session
    python tools/star_bloom_probe.py creation # creationSideThreshold 512m
    python tools/star_bloom_probe.py forced   # + applicationSideScanSizeThreshold 64m

r13 findings at sf10 (SPARK_GRAFT_SF_DIR=.scratch/sf10): `base` and
`creation` never inject (the 1.1 GB application-side scan is under the
10 GB applicationSideScanSizeThreshold — correct optimizer triage);
`forced` injects (bloom_filter/might_contain in the executed plan) and
measures INSIDE noise (8.03-9.34 s vs 8.44-8.97 s base) because a
single-box shuffle moves bytes at memory speed. The cluster note that
matters: with the stock 10 MB creationSideThreshold the filter stays
suppressed even when the scan-side gate passes — deployments wanting
§3.2 on this shape must raise creationSideThreshold.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finegourmet_spark.session import get_spark  # noqa: E402

import __spark_entry__ as contract  # noqa: E402


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
    extra = {
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(512 * 1024),
    }
    if variant in ("creation", "forced"):
        extra["spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"] = str(
            512 * 1024 * 1024
        )
    if variant == "forced":
        extra[
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ] = str(64 * 1024 * 1024)
    spark = get_spark(app_name=f"star_bloom_{variant}", extra_conf=extra)
    q = contract.queries()["q_star_join"]
    df = q(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    # Plan capture via the public explain API (ADVICE r13: the private
    # df._jdf accessor is version-fragile, and this DataFrame's own
    # QueryExecution never executes — the noop writes run through separate
    # QueryExecutions — so under AQE any join-strategy read here is the
    # INITIAL plan, not the runtime-adapted one. bloom might_contain
    # detection is unaffected: runtime bloom injection is a static
    # optimizer rule, visible pre-execution.)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    injected = "bloom_filter" in plan or "might_contain" in plan
    print(
        f"{variant}: best {best:.2f} s; bloom injected: {injected}; "
        f"pre-AQE plan shape (initial, not runtime-adapted): "
        f"SMJ: {'SortMergeJoin' in plan}; "
        f"broadcast joins: {plan.count('BroadcastHashJoin')}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
