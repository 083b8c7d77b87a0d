"""A/B: spark.io.compression.codec lz4 (default) vs zstd on the
bytes-heavy content-pair rungs (VERDICT r13 item 3 / guide §2.3 — the
deferred knob with no local evidence either way).

Protocol: alternating A/B/A/B, fresh session per run (cold plans, same
class as the rung anchors), one full query count() per run, the host
canaries from bench.py recorded per run so a verdict is adjudicable
against box state. Shuffle-scratch high-water is read from the block
manager before teardown — the codec's byte effect shows there even when
the wall is noise-bound.

Usage: SPARK_GRAFT_MUT_DIR=... python tools/zstd_ab.py [q_name ...] [--runs N]
  default queries: q_setsim_join_prefix q_dedup_minhash (the two ops
  whose rung shuffles are large enough to measure)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

MUT = os.environ.get("SPARK_GRAFT_MUT_DIR", "/root/repo/.scratch/sf10-mut")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args or ["q_setsim_join_prefix", "q_dedup_minhash"]

    import __spark_entry__ as contract
    from bench import _host_canary
    from finegourmet_spark.operators.scratch import shuffle_scratch_bytes as _shuffle_scratch_bytes
    from finegourmet_spark.session import get_spark

    q = contract.queries()
    for name in names:
        results: dict[str, list] = {"lz4": [], "zstd": []}
        for r in range(runs):
            for codec in ("lz4", "zstd"):
                cpu_c, mem_c = _host_canary()
                spark = get_spark(
                    app_name=f"zstd_ab_{name}_{codec}_{r}",
                    extra_conf={"spark.io.compression.codec": codec},
                )
                assert (
                    spark.conf.get("spark.io.compression.codec") == codec
                ), "codec conf did not apply"
                # poll scratch high-water while the query runs: the codec's
                # byte effect shows in shuffle-file volume even when the
                # wall is noise-bound
                import threading

                hw = [0]
                stop_flag = [False]

                def _poll():
                    while not stop_flag[0]:
                        b = _shuffle_scratch_bytes(spark)
                        if b is not None and b > hw[0]:
                            hw[0] = b
                        time.sleep(0.5)

                poller = threading.Thread(target=_poll, daemon=True)
                poller.start()
                t0 = time.time()
                n = q[name](spark, MUT).count()
                dt = round(time.time() - t0, 1)
                stop_flag[0] = True
                poller.join(timeout=2)
                gb = round(hw[0] / 2**30, 2)
                spark.stop()
                results[codec].append((dt, gb, cpu_c, mem_c, n))
                print(
                    f"{name} [{codec}] run{r}: {n} rows, {dt}s, "
                    f"scratch {gb} GB, canaries {cpu_c}/{mem_c}",
                    flush=True,
                )
        for codec, rows in results.items():
            walls = [x[0] for x in rows]
            print(
                f"{name} [{codec}] summary: min {min(walls)} walls {walls} "
                f"scratch {[x[1] for x in rows]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
