"""Round-14 optimization evidence capture.

Modes:

  python tools/r14_capture.py plans <suffix> [q_name ...]
      write plans/r14/<q>_<suffix>.txt — formatted pre-execution plans.
      Default query set: the 13 bench headline queries (same session conf
      as bench.py so the plans are the benched plans). Named queries are
      captured at $SPARK_GRAFT_SF_DIR (default sf0.01 for the non-headline
      content-pair ops, matching the r13 evidence protocol).

  python tools/r14_capture.py audit
      fleet audit of ALL queries: one line per registered query —
      #Exchange, join node types, Python eval nodes, pushed-filter scans.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q_star_join", "q_agg_basic", "q_topk", "q_window_rank", "q_join_inner",
    "q_pivot", "q_stream_tumbling", "q_stream_session", "q_dedup_exact",
    "q_dedup_minhash", "q_similarity_topk", "q_text_stats",
    "q_explode_wordcount",
]


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    default_sf = (
        "/root/testdata/sf0.1" if names is HEADLINE or not sys.argv[3:]
        else "/root/testdata/sf0.01"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", default_sf)

    from finegourmet_spark.session import get_spark

    import __spark_entry__ as contract

    # identical conf to bench.py so the captured plan is the benched plan
    spark = get_spark(
        app_name="r14_capture",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    queries = contract.queries()

    if mode == "plans":
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r14",
        )
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            plan = _plan(queries[name](spark, sf_dir))
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    else:  # audit
        rows = []
        for name in sorted(queries):
            try:
                plan = _plan(queries[name](spark, sf_dir))
            except Exception as exc:  # audit tool: never die mid-sweep
                rows.append((name, f"PLAN-ERROR {type(exc).__name__}: {exc}"))
                continue
            ops = re.findall(r"^\s*[:+\-| ]*\(\d+\) ([A-Za-z]+)", plan, re.M)
            joins = sorted({o for o in ops if "Join" in o or o == "CartesianProduct"})
            py = sorted({o for o in ops if "Python" in o or "Arrow" in o or "InPandas" in o})
            n_ex = sum(1 for o in ops if o == "Exchange")
            n_scan = sum(1 for o in ops if o.startswith("Scan"))
            pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
            rows.append(
                (name,
                 f"ex={n_ex} scans={n_scan} pushed={pushed} "
                 f"joins={','.join(joins) or '-'} py={','.join(py) or '-'}")
            )
        for name, desc in rows:
            print(f"{name:40s} {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
