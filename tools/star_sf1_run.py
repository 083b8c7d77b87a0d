"""Composed sf1 star+analytics run (VERDICT r5 item 4): star build → sink →
all §2C dashboard queries, ONE timed pipeline at ~1000x the reference's data
— the reference's end-to-end shape (/root/reference/main.py:19-127) at scale.

Phases (each timed, one JSON line at the end):
  build  : extract → conform → dims → fact → partitioned-parquet star sink
           (write_star: dims plain, fact partitioned by Sale_Month)
  serve  : read the written star back, run every analytics.ALL query to a
           noop sink (the dashboard refresh path)
  checks : composed-plan assertions — bounded dims (product/store) reach the
           analytics joins as BroadcastHashJoin, and a month-scoped fact
           query driven through a dim filter triggers dynamic partition
           pruning (the 100 TB access path: scan one month, not the table).

Usage: python tools/star_sf1_run.py [data_dir]
  data_dir: scaled raw inputs from tools/make_star_scale.py
            (default /root/repo/.scratch/star_sf1; generated if missing)
"""

from __future__ import annotations

import contextlib
import inspect
import io
import json
import subprocess
import sys
import time
from pathlib import Path

from finegourmet_spark.session import get_spark
from finegourmet_spark.star import analytics
from finegourmet_spark.star.load import read_star
from finegourmet_spark.star.pipeline import run_pipeline

FRAMES_BY_PARAM = {
    "fact": "Fact_Sales",
    "dim_product": "Dim_Product",
    "dim_store": "Dim_Store",
    "dim_client": "Dim_Client",
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    data = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/root/repo/.scratch/star_sf1"
    )
    if not data.exists():
        subprocess.run(
            [sys.executable, "tools/make_star_scale.py", "1000", str(data)],
            check=True,
        )
    out_dir = str(data) + "_out"
    spark = get_spark(app_name="star_sf1_composed")

    t0 = time.time()
    res = run_pipeline(
        spark,
        sfcc_glob=f"{data}/salesforces/*_sfcc_sales.csv",
        cegid_path=f"{data}/cegid/*.json",
        products_glob=f"{data}/product/*_product_reference.csv",
        boutiques_path=f"{data}/boutiques/2025_boutiques.csv",
        out_dir=out_dir,
    )
    t_build = time.time() - t0

    star = read_star(spark, out_dir)
    timings: dict[str, float] = {}
    serve0 = time.time()
    for name, fn in analytics.ALL.items():
        args = [
            star[FRAMES_BY_PARAM[p]]
            for p in inspect.signature(fn).parameters
            if p in FRAMES_BY_PARAM
        ]
        t = time.time()
        fn(*args).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t, 3)
    t_serve = time.time() - serve0

    # ---- composed-plan checks -------------------------------------------
    problems: list[str] = []
    for name, dim_param in (
        ("revenue_by_category", "dim_product"),
        ("store_share", "dim_store"),
    ):
        fn = analytics.ALL[name]
        args = [
            star[FRAMES_BY_PARAM[p]]
            for p in inspect.signature(fn).parameters
            if p in FRAMES_BY_PARAM
        ]
        if "BroadcastHashJoin" not in plan_of(fn(*args)):
            problems.append(f"{name}: bounded dim ({dim_param}) not broadcast")

    # DPP probe: a dashboard month-filter pushed through a join onto the
    # Sale_Month-partitioned fact must prune partitions dynamically.
    from pyspark.sql import functions as F

    dim_month = (
        star["Fact_Sales"]
        .select("Sale_Month")
        .distinct()
        .withColumn(
            "quarter",
            F.quarter(F.to_date(F.concat("Sale_Month", F.lit("-01")))),
        )
    )
    dpp_plan = plan_of(
        star["Fact_Sales"]
        .join(dim_month.filter(F.col("quarter") == 1), "Sale_Month")
        .groupBy("Sale_Month")
        .agg(F.sum("Price").alias("revenue"))
    )
    if "dynamicpruning" not in dpp_plan.lower():
        problems.append("DPP did not fire on the Sale_Month-scoped fact scan")

    metrics = {k: v for k, v in res.metrics().items()}
    print(
        json.dumps(
            {
                "metric": "star_sf1_composed",
                "build_sec": round(t_build, 2),
                "serve_sec": round(t_serve, 2),
                "total_sec": round(t_build + t_serve, 2),
                "queries": timings,
                "fact_rows": star["Fact_Sales"].count(),
                "dim_client_rows": star["Dim_Client"].count(),
                "observed": {k: str(v) for k, v in metrics.items()},
                "plan_problems": problems,
            }
        )
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
