"""Independent-model checks for the round-3 nineteenth-wave ops (interval
union/coverage, business-day SLA): plain-Python recomputation over the
collected sf0.001 tables, exact match required."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.temporal import (
    COVER_HOLD_DAYS,
    EPOCH_MONDAY,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def test_interval_coverage_matches_python_model(spark, sf_dir):
    ivs = defaultdict(set)
    for r in load_table(spark, sf_dir, "orders").collect():
        s = r["o_orderdate"].date()
        ivs[r["o_orderpriority"]].add((s, s + dt.timedelta(days=COVER_HOLD_DAYS)))
    expected = {}
    for pri, spans in ivs.items():
        merged = []
        for s, e in sorted(spans):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expected[pri] = (
            len(merged),
            sum((e - s).days for s, e in merged),
            max((e - s).days for s, e in merged),
        )
    got = {
        r["o_orderpriority"]: (
            r["n_spans"],
            r["covered_days"],
            r["longest_span_days"],
        )
        for r in QUERIES["q_interval_coverage"](spark, sf_dir).collect()
    }
    assert got == expected


def test_business_days_matches_python_model(spark, sf_dir):
    monday = dt.date.fromisoformat(EPOCH_MONDAY)
    first_ship = {}
    for r in load_table(spark, sf_dir, "lineitem").collect():
        d = r["l_shipdate"].date()
        k = r["l_orderkey"]
        if k not in first_ship or d < first_ship[k]:
            first_ship[k] = d
    agg = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_dir, "orders").collect():
        if r["o_orderkey"] not in first_ship:
            continue
        od, sd = r["o_orderdate"].date(), first_ship[r["o_orderkey"]]
        bus = 0
        d = od + dt.timedelta(days=1)
        while d <= sd:
            if (d - monday).days % 7 < 5:
                bus += 1
            d += dt.timedelta(days=1)
        e = agg[od.replace(day=1)]
        e[0] += 1
        e[1] += bus
        e[2] = max(e[2], bus)
    expected = {m: (n, s // n, mx) for m, (n, s, mx) in agg.items()}
    got = {
        r["month_start"]: (r["n_orders"], r["avg_busdays"], r["max_busdays"])
        for r in QUERIES["q_business_days_sla"](spark, sf_dir).collect()
    }
    assert got == expected
