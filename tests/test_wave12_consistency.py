"""Independent-model checks for the round-3 twelfth-wave ops (Python UDTF
installments, VARIANT extraction, SQL pipe syntax, CDC snapshot diff,
MoM/YoY growth): plain-Python recomputation over the collected sf0.001
tables, exact match required."""

from __future__ import annotations

import json
from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.python_udfs import N_INSTALLMENTS
from finegourmet_spark.operators.quality import (
    CDC_BUMP_CENTS,
    CDC_DEL,
    CDC_INS,
    CDC_KEYSHIFT,
    CDC_UPD,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_udtf_installments_match_python_model(spark, sf_dir):
    expected = {}
    for r in load_table(spark, sf_dir, "orders").collect():
        cents = _cents(r["o_totalprice"])
        base, rem = divmod(cents, N_INSTALLMENTS)
        for i in range(1, N_INSTALLMENTS + 1):
            expected[(r["o_orderkey"], i)] = base + (1 if i <= rem else 0)
    got = {
        (r["o_orderkey"], r["inst_no"]): r["inst_cents"]
        for r in QUERIES["q_udtf_installments"](spark, sf_dir).collect()
    }
    assert got == expected
    # every plan sums back to its order total exactly
    totals = defaultdict(int)
    for (ok, _), c in got.items():
        totals[ok] += c
    orders = {
        r["o_orderkey"]: _cents(r["o_totalprice"])
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    assert totals == orders


def test_variant_funcs_match_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, set()])
    for r in load_table(spark, sf_dir, "events").collect():
        k = json.loads(r["props"])["k"]
        if k % 2 == 1:
            e = agg[r["event_type"]]
            e[0] += 1
            e[1] += k
            e[2].add(k)
    expected = {et: (n, s, len(d)) for et, (n, s, d) in agg.items()}
    got = {
        r["event_type"]: (r["n_events"], r["sum_k"], r["distinct_k"])
        for r in QUERIES["q_variant_funcs"](spark, sf_dir).collect()
    }
    assert got == expected


def test_pipe_syntax_matches_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "lineitem").collect():
        if r["l_quantity"] > 10:
            e = agg[(r["l_returnflag"], r["l_linestatus"])]
            e[0] += 1
            e[1] += _cents(r["l_extendedprice"])
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_lines"], r["rev_cents"])
        for r in QUERIES["q_pipe_syntax"](spark, sf_dir).collect()
    }
    assert got == expected


def test_snapshot_diff_matches_python_model(spark, sf_dir):
    v1 = {}
    for r in load_table(spark, sf_dir, "customer").collect():
        v1[r["c_custkey"]] = (
            r["c_name"],
            r["c_nationkey"],
            _cents(r["c_acctbal"]),
        )
    v2 = {}
    for k, (nm, nk, bal) in v1.items():
        if k % CDC_DEL != 0:
            v2[k] = (nm, nk, bal + (CDC_BUMP_CENTS if k % CDC_UPD == 0 else 0))
        if k % CDC_INS == 0:
            v2[k + CDC_KEYSHIFT] = (nm, nk, bal)
    expected = {}
    for k in v1.keys() | v2.keys():
        if k not in v1:
            expected[k] = ("insert", None, v2[k][2])
        elif k not in v2:
            expected[k] = ("delete", v1[k][2], None)
        elif v1[k] != v2[k]:
            expected[k] = ("update", v1[k][2], v2[k][2])
    got = {
        r["c_custkey"]: (r["change_type"], r["old_bal_cents"], r["new_bal_cents"])
        for r in QUERIES["q_snapshot_diff_cdc"](spark, sf_dir).collect()
    }
    assert got == expected


def test_growth_rates_match_python_model(spark, sf_dir):
    monthly = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").collect():
        monthly[r["o_orderdate"].date().replace(day=1)] += _cents(
            r["o_totalprice"]
        )
    months = sorted(monthly)

    def signed(cur: int, base: int | None) -> int | None:
        if base is None:
            return None
        if cur >= base:
            return (1_000_000 * (cur - base)) // base
        return -((1_000_000 * (base - cur)) // base)

    expected = {}
    for i, m in enumerate(months):
        prev = monthly[months[i - 1]] if i >= 1 else None
        yoy = monthly[months[i - 12]] if i >= 12 else None
        expected[m] = (
            monthly[m],
            prev,
            signed(monthly[m], prev),
            signed(monthly[m], yoy),
        )
    got = {
        r["month_start"]: (
            r["rev_cents"],
            r["prev_cents"],
            r["mom_growth_ppm"],
            r["yoy_growth_ppm"],
        )
        for r in QUERIES["q_growth_rates"](spark, sf_dir).collect()
    }
    assert got == expected
