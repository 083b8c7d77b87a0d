"""Independent-model checks for the round-3 thirteenth-wave ops
(point-in-time features, late-arriving dim, SQL scalar function, bitmap
audience overlap): plain-Python recomputation over the collected sf0.001
tables, exact match required."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.eventflow import AOV_A, AOV_B
from finegourmet_spark.operators.relational import LATE_DIM_MOD, SQLF_BANDS
from finegourmet_spark.operators.temporal import PIT_WINDOW_DAYS
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_pit_features_are_leakage_free(spark, sf_dir):
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    by_cust = defaultdict(list)
    rows = load_table(spark, sf_dir, "orders").collect()
    for r in rows:
        by_cust[r["o_custkey"]].append(
            (
                (r["o_orderdate"].date() - epoch).days,
                r["o_orderkey"],
                _cents(r["o_totalprice"]),
            )
        )
    expected = {}
    for orders in by_cust.values():
        for dday, ok, _ in orders:
            prior = [
                c
                for d2, _, c in orders
                if dday - PIT_WINDOW_DAYS <= d2 <= dday - 1
            ]
            expected[ok] = (len(prior), sum(prior))
    got = {
        r["o_orderkey"]: (r["prior_orders_90d"], r["prior_rev_cents_90d"])
        for r in QUERIES["q_pit_features"](spark, sf_dir).collect()
    }
    assert got == expected
    # leakage guard: a same-day order must not count itself or its same-day
    # siblings — spot-check that no order's prior count includes its own day
    for orders in by_cust.values():
        days = defaultdict(int)
        for dday, _, _ in orders:
            days[dday] += 1
        for dday, ok, _ in orders:
            strict_prior = sum(
                n for d2, n in days.items() if d2 <= dday - 1 and d2 >= dday - PIT_WINDOW_DAYS
            )
            assert got[ok][0] == strict_prior


def test_late_arriving_dim_matches_python_model(spark, sf_dir):
    dim = {
        r["p_partkey"]: r["p_name"]
        for r in load_table(spark, sf_dir, "part").collect()
        if r["p_partkey"] % LATE_DIM_MOD != 0
    }
    fact_keys = {
        r["l_partkey"] for r in load_table(spark, sf_dir, "lineitem").collect()
    }
    expected = {k: (nm, False) for k, nm in dim.items()}
    for k in fact_keys - dim.keys():
        expected[k] = ("UNKNOWN", True)
    got = {
        r["p_partkey"]: (r["p_name"], r["is_inferred"])
        for r in QUERIES["q_late_arriving_dim"](spark, sf_dir).collect()
    }
    assert got == expected
    assert any(v[1] for v in got.values())  # some members really are inferred


def test_sql_scalar_function_matches_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "orders").collect():
        cents = _cents(r["o_totalprice"])
        if cents < SQLF_BANDS[0][0]:
            band = SQLF_BANDS[0][1]
        elif cents < SQLF_BANDS[1][0]:
            band = SQLF_BANDS[1][1]
        else:
            band = "high"
        agg[band][0] += 1
        agg[band][1] += cents
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        r["price_band"]: (r["n_orders"], r["rev_cents"])
        for r in QUERIES["q_sql_scalar_function"](spark, sf_dir).collect()
    }
    assert got == expected


def test_bitmap_overlap_matches_python_model(spark, sf_dir):
    a, b = defaultdict(set), defaultdict(set)
    for r in load_table(spark, sf_dir, "events").collect():
        m = r["ts"].date().replace(day=1)
        if r["event_type"] == AOV_A:
            a[m].add(r["user_id"])
        elif r["event_type"] == AOV_B:
            b[m].add(r["user_id"])
    expected = {
        m: (
            len(a[m]),
            len(b[m]),
            len(a[m] & b[m]),
            len(a[m] | b[m]),
        )
        for m in a.keys() | b.keys()
    }
    got = {
        r["month_start"]: (r["n_a"], r["n_b"], r["n_both"], r["n_either"])
        for r in QUERIES["q_bitmap_audience_overlap"](spark, sf_dir).collect()
    }
    assert got == expected
