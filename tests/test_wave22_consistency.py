"""Independent-model check for the round-3 twenty-second-wave op (SCD2
point-in-time lookup): plain-Python recomputation over the collected
sf0.001 tables, exact match required — including the pre-history channel
and the at-most-one-version-per-fact invariant."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.relational import SCD2_LKP_V1, SCD2_LKP_V2
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_scd2_lookup_matches_python_model(spark, sf_dir):
    v1 = dt.date.fromisoformat(SCD2_LKP_V1)
    v2 = dt.date.fromisoformat(SCD2_LKP_V2)
    agg = defaultdict(lambda: [0, 0])
    n_orders = 0
    for r in load_table(spark, sf_dir, "orders").collect():
        n_orders += 1
        od = r["o_orderdate"].date()
        even = r["o_custkey"] % 2 == 0
        if od < v1:
            version = "pre-history"
        elif even and od >= v2:
            version = SCD2_LKP_V2
        else:
            version = SCD2_LKP_V1
        agg[version][0] += 1
        agg[version][1] += _cents(r["o_totalprice"])
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        r["dim_version"]: (r["n_orders"], r["rev_cents"])
        for r in QUERIES["q_scd2_lookup"](spark, sf_dir).collect()
    }
    assert got == expected
    # the tiling invariant: every order lands in exactly one version bucket
    assert sum(v[0] for v in got.values()) == n_orders
