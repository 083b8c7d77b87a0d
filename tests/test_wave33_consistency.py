"""Independent plain-Python model for the round-4 wave 33 operator:
CDC-apply on an SCD2 dimension (close/open/insert version arithmetic)."""

from __future__ import annotations

import datetime as dt

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.relational import SCD2_APPLY_EFF, SCD2_APPLY_T0
from finegourmet_spark.sources.testdata import load_table


def test_scd2_apply_cdc_matches_python_model(spark, sf_dir):
    t0 = dt.date.fromisoformat(SCD2_APPLY_T0)
    eff = dt.date.fromisoformat(SCD2_APPLY_EFF)
    base = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    expected = set()
    for k, seg in base.items():
        if k % 7 == 0:  # update: close + reopen
            expected.add((k, seg, t0, eff, False))
            expected.add((k, "WEB", eff, None, True))
        elif k % 13 == 0:  # delete: close only
            expected.add((k, seg, t0, eff, False))
        else:  # untouched
            expected.add((k, seg, t0, None, True))
        if k % 11 == 0:  # insert under a derived key
            expected.add((k + 1000000, "NEW", eff, None, True))
    got = {
        (r["custkey"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in QUERIES["q_scd2_apply_cdc"](spark, sf_dir).collect()
    }
    assert got == expected
    # SCD2 invariants: every base key still present; exactly one current
    # version per surviving key; deletes have NO current version
    current = [(k) for (k, _, _, vt, cur) in got if cur]
    assert len(current) == len(set(current))
    deleted = {k for k in base if k % 13 == 0 and k % 7 != 0}
    assert deleted.isdisjoint(set(current))


def test_grouped_percentiles_match_python_model(spark, sf_dir):
    from collections import defaultdict
    from decimal import Decimal

    from finegourmet_spark.operators.quality import REPORT_PCTS

    groups = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        groups[r["event_type"]].append(
            int(Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100)
        )
    rows = {
        r["event_type"]: r
        for r in QUERIES["q_grouped_percentiles"](spark, sf_dir).collect()
    }
    assert set(rows) == set(groups)
    for g, xs in groups.items():
        xs.sort()
        n = len(xs)
        r = rows[g]
        assert r["n_rows"] == n
        for p in REPORT_PCTS:
            assert r[f"p{p}_cents"] == xs[-(-n * p // 100) - 1]
        # monotone percentile vector
        vec = [r[f"p{p}_cents"] for p in REPORT_PCTS]
        assert vec == sorted(vec)
