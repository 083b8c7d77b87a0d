"""Independent plain-Python models for the round-4 wave 31 operators:
multiset EXCEPT/INTERSECT ALL, Poisson bootstrap, diff-in-differences."""

from __future__ import annotations

import hashlib
from collections import Counter
from decimal import Decimal

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.quality import (
    BOOTSTRAP_B,
    DID_CUTOFF,
    POISSON1_THRESHOLDS,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def _hash_u(s: str, k: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:k], 16)


def test_multiset_set_ops_match_bag_algebra(spark, sf_dir):
    left, right = Counter(), Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        if r["o_orderpriority"] == "1-URGENT":
            left[r["o_custkey"]] += 1
        if r["o_orderstatus"] == "F":
            right[r["o_custkey"]] += 1
    exp_except = {
        k: left[k] - right[k] for k in left if left[k] - right[k] > 0
    }
    exp_intersect = {
        k: min(left[k], right[k]) for k in left if k in right and min(left[k], right[k]) > 0
    }
    got_e = {
        r["custkey"]: r["surviving_copies"]
        for r in QUERIES["q_except_all"](spark, sf_dir).collect()
    }
    got_i = {
        r["custkey"]: r["common_copies"]
        for r in QUERIES["q_intersect_all"](spark, sf_dir).collect()
    }
    assert got_e == exp_except
    assert got_i == exp_intersect
    # ALL variants genuinely differ from DISTINCT: some multiplicity > 1
    assert any(v > 1 for v in got_e.values()) or any(
        v > 1 for v in got_i.values()
    )


def _poisson_w(u: int) -> int:
    for k, t in enumerate(POISSON1_THRESHOLDS):
        if u < t:
            return k
    return 9


def test_bootstrap_poisson_matches_python_model(spark, sf_dir):
    orders = [
        (r["o_orderkey"], _cents(r["o_totalprice"]))
        for r in load_table(spark, sf_dir, "orders").collect()
    ]
    got = {
        r["resample"]: (r["n_eff"], r["sum_cents"])
        for r in QUERIES["q_bootstrap_poisson"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, BOOTSTRAP_B + 1))
    for b in (1, BOOTSTRAP_B):  # spot-check two resamples exactly
        n_eff = s = 0
        for ok, cents in orders:
            w = _poisson_w(_hash_u(f"pb-{b}-{ok}", 12) % 1_000_000)
            n_eff += w
            s += w * cents
        assert got[b] == (n_eff, s)
    # resample sizes concentrate near n (Poisson(1) per row)
    n = len(orders)
    for n_eff, _ in got.values():
        assert 0.7 * n < n_eff < 1.3 * n


def test_diff_in_diff_matches_python_model(spark, sf_dir):
    import datetime as dt

    cutoff = dt.datetime.fromisoformat(DID_CUTOFF)
    cells = {(t, p): [0, 0] for t in (True, False) for p in (True, False)}
    for r in load_table(spark, sf_dir, "orders").collect():
        treat = _hash_u(f"did-{r['o_custkey']}", 8) % 2 == 0
        post = r["o_orderdate"] >= cutoff
        cells[(treat, post)][0] += 1
        cells[(treat, post)][1] += _cents(r["o_totalprice"])
    mean = {k: v[1] // v[0] for k, v in cells.items()}
    row = QUERIES["q_diff_in_diff"](spark, sf_dir).collect()[0]
    assert row["treat_pre_avg_cents"] == mean[(True, False)]
    assert row["treat_post_avg_cents"] == mean[(True, True)]
    assert row["control_pre_avg_cents"] == mean[(False, False)]
    assert row["control_post_avg_cents"] == mean[(False, True)]
    assert row["did_cents"] == (mean[(True, True)] - mean[(True, False)]) - (
        mean[(False, True)] - mean[(False, False)]
    )
    assert row["n_orders"] == sum(v[0] for v in cells.values())
