"""Independent plain-Python models for the round-4 wave 26 operators
(SQL-semantics corners): null-safe join, explode_outer preservation,
GROUP BY ALL, calendar-spine zero-fill."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.temporal import SPINE_CUST_MOD
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_join_null_safe_matches_python_model(spark, sf_dir):
    okeys = Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        k = r["o_custkey"] % 25
        okeys[None if k == 0 else k] += 1
    dims = defaultdict(set)
    for r in load_table(spark, sf_dir, "nation").collect():
        k = None if r["n_nationkey"] == 0 else r["n_nationkey"]
        dims[k].add(r["n_name"])
    expected = {
        k: (okeys[k] * len(dims[k]), len(dims[k]))
        for k in okeys
        if k in dims
    }
    got = {
        r["k"]: (r["n_pairs"], r["n_dims"])
        for r in QUERIES["q_join_null_safe"](spark, sf_dir).collect()
    }
    assert got == expected
    assert None in got, "NULL <=> NULL must match (null-safe semantics)"


def test_explode_outer_preserves_empty_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["q_explode_outer"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs), "every parent doc must survive"
    for d in docs:
        n_long = sum(1 for w in d["text"].split(" ") if len(w) >= 8)
        r = rows[d["doc_id"]]
        assert r["n_long_words"] == n_long
        assert r["n_rows"] == max(n_long, 1)
        assert r["kept_as_null"] == (n_long == 0)


def test_group_by_all_matches_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "orders").collect():
        key = (r["o_orderdate"].date().replace(day=1), r["o_orderpriority"])
        agg[key][0] += 1
        agg[key][1] += _cents(r["o_totalprice"])
    got = {
        (r["month_start"], r["o_orderpriority"]): (r["n_orders"], r["rev_cents"])
        for r in QUERIES["q_group_by_all"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_date_spine_fill_is_continuous_and_zero_filled(spark, sf_dir):
    weekly = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "orders").collect():
        if r["o_custkey"] % SPINE_CUST_MOD != 0:
            continue
        d = r["o_orderdate"].date()
        wk = d - dt.timedelta(days=d.weekday())  # Monday truncation
        weekly[wk][0] += 1
        weekly[wk][1] += _cents(r["o_totalprice"])
    rows = sorted(
        QUERIES["q_date_spine_fill"](spark, sf_dir).collect(),
        key=lambda r: r["week_start"],
    )
    lo, hi = min(weekly), max(weekly)
    # continuity: exactly one row per week between bounds, 7 days apart
    assert rows[0]["week_start"] == lo and rows[-1]["week_start"] == hi
    assert len(rows) == (hi - lo).days // 7 + 1
    for prev, cur in zip(rows, rows[1:]):
        assert (cur["week_start"] - prev["week_start"]).days == 7
    for r in rows:
        exp = weekly.get(r["week_start"], [0, 0])
        assert (r["n_orders"], r["rev_cents"]) == tuple(exp)
        assert r["gap_filled"] == (r["week_start"] not in weekly)
    assert any(r["gap_filled"] for r in rows), "sparse series must have gaps"
