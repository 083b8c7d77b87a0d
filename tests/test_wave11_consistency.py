"""Independent-model checks for the round-3 eleventh-wave ops (incremental
aggregate maintenance, weighted median, RRF fusion, seasonal forecast,
vocabulary OOV rate): plain-Python recomputation over the collected
sf0.001 tables, exact match required."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.eventflow import FC_EPOCH_MONDAY, FC_HORIZON
from finegourmet_spark.operators.relational import RRF_K, RRF_SCALE, RRF_TOPN
from finegourmet_spark.operators.textops import VOCAB_K
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_incremental_agg_matches_full_recompute(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "lineitem").collect():
        key = (r["l_shipdate"].date().replace(day=1), r["l_returnflag"])
        agg[key][0] += 1
        agg[key][1] += _cents(r["l_extendedprice"])
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r["month_start"], r["l_returnflag"]): (r["n_rows"], r["rev_cents"])
        for r in QUERIES["q_incremental_agg_maintenance"](spark, sf_dir).collect()
    }
    assert got == expected


def test_weighted_median_matches_python_model(spark, sf_dir):
    by_flag = defaultdict(list)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        by_flag[r["l_returnflag"]].append(
            (_cents(r["l_extendedprice"]), int(r["l_quantity"]))
        )
    expected = {}
    for f, vws in by_flag.items():
        tot = sum(w for _, w in vws)
        cum = 0
        for v, w in sorted(
            ((v, sum(w for vv, w in vws if vv == v)) for v in {v for v, _ in vws})
        ):
            cum += w
            if 2 * cum >= tot:
                expected[f] = (v, tot)
                break
    got = {
        r["l_returnflag"]: (r["w_median_cents"], r["total_weight"])
        for r in QUERIES["q_weighted_median"](spark, sf_dir).collect()
    }
    assert got == expected


def test_rrf_fusion_matches_python_model(spark, sf_dir):
    rev = defaultdict(int)
    orders = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        rev[r["l_partkey"]] += _cents(r["l_extendedprice"])
        orders[r["l_partkey"]].add(r["l_orderkey"])
    ra = {
        pk: i + 1
        for i, pk in enumerate(sorted(rev, key=lambda p: (-rev[p], p)))
    }
    rb = {
        pk: i + 1
        for i, pk in enumerate(sorted(rev, key=lambda p: (-len(orders[p]), p)))
    }
    score = {
        pk: RRF_SCALE // (RRF_K + ra[pk]) + RRF_SCALE // (RRF_K + rb[pk])
        for pk in rev
    }
    top = sorted(score, key=lambda p: (-score[p], p))[:RRF_TOPN]
    expected = [(pk, ra[pk], rb[pk], score[pk]) for pk in top]
    got = [
        (r["l_partkey"], r["rank_revenue"], r["rank_orders"], r["rrf_score_nano"])
        for r in QUERIES["q_rrf_fusion"](spark, sf_dir).collect()
    ]
    assert got == expected


def test_seasonal_forecast_matches_python_model(spark, sf_dir):
    monday = dt.date.fromisoformat(FC_EPOCH_MONDAY)
    daily = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").collect():
        daily[(r["event_type"], r["ts"].date())] += _cents(r["value"])
    wk_sum, wk_n, dmax = defaultdict(int), defaultdict(int), {}
    for (et, d), cents in daily.items():
        wd = (d - monday).days % 7
        wk_sum[(et, wd)] += cents
        wk_n[(et, wd)] += 1
        dmax[et] = max(dmax.get(et, d), d)
    expected = {}
    for et, dm in dmax.items():
        for i in range(1, FC_HORIZON + 1):
            fd = dm + dt.timedelta(days=i)
            wd = (fd - monday).days % 7
            if (et, wd) in wk_sum:
                expected[(et, fd)] = wk_sum[(et, wd)] // wk_n[(et, wd)]
    got = {
        (r["event_type"], r["forecast_day"]): r["forecast_cents"]
        for r in QUERIES["q_seasonal_forecast"](spark, sf_dir).collect()
    }
    assert got == expected


def test_vocab_oov_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    tf = Counter()
    for r in docs:
        tf.update(w for w in r["text"].split(" ") if w)
    vocab = {
        w for w, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    }
    per_lang = defaultdict(list)
    for r in docs:
        toks = [w for w in r["text"].split(" ") if w]
        oov = sum(1 for w in toks if w not in vocab)
        per_lang[r["lang"]].append((oov, len(toks)))
    expected = {
        lang: (
            len(v),
            sum((1_000_000 * o) // n for o, n in v) // len(v),
            sum(o for o, _ in v),
            sum(n for _, n in v),
        )
        for lang, v in per_lang.items()
    }
    got = {
        r["lang"]: (
            r["n_docs"],
            r["avg_oov_ppm"],
            r["total_oov"],
            r["total_tokens"],
        )
        for r in QUERIES["q_vocab_oov_rate"](spark, sf_dir).collect()
    }
    assert got == expected
