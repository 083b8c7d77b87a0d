"""Independent-model checks for the round-3 fourteenth-wave ops
(share-of-parent, top-N+Other, linear multi-touch attribution):
plain-Python recomputation over the collected sf0.001 tables, exact
match required."""

from __future__ import annotations

import json
from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.eventflow import (
    LINATTR_WINDOW_US,
    N_CHANNELS,
)
from finegourmet_spark.operators.relational import TOPN_OTHERS_N
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_share_of_parent_matches_python_model(spark, sf_dir):
    nk_to_names = {}
    regions = {
        r["r_regionkey"]: r["r_name"]
        for r in load_table(spark, sf_dir, "region").collect()
    }
    for r in load_table(spark, sf_dir, "nation").collect():
        nk_to_names[r["n_nationkey"]] = (regions[r["n_regionkey"]], r["n_name"])
    cust_nk = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    rev = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").collect():
        rev[nk_to_names[cust_nk[r["o_custkey"]]]] += _cents(r["o_totalprice"])
    region_tot = defaultdict(int)
    for (rn, _), c in rev.items():
        region_tot[rn] += c
    total = sum(rev.values())
    expected = {
        (rn, nn): (
            c,
            (1_000_000 * c) // region_tot[rn],
            (1_000_000 * region_tot[rn]) // total,
        )
        for (rn, nn), c in rev.items()
    }
    got = {
        (r["r_name"], r["n_name"]): (
            r["rev_cents"],
            r["nation_share_ppm"],
            r["region_share_ppm"],
        )
        for r in QUERIES["q_share_of_parent"](spark, sf_dir).collect()
    }
    assert got == expected


def test_topn_others_matches_python_model(spark, sf_dir):
    rev = defaultdict(int)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        rev[r["l_partkey"]] += _cents(r["l_extendedprice"])
    head = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPN_OTHERS_N]
    expected = {
        i + 1: (str(pk), c) for i, (pk, c) in enumerate(head)
    }
    expected[TOPN_OTHERS_N + 1] = (
        "OTHER",
        sum(rev.values()) - sum(c for _, c in head),
    )
    got = {
        r["rank"]: (r["label"], r["rev_cents"])
        for r in QUERIES["q_topn_others"](spark, sf_dir).collect()
    }
    assert got == expected
    # the rollup is lossless: head + OTHER == grand total
    assert sum(v[1] for v in got.values()) == sum(rev.values())


def test_attribution_linear_matches_python_model(spark, sf_dir):
    purchases, clicks = [], defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        us = int(r["ts"].timestamp() * 1_000_000)
        if r["event_type"] == "purchase":
            purchases.append((r["user_id"], us, _cents(r["value"])))
        elif r["event_type"] == "click":
            ch = json.loads(r["props"])["k"] % N_CHANNELS
            clicks[r["user_id"]].append((us, r["event_id"], ch))
    credit = defaultdict(lambda: [0, 0])
    for u, pus, cents in purchases:
        prior = sorted(
            (c for c in clicks[u] if pus - LINATTR_WINDOW_US <= c[0] < pus)
        )
        if not prior:
            credit["direct"][0] += cents
            credit["direct"][1] += 1
            continue
        n = len(prior)
        base, rem = divmod(cents, n)
        for i, (_, _, ch) in enumerate(prior):
            credit[str(ch)][0] += base + (1 if i < rem else 0)
            credit[str(ch)][1] += 1
    expected = {k: tuple(v) for k, v in credit.items()}
    got = {
        r["channel"]: (r["credited_cents"], r["n_credits"])
        for r in QUERIES["q_attribution_linear"](spark, sf_dir).collect()
    }
    assert got == expected
    # conservation: total credited == total purchase cents
    assert sum(v[0] for v in got.values()) == sum(c for _, _, c in purchases)
