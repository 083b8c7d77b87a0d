"""Independent-model checks for the round-3 sixteenth-wave ops (XML
roundtrip, collation distinct, regex event-pattern matching):
plain-Python recomputation over the collected sf0.001 tables, exact
match required."""

from __future__ import annotations

import re
from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.eventflow import (
    CEP_FUNNEL_RE,
    CEP_INITIALS,
    CEP_RUN_RE,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_xml_roundtrip_matches_direct_aggregation(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_dir, "orders").collect():
        e = agg[r["o_orderpriority"]]
        e[0] += 1
        e[1] += _cents(r["o_totalprice"])
        e[2] = max(e[2], r["o_orderkey"])
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["sum_cents"], r["max_key"])
        for r in QUERIES["q_xml_funcs"](spark, sf_dir).collect()
    }
    assert got == expected


def test_collation_compare_matches_python_model(spark, sf_dir):
    per = defaultdict(list)
    for r in load_table(spark, sf_dir, "customer").collect():
        s2 = (
            r["c_mktsegment"].upper()
            if r["c_custkey"] % 2 == 0
            else r["c_mktsegment"].lower()
        )
        per[r["c_nationkey"]].append(s2)
    expected = {
        nk: (len(v), len(set(v)), len({s.lower() for s in v}))
        for nk, v in per.items()
    }
    got = {
        r["c_nationkey"]: (r["n"], r["distinct_binary"], r["distinct_ci"])
        for r in QUERIES["q_collation_compare"](spark, sf_dir).collect()
    }
    assert got == expected
    # the collation genuinely collapses case pairs somewhere
    assert any(b > c for _, b, c in got.values())


def test_event_pattern_match_matches_python_model(spark, sf_dir):
    evs = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        evs[r["user_id"]].append(
            (r["ts"], r["event_id"], CEP_INITIALS.get(r["event_type"], "e"))
        )
    seqs = ["".join(i for _, _, i in sorted(v)) for v in evs.values()]
    expected = (
        len(seqs),
        sum(1 for s in seqs if re.search(CEP_FUNNEL_RE, s)),
        sum(len(re.findall(CEP_RUN_RE, s)) for s in seqs),
        max(len(s) for s in seqs),
    )
    row = QUERIES["q_event_pattern_match"](spark, sf_dir).collect()[0]
    got = (
        row["n_users"],
        row["n_funnel_users"],
        row["total_tight_runs"],
        row["max_seq_len"],
    )
    assert got == expected
