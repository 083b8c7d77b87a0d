"""Independent-model checks for the round-3 eighteenth-wave ops
(sorted-neighborhood dedup, retraction-aware view maintenance):
plain-Python recomputation over the collected sf0.001 tables, exact
match required."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.dedup import (
    NEAR_DUP_THETA,
    SNM_KEY_CHARS,
    SNM_WINDOW,
)
from finegourmet_spark.operators.relational import IVM_RETRACT_MOD
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def _shingles(text: str) -> set:
    toks = text.strip().lower().split(" ")
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    } if len(toks) >= 3 else set()


def test_sorted_neighborhood_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    keyed = sorted(
        (r["text"].strip().lower()[:SNM_KEY_CHARS], r["doc_id"]) for r in docs
    )
    text_of = {r["doc_id"]: r["text"] for r in docs}
    expected = {}
    for i, (_, a) in enumerate(keyed):
        for j in range(i + 1, min(i + 1 + SNM_WINDOW, len(keyed))):
            b = keyed[j][1]
            sa, sb = _shingles(text_of[a]), _shingles(text_of[b])
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= NEAR_DUP_THETA:
                expected[(a, b)] = jac
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["q_dedup_sorted_neighborhood"](spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "the 10-copy duplicate clusters must produce SNM pairs"


def test_retraction_matches_full_recompute(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "lineitem").collect():
        if r["l_orderkey"] % IVM_RETRACT_MOD == 3:
            continue
        key = (r["l_shipdate"].date().replace(day=1), r["l_returnflag"])
        agg[key][0] += 1
        agg[key][1] += _cents(r["l_extendedprice"])
    expected = {k: tuple(v) for k, v in agg.items() if v[0] > 0}
    got = {
        (r["month_start"], r["l_returnflag"]): (r["n_rows"], r["rev_cents"])
        for r in QUERIES["q_incremental_agg_retraction"](spark, sf_dir).collect()
    }
    assert got == expected
