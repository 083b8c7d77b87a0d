"""Independent-model checks for the round-3 fifteenth-wave ops (try_*
arithmetic, bitwise aggregates, lambda HOFs, mask redaction, JSON
quarantine): plain-Python recomputation over the collected sf0.001
tables, exact match required."""

from __future__ import annotations

import json
import math
import re
from collections import defaultdict
from decimal import Decimal
from functools import reduce

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.quality import JSONQ_CORRUPT_MOD
from finegourmet_spark.operators.relational import LAMBDA_MIN_LEN
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_try_arithmetic_matches_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, sf_dir, "lineitem").collect():
        e = agg[r["l_returnflag"]]
        cents, qty = _cents(r["l_extendedprice"]), int(r["l_quantity"])
        e[0] += 1
        if qty == 10:
            e[1] += 1
        else:
            e[2] += math.floor(cents / (qty - 10))
        # l_returnflag is a letter: never castable
    expected = {k: (v[0], v[1], v[2], v[3]) for k, v in agg.items()}
    got = {
        r["l_returnflag"]: (
            r["n"],
            r["n_div_null"],
            r["sum_floor_ratio"],
            r["n_castable"],
        )
        for r in QUERIES["q_try_arithmetic"](spark, sf_dir).collect()
    }
    assert got == expected


def test_bitwise_agg_matches_python_model(spark, sf_dir):
    qtys = defaultdict(list)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        qtys[r["l_returnflag"]].append(int(r["l_quantity"]))
    expected = {
        f: (
            reduce(lambda a, b: a & b, v),
            reduce(lambda a, b: a | b, v),
            reduce(lambda a, b: a ^ b, v),
            sum(1 << (q % 8) for q in v),
        )
        for f, v in qtys.items()
    }
    got = {
        r["l_returnflag"]: (r["and_qty"], r["or_qty"], r["xor_qty"], r["sum_flags"])
        for r in QUERIES["q_bitwise_agg"](spark, sf_dir).collect()
    }
    assert got == expected


def test_lambda_funcs_match_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_dir, "documents").collect():
        toks = [w for w in r["text"].split(" ") if w]
        e = agg[r["lang"]]
        e[0] += sum(1 for w in toks if len(w) >= LAMBDA_MIN_LEN)
        e[1] += sum(len(w) for w in toks)
        e[2] += 1 if any(len(w) >= 10 for w in toks) else 0
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        r["lang"]: (r["long_tokens"], r["total_chars"], r["docs_with_10plus"])
        for r in QUERIES["q_lambda_funcs"](spark, sf_dir).collect()
    }
    assert got == expected


def test_mask_pii_matches_python_model(spark, sf_dir):
    def mask(s: str) -> str:
        s = re.sub(r"[A-Z]", "X", s)
        s = re.sub(r"[a-z]", "x", s)
        return re.sub(r"[0-9]", "n", s)

    per = defaultdict(list)
    for r in load_table(spark, sf_dir, "customer").collect():
        per[r["c_mktsegment"]].append(mask(r["c_name"]))
    expected = {
        seg: (len(v), len(set(v)), min(v)) for seg, v in per.items()
    }
    got = {
        r["c_mktsegment"]: (
            r["n_customers"],
            r["distinct_patterns"],
            r["sample_pattern"],
        )
        for r in QUERIES["q_mask_pii"](spark, sf_dir).collect()
    }
    assert got == expected


def test_json_quarantine_matches_python_model(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_dir, "events").collect():
        s = r["props"]
        if r["event_id"] % JSONQ_CORRUPT_MOD == 0:
            s = s[:-1]
        e = agg[r["event_type"]]
        e[0] += 1
        try:
            e[2] += json.loads(s)["k"]
        except json.JSONDecodeError:
            e[1] += 1
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        r["event_type"]: (r["n_total"], r["n_quarantined"], r["sum_k_clean"])
        for r in QUERIES["q_json_quarantine"](spark, sf_dir).collect()
    }
    assert got == expected
    # every corrupted row really lands in quarantine (truncation is fatal)
    assert sum(v[1] for v in got.values()) == sum(
        1
        for r in load_table(spark, sf_dir, "events").collect()
        if r["event_id"] % JSONQ_CORRUPT_MOD == 0
    )
