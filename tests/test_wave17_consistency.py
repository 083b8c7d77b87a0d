"""Independent-model checks for the round-3 seventeenth-wave ops (table
checksum, keyspace density audit, Wilson-bound ranking): plain-Python
recomputation over the collected sf0.001 tables, exact match required."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import Decimal
from functools import reduce

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.quality import (
    CHECKSUM_HEX_CHARS,
    KEYGAP_BUCKET,
    KEYGAP_TOPN,
    WILSON_MIN_N,
    WILSON_TOPN,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_table_checksum_matches_python_model(spark, sf_dir):
    per = defaultdict(list)
    for r in load_table(spark, sf_dir, "orders").collect():
        s = "|".join(
            [
                str(r["o_orderkey"]),
                str(r["o_custkey"]),
                r["o_orderstatus"],
                str(_cents(r["o_totalprice"])),
                r["o_orderdate"].date().isoformat(),
                r["o_orderpriority"],
            ]
        )
        digest = int(
            hashlib.md5(s.encode()).hexdigest()[:CHECKSUM_HEX_CHARS], 16
        )
        per[r["o_orderdate"].date().replace(day=1)].append(digest)
    expected = {
        m: (len(v), reduce(lambda a, b: a ^ b, v)) for m, v in per.items()
    }
    got = {
        r["month_start"]: (r["n_rows"], r["checksum"])
        for r in QUERIES["q_table_checksum"](spark, sf_dir).collect()
    }
    assert got == expected


def test_table_checksum_detects_single_row_change(spark, sf_dir):
    """The audit property: flipping ONE row's cents flips exactly that
    month's checksum (recomputed in the python model)."""
    rows = load_table(spark, sf_dir, "orders").collect()
    base = defaultdict(int)
    for r in rows:
        s = "|".join(
            [
                str(r["o_orderkey"]),
                str(r["o_custkey"]),
                r["o_orderstatus"],
                str(_cents(r["o_totalprice"])),
                r["o_orderdate"].date().isoformat(),
                r["o_orderpriority"],
            ]
        )
        base[r["o_orderdate"].date().replace(day=1)] ^= int(
            hashlib.md5(s.encode()).hexdigest()[:CHECKSUM_HEX_CHARS], 16
        )
    victim = rows[0]
    s2 = "|".join(
        [
            str(victim["o_orderkey"]),
            str(victim["o_custkey"]),
            victim["o_orderstatus"],
            str(_cents(victim["o_totalprice"]) + 1),  # one-cent corruption
            victim["o_orderdate"].date().isoformat(),
            victim["o_orderpriority"],
        ]
    )
    m = victim["o_orderdate"].date().replace(day=1)
    s1 = "|".join(
        [
            str(victim["o_orderkey"]),
            str(victim["o_custkey"]),
            victim["o_orderstatus"],
            str(_cents(victim["o_totalprice"])),
            victim["o_orderdate"].date().isoformat(),
            victim["o_orderpriority"],
        ]
    )
    changed = (
        base[m]
        ^ int(hashlib.md5(s1.encode()).hexdigest()[:CHECKSUM_HEX_CHARS], 16)
        ^ int(hashlib.md5(s2.encode()).hexdigest()[:CHECKSUM_HEX_CHARS], 16)
    )
    assert changed != base[m]


def test_keyspace_gaps_match_python_model(spark, sf_dir):
    keys = {r["o_orderkey"] for r in load_table(spark, sf_dir, "orders").collect()}
    buckets = defaultdict(list)
    for k in keys:
        buckets[k // KEYGAP_BUCKET].append(k)
    scored = [
        (b, len(v), min(v), max(v), max(v) - min(v) + 1 - len(v))
        for b, v in buckets.items()
    ]
    expected = sorted(scored, key=lambda x: (-x[4], x[0]))[:KEYGAP_TOPN]
    got = [
        (r["bucket"], r["n_present"], r["lo"], r["hi"], r["n_missing"])
        for r in QUERIES["q_keyspace_gaps"](spark, sf_dir).collect()
    ]
    assert got == expected


def test_rank_wilson_matches_python_model(spark, sf_dir):
    stats = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "lineitem").collect():
        e = stats[r["l_partkey"]]
        e[0] += 1
        if r["l_returnflag"] == "R":
            e[1] += 1
    scored = []
    for pk, (n, r_) in stats.items():
        if n < WILSON_MIN_N:
            continue
        p = r_ / n
        lb = (p + 1.9208 / n - 1.96 * math.sqrt((p * (1.0 - p) + 0.9604 / n) / n)) / (
            1.0 + 3.8416 / n
        )
        scored.append((pk, n, r_, lb))
    expected = sorted(scored, key=lambda x: (-x[3], x[0]))[:WILSON_TOPN]
    got = [
        (r["l_partkey"], r["n"], r["r"], r["lb"])
        for r in QUERIES["q_rank_wilson"](spark, sf_dir).collect()
    ]
    # ranking must agree exactly; bounds to double equality
    assert [(a, b, c) for a, b, c, _ in got] == [
        (a, b, c) for a, b, c, _ in expected
    ]
    for (_, _, _, g), (_, _, _, e) in zip(got, expected):
        assert g == e
