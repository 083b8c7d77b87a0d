"""Independent-model check for the round-3 twenty-first-wave op (BOM
hierarchical subtree rollup): plain-Python tree recursion over the
collected sf0.001 parts, exact match required — the recursion is the
semantic ground truth the path-enumeration trick must reproduce."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.graph import (
    BOM_FANOUT,
    BOM_TOPN,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_bom_rollup_matches_recursive_model(spark, sf_dir):
    own = {}
    for r in load_table(spark, sf_dir, "part").collect():
        if r["p_partkey"] >= 1:  # key 0 is outside the tree domain
            own[r["p_partkey"]] = _cents(r["p_retailprice"])
    children = defaultdict(list)
    for pk in own:
        parent = pk // BOM_FANOUT
        if parent >= 1:
            children[parent].append(pk)

    from functools import lru_cache
    import sys

    sys.setrecursionlimit(100000)

    def subtree(n):  # (size, cents) by genuine recursion
        size, cents = 1, own[n]
        for ch in children.get(n, []):
            s, c = subtree(ch)
            size += s
            cents += c
        return size, cents

    scored = [(n, *subtree(n)) for n in own]
    expected = sorted(scored, key=lambda x: (-x[2], x[0]))[:BOM_TOPN]
    got = [
        (r["node"], r["subtree_size"], r["subtree_cents"])
        for r in QUERIES["q_bom_rollup"](spark, sf_dir).collect()
    ]
    assert got == expected
    # the tree is non-trivial: some top node aggregates many descendants
    assert max(s for _, s, _ in got) > 1
