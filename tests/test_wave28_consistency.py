"""Independent plain-Python models for the round-4 wave 28 operators:
winsorized robust metrics and synchronous label propagation."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.graph import LPA_ROUNDS
from finegourmet_spark.operators.quality import WINSOR_HI_PCT, WINSOR_LO_PCT
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_winsorize_matches_python_model(spark, sf_dir):
    groups = defaultdict(list)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        groups[r["l_returnflag"]].append(_cents(r["l_extendedprice"]))
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["q_winsorize"](spark, sf_dir).collect()
    }
    assert set(rows) == set(groups)
    for g, xs in groups.items():
        xs.sort()
        n = len(xs)
        p_lo = xs[-(-n * WINSOR_LO_PCT // 100) - 1]  # nearest-rank, 1-based
        p_hi = xs[-(-n * WINSOR_HI_PCT // 100) - 1]
        r = rows[g]
        assert (r["n_rows"], r["p_lo_cents"], r["p_hi_cents"]) == (n, p_lo, p_hi)
        assert r["n_clipped_low"] == sum(1 for x in xs if x < p_lo)
        assert r["n_clipped_high"] == sum(1 for x in xs if x > p_hi)
        assert r["raw_sum_cents"] == sum(xs)
        assert r["winsorized_sum_cents"] == sum(
            min(max(x, p_lo), p_hi) for x in xs
        )
        # robustness invariant: clipping can only pull the sum inward
        assert r["n_clipped_low"] + r["n_clipped_high"] < n


def test_label_propagation_matches_python_model(spark, sf_dir):
    co = defaultdict(set)
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        co[r["l_orderkey"]].add(r["l_partkey"])
    edges = defaultdict(set)
    for parts in co.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges[a].add(b)
    labels = {v: v for v in edges}
    for _ in range(LPA_ROUNDS):
        new = {}
        for v, nbrs in edges.items():
            cnt = Counter(labels[u] for u in nbrs)
            best = max(cnt.values())
            new[v] = min(lbl for lbl, c in cnt.items() if c == best)
        labels = new
    sizes = Counter(labels.values())
    got = {
        r["node"]: (r["community"], r["community_size"])
        for r in QUERIES["q_graph_label_propagation"](spark, sf_dir).collect()
    }
    assert got == {v: (lbl, sizes[lbl]) for v, lbl in labels.items()}
    # communities genuinely merge: fewer labels than nodes
    assert len(sizes) < len(labels)
