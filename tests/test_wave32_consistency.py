"""Independent plain-Python models for the round-4 wave 32 operators:
set-completion funnel and the embedding-table quality audit."""

from __future__ import annotations

import math
from collections import defaultdict

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.similarity import DIM
from finegourmet_spark.sources.testdata import load_table


def test_funnel_unordered_matches_python_model(spark, sf_dir):
    flags = defaultdict(set)
    for r in load_table(spark, sf_dir, "events").collect():
        flags[r["user_id"]].add(r["event_type"])
    row = QUERIES["q_funnel_unordered"](spark, sf_dir).collect()[0]
    assert row["n_users"] == len(flags)
    assert row["n_view"] == sum(1 for s in flags.values() if "view" in s)
    assert row["n_view_click"] == sum(
        1 for s in flags.values() if {"view", "click"} <= s
    )
    assert row["n_all_three"] == sum(
        1 for s in flags.values() if {"view", "click", "purchase"} <= s
    )
    assert row["n_purchase_no_view"] == sum(
        1 for s in flags.values() if "purchase" in s and "view" not in s
    )
    # the unordered count dominates the ordered funnel's completion count
    ordered = QUERIES["q_funnel"](spark, sf_dir)
    n_ordered_complete = min(
        (r for r in ordered.collect()), key=lambda r: r["n_users"]
    )["n_users"]
    assert row["n_all_three"] >= n_ordered_complete


def test_embedding_quality_audit_matches_python_model(spark, sf_dir):
    groups = defaultdict(list)
    for r in load_table(spark, sf_dir, "embeddings").collect():
        emb = r["embedding"]
        norm2 = 0.0
        for x in emb:  # sequential fold, same order as the engine
            norm2 += float(x) * float(x)
        groups[r["label"]].append((len(emb), norm2))
    rows = {
        r["label"]: r
        for r in QUERIES["q_embedding_quality_audit"](spark, sf_dir).collect()
    }
    assert set(rows) == set(groups)
    for lbl, vs in groups.items():
        r = rows[lbl]
        assert r["n_vecs"] == len(vs)
        assert r["n_dim_anomalies"] == sum(1 for d, _ in vs if d != DIM)
        assert r["n_zero_vecs"] == sum(1 for _, n2 in vs if n2 == 0)
        ppms = [math.floor(n2 * 1_000_000) for _, n2 in vs]
        assert r["sum_norm2_ppm"] == sum(ppms)
        assert r["min_norm2_ppm"] == min(ppms)
