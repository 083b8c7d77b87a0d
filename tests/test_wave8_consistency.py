"""Independent-model checks for the round-3 eighth-wave ops (kNN confusion
matrix, time-constrained funnel, order-gap histogram, chunk-level dedup):
plain-Python recomputation over the collected sf0.001 tables, exact match
required."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.dedup import CHUNK_DUP_MIN_DOCS
from finegourmet_spark.operators.eventflow import FUNNEL_WINDOW_US
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.textops import CHUNK_TOKENS
from finegourmet_spark.sources.testdata import load_table


def test_knn_confusion_matches_classifier_rollup(spark, sf_dir):
    preds = QUERIES["q_knn_classify"](spark, sf_dir).collect()
    cells = Counter((r["true_label"], r["pred_label"]) for r in preds)
    rows = Counter()
    cols = Counter()
    for (t_, p), n in cells.items():
        rows[t_] += n
        cols[p] += n
    expected = {
        (t_, p): (n, (1_000_000 * n) // rows[t_], (1_000_000 * n) // cols[p])
        for (t_, p), n in cells.items()
    }
    got = {
        (r["true_label"], r["pred_label"]): (
            r["n"],
            r["recall_ppm"],
            r["precision_ppm"],
        )
        for r in QUERIES["q_knn_confusion"](spark, sf_dir).collect()
    }
    assert got == expected
    # marginals: recall cells per true label sum close to 1e6 (floor slack)
    assert sum(n for n, _, _ in expected.values()) == len(preds)


def test_funnel_windowed_matches_python_model(spark, sf_dir):
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    per_user = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        if r["event_type"] in ("view", "click", "purchase"):
            us = int((r["ts"] - epoch) / dt.timedelta(microseconds=1))
            per_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    n1 = n2 = n3 = 0
    for evs in per_user.values():
        evs.sort()
        v = c = p = None
        for us, _, et in evs:
            if et == "view" and v is None:
                v = us
            deadline_ok = v is not None and us <= v + FUNNEL_WINDOW_US
            if et == "click" and c is None and deadline_ok:
                c = us
            if et == "purchase" and p is None and c is not None and deadline_ok:
                p = us
        n1 += v is not None
        n2 += c is not None
        n3 += p is not None
    rows = {r["stage"]: r for r in QUERIES["q_funnel_windowed"](spark, sf_dir).collect()}
    assert (rows[1]["n_users"], rows[2]["n_users"], rows[3]["n_users"]) == (
        n1,
        n2,
        n3,
    )
    assert rows[1]["conv_ppm"] == 1_000_000
    assert rows[2]["conv_ppm"] == (1_000_000 * n2) // n1
    assert rows[3]["conv_ppm"] == (1_000_000 * n3) // n1
    # the deadline can only shrink stages 2-3 vs the unconstrained funnel
    free = {r["stage"]: r["n_users"] for r in QUERIES["q_funnel"](spark, sf_dir).collect()}
    assert n1 == free[1] and n2 <= free[2] and n3 <= free[3]


def test_order_gaps_match_python_model(spark, sf_dir):
    per_cust = defaultdict(list)
    for r in load_table(spark, sf_dir, "orders").collect():
        per_cust[r["o_custkey"]].append((r["o_orderdate"].date(), r["o_orderkey"]))
    hist = Counter()
    for lst in per_cust.values():
        lst.sort()
        for (d1, _), (d2, _) in zip(lst, lst[1:]):
            hist[(d2 - d1).days] += 1
    rows = QUERIES["q_order_gaps"](spark, sf_dir).collect()
    assert {r["gap_days"]: r["n_gaps"] for r in rows} == dict(hist)


def test_dedup_chunks_match_python_model(spark, sf_dir):
    by_hash = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").collect():
        tk = r["text"].split(" ")
        for i in range(math.ceil(len(tk) / CHUNK_TOKENS)):
            chunk = " ".join(tk[i * CHUNK_TOKENS : (i + 1) * CHUNK_TOKENS])
            h = hashlib.md5(chunk.encode()).hexdigest()
            by_hash[h].append(r["doc_id"])
    expected = {
        h: (len(set(ids)), len(ids), min(ids))
        for h, ids in by_hash.items()
        if len(set(ids)) >= CHUNK_DUP_MIN_DOCS
    }
    rows = QUERIES["q_dedup_chunks"](spark, sf_dir).collect()
    got = {
        r["chunk_hash"]: (r["n_docs"], r["n_occurrences"], r["first_doc"])
        for r in rows
    }
    assert got == expected
