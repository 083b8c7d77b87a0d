"""Independent-model checks for the round-3 sixth-wave ops (BM25,
weighted systematic sampling, association rules, cohort LTV, funnel
latency, ABC classification): each Spark result is recomputed in plain
Python over the collected sf0.001 tables and must match EXACTLY."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.graph import RULE_MIN_SUPPORT
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.relational import (
    ABC_A_DEN,
    ABC_A_NUM,
    ABC_B_DEN,
    ABC_B_NUM,
)
from finegourmet_spark.operators.textops import (
    BM25_QUERY,
    BM25_TOP,
    SAMPLE_STRIDES,
)
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_bm25_matches_python_model(spark, sf_dir):
    docs = {
        r["doc_id"]: [w for w in r["text"].strip().lower().split(" ") if w]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n = len(docs)
    dl = {d: len(ws) for d, ws in docs.items()}
    big_l = sum(dl.values())
    tf = defaultdict(Counter)
    for d, ws in docs.items():
        for w in ws:
            if w in BM25_QUERY:
                tf[d][w] += 1
    df = Counter()
    for d in tf:
        for w in tf[d]:
            df[w] += 1
    scores = {}
    for d, terms in tf.items():
        s = 0
        for w, f in terms.items():
            idf = math.floor(
                1_000_000.0 * math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            )
            s += (idf * 44 * big_l * f) // (
                20 * big_l * f + 6 * big_l + 18 * dl[d] * n
            )
        scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOP]
    expected = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    rows = QUERIES["q_bm25_topk"](spark, sf_dir).collect()
    got = [
        (r["rank"], r["doc_id"], r["score_micro"])
        for r in sorted(rows, key=lambda r: r["rank"])
    ]
    assert got == expected


def test_sample_weighted_matches_python_model(spark, sf_dir):
    docs = sorted(
        (r["doc_id"], r["n_chars"])
        for r in load_table(spark, sf_dir, "documents").collect()
    )
    total = sum(w for _, w in docs)
    stride = max(total // SAMPLE_STRIDES, 1)
    expected, cum = {}, 0
    for d, w in docs:
        before = cum
        cum += w
        if before // stride < cum // stride:
            expected[d] = (w, before // stride)
    rows = QUERIES["q_sample_weighted"](spark, sf_dir).collect()
    got = {r["doc_id"]: (r["n_chars"], r["bucket"]) for r in rows}
    assert got == expected
    # weight-proportionality: picks land within every stride of the line,
    # so the count is SAMPLE_STRIDES ± rounding at the tail
    assert abs(len(got) - SAMPLE_STRIDES) <= 1 + total % SAMPLE_STRIDES // max(
        stride, 1
    )


def test_assoc_rules_match_python_model(spark, sf_dir):
    baskets = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n_orders = len(baskets)
    item = Counter()
    pair = Counter()
    for parts in baskets.values():
        for a in parts:
            item[a] += 1
            for b in parts:
                if a != b:
                    pair[(a, b)] += 1
    expected = {}
    for (a, b), nab in pair.items():
        if nab >= RULE_MIN_SUPPORT:
            expected[(a, b)] = (
                nab,
                (1_000_000 * nab) // n_orders,
                (1_000_000 * nab) // item[a],
                (1_000_000 * nab * n_orders) // (item[a] * item[b]),
            )
    rows = QUERIES["q_assoc_rules"](spark, sf_dir).collect()
    got = {
        (r["ante"], r["cons"]): (
            r["n_ab"],
            r["support_ppm"],
            r["confidence_ppm"],
            r["lift_ppm"],
        )
        for r in rows
    }
    assert got == expected


def test_cohort_ltv_matches_python_model(spark, sf_dir):
    om = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").collect():
        d = r["o_orderdate"]
        om[(r["o_custkey"], d.year * 12 + d.month)] += _cents(r["o_totalprice"])
    cohort = {}
    for (c, m), _ in om.items():
        cohort[c] = min(cohort.get(c, m), m)
    cm = defaultdict(int)
    for (c, m), cents in om.items():
        cm[(cohort[c], m - cohort[c])] += cents
    expected = {}
    for coh in {k[0] for k in cm}:
        cum = 0
        for off in sorted(o for c2, o in cm if c2 == coh):
            cum += cm[(coh, off)]
            expected[(coh, off)] = (cm[(coh, off)], cum)
    rows = QUERIES["q_cohort_ltv"](spark, sf_dir).collect()
    got = {
        (r["cohort"], r["month_offset"]): (r["rev_cents"], r["cum_ltv_cents"])
        for r in rows
    }
    assert got == expected


def test_funnel_latency_matches_python_model(spark, sf_dir):
    first = defaultdict(lambda: [None, None])
    for r in load_table(spark, sf_dir, "events").collect():
        e = first[r["user_id"]]
        if r["event_type"] == "view" and (e[0] is None or r["ts"] < e[0]):
            e[0] = r["ts"]
        if r["event_type"] == "purchase" and (e[1] is None or r["ts"] < e[1]):
            e[1] = r["ts"]
    lats = sorted(
        int((p - v).total_seconds())
        for v, p in first.values()
        if v is not None and p is not None and p > v
    )

    def disc(q):
        return lats[max(math.ceil(q * len(lats)), 1) - 1]

    [row] = QUERIES["q_funnel_latency"](spark, sf_dir).collect()
    assert (
        row["n_converts"],
        row["min_s"],
        row["p50_s"],
        row["p90_s"],
        row["max_s"],
    ) == (len(lats), lats[0], disc(0.5), disc(0.9), lats[-1])


def test_abc_matches_python_model(spark, sf_dir):
    rev = defaultdict(int)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        rev[r["l_partkey"]] += _cents(r["l_extendedprice"])
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, agg = 0, defaultdict(lambda: [0, 0])
    for pk, cents in ranked:
        cum += cents
        cls = (
            "A"
            if ABC_A_DEN * cum <= ABC_A_NUM * total
            else "B"
            if ABC_B_DEN * cum <= ABC_B_NUM * total
            else "C"
        )
        agg[cls][0] += 1
        agg[cls][1] += cents
    rows = QUERIES["q_abc_analysis"](spark, sf_dir).collect()
    got = {r["abc_class"]: [r["n_parts"], r["revenue_cents"]] for r in rows}
    assert got == dict(agg)
    assert sum(v[1] for v in got.values()) == total


def test_sample_weighted_degenerate_corpus_agrees_with_oracle(
    spark, sf_dir, tmp_path
):
    """total < SAMPLE_STRIDES makes the naive stride zero — Spark's
    ANSI-off division would return NULL while DuckDB errors. The
    greatest(stride, 1) floor keeps both engines defined AND identical:
    with stride 1 every document crosses a boundary, so the sample is the
    whole (tiny) corpus."""
    import shutil

    import pandas as pd

    from finegourmet_spark.operators.registry import ORACLES
    from finegourmet_spark.sources.testdata import TABLES
    from tests.oracle_harness import compare

    for name in TABLES:
        shutil.copy(f"{sf_dir}/{name}.parquet", tmp_path / f"{name}.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b", "c", "d e f"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [3, 1, 5],  # total 9 < 100 strides
        }
    ).to_parquet(tmp_path / "documents.parquet")
    df = QUERIES["q_sample_weighted"](spark, str(tmp_path))
    assert compare(df, ORACLES["q_sample_weighted"], str(tmp_path)) == []
    assert df.count() == 3  # stride 1 ⇒ every doc crosses a boundary
