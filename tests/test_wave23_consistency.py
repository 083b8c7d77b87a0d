"""Independent plain-Python models for the round-4 waves 23-25 operators
(web-corpus curation, lakehouse maintenance, exact distribution stats):
recomputation over the collected sf0.001 tables, exact match required.
These catch model-level bugs the DuckDB oracle can't (an oracle written
with the same misunderstanding agrees with the same wrong answer)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.lakehouse import (
    COMPACT_TARGET_ROWS,
    GDPR_MOD,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


# ---------------------------------------------------------------- wave 23


def test_url_canonicalize_matches_python_model(spark, sf_dir):
    groups = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").select("doc_id").collect():
        did = r["doc_id"]
        tgt = did // 3
        variant = did % 3
        # canonical form straight from first principles (not the regex
        # pipeline): https + lower host + no trailing slash + content params
        if variant == 2:
            canon = f"https://example.com/d/{tgt}?id={tgt % 7}"
        else:
            canon = f"https://example.com/d/{tgt}"
        groups[canon].append(did)
    expected = {k: (len(v), min(v)) for k, v in groups.items()}
    got = {
        r["canonical_url"]: (r["n_urls"], r["first_doc_id"])
        for r in QUERIES["q_url_canonicalize"](spark, sf_dir).collect()
    }
    assert got == expected
    # the 3 variants of one target with the same query-class collapse:
    # targets with all three variants present must show n_urls >= 2
    assert any(n >= 2 for n, _ in got.values())


def test_pretokenizer_matches_python_re(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = QUERIES["q_token_count_pretokenizer"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    for r in rows:
        txt = f"{docs[r['doc_id']]} (sec. {r['doc_id']})—v2.0!"
        assert r["n_ws_tokens"] == len(txt.split(" "))
        word = len(re.findall(r"[a-z]+", txt))
        digit = len(re.findall(r"[0-9]+", txt))
        punct = len(re.findall(r"[^a-z0-9 ]+", txt))
        assert r["n_pretokens"] == len(
            re.findall(r"[a-z]+|[0-9]+|[^a-z0-9 ]+", txt)
        )
        assert (r["n_word_runs"], r["n_digit_runs"], r["n_punct_runs"]) == (
            word,
            digit,
            punct,
        )
        # run classes partition the pretoken stream
        assert r["n_pretokens"] == word + digit + punct


# ---------------------------------------------------------------- wave 25


def test_ks_drift_matches_python_model(spark, sf_dir):
    a, b = Counter(), Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        (a if r["doc_id"] % 2 == 0 else b)[r["n_chars"]] += 1
    na, nb = sum(a.values()), sum(b.values())
    best = (-1, None)
    cuma = cumb = 0
    for v in sorted(set(a) | set(b)):
        cuma += a[v]
        cumb += b[v]
        d = abs(nb * cuma - na * cumb)
        if d > best[0]:
            best = (d, v)
    row = QUERIES["q_ks_drift"](spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert (row["ks_scaled"], row["ks_at"]) == best


def test_mann_whitney_matches_python_model(spark, sf_dir):
    import hashlib

    vals = {"A": [], "B": []}
    for r in load_table(spark, sf_dir, "events").collect():
        if r["event_type"] != "purchase":
            continue
        h = int(hashlib.md5(f"mw-{r['user_id']}".encode()).hexdigest()[:8], 16)
        vals["A" if h % 2 == 0 else "B"].append(_cents(r["value"]))
    pooled = sorted(vals["A"] + vals["B"])
    # doubled average rank per value (ties → average), exact integers
    first = {}
    for i, v in enumerate(pooled, 1):
        first.setdefault(v, i)
    r1_x2 = sum(2 * first[v] + pooled.count(v) - 1 for v in vals["A"])
    n1, n2 = len(vals["A"]), len(vals["B"])
    u_a_x2 = r1_x2 - n1 * (n1 + 1)
    row = QUERIES["q_mann_whitney_ab"](spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (n1, n2)
    assert row["u_a_x2"] == u_a_x2
    assert row["u_a_x2"] + row["u_b_x2"] == 2 * n1 * n2


def test_gini_matches_python_model(spark, sf_dir):
    rev = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").collect():
        rev[r["o_custkey"]] += _cents(r["o_totalprice"])
    xs = sorted(rev.values())
    n = len(xs)
    num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, 1))
    den = n * sum(xs)
    row = QUERIES["q_gini_revenue"](spark, sf_dir).collect()[0]
    assert row["n_customers"] == n
    assert row["gini_ppm"] == (1_000_000 * num) // den
    assert 0 <= row["gini_ppm"] <= 1_000_000  # 0 ≤ G ≤ 1


def test_km_risk_table_matches_python_model(spark, sf_dir):
    spans = {}
    for r in load_table(spark, sf_dir, "events").collect():
        u, d = r["user_id"], r["ts"].date()
        lo, hi = spans.get(u, (d, d))
        spans[u] = (min(lo, d), max(hi, d))
    deaths = Counter((hi - lo).days for lo, hi in spans.values())
    rows = {
        r["lifespan_days"]: (r["n_events"], r["n_at_risk"])
        for r in QUERIES["q_km_risk_table"](spark, sf_dir).collect()
    }
    assert set(rows) == set(deaths)
    at_risk = 0
    for d in sorted(deaths, reverse=True):
        at_risk += deaths[d]
        assert rows[d] == (deaths[d], at_risk)
    # everyone is at risk at the minimum observed lifespan
    assert rows[min(deaths)][1] == len(spans)


# ---------------------------------------------------------------- wave 24


def test_merge_upsert_matches_python_model(spark, sf_dir):
    cust = {
        r["c_custkey"]: r["c_name"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    expected = {}
    for k, name in cust.items():
        in_target, in_source = k % 3 != 0, k % 2 == 0
        if in_target and in_source:
            expected[k] = ("update", f"upd:{name}")
        elif in_target:
            expected[k] = ("keep", name)
        elif in_source:
            expected[k] = ("insert", f"upd:{name}")
    got = {
        r["k"]: (r["action"], r["final_name"])
        for r in QUERIES["q_merge_upsert"](spark, sf_dir).collect()
    }
    assert got == expected


def test_gdpr_erasure_matches_python_model(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    exp = {
        "events": sum(1 for r in ev if r["user_id"] % GDPR_MOD == 0),
        "orders": sum(1 for r in orders if r["o_custkey"] % GDPR_MOD == 0),
        "lineitem": sum(
            1
            for r in li
            if r["l_orderkey"] in cust_of
            and cust_of[r["l_orderkey"]] % GDPR_MOD == 0
        ),
    }
    totals = {
        "events": len(ev),
        "orders": len(orders),
        "lineitem": sum(1 for r in li if r["l_orderkey"] in cust_of),
    }
    got = {
        r["table_name"]: (r["n_erased"], r["n_retained"])
        for r in QUERIES["q_gdpr_erasure"](spark, sf_dir).collect()
    }
    assert got == {k: (exp[k], totals[k] - exp[k]) for k in exp}


def test_skew_diagnose_matches_python_model(spark, sf_dir):
    counts = Counter(
        r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders").collect()
    )
    total = sum(counts.values())
    max_cnt = max(counts.values())
    hottest = min(k for k, c in counts.items() if c == max_cnt)
    row = QUERIES["q_skew_diagnose"](spark, sf_dir).collect()[0]
    assert row["total_rows"] == total
    assert row["n_keys"] == len(counts)
    assert (row["hottest_key"], row["max_key_rows"]) == (hottest, max_cnt)
    assert row["top_share_ppm"] == 1_000_000 * max_cnt // total
    assert row["suggested_salt"] == -(-max_cnt * len(counts) // total)  # ceil
    assert row["suggested_salt"] >= 1


def test_compaction_plan_matches_python_model(spark, sf_dir):
    manifest = Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        month = r["o_orderdate"].date().replace(day=1)
        manifest[(month, r["o_orderpriority"])] += 1
    bins = defaultdict(lambda: [0, 0, None, None])
    cum = 0
    for key in sorted(manifest):
        n = manifest[key]
        b = cum // COMPACT_TARGET_ROWS
        cum += n
        entry = bins[b]
        entry[0] += 1
        entry[1] += n
        entry[2] = key[0] if entry[2] is None else min(entry[2], key[0])
        entry[3] = key[0] if entry[3] is None else max(entry[3], key[0])
    got = {
        r["bin_id"]: (r["n_files"], r["bin_rows"], r["first_month"], r["last_month"])
        for r in QUERIES["q_compaction_plan"](spark, sf_dir).collect()
    }
    assert got == {b: tuple(v) for b, v in bins.items()}
    # bins are dense from 0 and every bin except possibly the last is full
    assert set(got) == set(range(len(got)))
