"""Independent-model checks for the round-3 second-wave ops (ordered
funnel, cohort retention, last-touch attribution, co-purchase graph):
each Spark result is recomputed in plain Python over the collected
sf0.001 tables and must match EXACTLY — a second net under the DuckDB
oracles, catching any case where query and oracle share a wrong
assumption.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

from finegourmet_spark.operators.eventflow import FUNNEL_STEPS, N_CHANNELS
from finegourmet_spark.operators.graph import (
    PR_BASE,
    PR_INIT,
    PR_ROUNDS,
    PR_TOPN,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").collect()


def test_funnel_matches_python_model(spark, sf_dir):
    """Strict ordered funnel recomputed row-by-row: a user is at stage k
    when a step-k event follows (in the total (ts, event_id) order) an
    event completing stage k-1."""
    by_user = defaultdict(list)
    for r in _events(spark, sf_dir):
        if r["event_type"] in FUNNEL_STEPS:
            by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    reached = Counter()
    for evs in by_user.values():
        evs.sort()
        stage = 0
        for _, _, et in evs:
            if stage < len(FUNNEL_STEPS) and et == FUNNEL_STEPS[stage]:
                stage += 1
                if stage == len(FUNNEL_STEPS):
                    break
        for k in range(1, stage + 1):
            reached[k] += 1
    got = {r["stage"]: (r["step"], r["n_users"]) for r in QUERIES["q_funnel"](spark, sf_dir).collect()}
    assert got == {
        k + 1: (FUNNEL_STEPS[k], reached[k + 1]) for k in range(len(FUNNEL_STEPS))
    }
    # funnel counts are monotone non-increasing by construction
    ns = [got[k][1] for k in sorted(got)]
    assert ns == sorted(ns, reverse=True)


def test_retention_matches_python_model(spark, sf_dir):
    """Cohort triangle recomputed from distinct (user, day) pairs."""
    user_days = defaultdict(set)
    for r in _events(spark, sf_dir):
        user_days[r["user_id"]].add(r["ts"].date())
    expected = Counter()
    for days in user_days.values():
        cohort = min(days)
        for d in days:
            expected[(cohort, (d - cohort).days)] += 1
    rows = QUERIES["q_retention_cohorts"](spark, sf_dir).collect()
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"] for r in rows}
    assert got == dict(expected)
    # day-offset 0 row exists for every cohort and counts its full size
    cohort_sizes = Counter(min(days) for days in user_days.values())
    for cohort, size in cohort_sizes.items():
        assert got[(cohort, 0)] == size


def test_attribution_matches_python_model(spark, sf_dir):
    """Last-touch credit recomputed per purchase; channel revenue must
    conserve total purchase revenue under the same decimal(18,2) rule."""
    import json

    by_user = defaultdict(list)
    for r in _events(spark, sf_dir):
        if r["event_type"] not in ("purchase", "click"):
            continue
        ch = json.loads(r["props"])["k"] % N_CHANNELS if r["event_type"] == "click" else None
        # purchases sort AFTER equal-ts clicks: is_probe 1 vs 0 in the order
        is_probe = 1 if r["event_type"] == "purchase" else 0
        by_user[r["user_id"]].append((r["ts"], is_probe, r["event_id"], ch, r["value"]))
    n = Counter()
    rev: dict[str, Decimal] = defaultdict(Decimal)
    for evs in by_user.values():
        evs.sort(key=lambda t: t[:3])
        last_ch = None
        for _, is_probe, _, ch, value in evs:
            if is_probe == 0:
                last_ch = ch
            else:
                channel = "direct" if last_ch is None else f"ch{last_ch}"
                n[channel] += 1
                rev[channel] += Decimal(str(round(value, 2)))
    got = {
        r["channel"]: (r["n_purchases"], r["revenue"])
        for r in QUERIES["q_attribution"](spark, sf_dir).collect()
    }
    assert set(got) == set(n)
    for channel in n:
        assert got[channel][0] == n[channel], channel
        assert abs(got[channel][1] - float(rev[channel])) < 1e-6, channel
    # conservation: channel revenues sum to total purchase revenue
    total = sum(rev.values())
    assert abs(sum(v for _, v in got.values()) - float(total)) < 1e-6


def _copurchase_edges(spark, sf_dir):
    order_parts = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect():
        order_parts[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in order_parts.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    return edges


def test_degree_dist_matches_python_model(spark, sf_dir):
    edges = _copurchase_edges(spark, sf_dir)
    deg = Counter(src for src, _ in edges)
    expected = Counter(deg.values())
    got = {
        r["degree"]: r["n_nodes"]
        for r in QUERIES["q_graph_degree_dist"](spark, sf_dir).collect()
    }
    assert got == dict(expected)
    # handshake identity: Σ degree·n_nodes = directed edge count
    assert sum(d * n for d, n in got.items()) == len(edges)


def test_pagerank_matches_python_model(spark, sf_dir):
    """Integer damped-mass propagation is exactly reproducible — floor
    division only, so the Python model must agree bit-for-bit."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = Counter(src for src, _ in edges)
    mass = {pk: PR_INIT for pk in deg}
    for _ in range(PR_ROUNDS):
        incoming = defaultdict(int)
        for src, dst in edges:
            incoming[dst] += mass[src] // deg[src]
        mass = {pk: PR_BASE + (17 * s) // 20 for pk, s in incoming.items()}
    expected = sorted(mass.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOPN]
    got = QUERIES["q_graph_pagerank"](spark, sf_dir).collect()
    assert [(r["part_id"], r["mass"]) for r in sorted(got, key=lambda r: r["rank"])] == expected
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, len(expected) + 1)
    )
