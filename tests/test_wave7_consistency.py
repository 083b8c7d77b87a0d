"""Independent-model checks for the round-3 seventh-wave ops (exact heavy
hitters, rolling median, Theil-Sen trend, session path mining): plain-Python
recomputation over the collected sf0.001 tables, exact match required."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.eventflow import PATH_LEN, PATH_TOPN
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.temporal import (
    ROLL_MED_DAYS,
    SESSION_GAP_US,
)
from finegourmet_spark.operators.textops import HH_K
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def _disc(sorted_xs, q):
    return sorted_xs[max(math.ceil(q * len(sorted_xs)), 1) - 1]


def test_heavy_hitters_match_python_model(spark, sf_dir):
    counts = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        for w in r["text"].strip().lower().split(" "):
            if w:
                counts[w] += 1
    n = sum(counts.values())
    expected = {w: c for w, c in counts.items() if c * HH_K > n}
    rows = QUERIES["q_heavy_hitters"](spark, sf_dir).collect()
    got = {r["term"]: r["n_occurrences"] for r in rows}
    assert got == expected
    assert expected, "fixture should produce at least one heavy hitter"


def test_rolling_median_matches_python_model(spark, sf_dir):
    daily = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").collect():
        daily[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    import datetime as dt

    expected = {}
    for rd in daily:
        window = sorted(
            daily[rd - dt.timedelta(days=j)]
            for j in range(ROLL_MED_DAYS)
            if rd - dt.timedelta(days=j) in daily
        )
        expected[rd] = (len(window), _disc(window, 0.5))
    rows = QUERIES["q_rolling_median"](spark, sf_dir).collect()
    got = {r["report_day"]: (r["n_days"], r["med_cents"]) for r in rows}
    assert got == expected


def test_theil_sen_matches_python_model(spark, sf_dir):
    daily = Counter()
    for r in load_table(spark, sf_dir, "events").collect():
        daily[r["ts"].date().toordinal() - 719163] += 1  # days since epoch
    pts = sorted(daily.items())
    slopes = []
    for i, (xa, ya) in enumerate(pts):
        for xb, yb in pts[i + 1 :]:
            dy, dx = yb - ya, xb - xa
            s = (
                (1_000_000 * dy) // dx
                if dy >= 0
                else -((1_000_000 * -dy) // dx)
            )
            slopes.append(s)
    slopes.sort()
    [row] = QUERIES["q_theil_sen"](spark, sf_dir).collect()
    assert (row["n_days"], row["n_pairs"], row["slope_e6_per_day"]) == (
        len(pts),
        len(slopes),
        _disc(slopes, 0.5),
    )


def test_session_paths_match_python_model(spark, sf_dir):
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    per_user = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        # naive UTC timestamps: diff against the epoch directly, never
        # .timestamp() (which would apply the host's local timezone)
        us = int((r["ts"] - epoch) / dt.timedelta(microseconds=1))
        per_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    paths = Counter()
    for evs in per_user.values():
        evs.sort()
        cur: list[str] = []
        prev_us = None
        for us, _, et in evs:
            if prev_us is None or us - prev_us > SESSION_GAP_US:
                if cur:
                    paths[">".join(cur[:PATH_LEN])] += 1
                cur = []
            cur.append(et)
            prev_us = us
        if cur:
            paths[">".join(cur[:PATH_LEN])] += 1
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOPN]
    expected = [(i + 1, p, n) for i, (p, n) in enumerate(ranked)]
    rows = QUERIES["q_session_paths"](spark, sf_dir).collect()
    got = [
        (r["rank"], r["path"], r["n_sessions"])
        for r in sorted(rows, key=lambda r: r["rank"])
    ]
    assert got == expected
