"""Independent plain-Python models for the round-4 wave 27 operators:
timezone normalization (incl. a pinned DST spring-forward boundary),
tolerance-bounded as-of join, and the power-of-two histogram."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict
from decimal import Decimal
from zoneinfo import ZoneInfo

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.temporal import ASOF_TOL_HOURS, TZ_REPORT_ZONES
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def test_timezone_normalize_matches_zoneinfo(spark, sf_dir):
    agg = defaultdict(lambda: [0, 24, -1])
    for r in load_table(spark, sf_dir, "events").collect():
        utc = r["ts"].replace(tzinfo=dt.timezone.utc)
        for z in TZ_REPORT_ZONES:
            local = utc.astimezone(ZoneInfo(z))
            k = (z, local.date())
            agg[k][0] += 1
            agg[k][1] = min(agg[k][1], local.hour)
            agg[k][2] = max(agg[k][2], local.hour)
    got = {
        (r["tz"], r["local_date"]): (r["n_events"], r["first_hour"], r["last_hour"])
        for r in QUERIES["q_timezone_normalize"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # the same UTC stream lands on shifted local-date ranges per zone
    dates = lambda z: {d for (tz, d) in got if tz == z}  # noqa: E731
    assert dates("Asia/Tokyo") != dates("America/New_York")


def test_dst_spring_forward_is_iana_correct(spark):
    """Pin the 2024-03-10 US spring-forward on constructed instants: the
    2-3 AM wall-clock hour must not exist in America/New_York."""
    rows = spark.sql(
        """
        SELECT from_utc_timestamp(TIMESTAMP '2024-03-10 06:30:00',
                                  'America/New_York') AS pre,
               from_utc_timestamp(TIMESTAMP '2024-03-10 07:30:00',
                                  'America/New_York') AS post
        """
    ).collect()[0]
    assert rows["pre"].hour == 1 and rows["post"].hour == 3  # 2 AM skipped


def test_asof_tolerance_matches_untol_asof(spark, sf_dir):
    """Tolerance variant == plain as-of with stale matches nulled out."""
    base = {
        r["click_id"]: r
        for r in QUERIES["q_join_asof"](spark, sf_dir).collect()
    }
    tol_us = ASOF_TOL_HOURS * 3600 * 1_000_000
    got = QUERIES["q_join_asof_tolerance"](spark, sf_dir).collect()
    assert {r["click_id"] for r in got} == set(base)  # left semantics
    n_stale = 0
    for r in got:
        b = base[r["click_id"]]
        fresh = b["purchase_ts"] is not None and (
            (b["click_ts"] - b["purchase_ts"]).total_seconds() * 1_000_000
            <= tol_us
        )
        if b["purchase_id"] is not None and not fresh:
            n_stale += 1
        assert r["within_tolerance"] == fresh
        assert r["purchase_id"] == (b["purchase_id"] if fresh else None)
        assert r["purchase_value"] == (b["purchase_value"] if fresh else None)
    assert n_stale > 0, "fixture must contain stale matches to null out"


def test_histogram_log_bins_matches_python_model(spark, sf_dir):
    bins = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "orders").collect():
        if r["o_totalprice"] <= 0:
            continue
        c = _cents(r["o_totalprice"])
        bins[c.bit_length() - 1][0] += 1
        bins[c.bit_length() - 1][1] += c
    got = {}
    for r in QUERIES["q_histogram_log_bins"](spark, sf_dir).collect():
        assert r["bin_lo"] == 1 << r["bin_exp"]
        assert r["bin_hi"] == (1 << (r["bin_exp"] + 1)) - 1
        got[r["bin_exp"]] = (r["n_orders"], r["cents_total"])
    assert got == {k: tuple(v) for k, v in bins.items()}


def test_dst_fall_back_is_iana_correct(spark):
    """Pin the 2024-11-03 US fall-back on constructed instants: the 1-2 AM
    wall-clock hour occurs twice in America/New_York (5:30 UTC = 1:30 EDT,
    6:30 UTC = 1:30 EST)."""
    row = spark.sql(
        """
        SELECT from_utc_timestamp(TIMESTAMP '2024-11-03 05:30:00',
                                  'America/New_York') AS first_pass,
               from_utc_timestamp(TIMESTAMP '2024-11-03 06:30:00',
                                  'America/New_York') AS second_pass
        """
    ).collect()[0]
    assert row["first_pass"].hour == 1 and row["second_pass"].hour == 1
    assert row["first_pass"] == row["second_pass"]  # same wall clock, twice
