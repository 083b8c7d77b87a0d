"""Independent-model checks for the round-3 fourth-wave ops (Markov
transitions, streaks, interval concurrency, EWMA, MAD outliers, kNN
classify, vocab growth, LATERAL top-k): each Spark result is recomputed in
plain Python over the collected sf0.001 tables and must match EXACTLY — a
second net under the DuckDB oracles, catching any case where query and
oracle share a wrong assumption.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import io
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.quality import MAD_K
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.similarity import KNN_K, KNN_N_TEST
from finegourmet_spark.operators.temporal import EWMA_DAYS
from finegourmet_spark.operators.textops import VOCAB_BUCKET_DOCS
from finegourmet_spark.sources.testdata import load_table


def test_markov_matches_python_model(spark, sf_dir):
    seqs = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pairs = Counter()
    for evs in seqs.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    froms = Counter()
    for (a, _), n in pairs.items():
        froms[a] += n
    expected = {
        (a, b): (n, (1_000_000 * n) // froms[a]) for (a, b), n in pairs.items()
    }
    rows = QUERIES["q_markov_transitions"](spark, sf_dir).collect()
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p_ppm"])
        for r in rows
    }
    assert got == expected
    # per-from floor-ppm rows sum to ≤ 1e6 and within |targets| of it
    by_from = defaultdict(int)
    for (a, _), (_, ppm) in got.items():
        by_from[a] += ppm
    n_targets = defaultdict(int)
    for a, _ in got:
        n_targets[a] += 1
    for a, s in by_from.items():
        assert 1_000_000 - n_targets[a] < s <= 1_000_000


def test_streaks_match_python_model(spark, sf_dir):
    user_days = defaultdict(set)
    for r in load_table(spark, sf_dir, "events").collect():
        user_days[r["user_id"]].add(r["ts"].date())
    hist = Counter()
    for days in user_days.values():
        ordered = sorted(days)
        best = run = 1
        for a, b in zip(ordered, ordered[1:]):
            run = run + 1 if (b - a).days == 1 else 1
            best = max(best, run)
        hist[best] += 1
    rows = QUERIES["q_user_streaks"](spark, sf_dir).collect()
    assert {r["streak_days"]: r["n_users"] for r in rows} == dict(hist)
    assert sum(hist.values()) == len(user_days)


def test_concurrency_peak_matches_python_model(spark, sf_dir):
    ship_max: dict[int, dt.date] = {}
    for r in load_table(spark, sf_dir, "lineitem").collect():
        d = r["l_shipdate"].date()
        k = r["l_orderkey"]
        if k not in ship_max or d > ship_max[k]:
            ship_max[k] = d
    deltas: dict[str, Counter] = defaultdict(Counter)
    for r in load_table(spark, sf_dir, "orders").collect():
        if r["o_orderkey"] not in ship_max:
            continue
        pri = r["o_orderpriority"]
        deltas[pri][r["o_orderdate"].date()] += 1
        deltas[pri][ship_max[r["o_orderkey"]] + dt.timedelta(days=1)] -= 1
    expected = {}
    for pri, dd in deltas.items():
        inflight, best, best_day = 0, None, None
        for day in sorted(dd):
            inflight += dd[day]
            if best is None or inflight > best:
                best, best_day = inflight, day
        expected[pri] = (best, best_day)
    rows = QUERIES["q_concurrency_peak"](spark, sf_dir).collect()
    got = {r["o_orderpriority"]: (r["peak_inflight"], r["peak_day"]) for r in rows}
    assert got == expected


def _cents(x: float) -> int:
    """Exact decimal(18,4) cast of a double, in 1e-4 units (the Spark/DuckDB
    shared HALF_UP semantics)."""
    return int(
        (Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP) * 10_000)
        .to_integral_exact()
    )


def test_ewma_matches_python_model(spark, sf_dir):
    daily: dict[tuple[str, dt.date], int] = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").collect():
        daily[(r["o_orderpriority"], r["o_orderdate"].date())] += _cents(
            r["o_totalprice"]
        )
    expected = {}
    for (pri, d), cents in daily.items():
        num = den = 0
        for j in range(EWMA_DAYS):  # calendar distance, not row distance
            back = d - dt.timedelta(days=j)
            if (pri, back) in daily:
                w = 1 << (EWMA_DAYS - 1 - j)
                num += w * daily[(pri, back)]
                den += w
        expected[(pri, d)] = (cents, num // den)
    rows = QUERIES["q_ewma_revenue"](spark, sf_dir).collect()
    got = {(r["o_orderpriority"], r["d"]): (r["rev_e4"], r["ewma_e4"]) for r in rows}
    assert got == expected


def _disc_median(values: list[float]) -> float:
    """percentile_disc(0.5): smallest value with cume_dist ≥ 0.5 — the
    convention Spark and DuckDB share."""
    ordered = sorted(values)
    return ordered[(len(ordered) + 1) // 2 - 1]


def test_outlier_mad_matches_python_model(spark, sf_dir):
    groups = defaultdict(list)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        groups[r["l_returnflag"]].append(r["l_extendedprice"])
    expected = {}
    for rf, xs in groups.items():
        med = _disc_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = _disc_median(devs)
        n_out = sum(1 for d in devs if d > MAD_K * mad)
        expected[rf] = (med, mad, n_out, len(xs))
    rows = QUERIES["q_outlier_mad"](spark, sf_dir).collect()
    got = {
        r["l_returnflag"]: (
            r["median_price"],
            r["mad_price"],
            r["n_outliers"],
            r["n_rows"],
        )
        for r in rows
    }
    assert got == expected
    # MAD flags a minority under any sane distribution
    for rf, (_, _, n_out, n) in got.items():
        assert n_out < n / 2


def _round6(v: float) -> float:
    return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_knn_classify_matches_python_model(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    probes = [r for r in rows if r["vec_id"] < KNN_N_TEST]
    train = [r for r in rows if r["vec_id"] >= KNN_N_TEST]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):  # same left-fold order as the Spark aggregate
            acc = acc + float(x) * float(y)
        return acc

    def cos(a, b):
        return _round6(
            fold_dot(a, b) / (fold_dot(a, a) ** 0.5 * fold_dot(b, b) ** 0.5)
        )

    expected = {}
    for p in probes:
        scored = sorted(
            (
                (-cos(p["embedding"], c["embedding"]), c["vec_id"], c["label"])
                for c in train
            ),
        )[:KNN_K]
        votes = Counter(lbl for _, _, lbl in scored)
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        expected[p["vec_id"]] = (
            p["label"],
            pred[0],
            pred[1],
            pred[0] == p["label"],
        )
    got = {
        r["query_id"]: (r["true_label"], r["pred_label"], r["n_votes"], r["correct"])
        for r in QUERIES["q_knn_classify"](spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == min(KNN_N_TEST, len(probes))


def test_vocab_growth_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    first_seen: dict[str, int] = {}
    bucket_docs = Counter()
    bucket_tokens = Counter()
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        b = r["doc_id"] // VOCAB_BUCKET_DOCS
        toks = r["text"].split(" ")
        bucket_docs[b] += 1
        bucket_tokens[b] += len(toks)
        for term in toks:
            first_seen.setdefault(term, b)
    new_terms = Counter(first_seen.values())
    expected, cd = [], 0
    ct = cv = 0
    for b in sorted(bucket_docs):
        cd += bucket_docs[b]
        ct += bucket_tokens[b]
        cv += new_terms.get(b, 0)
        expected.append((b * VOCAB_BUCKET_DOCS, cd, ct, cv))
    rows = QUERIES["q_vocab_growth"](spark, sf_dir).collect()
    got = sorted(
        (r["first_doc_id"], r["cum_docs"], r["cum_tokens"], r["cum_vocab"])
        for r in rows
    )
    assert got == expected
    # the curve is strictly monotone in docs/tokens, non-decreasing in vocab
    assert got[-1][3] == len(first_seen)


def test_lateral_topk_matches_python_model(spark, sf_dir):
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    per_nation = defaultdict(list)
    for r in load_table(spark, sf_dir, "customer").collect():
        per_nation[r["c_nationkey"]].append((-r["c_acctbal"], r["c_custkey"]))
    expected = set()
    for nk, name in nations.items():
        for negbal, ck in sorted(per_nation.get(nk, []))[:2]:
            expected.add((name, ck, -negbal))
    got = {
        (r["n_name"], r["c_custkey"], r["c_acctbal"])
        for r in QUERIES["q_lateral_topk"](spark, sf_dir).collect()
    }
    assert got == expected


# ---- plan shapes ----------------------------------------------------------


def _extended_tree(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue().split("== Physical Plan ==")[1]


def test_markov_single_user_exchange(spark, sf_dir):
    """q_markov_transitions: the lead window rides ONE hash(user_id)
    exchange; the pair agg and ppm window run on the collapsed pair frame."""
    tree = _extended_tree(QUERIES["q_markov_transitions"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(user_id") == 1, tree


def test_concurrency_collapses_before_prefix_sum(spark, sf_dir):
    """q_concurrency_peak: the running-sum window's exchange keys on the
    priority only AFTER the (pri, day) delta collapse — the window input is
    calendar-bounded. No nested-loop/cartesian interval pairing anywhere."""
    tree = _extended_tree(QUERIES["q_concurrency_peak"](spark, sf_dir))
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "Exchange hashpartitioning(pri" in tree, tree


def test_knn_corpus_not_shuffled(spark, sf_dir):
    """q_knn_classify: the corpus side streams into a broadcast join — the
    only hash exchanges key on query_id frames (probes × k scale)."""
    tree = _extended_tree(QUERIES["q_knn_classify"](spark, sf_dir))
    assert "BroadcastExchange" in tree, tree
    assert "Exchange hashpartitioning(vec_id" not in tree, tree


def test_setsim_prefix_is_superset_of_lsh_gated(spark, sf_dir):
    """The prefix-filtered exact join must find every pair the LSH-gated
    variant finds (the gate can only lose pairs), and each shared pair must
    agree on the similarity value (ppm floor of the gated double)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jac_ppm"]
        for r in QUERIES["q_setsim_join_prefix"](spark, sf_dir).collect()
    }
    gated = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["q_dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert set(gated) <= set(exact)
    for pair, jac in gated.items():
        assert abs(exact[pair] / 1_000_000 - jac) < 1e-4


def test_setsim_prefix_matches_python_model(spark, sf_dir):
    """Brute-force all-pairs recompute of shingle-set Jaccard ≥ 1/2 — proves
    prefix filtering dropped nothing, independent of both engines."""
    from finegourmet_spark.operators.dedup import (
        SETSIM_THETA_DEN,
        SETSIM_THETA_NUM,
        normalized_text,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles(normalized_text()).alias("sh")
    )
    sets = {r["doc_id"]: set(r["sh"]) for r in docs.collect() if r["sh"]}
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and SETSIM_THETA_DEN * inter >= SETSIM_THETA_NUM * uni:
                expected[(a, b)] = (inter, uni, (1_000_000 * inter) // uni)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_union"], r["jac_ppm"])
        for r in QUERIES["q_setsim_join_prefix"](spark, sf_dir).collect()
    }
    assert got == expected


def test_setsim_prep_passes_invariant(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_SETSIM_PASSES=K slices the token-prep phase by doc hash
    (the scratch governor): per-doc prefixes depend only on the global df
    table, so the sliced union must equal the single-pass result exactly."""
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    base = {key(r): (r["n_common"], r["n_union"], r["jac_ppm"])
            for r in QUERIES["q_setsim_join_prefix"](spark, sf_dir).collect()}
    monkeypatch.setenv("SPARK_GRAFT_SETSIM_PASSES", "3")
    sliced = {key(r): (r["n_common"], r["n_union"], r["jac_ppm"])
              for r in QUERIES["q_setsim_join_prefix"](spark, sf_dir).collect()}
    assert base == sliced
    assert base


def test_ohlc_bars_match_python_model(spark, sf_dir):
    """OHLC endpoints/extremes recomputed per (event_type, hour); volume via
    the same exact decimal(18,4) cast-sum."""
    bars = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        bars[(r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))].append(
            (r["ts"], r["event_id"], r["value"])
        )
    expected = {}
    for key, evs in bars.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        vol = float(
            sum(Decimal(v).quantize(Decimal("0.0001"), ROUND_HALF_UP) for v in vals)
        )
        expected[key] = (vals[0], max(vals), min(vals), vals[-1], vol, len(vals))
    rows = QUERIES["q_ohlc_bars"](spark, sf_dir).collect()
    got = {
        (r["event_type"], r["bar_hour"]): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["volume"],
            r["n_events"],
        )
        for r in rows
    }
    assert got == expected
    for _, (o, h, l, c, _, _) in got.items():
        assert l <= min(o, c) and h >= max(o, c)


def test_time_weighted_avg_matches_python_model(spark, sf_dir):
    """LOCF integral recomputed per user in exact integer arithmetic; the
    TWA must sit inside the user's [min, max] value range."""
    seqs = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        v_e2 = int(
            (Decimal(r["value"]).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100)
            .to_integral_exact()
        )
        seqs[r["user_id"]].append((r["ts"], r["event_id"], v_e2))
    expected = {}
    for uid, evs in seqs.items():
        evs.sort()
        if len(evs) < 2:
            continue
        wsum = span = 0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            dt_us = int((t1 - t0).total_seconds() * 1_000_000 + 0.5)
            wsum += v * dt_us
            span += dt_us
        expected[uid] = (len(evs) - 1, span, wsum // span)
    rows = QUERIES["q_time_weighted_avg"](spark, sf_dir).collect()
    got = {
        r["user_id"]: (r["n_intervals"], r["span_us"], r["twa_e2"]) for r in rows
    }
    assert got == expected
    for uid, (_, _, twa) in got.items():
        vs = [v for _, _, v in seqs[uid]]
        assert min(vs) <= twa <= max(vs)


def test_containment_matches_python_model(spark, sf_dir):
    """Brute-force all-pairs containment recompute — proves the asymmetric
    prefix scheme dropped nothing; also exhibits the decision's asymmetry
    vs Jaccard (every Jaccard ≥ θ pair has containment ≥ θ, not vice
    versa)."""
    from finegourmet_spark.operators.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        normalized_text,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles(normalized_text()).alias("sh")
    )
    sets = {r["doc_id"]: set(r["sh"]) for r in docs.collect() if r["sh"]}
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            smaller = min(len(sets[a]), len(sets[b]))
            if smaller and CONTAIN_DEN * inter >= CONTAIN_NUM * smaller:
                expected[(a, b)] = (
                    inter,
                    smaller,
                    (1_000_000 * inter) // smaller,
                )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_common"],
            r["n_smaller"],
            r["containment_ppm"],
        )
        for r in QUERIES["q_containment_dedup"](spark, sf_dir).collect()
    }
    assert got == expected


def test_crosstab_chi2_matches_python_model(spark, sf_dir):
    """Exact-integer recompute of every cell's floored ppm contribution;
    also sanity-checks marginals: Σ n_obs = N and each row/col total
    matches the raw counts."""
    import json

    from finegourmet_spark.operators.quality import CHI2_CHANNELS

    cells = Counter()
    for r in load_table(spark, sf_dir, "events").collect():
        ch = json.loads(r["props"])["k"] % CHI2_CHANNELS
        cells[(r["event_type"], ch)] += 1
    n = sum(cells.values())
    row_tot = Counter()
    col_tot = Counter()
    for (et, ch), o in cells.items():
        row_tot[et] += o
        col_tot[ch] += o
    expected = {
        (et, ch): (
            o,
            (1_000_000 * (n * o - row_tot[et] * col_tot[ch]) ** 2)
            // (n * row_tot[et] * col_tot[ch]),
        )
        for (et, ch), o in cells.items()
    }
    got = {
        (r["event_type"], r["channel"]): (r["n_obs"], r["contrib_ppm"])
        for r in QUERIES["q_crosstab_chi2"](spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(v for v, _ in got.values()) == n
