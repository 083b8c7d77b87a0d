"""Independent-model checks for the round-3 tenth-wave ops (multi-source
BFS, item-item CF, bitmap distinct rollup, Simpson diversity, grid nearest
neighbor): plain-Python recomputation over the collected sf0.001 tables,
exact match required."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.graph import (
    BFS_ROUNDS,
    BFS_SEED_MOD,
    CF_MIN_CO,
    CF_TOPN,
)
from finegourmet_spark.operators.spatial import CELL, GRID
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def _edges_py(spark, sf_dir):
    baskets = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for pks in baskets.values():
        for a in pks:
            for b in pks:
                if a != b:
                    adj[a].add(b)
    return adj


def test_bfs_hops_matches_python_model(spark, sf_dir):
    adj = _edges_py(spark, sf_dir)
    dist = {n: 0 for n in adj if n % BFS_SEED_MOD == 0}
    frontier = set(dist)
    for hop in range(1, BFS_ROUNDS + 1):
        nxt = {d for n in frontier for d in adj[n]} - dist.keys()
        for n in nxt:
            dist[n] = hop
        frontier = nxt
    expected = Counter(dist.values())
    got = {
        r["hop"]: r["n_nodes"]
        for r in QUERIES["q_graph_bfs_hops"](spark, sf_dir).collect()
    }
    assert got == dict(expected)


def test_item_item_cf_matches_python_model(spark, sf_dir):
    cust_of = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    up = set()
    for r in load_table(spark, sf_dir, "lineitem").collect():
        up.add((cust_of[r["l_orderkey"]], r["l_partkey"]))
    items_of = defaultdict(set)
    for u, pk in up:
        items_of[u].add(pk)
    nu = Counter(pk for _, pk in up)
    co = Counter()
    for pks in items_of.values():
        for a in pks:
            for b in pks:
                if a != b:
                    co[(a, b)] += 1
    scored = defaultdict(list)
    for (a, b), c in co.items():
        if c >= CF_MIN_CO:
            ppm = (1_000_000 * c * c) // (nu[a] * nu[b])
            scored[a].append((-ppm, b, c))
    expected = set()
    for a, cands in scored.items():
        for rank, (neg, b, c) in enumerate(sorted(cands)[:CF_TOPN], start=1):
            expected.add((a, b, c, -neg, rank))
    got = {
        (r["part_a"], r["part_b"], r["co_users"], r["cos2_ppm"], r["rank"])
        for r in QUERIES["q_item_item_cf"](spark, sf_dir).collect()
    }
    assert got == expected


def test_bitmap_rollup_matches_python_model(spark, sf_dir):
    seen = defaultdict(set)
    for r in load_table(spark, sf_dir, "events").collect():
        key = (r["event_type"], r["ts"].date().replace(day=1))
        seen[key].add(r["user_id"])
    expected = {k: len(v) for k, v in seen.items()}
    got = {
        (r["event_type"], r["month_start"]): r["distinct_users"]
        for r in QUERIES["q_bitmap_distinct_rollup"](spark, sf_dir).collect()
    }
    assert got == expected


def test_simpson_diversity_matches_python_model(spark, sf_dir):
    per_lang = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").collect():
        c = Counter(w for w in r["text"].split(" ") if w)
        n = sum(c.values())
        s2 = sum(v * v for v in c.values())
        per_lang[r["lang"]].append(
            ((1_000_000 * (n * n - s2)) // (n * n), len(c), n)
        )
    expected = {
        lang: (
            len(v),
            sum(p for p, _, _ in v) // len(v),
            sum(d for _, d, _ in v),
            sum(n for _, _, n in v),
        )
        for lang, v in per_lang.items()
    }
    got = {
        r["lang"]: (
            r["n_docs"],
            r["avg_simpson_ppm"],
            r["total_distinct"],
            r["total_tokens"],
        )
        for r in QUERIES["q_simpson_diversity"](spark, sf_dir).collect()
    }
    assert got == expected


def _coord(salt: str, key: int) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:7], 16) % GRID


def test_geo_nearest_matches_python_model(spark, sf_dir):
    cust = [
        (r["c_custkey"], _coord("gx", r["c_custkey"]), _coord("gy", r["c_custkey"]))
        for r in load_table(spark, sf_dir, "customer").collect()
    ]
    supp = [
        (r["s_suppkey"], _coord("gx", r["s_suppkey"]), _coord("gy", r["s_suppkey"]))
        for r in load_table(spark, sf_dir, "supplier").collect()
    ]
    expected = {}
    for ck, cx, cy in cust:
        best = None
        for sk, sx, sy in supp:
            if abs(cx - sx) <= CELL and abs(cy - sy) <= CELL:
                d2 = (cx - sx) ** 2 + (cy - sy) ** 2
                if best is None or (d2, sk) < best:
                    best = (d2, sk)
        if best is not None:
            expected[ck] = (best[1], best[0])
    got = {
        r["c_custkey"]: (r["s_suppkey"], r["d2"])
        for r in QUERIES["q_geo_nearest_grid"](spark, sf_dir).collect()
    }
    assert got == expected


def test_geo_grid_radius_invariant():
    """The 3×3 cell neighborhood must cover the Chebyshev radius — the
    correctness precondition of the bucketing scheme."""
    assert CELL * 3 >= 2 * CELL + 1  # one cell each side covers radius CELL
    assert GRID % CELL == 0


def test_geo_nearest_expanding_ring_equals_single_level(spark, sf_dir):
    """The density-adaptive multi-level path (fine cells + doubling
    expanding-ring search) computes the SAME function as the one-level
    coarse plan — forced here with fine_cell=16 at driver SF, which
    exercises every ring level (16→32→64→128→256) because the fixture is
    sparse and most customers finalize only in the outer rings."""
    from finegourmet_spark.operators.spatial import _nearest_grid

    one = {
        r["c_custkey"]: (r["s_suppkey"], r["d2"])
        for r in _nearest_grid(spark, sf_dir, fine_cell=CELL).collect()
    }
    multi = {
        r["c_custkey"]: (r["s_suppkey"], r["d2"])
        for r in _nearest_grid(spark, sf_dir, fine_cell=16).collect()
    }
    assert multi == one
    assert one  # non-degenerate: the radius does match some customers


def test_geo_fine_cell_selector_bounds_density():
    """_pick_fine_cell keeps expected points-per-cell ≤ TARGET_PER_CELL
    whenever that is reachable with w ≥ MIN_FINE_CELL, returns CELL at
    driver densities (plan unchanged), and always divides CELL."""
    from finegourmet_spark.operators.spatial import (
        MIN_FINE_CELL,
        TARGET_PER_CELL,
        _pick_fine_cell,
    )

    assert _pick_fine_cell(100) == CELL  # sf0.01: stays single-level
    assert _pick_fine_cell(1_000) == CELL  # sf0.1
    for n in (10_000, 100_000, 1_000_000, 10_000_000):
        w = _pick_fine_cell(n)
        assert CELL % w == 0 and w >= MIN_FINE_CELL
        if w > MIN_FINE_CELL:
            assert n * w * w <= TARGET_PER_CELL * GRID * GRID
    assert _pick_fine_cell(100_000) == 16  # the measured sf10 regime
