"""Independent plain-Python DBSCAN (brute-force O(n²) distances +
union-find CC) checked against the grid-bucketed distributed q_geo_dbscan:
exact role and cluster-label match required."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__  # noqa: F401
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.spatial import (
    DBSCAN_EPS2,
    DBSCAN_KEY_CAP,
    DBSCAN_MINPTS,
    GRID,
)
from finegourmet_spark.sources.testdata import load_table


def _coord(salt: str, key: int) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:7], 16) % GRID


def test_geo_dbscan_matches_bruteforce_python(spark, sf_dir):
    pts = {
        r["c_custkey"]: (_coord("gx", r["c_custkey"]), _coord("gy", r["c_custkey"]))
        for r in load_table(spark, sf_dir, "customer").collect()
        if r["c_custkey"] <= DBSCAN_KEY_CAP
    }
    nbrs = defaultdict(set)
    ids = sorted(pts)
    for i, a in enumerate(ids):
        ax, ay = pts[a]
        for b in ids[i + 1 :]:
            bx, by = pts[b]
            if (ax - bx) ** 2 + (ay - by) ** 2 <= DBSCAN_EPS2:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {v for v in ids if len(nbrs[v]) + 1 >= DBSCAN_MINPTS}

    parent = {v: v for v in core}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {v: min(u for u in core if find(u) == find(v)) for v in core}

    expected = {}
    for v in ids:
        if v in core:
            expected[v] = ("core", label[v])
        else:
            core_nbrs = [label[u] for u in nbrs[v] if u in core]
            if core_nbrs:
                expected[v] = ("border", min(core_nbrs))
            else:
                expected[v] = ("noise", None)

    got = {
        r["c_custkey"]: (r["role"], r["cluster"])
        for r in QUERIES["q_geo_dbscan"](spark, sf_dir).collect()
    }
    assert got == expected
    roles = {role for role, _ in got.values()}
    assert "noise" in roles  # subcritical eps: noise must exist
