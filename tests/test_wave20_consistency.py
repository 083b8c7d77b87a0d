"""Independent-model check for the round-3 twentieth-wave op
(exact distributed PERCENTILE_CONT): numpy's canonical linear-interpolation
quantile over the collected sf0.001 cents, exact match required after the
×4 quarter-cent scaling."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import numpy as np

import __spark_entry__  # noqa: F401  — populates the full registry
from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.sources.testdata import load_table


def test_percentile_cont_matches_numpy_linear(spark, sf_dir):
    vals = defaultdict(list)
    for r in load_table(spark, sf_dir, "lineitem").collect():
        vals[r["l_returnflag"]].append(
            int(
                Decimal(str(r["l_extendedprice"])).quantize(Decimal("0.01"))
                * 100
            )
        )
    got = {
        (r["l_returnflag"], r["quarter"]): (r["n_rows"], r["q_quarter_cents"])
        for r in QUERIES["q_percentile_cont_exact"](spark, sf_dir).collect()
    }
    for f, v in vals.items():
        arr = np.array(sorted(v), dtype=np.int64)
        for q in (1, 2, 3):
            # 4·percentile is integer by construction: (4−rem)·lo + rem·hi
            expect = round(4 * np.percentile(arr, 25 * q, method="linear"))
            assert got[(f, q)] == (len(v), expect), (f, q)
    assert set(got) == {(f, q) for f in vals for q in (1, 2, 3)}
