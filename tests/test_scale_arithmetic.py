"""Width-rule regression tests (the q_crosstab_chi2 decimal(38,0)/HUGEINT
rule): ppm/ratio arithmetic must stay exact at 100 TB magnitudes.

Round-6 sf10 parity caught q_share_of_parent's 1e6·rev_cents passing
int64's 9.2e18 ceiling — DuckDB errors loudly, Spark (non-ANSI) WRAPS
SILENTLY and reports wrong shares. Six sites multiplied data-scaling sums
or counts in BIGINT; all now ride decimal(38,0) (Spark) / HUGEINT (DuckDB).

Three layers pin the class:
1. Query-level: a micro-fixture whose region/month cents sums push the ppm
   numerator to ~1e22 — the REAL q_share_of_parent/q_growth_rates vs their
   REAL oracles through the driver's own compare(). Under the old BIGINT
   arithmetic this fixture makes DuckDB raise and Spark wrap.
2. Expression-level: the widened expression shapes for the count-based
   sites (counts of 1e13 can't be fixtured as rows) evaluated on literals
   in BOTH engines against Python int ground truth.
3. Source pins: the widened substrings must stay present, so silently
   reverting a cast fails this file, not a 100 TB run.
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as contract
from tests.oracle_harness import compare

SF001 = Path("/root/testdata/sf0.001")
INT64_MAX = (1 << 63) - 1

# 9e13 currency units per order → 9e15 cents per order (exact as double:
# 9e13 < 2^53; fits decimal(18,2)). A handful of orders per region/month
# puts 1e6 · (region or month cents sum) far past int64.
BIG_PRICE = 9.0e13


@pytest.fixture(scope="module")
def big_sums_dir(tmp_path_factory, spark):
    out = tmp_path_factory.mktemp("bigsums")
    for f in SF001.glob("*.parquet"):
        shutil.copy(f, out / f.name)

    # customers spanning at least two nations, from the real dimension so
    # the share-of-parent joins resolve
    cust = pq.read_table(
        SF001 / "customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pylist()
    by_nation: dict[int, int] = {}
    for r in cust:
        by_nation.setdefault(int(r["c_nationkey"]), int(r["c_custkey"]))
    custkeys = list(by_nation.values())[:6]
    assert len(custkeys) >= 2, "fixture needs >= 2 nations"

    rows = []
    ok = 1
    for month in range(13):  # 13 months => growth_rates exercises yoy too
        y, m = 2024 + month // 12, month % 12 + 1
        for j in range(month % 3 + 1):  # 1-3 orders/month, varying sums
            rows.append(
                {
                    "o_orderkey": ok,
                    "o_custkey": custkeys[(ok - 1) % len(custkeys)],
                    "o_orderstatus": "F",
                    "o_totalprice": BIG_PRICE,
                    "o_orderdate": dt.datetime(y, m, 10 + j),
                    "o_orderpriority": "1-URGENT",
                }
            )
            ok += 1
    schema = pq.read_schema(SF001 / "orders.parquet")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema), out / "orders.parquet"
    )

    # guard: the fixture must actually stress the width — the largest
    # ppm numerator has to pass int64 (else this test proves nothing)
    per_order_cents = int(BIG_PRICE) * 100
    month_max_cents = 3 * per_order_cents
    assert 1_000_000 * month_max_cents > INT64_MAX
    return str(out)


def test_share_of_parent_exact_past_int64(spark, big_sums_dir):
    df = contract.queries()["q_share_of_parent"](spark, big_sums_dir)
    problems = compare(df, contract.oracle_sql()["q_share_of_parent"], big_sums_dir)
    assert not problems, "\n".join(problems)
    # shares must still be sane ppm (a silent int64 wrap yields garbage,
    # often negative) and each region's nation shares ≈ 1e6
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r["nation_share_ppm"] <= 1_000_000
        assert 0 <= r["region_share_ppm"] <= 1_000_000


def test_growth_rates_exact_past_int64(spark, big_sums_dir):
    df = contract.queries()["q_growth_rates"](spark, big_sums_dir)
    problems = compare(df, contract.oracle_sql()["q_growth_rates"], big_sums_dir)
    assert not problems, "\n".join(problems)
    rows = {r["month_start"]: r for r in df.collect()}
    assert len(rows) == 13
    # month 1: 1 order, month 2: 2 orders => mom growth exactly +100% ppm
    mom = rows[dt.date(2024, 2, 1)]["mom_growth_ppm"]
    assert mom == 1_000_000


# (label, spark expr, duckdb expr, python ground truth) — the exact widened
# shapes used by the count-based sites, at count magnitudes (~1e13 events /
# hot keys) that cannot be fixtured as physical rows.
N_LATE, N_ALL = 9_300_000_000_000, 13_000_000_000_000
MAXC, NKEYS, TOTAL = 4_000_000_000, 3_100_000_000, 9_200_000_000_000
N_AB, N_ORD, N_A, N_C = 70_000, 1_500_000_000_000, 9_000_000, 8_000_000
_WIDTH_CASES = [
    (
        "late_ppm (q_out_of_order_events / q_markov_transitions shape)",
        f"cast((1000000 * cast({N_LATE} as decimal(38,0))) div {N_ALL} as bigint)",
        f"CAST((1000000::HUGEINT * {N_LATE}) // {N_ALL} AS BIGINT)",
        1_000_000 * N_LATE // N_ALL,
    ),
    (
        "top_share_ppm (q_skew_diagnose shape)",
        f"cast((1000000 * cast({MAXC} as decimal(38,0))) div {TOTAL} as bigint)",
        f"CAST((1000000::HUGEINT * {MAXC}) // {TOTAL} AS BIGINT)",
        1_000_000 * MAXC // TOTAL,
    ),
    (
        "suggested_salt (q_skew_diagnose shape)",
        f"cast((cast({MAXC} as decimal(38,0)) * {NKEYS} + {TOTAL} - 1)"
        f" div {TOTAL} as bigint)",
        f"CAST((CAST({MAXC} AS HUGEINT) * {NKEYS} + {TOTAL} - 1)"
        f" // {TOTAL} AS BIGINT)",
        (MAXC * NKEYS + TOTAL - 1) // TOTAL,
    ),
    (
        "lift_ppm (q_assoc_rules shape)",
        f"cast((1000000 * cast({N_AB} as decimal(38,0)) * {N_ORD})"
        f" div (cast({N_A} as decimal(38,0)) * {N_C}) as bigint)",
        f"CAST((1000000::HUGEINT * {N_AB} * {N_ORD})"
        f" // (CAST({N_A} AS HUGEINT) * {N_C}) AS BIGINT)",
        1_000_000 * N_AB * N_ORD // (N_A * N_C),
    ),
]


@pytest.mark.parametrize("label,sexpr,dexpr,want", _WIDTH_CASES)
def test_width_rule_expressions(spark, label, sexpr, dexpr, want):
    # the numerator must pass int64, else the case is vacuous
    got_s = spark.sql(f"SELECT {sexpr} AS v").collect()[0]["v"]
    got_d = duckdb.sql(f"SELECT {dexpr} AS v").fetchone()[0]
    assert got_s == want, f"{label}: spark {got_s} != {want}"
    assert got_d == want, f"{label}: duckdb {got_d} != {want}"


# --- source pins: reverting a widening must fail HERE, not at 100 TB ---
_SRC = Path(__file__).resolve().parent.parent / "finegourmet_spark" / "operators"
_PINS = {
    "relational.py": [  # q_share_of_parent, q_allocation_largest_remainder,
        # q_abc_analysis
        "1000000 * cast(rev_cents as decimal(38,0))",
        "1000000::HUGEINT * rev_cents",
        "1000000::HUGEINT * region_cents",
        "{ALLOC_UNITS}::HUGEINT * rev_cents",
        "{ALLOC_UNITS} * cast(rev_cents as decimal(38,0))",
        "::HUGEINT * cum",
    ],
    "temporal.py": [  # q_growth_rates
        "as decimal(38,0))) div {base}",
        "1000000::HUGEINT * (rev_cents - prev_cents)",
        "1000000::HUGEINT * (rev_cents - yoy_cents)",
    ],
    "graph.py": [  # q_assoc_rules lift
        "1000000 * cast(n_ab as decimal(38,0)) * n_orders",
        "1000000::HUGEINT * p.n_ab * nb.n_orders",
    ],
    "lakehouse.py": [  # q_skew_diagnose
        "1000000 * cast(max_cnt as decimal(38,0))",
        "1000000::HUGEINT * max_cnt",
        "CAST(max_cnt AS HUGEINT) * n_keys",
    ],
    "quality.py": [  # q_out_of_order_events
        "as decimal(38,0))) div count(*)",
        "1000000::HUGEINT * count(*) FILTER",
    ],
    "eventflow.py": [  # q_markov_transitions
        "1000000 * cast(n_transitions as decimal(38,0))",
        "1000000::HUGEINT * n_transitions",
    ],
}


@pytest.mark.parametrize("fname", sorted(_PINS))
def test_width_rule_source_pins(fname):
    src = (_SRC / fname).read_text()
    missing = [p for p in _PINS[fname] if p not in src]
    assert not missing, f"{fname} lost width-rule arithmetic: {missing}"
