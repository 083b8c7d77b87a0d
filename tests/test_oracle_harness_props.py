"""Property tests for the oracle harness ITSELF (ROADMAP round-2 item):
the canonicalizer is the trusted judge of every driver comparison, so its
invariants — order-insensitivity, column-order-insensitivity, and
injectivity across the value domains the queries emit — get their own
adversarial coverage. A canonicalizer that maps two different results to
the same canonical form would let a wrong answer pass; one that maps equal
results differently would flake a correct one."""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "tests")
from oracle_harness import _canon, canonical_rows  # noqa: E402

SCALARS = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
    st.dates(),
    st.datetimes(),
    st.decimals(allow_nan=False, allow_infinity=False, places=4),
    st.booleans(),
)
ROW = st.tuples(SCALARS, SCALARS, SCALARS)


@settings(max_examples=200, deadline=None)
@given(st.lists(ROW, max_size=8), st.permutations([0, 1, 2]))
def test_row_and_column_order_insensitive(rows, perm):
    """Shuffling rows AND columns (with matching names) never changes the
    canonical form — the driver compares unordered result sets."""
    cols = ["a", "b", "c"]
    base = canonical_rows(cols, rows)
    shuffled_rows = list(reversed(rows))
    perm_cols = [cols[i] for i in perm]
    perm_rows = [tuple(r[i] for i in perm) for r in shuffled_rows]
    assert canonical_rows(perm_cols, perm_rows) == base


@settings(max_examples=200, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=8), ROW)
def test_any_extra_row_changes_canonical_form(rows, extra):
    """Adding a row always changes the canonical form (no silent absorption
    — a wrong row count can never hash-collide into a pass)."""
    cols = ["a", "b", "c"]
    assert canonical_rows(cols, rows + [extra]) != canonical_rows(cols, rows)


@settings(max_examples=300, deadline=None)
@given(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
def test_distinct_floats_stay_distinct(a, b):
    """Full-precision float canon: two different doubles never canonicalize
    equal (repr round-trips IEEE doubles exactly)."""
    if a != b:
        assert _canon(a) != _canon(b)


def test_known_cross_engine_equivalences():
    """The exact cross-engine representation differences the harness MUST
    unify (these produced round-1 false failures before the type policy):
    naive/aware datetimes, date objects, nested lists, decimal trailing
    zeros vs normalized form."""
    assert _canon(dt.datetime(2024, 1, 1, 8, 30)) == _canon(
        dt.datetime(2024, 1, 1, 8, 30, tzinfo=dt.timezone.utc)
    )
    assert _canon([1.5, None]) == _canon((1.5, None))
    assert _canon(decimal.Decimal("103580.80")) == _canon(decimal.Decimal("103580.8"))
    # and the ones it must NOT unify (bigint vs double is a schema contract)
    assert _canon(3549) != _canon(3549.0)
    assert _canon(None) != _canon("None")
    assert _canon(math.nan) == "nan"  # NaN == NaN under canon (sortable)


def test_negative_zero_is_not_positive_zero():
    """-0.0 vs 0.0: repr distinguishes them; both engines produce -0.0 only
    via the same IEEE operations, so distinguishing is the safe default.
    This documents (rather than hides) the sharp edge."""
    assert _canon(-0.0) != _canon(0.0)


def test_type_problems_catches_hugeint_vs_bigint(spark, sf_dir):
    """The r2 q_pack_sequences failure class: an uncast SUM of ints reaches
    Arrow as decimal128 from DuckDB while Spark emits BIGINT — the schema
    check must flag it, and must NOT flag driver-tolerated int-width
    differences (int32 rank vs BIGINT)."""
    from pyspark.sql import functions as F

    from tests.oracle_harness import type_problems

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"), F.sum("o_custkey").alias("s"))

    flagged = type_problems(
        df,
        "SELECT o_orderpriority, COUNT(*) AS n, SUM(o_custkey) AS s "
        "FROM orders GROUP BY 1",
        sf_dir,
    )
    assert any("s" in p and "decimal128" in p for p in flagged), flagged

    clean = type_problems(
        df,
        "SELECT o_orderpriority, COUNT(*) AS n, "
        "CAST(SUM(o_custkey) AS BIGINT) AS s FROM orders GROUP BY 1",
        sf_dir,
    )
    assert clean == [], clean


def test_base_testdata_has_no_nulls(sf_dir):
    """NULL-order hygiene precondition (ADVICE r4 Mann-Whitney class,
    VERDICT r5 item 5): Spark and DuckDB default to OPPOSITE NULL placement
    in ORDER BY (Spark asc = NULLS FIRST, DuckDB asc = NULLS LAST), so any
    un-annotated window ORDER BY diverges the moment its sort key is NULL.
    This pins the fact that makes the fleet-wide audit tractable: NO base
    testdata column contains a NULL at any tested sf, so a nullable sort
    key can ONLY be derived (left join, try_cast, explicit injection) —
    and derived-NULL sites are local, greppable, and carry explicit
    filters/annotations (quality.py Mann-Whitney + grouped-percentiles).
    If the driver ever regenerates testdata WITH nulls, this fails loudly
    and the 61 un-annotated window ORDER BYs must be re-audited."""
    import duckdb

    con = duckdb.connect()
    # derive from the live table list (ADVICE r6): a driver-added table
    # must not silently skip the NULL-free precondition this test pins
    from finegourmet_spark.sources.testdata import TABLES

    import glob as _glob
    import os as _os

    on_disk = {
        _os.path.splitext(_os.path.basename(p))[0]
        for p in _glob.glob(f"{sf_dir}/*.parquet")
    }
    assert on_disk <= set(TABLES), (
        f"fixture dir has tables unknown to TABLES: {sorted(on_disk - set(TABLES))}"
    )
    for tbl in TABLES:
        path = f"{sf_dir}/{tbl}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{path}'"
            ).fetchall()
        ]
        exprs = ", ".join(
            f'SUM(CASE WHEN "{c}" IS NULL THEN 1 ELSE 0 END)' for c in cols
        )
        row = con.execute(f"SELECT {exprs} FROM '{path}'").fetchone()
        nulls = {c: n for c, n in zip(cols, row) if n}
        assert not nulls, f"{tbl} now carries NULLs: {nulls} — re-audit"
