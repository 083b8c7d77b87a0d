"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01) so oracle drift is
caught locally before a round ends.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.oracle_harness import compare, driver_canon_problems

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, ORACLES[name], sf_dir)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()  # the execution itself is the check (ADVICE r5)
    # rows-only results still pass through the driver; keep them
    # pandas-canonicalizable too (see driver_canon_problems).
    problems = driver_canon_problems(df.columns, [tuple(r) for r in rows], "spark")
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    df = contract.entry(spark)
    assert df.count() > 0
