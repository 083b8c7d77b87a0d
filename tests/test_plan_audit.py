"""Fleet-wide physical-plan audit: every registered query, one set of
anti-pattern checks. The targeted tests in test_plan_shapes.py assert the
RIGHT plan for specific operators; this sweep asserts the ABSENCE of the
wrong ones everywhere, so a future query can't quietly ship a scale-killer.

Checked per query (pre-execution formatted plan at sf0.001):
  * no CartesianProduct — the non-broadcast cross join materializes |L|×|R|;
    only the explicit q_join_cross (5×25 dims) may carry one.
  * no row-at-a-time Python eval (BatchEvalPython) — the hot path must be
    JVM expressions or Arrow (ArrowEvalPython/MapInPandas); the single
    allowed site is q_udf_scalar's documented contrast case.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as contract

QUERIES = contract.queries()

ALLOW_CARTESIAN = {"q_join_cross"}
ALLOW_ROW_PYTHON = {"q_udf_scalar"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(spark, sf_dir, name):
    plan = _plan(QUERIES[name](spark, sf_dir))
    if name not in ALLOW_CARTESIAN:
        assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross join"
    if name not in ALLOW_ROW_PYTHON:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
