"""Fleet-wide empty-input robustness: every registered query must run (and
return an empty or degenerate-but-well-formed result) when every table has
ZERO rows. A 100 TB pipeline hits empty partitions, empty date slices, and
fresh tenants constantly; an operator that crashes on emptiness is a pager
at 3am. This sweep caught three real bugs on first run (np.linalg.norm
axis error on an empty probe matrix ×2, spark.ml KMeans.fit on an empty
corpus)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as contract
from finegourmet_spark.sources.testdata import TABLES

QUERIES = contract.queries()


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory, sf_dir) -> str:
    d = tmp_path_factory.mktemp("sf0")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_runs_on_zero_rows(spark, empty_dir, name):
    assert QUERIES[name](spark, empty_dir).count() >= 0


@pytest.fixture(scope="session")
def one_row_dir(tmp_path_factory, sf_dir) -> str:
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet").slice(0, 1)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_runs_on_one_row(spark, one_row_dir, name):
    """Single-row inputs reach the degenerate-denominator paths empty
    input can't (variance of one point, trends with one observation,
    quantizers with fewer points than cells). Caught the KMeans
    fewer-points-than-clusters crash on first run."""
    assert QUERIES[name](spark, one_row_dir).count() >= 0
