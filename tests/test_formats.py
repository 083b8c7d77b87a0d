"""Round-trip fidelity per file format: which formats preserve which types,
as executable documentation (sources/formats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finegourmet_spark.sources.formats import FORMATS, read_table, write_table

SCHEMA = (
    "k bigint, s string, d double, dec decimal(12,2), dt date, ts timestamp, flag boolean"
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.sql(
        """
        SELECT CAST(k AS BIGINT) AS k, s, CAST(d AS DOUBLE) AS d,
               CAST(dec AS DECIMAL(12,2)) AS dec, dt, ts, flag
        FROM VALUES
          (1, 'alpha', 1.5, 10.25,
           DATE'2024-01-15', TIMESTAMP'2024-01-15 08:30:00', true),
          (2, 'beta,with,commas', -2.25, 0.10,
           DATE'2024-02-29', TIMESTAMP'2024-02-29 23:59:59', false),
          (3, NULL, NULL, NULL, NULL, NULL, NULL)
        AS t(k, s, d, dec, dt, ts, flag)
        """
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_preserves_rows_and_types(spark, sample, fmt, tmp_path_factory):
    path = str(tmp_path_factory.mktemp(f"fmt_{fmt}")) + "/t"
    write_table(sample, path, fmt)
    back = read_table(spark, path, fmt, SCHEMA)
    # declared schema wins for ALL formats (nullability is advisory in Spark)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in sample.schema.fields
    ]
    got = sorted(
        (tuple(r) for r in back.collect()), key=lambda r: r[0]
    )
    want = sorted((tuple(r) for r in sample.collect()), key=lambda r: r[0])
    assert got == want  # values round-trip bit-exact under the declared schema


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_formats_prune_and_push(spark, sample, fmt, tmp_path_factory):
    """Columnar formats keep the scan optimizations the engine relies on."""
    path = str(tmp_path_factory.mktemp(f"fmtp_{fmt}")) + "/t"
    write_table(sample, path, fmt)
    df = read_table(spark, path, fmt, SCHEMA).filter(F.col("k") > 1).select("k", "s")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,1)]" in plan
    read_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "dec" not in read_line and "flag" not in read_line  # pruned
