"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet dir,
then compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by stringified tuple — stricter than a
hash: mismatches show the first differing row).
"""

from __future__ import annotations

import datetime as dt
import math
import re
from typing import Any

import duckdb

from finegourmet_spark.sources.testdata import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _is_scalar_na(v: Any) -> bool:
    """True for scalar missing sentinels (None, float NaN, pandas NaT,
    Decimal('NaN')) — the values the mixed-dtype check must ignore.
    Non-scalars (lists, arrays) are never 'na' here: pd.isna would return
    an elementwise array for them, so they are checked as real values."""
    import pandas as pd

    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _canon(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — exact match required
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:
        pass
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _canon_arrow_type(t: str) -> str:
    """Canonical type tag for a DuckDB Arrow field. Int widths collapse to
    one tag — the driver is proven tolerant of int32-vs-int64 (r2: q_pivot,
    q_window_rank etc. were hash-green with rank() int32 vs DuckDB BIGINT) —
    but decimal-vs-int is NOT tolerated (r2: q_pack_sequences hash-failed on
    DuckDB HUGEINT → decimal128(38,0) vs Spark BIGINT). List types
    normalize the (engine-specific) element field name away — DuckDB emits
    list<l: int64>, Spark's canon emits list<item: int> — and canonicalize
    the element type recursively."""
    t = t.replace("large_string", "string").replace("large_utf8", "string")
    t = t.replace("utf8", "string")
    m = re.fullmatch(r"(?:large_)?list<\w+: (.*)>", t)
    if m:
        return f"list<item: {_canon_arrow_type(m.group(1))}>"
    if t in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"):
        return "int"
    if t.startswith("timestamp"):
        return "timestamp"
    return t


def _canon_spark_type(dt) -> str:
    import pyspark.sql.types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date32[day]"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal128({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<item: {_canon_spark_type(dt.elementType)}>"
    return str(dt)


def type_problems(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Compare Spark schema vs the DuckDB oracle's Arrow schema (canonical
    tags). The value comparison in ``compare`` stringifies, so an int-typed
    Spark column vs a HUGEINT/decimal oracle column passes locally but fails
    the driver's dtype-sensitive hash — this catches it before a round ends."""
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        # LIMIT 0 wrapper: the schema comes from planning, not a second full
        # execution of the oracle (r3 review — the unrolled CC oracle is
        # expensive; compare() already runs it once for the values)
        oschema = (
            con.execute(f"SELECT * FROM ({oracle_sql}) LIMIT 0")
            .fetch_arrow_table()
            .schema
        )
    finally:
        con.close()
    otypes = {f.name: _canon_arrow_type(str(f.type)) for f in oschema}
    stypes = {f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    if set(otypes) != set(stypes):
        return [f"columns differ: spark={sorted(stypes)} oracle={sorted(otypes)}"]
    return [
        f"type mismatch on {k}: spark={stypes[k]} oracle={otypes[k]}"
        for k in sorted(stypes)
        if stypes[k] != otypes[k]
    ]


def driver_canon_problems(cols: list[str], rows: list[tuple], side: str) -> list[str]:
    """Simulate the driver's pandas canonicalization: it sorts the result
    frame with ``sort_values`` over the name-sorted columns before hashing.
    A raw list/map/struct-typed column is unhashable in pandas' lexsort and
    errors the driver row before comparison (r4's only hard FAIL,
    q_inverted_index — VERDICT r4 item 1). This fails loud locally so a
    non-canonicalizable result contract never burns a driver slot again."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=cols)
    try:
        pdf.sort_values(by=sorted(cols))
    except TypeError as e:
        return [f"{side} result not driver-canonicalizable (raw list/map col?): {e}"]
    # dtype-level check (VERDICT r5 item 6): a sortable-but-MIXED object
    # column (e.g. int and str values interleaved, or date vs datetime) can
    # canonicalize differently per side and break the driver's
    # dtype-sensitive hash without any TypeError locally. Require every
    # object-dtype column to hold ONE python type (None/NaN excluded).
    problems: list[str] = []
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype == object:
            kinds = {
                type(v).__name__
                for v in s
                # pd.isna covers None, float NaN, NaT and Decimal('NaN')
                # uniformly (ADVICE r6); guard non-scalars (lists/arrays),
                # for which pd.isna returns an elementwise array
                if not (_is_scalar_na(v))
            }
            if len(kinds) > 1:
                problems.append(
                    f"{side} column {col!r} mixes object dtypes {sorted(kinds)}"
                    " — schema_match hazard"
                )
    return problems


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty ⇒ parity)."""
    problems: list[str] = list(type_problems(spark_df, oracle_sql, sf_dir))
    srows = spark_df.collect()
    scols = spark_df.columns
    ocols, orows = run_oracle(oracle_sql, sf_dir)
    problems += driver_canon_problems(scols, [tuple(r) for r in srows], "spark")
    problems += driver_canon_problems(ocols, orows, "oracle")

    if sorted(scols) != sorted(ocols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")

    sc = canonical_rows(scols, [tuple(r) for r in srows])
    oc = canonical_rows(ocols, orows)
    if sc != oc:
        n_bad = 0
        for i, (a, b) in enumerate(zip(sc, oc)):
            if a != b:
                problems.append(f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
                n_bad += 1
                if n_bad >= 3:
                    break
        if len(sc) != len(oc):
            problems.append(f"canonical lengths differ: {len(sc)} vs {len(oc)}")
        if not problems:
            problems.append("rows differ (ordering anomaly)")
    return problems
