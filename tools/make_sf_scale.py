"""Scale-up replicator for the driver-generated testdata (VERDICT r2 item 7).

Builds sfN from sf0.1 by unioning N/0.1 key-remapped copies of each table —
FK-consistent (every key column in a copy is offset by copy_index × stride,
with the same stride on both sides of each FK), schema-identical (pyarrow
round-trip preserves physical types, incl. events.ts TIMESTAMP(NANOS)).

This is a PERFORMANCE fixture, not new synthetic truth: every value is a
shifted copy of driver-generated data. Replicated documents/embeddings form
exact-duplicate clusters (10 copies ⇒ 45 candidate pairs per cluster) — a
heavy-duplication corpus, which is precisely the workload dedup exists for;
pair counts stay LINEAR in corpus size (45 × n_docs/10).

Usage: python tools/make_sf_scale.py [factor] [out_dir]
  factor  : multiple of sf0.1 to build (default 10 ⇒ sf1)
  out_dir : default /root/repo/.scratch/sf1
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")

# key columns to offset per table: {table: {column: stride_group}}
# the same stride_group gets the same stride on every side of an FK
KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    # region/nation: shared small dims, single copy
    "region": {},
    "nation": {},
}


def _strides() -> dict[str, int]:
    """stride per group = pow10 ceiling of max key over every column using it
    (pow10 keeps remapped keys human-readable: copy 3 of order 1234 is
    3001234)."""
    maxes: dict[str, int] = {}
    for table, cols in KEYS.items():
        if not cols:
            continue
        t = pq.read_table(SRC / f"{table}.parquet", columns=list(cols))
        for col, group in cols.items():
            m = pc.max(t[col]).as_py()
            maxes[group] = max(maxes.get(group, 0), int(m))
    return {
        g: 10 ** len(str(m)) for g, m in maxes.items()
    }


def build(factor: int, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    strides = _strides()
    for table, cols in KEYS.items():
        src = pq.read_table(SRC / f"{table}.parquet")
        if not cols:
            pq.write_table(src, out_dir / f"{table}.parquet")
            print(f"{table}: {src.num_rows} rows (single copy)")
            continue
        # stream one shifted copy per row group: peak memory is ONE copy
        # regardless of factor (factor 1000 would need ~60 GB with the old
        # concat-then-write; the parquet schema is taken verbatim from the
        # source table, so physical types survive exactly as before)
        n_rows = 0
        with pq.ParquetWriter(out_dir / f"{table}.parquet", src.schema) as w:
            for i in range(factor):
                t = src
                for col, group in cols.items():
                    field = t.schema.field(col)
                    shifted = pc.add(t[col], i * strides[group])
                    t = t.set_column(
                        t.schema.get_field_index(col),
                        field,
                        shifted.cast(field.type),
                    )
                w.write_table(t)
                n_rows += t.num_rows
        print(f"{table}: {n_rows} rows ({factor} copies)")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/root/repo/.scratch/sf1")
    build(factor, out)
