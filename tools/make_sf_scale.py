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

NEAR-DUP-RATE-CONTROLLED variant (--mutate, VERDICT r8 item 5): at high
factors the plain replicator is fixture-QUADRATIC for content-pair ops —
100 byte-identical copies per document put C(100,2)=4950 candidate pairs
in every LSH bucket, a stress no real corpus exhibits (near-dup rates stay
~constant as a corpus grows). --mutate rewrites documents.text and
embeddings.embedding per copy so that copies 2k and 2k+1 form a NEAR-dup
pair (light ~2%-token / ε-noise mutation) while different pair-groups are
far apart (60% of token positions group-salted → 3-gram shingle Jaccard
~0.06, well under every θ; embeddings pushed cos≈0.3 apart, under the
0.35-distance near threshold). Per-cluster near-dup pairs are then
factor/2 — LINEAR in corpus size — so MinHash/LSH/setsim/containment/
semantic-dedup get real scale rows instead of fixture-quadratic skips.
All mutations are deterministic (position hashes keyed by the ORIGINAL
doc id, fixed numpy seeds) — Spark and DuckDB read the same parquet, so
oracle compares are unaffected.

Usage: python tools/make_sf_scale.py [factor] [out_dir] [--mutate]
  factor  : multiple of sf0.1 to build (default 10 ⇒ sf1)
  out_dir : default /root/repo/.scratch/sf1
  --mutate: near-dup-rate-controlled documents/embeddings (see above)
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


# --mutate knobs: group size 2 (consecutive copies pair up), 60% of token
# positions carry the group salt, ~2% carry the intra-group light salt,
# embeddings get a per-group random ROTATION (cross-group cos ~ N(0, 1/8))
# plus intra-group noise ε = 0.01 (cos ≈ 0.9999)
_GROUP = 2
_HEAVY_PCT = 60
_LIGHT_PCT = 2
_EMB_EPS = 0.01


def _mutate_text(text: str, orig_id: int, copy: int) -> str:
    """Deterministic per-copy token rewrite. Position selection is keyed by
    the ORIGINAL doc id (identical across copies), so the same positions
    mutate in every copy — group salt values differ across groups (far),
    light salt only on the odd member of each pair-group (near)."""
    g, sub = copy // _GROUP, copy % _GROUP
    toks = text.split()
    out = []
    for j, tok in enumerate(toks):
        h = (orig_id * 1_000_003 + j * 7_919) % 100
        if h < _HEAVY_PCT:
            tok = f"{tok}g{g}"
        elif sub and h < _HEAVY_PCT + _LIGHT_PCT:
            tok = f"{tok}x"
        out.append(tok)
    return " ".join(out)


def _mutate_documents(t: pa.Table, orig_ids, copy: int) -> pa.Table:
    texts = [
        _mutate_text(txt, oid, copy)
        for txt, oid in zip(t["text"].to_pylist(), orig_ids)
    ]
    t = t.set_column(
        t.schema.get_field_index("text"), t.schema.field("text"),
        pa.array(texts, type=t.schema.field("text").type),
    )
    if "n_chars" in t.schema.names:  # keep the length column self-consistent
        t = t.set_column(
            t.schema.get_field_index("n_chars"), t.schema.field("n_chars"),
            pa.array([len(s) for s in texts],
                     type=t.schema.field("n_chars").type),
        )
    return t


def _mutate_embeddings(t: pa.Table, copy: int) -> pa.Table:
    """Per-pair-group RANDOM ROTATION of the embedding space (QR of a
    seeded Gaussian), plus ε-noise on the odd group member. Rotation is
    the clean instrument here: it preserves unit norms and every
    WITHIN-group geometry exactly (different originals keep their original
    cosines — no per-group blob, uniform LSH buckets), while the same
    original across two groups becomes v·(Q₁ᵀQ₂)v — a random-direction
    cosine, N(0, 1/√dim), overwhelmingly below the 0.35 near threshold.
    (Additive noise can't do this: its cross term α²·u₁·u₂ has σ≈0.1 at
    dim 64, leaking ~7% of cross-group pairs above the threshold.) The
    coarse ``label`` cell is remapped per pair-group too — a real
    quantizer would assign the now-decorrelated groups different cells,
    and leaving the label shared would keep every label-bucketed candidate
    join quadratic in the factor no matter what the vectors say."""
    import numpy as np

    g, sub = copy // _GROUP, copy % _GROUP
    field = t.schema.field("embedding")
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    q, r = np.linalg.qr(
        np.random.RandomState(70_000 + g).standard_normal((dim, dim))
    )
    q *= np.sign(np.diag(r))  # fix QR sign ambiguity: deterministic rotation
    out = vecs @ q.T
    if sub:
        out = out + np.random.RandomState(90_000 + copy).standard_normal(
            vecs.shape
        ) * _EMB_EPS
    out /= np.linalg.norm(out, axis=1, keepdims=True)
    arr = pa.array(
        [row for row in out.astype(np.float32).tolist()], type=field.type
    )
    t = t.set_column(t.schema.get_field_index("embedding"), field, arr)
    lfield = t.schema.field("label")
    lmax = int(pc.max(t["label"]).as_py() or 0)
    lstride = 10 ** len(str(lmax + 1))
    labels = pc.add(t["label"], g * lstride).cast(lfield.type)
    return t.set_column(t.schema.get_field_index("label"), lfield, labels)


def build(factor: int, out_dir: Path, mutate: bool = False) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    strides = _strides()
    for table, cols in KEYS.items():
        src = pq.read_table(SRC / f"{table}.parquet")
        if not cols:
            pq.write_table(src, out_dir / f"{table}.parquet")
            print(f"{table}: {src.num_rows} rows (single copy)")
            continue
        orig_doc_ids = (
            src["doc_id"].to_pylist()
            if mutate and table == "documents"
            else None
        )
        # write one shifted whole-table copy per iteration: peak memory is
        # ONE copy of the source table regardless of factor — plus, under
        # --mutate, the text/embedding columns of that copy materialized
        # as Python lists (factor 1000 would need ~60 GB with the old
        # concat-then-write; the parquet schema is taken verbatim from the
        # source table, so physical types survive exactly as before). If a
        # much larger SOURCE fixture ever feeds this, mutate per record
        # batch instead of per full table (ADVICE r9) — today's sources
        # are ≤150 MB so one copy + pylists is ≪1 GB.
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
                if mutate and table == "documents":
                    t = _mutate_documents(t, orig_doc_ids, i)
                elif mutate and table == "embeddings":
                    t = _mutate_embeddings(t, i)
                w.write_table(t)
                n_rows += t.num_rows
        tag = " mutated" if mutate and table in ("documents", "embeddings") else ""
        print(f"{table}: {n_rows} rows ({factor} copies{tag})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--mutate"]
    mutate = "--mutate" in sys.argv[1:]
    factor = int(args[0]) if args else 10
    out = Path(args[1]) if len(args) > 1 else Path("/root/repo/.scratch/sf1")
    build(factor, out, mutate=mutate)
