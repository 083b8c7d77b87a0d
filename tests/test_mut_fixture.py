"""Invariants of the near-dup-rate-controlled fixture (make_sf_scale --mutate).

The mutated replicator exists so content-pair ops see LINEAR near-dup pair
counts at high factors (VERDICT r8 item 5): copies 2k/2k+1 of a document /
embedding form ONE near-dup pair, and everything else sits far below every
similarity threshold the registry uses (Jaccard θ=1/2, ML-join 0.8,
containment 4/5, embedding cos ≥ 0.35). These tests pin the similarity
STRUCTURE the fixture promises, on a tiny factor-4 build — if a mutation
knob drifts (heavier/lighter salting, offset α), the sf10 scale rows in
BASELINE.md stop meaning what they claim.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from make_sf_scale import build  # noqa: E402


@pytest.fixture(scope="module")
def mut_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("mut") / "f4"
    build(4, out, mutate=True)
    return out


def _copies(table, col, n_orig, row):
    return [table[col][k * n_orig + row].as_py() for k in range(4)]


def test_document_mutation_structure(mut_dir):
    docs = pq.read_table(mut_dir / "documents.parquet")
    n = docs.num_rows // 4

    def shingles(text):
        toks = text.split()
        return {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}

    def jac(a, b):
        return len(a & b) / len(a | b)

    for row in (0, 7, 131):
        c = [shingles(t) for t in _copies(docs, "text", n, row)]
        # intra-pair-group: a near-dup at every registry threshold
        assert jac(c[0], c[1]) > 0.6
        assert jac(c[2], c[3]) > 0.6
        # cross-group: far below every threshold
        assert jac(c[0], c[2]) < 0.2
        assert jac(c[1], c[3]) < 0.2
    # n_chars stays self-consistent with the mutated text
    assert docs["n_chars"][0].as_py() == len(docs["text"][0].as_py())


def test_embedding_mutation_structure(mut_dir):
    emb = pq.read_table(mut_dir / "embeddings.parquet")
    n = emb.num_rows // 4
    rows = range(0, n, max(1, n // 200))  # ~200 sampled originals
    intra, cross = [], []
    for row in rows:
        v = [np.array(x) for x in _copies(emb, "embedding", n, row)]
        for x in v:  # unit norm preserved
            assert abs(float(np.linalg.norm(x)) - 1.0) < 1e-3
        intra += [float(v[0] @ v[1]), float(v[2] @ v[3])]
        cross += [float(v[0] @ v[2]), float(v[1] @ v[3])]
    # intra-pair-group: a near-dup, every sampled pair
    assert min(intra) > 0.95
    # cross-group same-original: rotation makes it a random-direction
    # cosine ~ N(0, 1/sqrt(64)) — a STATISTICAL guarantee (P[>0.35] ≈
    # 0.3%), so bound the quantile and the tail, not every sample
    cross = sorted(cross)
    assert cross[int(len(cross) * 0.98)] < 0.35
    assert cross[-1] < 0.6
    # different originals within one group keep their original geometry
    # (rotation-invariant) — no per-group blob
    a = np.array(emb["embedding"][0].as_py())
    b = np.array(emb["embedding"][1].as_py())
    assert abs(float(a @ b)) < 0.5
    # labels are remapped per pair-group (quantizer-faithful cells): the
    # same original's cell differs across groups, matches within a group
    l0, l1, l2, l3 = _copies(emb, "label", n, 0)
    assert l0 == l1 and l2 == l3 and l0 != l2


def test_fk_consistency_preserved(mut_dir):
    # mutation must not disturb the key remapping: every lineitem orderkey
    # still joins an order in its own copy
    import duckdb

    con = duckdb.connect()
    orphans = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{mut_dir}/lineitem.parquet') l
        WHERE NOT EXISTS (
          SELECT 1 FROM read_parquet('{mut_dir}/orders.parquet') o
          WHERE o.o_orderkey = l.l_orderkey)
        """
    ).fetchone()[0]
    assert orphans == 0
