"""Bounded within-cell self-pair enumeration — the shared hot-cell guard.

Several operators enumerate all pairs of rows that share a coarse CELL key
(quantizer cell for embedding dedup, customer basket for item-item CF, grid
cell for spatial neighbors). The plain equi-self-join is exact and cheap
until ONE cell is skewed: a cell with c members puts a c² candidate block
through a single task — straggler, then OOM, at 100 TB scale (the class of
failure VERDICT r9 item 5 flagged for q_dedup_embedding).

:func:`bounded_cell_self_join` is the shared fix. Cells above ``cap`` are
sub-split into s = ceil(c/cap) xxhash buckets and the join enumerates the
s(s+1)/2 sub-block PAIRS on (cell, sub_i, sub_j) keys with i ≤ j:

* every unordered within-cell pair still meets EXACTLY once — its
  lower-sub member arrives on the A side; diagonal blocks (i == j) see
  both orderings and dedupe by id order — so output semantics (and any
  DuckDB oracle) are unchanged: this bounds task granularity, it does not
  sample (unlike the Jaccard hub cap, which is a documented approximation);
* the worst task sees ~cap² candidate work instead of c²;
* replication cost is ~s/2 extra copies of hot-cell rows only; dispatch is
  ADAPTIVE on one support-scale max-cell probe, so corpora with no hot cell
  keep the plain join and pay nothing (measured: the always-on sub-split
  plumbing alone cost ~30% at sf10-mut — BASELINE.md r10).

Column contract: the result carries every input column twice, prefixed
``a_`` / ``b_``. Side assignment is arbitrary on the sub-split path, so
callers needing a canonical pair order must normalize with
least/greatest — symmetric payloads (cosine, co-counts) don't care.
All internal working columns use ``__bcsj_*`` / ``__bbcj_*`` names so a
caller frame that happens to carry e.g. ``blk`` or ``n_a`` can never
collide with the guard's plumbing (ADVICE r10); the only reserved names
are those dunder prefixes themselves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pair rows per output partition of the cost-sized join (the
# graph._evidence_partitions rule, restated here to avoid a circular
# import): ~2M pair rows keeps each task's partial-agg / filter working
# set ≈ tens of MB, so 32 concurrent local tasks fit a default 8 GB heap.
_PAIR_ROWS_PER_PART = 2_000_000


def _pair_partitions(total_pairs: int, base: int) -> int:
    """Never below the session width, one partition per
    {_PAIR_ROWS_PER_PART} expected pair rows above it, capped at 4096
    (AQE coalesces unneeded ones at low SF)."""
    return max(base, min(4096, 1 + total_pairs // _PAIR_ROWS_PER_PART))


def bounded_cell_self_join(
    df: DataFrame,
    cell_col: str,
    id_col: str,
    cap: int,
    cells: DataFrame | None = None,
    return_parts: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """All unordered pairs of distinct rows sharing ``cell_col``, each
    exactly once, as ``a_*`` / ``b_*`` columns; per-task candidate work
    bounded by ~``cap``². ``cells`` may pass a precomputed
    (cell_col, c_sz) frame to avoid a second support-scale agg.

    The join's exchange is COST-SIZED from the exact expected pair count
    Σ c(c−1)/2 (a support-scale agg over ``cells``) instead of
    inheriting the session shuffle width: at sf10 item-item CF emits
    ~1.3e9 raw pair rows, and 32 inherited partitions put a ~40M-row
    partial-agg hash map through every task — measured
    AGGREGATE_OUT_OF_MEMORY on the default 8 GB heap (r10, the same
    inherited-width failure the pagerank exchange fix closed). Both
    probe scalars (max cell, total pairs) come from ONE .first().

    ``return_parts=True`` also returns the chosen width: a caller that
    AGGREGATES over pair-derived keys must re-use it for its own
    exchange — near-unique pair keys defeat the map-side combine, so the
    agg's final hash maps see ~all pair rows and a session-width (32)
    exchange re-creates the OOM one stage later (measured: CF's pair agg
    died at stage 59 after the join itself was fixed)."""
    spark = df.sparkSession
    try:
        base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        base = 32
    if cells is None:
        cells = df.groupBy(cell_col).agg(F.count(F.lit(1)).alias("c_sz"))
    stats = cells.agg(
        F.max("c_sz"),
        F.sum(F.col("c_sz").cast("double") * (F.col("c_sz") - 1) / 2),
    ).first()
    max_cell = stats[0] or 0
    parts = _pair_partitions(int(stats[1] or 0), base)

    def side(prefix: str, extra: dict) -> DataFrame:
        cols = [F.col(c).alias(f"{prefix}_{c}") for c in df.columns]
        return extra["frame"].select(*cols, *extra["keys"])

    if max_cell <= cap:
        a = side("a", {"frame": df, "keys": []}).repartition(
            parts, f"a_{cell_col}"
        )
        b = side("b", {"frame": df, "keys": []}).repartition(
            parts, f"b_{cell_col}"
        )
        out = a.join(
            b,
            (F.col(f"a_{cell_col}") == F.col(f"b_{cell_col}"))
            & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")),
        )
        return (out, parts) if return_parts else out

    # Attach split factors via the HOT cells only (c_sz > cap — at most
    # N/cap rows, usually a handful) with a LEFT join and no broadcast
    # hint: the full (cell, n_sub) frame is one row per distinct cell,
    # which SCALES with the corpus (per-customer for item-item CF), and a
    # forced hint on a scaling frame is exactly what the r6 broadcast
    # policy freeze forbids — the allowlist test caught this helper's
    # first draft doing it. AQE broadcasts the hot set when it is small
    # and falls back to a co-keyed shuffle join when it is not.
    hot = cells.filter(F.col("c_sz") > cap).select(
        cell_col,
        F.ceil(F.col("c_sz") / F.lit(cap)).cast("int").alias("__bcsj_n_sub"),
    )
    es = (
        df.join(hot, cell_col, "left")
        .withColumn("__bcsj_n_sub", F.coalesce(F.col("__bcsj_n_sub"), F.lit(1)))
        .withColumn(
            "__bcsj_sub", F.pmod(F.xxhash64(F.col(id_col)), F.col("__bcsj_n_sub")).cast("int")
        )
    )
    a = side(
        "a",
        {
            "frame": es,
            "keys": [
                F.col("__bcsj_sub").alias("__bcsj_ib"),
                F.explode(
                    F.sequence(F.col("__bcsj_sub"), F.col("__bcsj_n_sub") - 1)
                ).alias("__bcsj_jb"),
            ],
        },
    ).repartition(parts, f"a_{cell_col}", "__bcsj_ib", "__bcsj_jb")
    b = side(
        "b",
        {
            "frame": es,
            "keys": [
                F.explode(F.sequence(F.lit(0), F.col("__bcsj_sub"))).alias("__bcsj_ib"),
                F.col("__bcsj_sub").alias("__bcsj_jb"),
            ],
        },
    )
    out = a.join(
        b.withColumnRenamed("__bcsj_ib", "__bcsj_b_ib")
        .withColumnRenamed("__bcsj_jb", "__bcsj_b_jb")
        .repartition(parts, f"b_{cell_col}", "__bcsj_b_ib", "__bcsj_b_jb"),
        (F.col(f"a_{cell_col}") == F.col(f"b_{cell_col}"))
        & (F.col("__bcsj_ib") == F.col("__bcsj_b_ib"))
        & (F.col("__bcsj_jb") == F.col("__bcsj_b_jb"))
        # diagonal blocks see both orderings of a pair — keep one; cross
        # blocks see exactly one ordering — keep it whichever way round
        & (
            (F.col("__bcsj_ib") != F.col("__bcsj_jb"))
            | (F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        ),
    ).drop("__bcsj_ib", "__bcsj_jb", "__bcsj_b_ib", "__bcsj_b_jb")
    return (out, parts) if return_parts else out


def bounded_bipartite_cell_join(
    a_df: DataFrame,
    b_df: DataFrame,
    cell_cols: Sequence[str],
    a_id_col: str,
    b_id_col: str,
    cap: int,
    return_parts: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """The BIPARTITE sibling of :func:`bounded_cell_self_join`, for
    stencil-shaped cell joins (grid DBSCAN's points × 3×3-replicated
    points, probe × bucketed-corpus ANN): every (a, b) pair whose rows
    share all ``cell_cols`` values, each exactly once, as ``a_*`` /
    ``b_*`` columns. No pair-order canonicalization is applied — the
    sides are distinct roles, so each ordered (a, b) is the output unit
    and self/symmetry filtering stays with the caller.

    Hot-cell scheme (richer than the self-join's triangular blocks, per
    the r10 handoff note): a cell hot on EITHER side splits A into
    n_a = ceil(a_sz/cap) and B into n_b = ceil(b_sz/cap) xxhash blocks,
    and the join enumerates the full n_a × n_b block GRID — each A row
    replicates n_b times, each B row n_a times (hot cells only), and a
    pair meets exactly once at (block(a), block(b)). Worst task work is
    ~cap² instead of a_sz × b_sz. Dispatch stays adaptive on one
    support-scale probe (max a_sz, max b_sz, Σ a_sz·b_sz — one
    ``.first()``), which also cost-sizes the exchange the way the
    self-join does; cold corpora pay nothing."""
    spark = a_df.sparkSession
    try:
        base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        base = 32
    keys = list(cell_cols)
    ca = a_df.groupBy(*keys).agg(F.count(F.lit(1)).alias("a_sz"))
    cb = b_df.groupBy(*keys).agg(F.count(F.lit(1)).alias("b_sz"))
    occ = ca.join(cb, keys)
    stats = occ.agg(
        F.max("a_sz"),
        F.max("b_sz"),
        F.sum(F.col("a_sz").cast("double") * F.col("b_sz")),
    ).first()
    max_a, max_b = stats[0] or 0, stats[1] or 0
    parts = _pair_partitions(int(stats[2] or 0), base)
    a_keys = [f"a_{k}" for k in keys]
    cell_eq = [F.col(f"a_{k}") == F.col(f"b_{k}") for k in keys]

    def side(prefix: str, src: DataFrame, frame: DataFrame, keycols) -> DataFrame:
        cols = [F.col(c).alias(f"{prefix}_{c}") for c in src.columns]
        return frame.select(*cols, *keycols)

    if max_a <= cap and max_b <= cap:
        a = side("a", a_df, a_df, []).repartition(parts, *a_keys)
        b = side("b", b_df, b_df, []).repartition(
            parts, *[f"b_{k}" for k in keys]
        )
        cond = cell_eq[0]
        for c in cell_eq[1:]:
            cond = cond & c
        out = a.join(b, cond)
        return (out, parts) if return_parts else out

    # Split factors ride a LEFT join against the HOT cells only (same
    # no-broadcast-hint rationale as the self-join path: the full cell
    # frame scales with the corpus; AQE picks the strategy).
    hot = occ.filter((F.col("a_sz") > cap) | (F.col("b_sz") > cap)).select(
        *keys,
        F.ceil(F.col("a_sz") / F.lit(cap)).cast("int").alias("__bbcj_n_a"),
        F.ceil(F.col("b_sz") / F.lit(cap)).cast("int").alias("__bbcj_n_b"),
    )

    def blocked(df: DataFrame, id_col: str, n_col: str) -> DataFrame:
        return (
            df.join(hot, keys, "left")
            .withColumn("__bbcj_n_a", F.coalesce(F.col("__bbcj_n_a"), F.lit(1)))
            .withColumn("__bbcj_n_b", F.coalesce(F.col("__bbcj_n_b"), F.lit(1)))
            .withColumn(
                "__bbcj_blk",
                F.pmod(F.xxhash64(F.col(id_col)), F.col(n_col)).cast("int"),
            )
        )

    ea = blocked(a_df, a_id_col, "__bbcj_n_a")
    eb = blocked(b_df, b_id_col, "__bbcj_n_b")
    a = side(
        "a",
        a_df,
        ea,
        [
            F.col("__bbcj_blk").alias("__bbcj_ia"),
            F.explode(F.sequence(F.lit(0), F.col("__bbcj_n_b") - 1)).alias("__bbcj_jb"),
        ],
    ).repartition(parts, *a_keys, "__bbcj_ia", "__bbcj_jb")
    b = side(
        "b",
        b_df,
        eb,
        [
            F.explode(F.sequence(F.lit(0), F.col("__bbcj_n_a") - 1)).alias("__bbcj_b_ia"),
            F.col("__bbcj_blk").alias("__bbcj_b_jb"),
        ],
    ).repartition(parts, *[f"b_{k}" for k in keys], "__bbcj_b_ia", "__bbcj_b_jb")
    cond = (F.col("__bbcj_ia") == F.col("__bbcj_b_ia")) & (F.col("__bbcj_jb") == F.col("__bbcj_b_jb"))
    for c in cell_eq:
        cond = cond & c
    out = a.join(b, cond).drop("__bbcj_ia", "__bbcj_jb", "__bbcj_b_ia", "__bbcj_b_jb")
    return (out, parts) if return_parts else out
