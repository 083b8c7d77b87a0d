"""Graph analytics over a co-occurrence graph: degree distribution and a
deterministic damped-mass centrality (PageRank-style), iterative with an
EXACT unrolled-round DuckDB oracle.

Graph construction: parts are nodes; an undirected edge connects two parts
that co-occur in at least one order (the market-basket graph). Pairs per
order are bounded by (items-per-order)², the same bounded fan-out argument
as q_cooccurrence_lift (textops.py) — never an all-pairs product.

Centrality arithmetic is INTEGER ONLY so the iterative result is
bit-identical across engines (the q_lm_bigram_score lesson, BASELINE.md
round-3 notes: never hash post-round doubles):

    mass₀      = 1_000_000 per node
    contrib    = mass div degree              (floor — both engines)
    massₖ₊₁    = 150_000 + (17 · Σ contrib) div 20   (damping 0.85 exact)

Dangling mass is structurally absent: edges are symmetric, so every node
with out-degree has in-degree. This is a defined deterministic variant of
damped PageRank (mass conservation is deliberately traded for floor-exact
cross-engine parity), not a float PageRank approximation.

The oracle unrolls the rounds as materialized CTEs — the same technique the
connected-components oracle uses (dedup.py min-label rounds).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.operators.scratch import (
    pass_log as _pass_log,
    release_pass_shuffles as _release_pass_shuffles,
    scratch_pressure as _scratch_pressure,
    shuffle_scratch_bytes as _shuffle_scratch_bytes,
    sliced_exchange,
)
from finegourmet_spark.sources.testdata import load_table as t

PR_ROUNDS = 3
PR_INIT = 1_000_000
PR_BASE = 150_000  # 0.15 · PR_INIT, the damping complement
PR_TOPN = 20

# The iterated/grace-pass ops execute their heavy plan EAGERLY (so the
# pinned DISK_ONLY frames can be released before returning — ADVICE r8)
# and hand back a metadata-scale literal frame, which makes the returned
# plan useless as scale-review evidence. When SPARK_GRAFT_RECORD_PLANS is
# set (tools/dump_plans.py sets it), each op records the formatted plan
# of its interior exchange here, keyed by query name.
INTERIOR_PLANS: dict[str, str] = {}
_RECORD_PLANS_ENV = "SPARK_GRAFT_RECORD_PLANS"


def _record_interior(name: str, df: DataFrame) -> None:
    import os

    if not os.environ.get(_RECORD_PLANS_ENV):
        return
    try:
        jvm = df.sparkSession.sparkContext._jvm  # noqa: SLF001
        INTERIOR_PLANS[name] = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
    except Exception:
        pass  # plan evidence is best-effort; never fail the query for it

_EDGE_SQL = """
    op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    edges AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) — distinct directed edge list (both directions of each
    undirected pair). The self-join rides ONE hash(ok) exchange: both sides
    are the same plan, so Spark reuses the exchange (ReusedExchange), and
    per-order fan-out is bounded by (items-per-order)²."""
    op = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )


def _degrees(edges: DataFrame) -> DataFrame:
    """(src, d) — NODE-scale out-degree frame; consumers join it at node
    scale (mass ⋈ deg), never annotating the edge list itself — the r3
    timing lesson: the edge⋈deg join at edge scale doubled the build cost."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))


@query(
    "q_graph_degree_dist",
    oracle=f"""
    WITH {_EDGE_SQL}
    SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY d
    """,
)
def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first sanity
    report any graph pipeline runs (spot skewed hubs BEFORE paying for an
    iterative algorithm on them). Two chained aggregations, no join: the
    only edge-scale shuffle is the degree count itself."""
    deg = _degrees(_edges(spark, sf_dir))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


def _pr_round_sql(k: int) -> str:
    """One unrolled oracle round: m{k} ← propagate m{k-1}."""
    return f"""
    m{k} AS (
      SELECT e.dst AS pk,
             {PR_BASE} + (17 * SUM(m.mass // d.d)) // 20 AS mass
      FROM edges e
      JOIN m{k - 1} m ON e.src = m.pk
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )"""


@query(
    "q_graph_pagerank",
    oracle=f"""
    WITH {_EDGE_SQL},
    m0 AS (SELECT src AS pk, CAST({PR_INIT} AS BIGINT) AS mass FROM deg),
    {",".join(_pr_round_sql(k) for k in range(1, PR_ROUNDS + 1))}
    SELECT CAST(rank AS INT) AS rank, pk AS part_id, CAST(mass AS BIGINT) AS mass
    FROM (
      SELECT pk, mass,
             row_number() OVER (ORDER BY mass DESC, pk) AS rank
      FROM m{PR_ROUNDS}
    ) WHERE rank <= {PR_TOPN}
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PR_TOPN} parts by damped-mass centrality after {PR_ROUNDS}
    propagation rounds over the co-purchase graph.

    Plan shape per round (r9: the triangle-census pinning pattern applied
    to the iterated exchange — VERDICT r8 item 3; r10: the claim is now
    actually delivered — VERDICT r9 item 2): the edge list is pinned
    hash(src)-partitioned AND src-sorted, DISK_ONLY, and MATERIALIZED
    EAGERLY before the loop. The eager count() is load-bearing, not a
    style choice: an InMemoryRelation whose cached plan is an
    un-finalized AdaptiveSparkPlan reports UnknownPartitioning, so round
    0 (the only round compiled before the cache's first action) planned
    an ENSURE_REQUIREMENTS re-exchange + re-sort of every edge row on
    top of the pinned scan (the r9 recorded plan, PLANS.md Exchange(25)/
    Sort(26)). Once the cache is final, the scan exposes
    hashpartitioning(src, parts) + src-ordering and every round's
    mass⋈edge join is the promised pure streaming merge-join against the
    pinned blocks — no re-exchange, no per-task sort of edge rows; the
    only memory consumers are the node-scale contribution sort and the
    partial-agg map. The contrib side carries an explicit merge hint so
    the shape is scale-stable: without it Catalyst broadcast-converts
    the join at low SF by building a hash map of the EDGE side (legal,
    but the wrong side at any real scale and useless as plan evidence).
    The exchange is COST-SIZED from the exact directed
    edge count (Σd, a node-scale aggregate) via `_evidence_partitions`
    instead of inheriting the session shuffle width — at sf10 the edge
    list is ~100M rows and 32 inherited partitions would put ~3M-row hash
    builds through every task. The per-node contribution (mass div
    degree) is resolved by a NODE-scale mass⋈deg join BEFORE touching
    edges, so each round shuffles only node-scale frames plus the
    map-side-combined contribution aggregate on dst; per-round masses are
    localCheckpointed (lineage would double per round otherwise, the CC
    lesson, dedup.py:204). The final top-{PR_TOPN} is collected
    (metadata-scale) so the pinned edge blocks are RELEASED before
    returning (ADVICE r8), and the {PR_TOPN}-row rank window is
    explicitly metadata-scale."""
    from pyspark import StorageLevel

    try:
        base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        base_parts = 32
    deg = _degrees(_edges(spark, sf_dir)).localCheckpoint()  # node-scale
    n_edges = int(deg.agg(F.sum("d")).first()[0] or 0)  # exact Σd, directed
    parts = _evidence_partitions(n_edges, base_parts)
    ej = (
        _edges(spark, sf_dir)
        .repartition(parts, "src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.DISK_ONLY)
    )
    # Materialize NOW: finalizes the cached AdaptiveSparkPlan so the scan
    # exposes hashpartitioning(src, parts) + ordering to every round's SMJ
    # (an unfinalized cached plan reports UnknownPartitioning and round 0
    # re-exchanges + re-sorts the whole edge list — VERDICT r9 item 2).
    ej.count()
    try:
        mass = deg.select("src", F.lit(PR_INIT).cast("long").alias("mass"))
        for rnd in range(PR_ROUNDS):
            contrib = (
                mass.join(deg, "src")  # node ⋈ node, broadcast-scale
                .select("src", F.expr("mass div d").alias("c"))
                .repartition(parts, "src")
                .sortWithinPartitions("src")  # co-sorted → streaming SMJ
                .hint("merge")  # pin the SMJ shape at every SF
            )
            nxt = (
                ej.join(contrib, "src")
                .groupBy("dst")
                .agg(
                    (F.lit(PR_BASE) + F.expr("(17 * sum(c)) div 20"))
                    .cast("long")
                    .alias("mass")
                )
                .select(F.col("dst").alias("src"), "mass")
            )
            if rnd == 0:
                _record_interior("q_graph_pagerank", nxt)
            mass = nxt.localCheckpoint()  # node-scale pin, flat lineage
        top_rows = (
            mass.orderBy(F.col("mass").desc(), F.col("src"))
            .limit(PR_TOPN)
            .collect()
        )
    finally:
        ej.unpersist(blocking=False)
    top = (
        spark.createDataFrame(top_rows, "src bigint, mass bigint")
        .orderBy(F.col("mass").desc(), F.col("src"))
        .limit(PR_TOPN)
    )
    # rank over PR_TOPN rows only — metadata-scale single partition by design
    w = Window.orderBy(F.col("mass").desc(), F.col("src"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("src").alias("part_id"),
        "mass",
    )


@query(
    "q_graph_triangles",
    oracle=f"""
    WITH {_EDGE_SQL},
    dd AS (SELECT src AS n, d FROM deg),
    oriented AS (
      SELECT e.src AS u, e.dst AS v, dv.d AS dv
      FROM edges e
      JOIN dd du ON e.src = du.n
      JOIN dd dv ON e.dst = dv.n
      WHERE (du.d < dv.d) OR (du.d = dv.d AND e.src < e.dst)
    ),
    wedges AS (
      SELECT x.v AS b, y.v AS c
      FROM oriented x JOIN oriented y ON x.u = y.u
      WHERE (x.dv < y.dv) OR (x.dv = y.dv AND x.v < y.v)
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM wedges w JOIN oriented z ON w.b = z.u AND w.c = z.v
    ),
    sizes AS (
      SELECT CAST((SELECT count(*) FROM dd) AS BIGINT) AS n_nodes,
             CAST((SELECT count(*) FROM oriented) AS BIGINT) AS n_edges,
             CAST((SELECT count(*) FROM wedges) AS BIGINT) AS n_wedges
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CAST(CASE WHEN n_wedges = 0 THEN 0
                ELSE (3000000 * n_triangles) // n_wedges END AS BIGINT)
             AS closure_ppm
    FROM sizes, tri
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global closure coefficient of the co-purchase
    graph, via DEGREE-ORIENTED wedge counting (the MapReduce-era
    Suri-Vassilvitskii / Cohen scheme): orient every undirected edge from
    its lower-(degree, id) endpoint to the higher one, enumerate wedges
    only between each node's HIGHER-ordered neighbors, and close them
    against the oriented edge list.

    The wedge⋈edge closure exchange is COST-SIZED (the same
    `_evidence_partitions` rule the Jaccard pipeline uses): the oriented
    wedge count is exactly Σ C(outdeg, 2) — a node-scale aggregate over
    the already-pinned oriented frame — so the (b, c) shuffle is sized
    before it runs instead of inheriting spark.sql.shuffle.partitions.
    At sf10 (~4e9 wedges) the default 32 partitions put 1/32 of the
    edge-scale hash build AND 125M streamed wedge rows through each of
    32 concurrent tasks, which OOMed a 24 GB heap; ~2000 cost-sized
    partitions keep each build a few-MB and let AQE coalesce at low SF.
    The closed form also REPLACES the second full wedge enumeration the
    n_wedges output column used to need — one O(m^1.5) pass, not two.

    SCRATCH-BOUNDED mode (grace-partitioned closure): even cost-sized,
    the closure exchange WRITES every wedge row to local shuffle disk at
    once — ~78 GB at sf10 (~19 B/row on disk, lz4 on near-random longs),
    which filled this host's scratch. When ${_CLOSURE_SCRATCH_ENV} sets a
    per-host scratch budget (GB), the closure splits into K passes by
    ``xxhash64(b, c) % K`` with K sized from the exact wedge count: pass
    i enumerates wedges but keeps only slice i MAP-SIDE (the filter runs
    inside the enumeration stage, before the exchange write), joins it
    against the identically-sliced edge list, and the per-pass triangle
    counts sum. Disk high-water drops K× for K extra probe passes over
    the pinned oriented frame — the classic grace-join time/space trade.
    Unset (the default), the closure is the original one-pass plan: on a
    real cluster shuffle scratch is fleet-wide and the knob belongs to
    the host, not the query.

    Why this survives 100 TB: orientation bounds each node's outgoing
    fan-out by O(sqrt(m)) regardless of hub degree — a celebrity node with
    10^6 co-purchases contributes wedges only through its (rare) neighbors
    of even higher degree, so total wedge volume is O(m^{3/2}) instead of
    the Σd² blowup a naive wedge join hits on skewed graphs. All three
    legs are equi-joins (never a cartesian); the two degree annotations are
    co-keyed edge-scale joins; closure_ppm = floor(3e6·tri/wedges) is
    integer-exact in both engines (nonnegative operands — truncating `div`
    equals flooring `//`).
    """
    from pyspark import StorageLevel

    edges = _edges(spark, sf_dir)
    deg = _degrees(edges)
    du = deg.select(F.col("src").alias("u_n"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v_n"), F.col("d").alias("dv"))
    try:
        base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        base_parts = 32
    # Pin the oriented frame hash(u)-partitioned AND u-sorted, DISK_ONLY:
    # the wedge self-join then needs NO exchange and NO per-task sort —
    # Catalyst sees both children co-partitioned and pre-ordered, so the
    # enumeration task is a pure streaming merge-join whose only memory
    # consumer is the shuffle writer. The r8 sf10 run that sorted inside
    # the enumeration task (sort + SMJ + shuffle write = 3 memory
    # consumers x 32 tasks) exhausted the unified pool; DISK_ONLY also
    # keeps the pinned blocks out of that pool (sequential re-reads are
    # cheap; the frame is edge-scale).
    oriented = (
        edges.join(du, edges["src"] == du["u_n"])
        .join(dv, edges["dst"] == dv["v_n"])
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v"), "dv")
        .repartition(base_parts, "u")
        .sortWithinPartitions("u")
        .persist(StorageLevel.DISK_ONLY)
    )
    x = oriented.select(F.col("u"), F.col("v").alias("b"), F.col("dv").alias("db"))
    y = oriented.select(F.col("u"), F.col("v").alias("c"), F.col("dv").alias("dc"))
    wedges = x.join(y, "u").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    # Exact wedge count in closed form: the (db, b) < (dc, c) tie-break is
    # a total order on each center's out-neighbors, so center u with
    # out-degree k contributes exactly C(k, 2) wedges. A node-scale agg on
    # the PINNED oriented frame — no second O(m^1.5) enumeration. The
    # scalar fetch is metadata-scale (same action class as the CC
    # convergence checks, dedup.py).
    n_wedges_val = int(
        oriented.groupBy("u")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(F.sum(F.expr("(k * (k - 1)) div 2")).alias("w"))
        .first()[0]
        or 0
    )
    parts = _evidence_partitions(n_wedges_val, base_parts)
    closer = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    # shuffle-hash, not sort-merge: the wedge side is O(m^1.5) rows and
    # sorting it dominates the whole query; hash-building on the edge-scale
    # closer side streams the wedges unsorted (sf1: 411M wedges vs 12M
    # edges — the sort was the JVM-pressure hotspot). Both sides are
    # repartitioned to the cost-sized count so each task's hash build is
    # edges/parts rows (see the docstring's sf10 OOM note).
    passes = _closure_passes(n_wedges_val)

    def _closure_count(w_side: DataFrame, c_side: DataFrame, p: int):
        return (
            w_side.repartition(p, "b", "c")
            .join(c_side.repartition(p, "b", "c").hint("shuffle_hash"), ["b", "c"])
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )

    # All outputs are single scalars — collect them eagerly (metadata-
    # scale actions) so the pinned oriented frame can be RELEASED before
    # returning (ADVICE r8: the DISK_ONLY pin otherwise lingers for the
    # whole session). The returned one-row frame is built from literals.
    try:
        n_nodes_val = int(deg.count())
        n_edges_val = int(oriented.count())
        if passes == 1:
            cc = _closure_count(wedges, closer, parts)
            _record_interior("q_graph_triangles", cc)
            n_tri_val = int(cc.first()[0])
        else:
            # grace-partitioned closure (see docstring): slice BOTH sides
            # by the same (b, c) hash so each pass is a complete equi-join
            # on its slice; the slice filter runs map-side inside the
            # enumeration stage, so only 1/passes of the wedge shuffle
            # hits disk at once. The per-pass scalar fetch is metadata-
            # scale; the release call nudges the ContextCleaner to drop
            # the finished pass's shuffle files before the next pass
            # writes its own.
            p = _evidence_partitions(n_wedges_val // passes, base_parts)
            n_tri_val = 0
            for i in range(passes):
                sl = F.pmod(F.xxhash64("b", "c"), F.lit(passes)) == i
                n_tri_val += int(
                    _closure_count(
                        wedges.filter(sl), closer.filter(sl), p
                    ).first()[0]
                )
                _release_pass_shuffles(spark)
                _pass_log(f"triangles closure pass {i + 1}/{passes} done")
    finally:
        oriented.unpersist(blocking=False)
    closure_ppm = (
        0 if n_wedges_val == 0 else (3_000_000 * n_tri_val) // n_wedges_val
    )
    return spark.range(1).select(
        F.lit(n_nodes_val).cast("bigint").alias("n_nodes"),
        F.lit(n_edges_val).cast("bigint").alias("n_edges"),
        F.lit(n_wedges_val).cast("bigint").alias("n_wedges"),
        F.lit(n_tri_val).cast("bigint").alias("n_triangles"),
        F.lit(closure_ppm).cast("bigint").alias("closure_ppm"),
    )


JACC_MIN_COMMON = 3  # minimum shared neighbors for a link-prediction pair
JACC_TOPN = 20


@query(
    "q_graph_jaccard_neighbors",
    oracle=f"""
    WITH {_EDGE_SQL},
    wedges AS (
      SELECT x.dst AS u, y.dst AS v, CAST(count(*) AS BIGINT) AS common
      FROM edges x JOIN edges y ON x.src = y.src AND x.dst < y.dst
      GROUP BY 1, 2
      HAVING count(*) >= {JACC_MIN_COMMON}
    ), cand AS (
      SELECT w.u, w.v, w.common
      FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.src = w.u AND e.dst = w.v)
    ), jac AS (
      SELECT c.u, c.v, c.common,
             CAST((1000000 * c.common)
                  // (du.d + dv.d - c.common) AS BIGINT) AS jaccard_ppm
      FROM cand c
      JOIN deg du ON du.src = c.u
      JOIN deg dv ON dv.src = c.v
    )
    SELECT CAST(row_number() OVER (ORDER BY jaccard_ppm DESC, u, v) AS INT)
             AS rank,
           u AS part_a, v AS part_b, common, jaccard_ppm
    FROM jac
    ORDER BY jaccard_ppm DESC, u, v
    LIMIT {JACC_TOPN}
    """,
)
def q_graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: top-{JACC_TOPN}
    NON-adjacent part pairs by neighborhood Jaccard similarity
    |N(u)∩N(v)| / |N(u)∪N(v)| with ≥{JACC_MIN_COMMON} shared neighbors —
    the common-neighbors recommender ('parts bought alongside the same
    things, never together yet').

    Pipeline: wedge enumeration through each center (ONE hash(src)
    self-join of the edge list — the exchange is planned once and reused),
    u<v canonicalization, pair-count agg, anti-join against the edge list
    to drop already-adjacent pairs, two node-scale degree joins, then
    floor-ppm Jaccard via |N∪| = d(u)+d(v)−common (all integer, nonneg —
    `div` ≡ `//`). Honest scale note: per-center wedge fan-out is C(d,2),
    so hub degrees dominate cost (Σd² worst case) — unlike the triangle
    census, the pair COUNT itself needs every wedge, so the degree-
    orientation trick does not apply; the production knob is a hub cap
    (drop centers above a degree ceiling, documented-approximate) or the
    min-common HAVING pushed into a semi-join prefilter. The final
    metadata-scale rank window runs on the thresholded candidate set.
    `q_graph_jaccard_capped` below IS that production knob — same
    pipeline with per-center fan-out capped at {JACC_HUB_CAP}."""
    return _jaccard_topk(spark, sf_dir, hub_cap=None)


JACC_HUB_CAP = 48  # sampled neighbors per hub center in the capped variant
_PPM = 1_000_000
# ~2M pair keys per task keeps the final hash-agg map ≈ 80 MB — 32
# concurrent local tasks then fit a default 8 GB heap with headroom.
_WEDGE_ROWS_PER_PART = 2_000_000


# _shuffle_scratch_bytes / _scratch_pressure / _release_pass_shuffles /
# _pass_log moved VERBATIM to operators/scratch.py (VERDICT r12 item 4:
# three ops shared the governor; consolidate before a fourth copy
# drifts) and are re-imported above under their old names for the
# existing importers (tests/test_eventflow_graph.py, tools/).


_CLOSURE_SCRATCH_ENV = "SPARK_GRAFT_CLOSURE_SCRATCH_GB"
# measured on-disk bytes per wedge shuffle row (r8 sf10 run: ~4.1e9 wedges
# filled ~78 GB of lz4 shuffle — near-random long pairs barely compress)
_WEDGE_DISK_BYTES = 19
# pair-evidence rows carry a third long (the HT weight / unit count)
_PAIR_DISK_BYTES = 25


def _closure_passes(n_wedges: int, row_bytes: int = _WEDGE_DISK_BYTES) -> int:
    """Number of grace-partition passes for the triangle closure: 1 when
    no per-host scratch budget is set (cluster default — shuffle scratch
    is fleet-wide), else enough passes that one slice's wedge shuffle
    fits the budget. Capped at 64 — past that the enumeration re-probes
    dominate and the host is simply too small for the graph."""
    import os

    budget_gb = float(os.environ.get(_CLOSURE_SCRATCH_ENV, "0") or "0")
    if budget_gb <= 0:
        return 1
    budget_bytes = int(budget_gb * 2**30)
    need = max(1, -(-n_wedges * row_bytes // budget_bytes))
    if need > 64:
        # ADVICE r8: don't proceed silently over-budget — make the
        # host-too-small case visible BEFORE the disk fills.
        import warnings

        per_pass = n_wedges * row_bytes / 64 / 2**30
        warnings.warn(
            f"grace-pass cap hit: {n_wedges} rows x {row_bytes} B needs "
            f"{need} passes to honor {_CLOSURE_SCRATCH_ENV}={budget_gb} GB; "
            f"capped at 64 => ~{per_pass:.1f} GB/pass OVER the budget — "
            f"this host's scratch is likely too small for this graph",
            RuntimeWarning,
            stacklevel=3,
        )
    return min(64, need)


def _evidence_partitions(n_wedges: int, base: int) -> int:
    """Partition count for the (u, v) pair-evidence exchange: never below
    the session default, one partition per {_WEDGE_ROWS_PER_PART} wedge
    rows above it, capped at 4096 (AQE coalesces unneeded ones at low
    SF). sf1's ~1.25e9 wedges → ~628 partitions → ≈80 MB agg maps."""
    return max(base, min(4096, 1 + n_wedges // _WEDGE_ROWS_PER_PART))


def _hub_capped(edges: DataFrame, deg: DataFrame, cap: int) -> DataFrame:
    """Hub-sampled adjacency with Horvitz-Thompson wedge weights: centers
    with degree ≤ ``cap`` keep every neighbor (weight 1e6 ppm); hub
    centers keep the ``cap`` neighbors with the smallest portable md5
    permutation value (the same cross-engine hash the spatial grid uses,
    spatial.py:_coord_col — both engines keep the SAME sample, so the
    capped query has a full DuckDB oracle instead of a rows-only waiver).
    A wedge through a sampled hub survives with inclusion probability
    cap(cap−1)/(d(d−1)), so its HT weight is the floor-ppm inverse
    ``(1e6·d·(d−1)) div (cap·(cap−1))`` — the per-pair weight sum is an
    (almost-)unbiased integer estimate of the true common-neighbor count.
    One src-keyed exchange + a node-scale degree join; the in-partition
    sort is d·log d per center."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("jcap"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("src").orderBy(h, "dst")
    kept = (
        edges.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("src", "dst")
    )
    return kept.join(deg, "src").select(
        "src",
        "dst",
        F.when(F.col("d") <= cap, F.lit(_PPM).cast("bigint"))
        .otherwise(
            F.expr(f"({_PPM}L * d * (d - 1)) div ({cap} * ({cap} - 1))")
        )
        .alias("w_ppm"),
    )


def _jacc_hash_sql() -> str:
    """DuckDB twin of the capping permutation (7 hex chars < 2^28)."""
    return (
        "CAST(('0x' || substring(md5('jcap' || CAST(src AS VARCHAR) || ':'"
        " || CAST(dst AS VARCHAR)), 1, 7)) AS BIGINT)"
    )


@query(
    "q_graph_jaccard_capped",
    oracle=f"""
    WITH {_EDGE_SQL},
    hcap AS (
      SELECT t.src, t.dst,
             CASE WHEN g.d <= {JACC_HUB_CAP} THEN CAST({_PPM} AS BIGINT)
                  ELSE CAST({_PPM} AS BIGINT) * g.d * (g.d - 1)
                       // ({JACC_HUB_CAP} * ({JACC_HUB_CAP} - 1))
             END AS w_ppm
      FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY {_jacc_hash_sql()}, dst) AS rk
        FROM edges) t
      JOIN deg g ON g.src = t.src
      WHERE t.rk <= {JACC_HUB_CAP}
    ),
    wedges AS (
      SELECT x.dst AS u, y.dst AS v,
             CAST(sum(x.w_ppm) AS BIGINT) AS common_ppm
      FROM hcap x JOIN hcap y ON x.src = y.src AND x.dst < y.dst
      GROUP BY 1, 2
      HAVING sum(x.w_ppm) >= {JACC_MIN_COMMON} * {_PPM}
    ), cand AS (
      SELECT w.u, w.v, w.common_ppm
      FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.src = w.u AND e.dst = w.v)
    ), jac AS (
      -- clamp the HT estimate at its logical ceiling 1e6*min(d_u, d_v):
      -- true common can never exceed the smaller neighborhood, and the
      -- clamp keeps the union denominator strictly positive (an
      -- unclamped lucky all-hub-wedge estimate can overshoot 1e6*(du+dv),
      -- where Spark's truncating `div` and DuckDB's flooring `//` would
      -- disagree on the negative result)
      SELECT c.u, c.v,
             least(c.common_ppm,
                   {_PPM}::BIGINT * least(du.d, dv.d)) AS common_ppm,
             CAST(({_PPM} * least(c.common_ppm,
                                  {_PPM}::BIGINT * least(du.d, dv.d)))
                  // ({_PPM}::BIGINT * (du.d + dv.d)
                      - least(c.common_ppm,
                              {_PPM}::BIGINT * least(du.d, dv.d)))
               AS BIGINT) AS jaccard_ppm
      FROM cand c
      JOIN deg du ON du.src = c.u
      JOIN deg dv ON dv.src = c.v
    )
    SELECT CAST(row_number() OVER (ORDER BY jaccard_ppm DESC, u, v) AS INT)
             AS rank,
           u AS part_a, v AS part_b, common_ppm, jaccard_ppm
    FROM jac
    ORDER BY jaccard_ppm DESC, u, v
    LIMIT {JACC_TOPN}
    """,
)
def q_graph_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of :func:`q_graph_jaccard_neighbors`: wedge
    evidence is counted over a HUB-SAMPLED adjacency — each center keeps
    at most {JACC_HUB_CAP} neighbors chosen by a portable md5 permutation
    — and every surviving wedge carries its Horvitz-Thompson inverse-
    inclusion weight d(d−1)/(D(D−1)) in floor ppm, so the per-pair weight
    sum `common_ppm` is an (almost-)unbiased integer estimate of 1e6× the
    true shared-neighbor count. Degrees in the Jaccard denominator stay
    EXACT; the MIN_COMMON floor and the final ranking apply to the
    estimate. Deterministic in both engines (the sample is the same md5
    permutation on both sides), hence a full DuckDB oracle — the driver
    hash-checks the estimator itself, not just row counts.

    Why it scales where the exact form cannot: exact wedge fan-out per
    center is C(d,2) — Σd² in total; this graph's degrees (p50≈115 at
    sf0.01, SF-invariant ≈ items-per-order × orders-per-part) put that at
    ~1.3e9 wedge rows at sf1, the measured 48 GB heap. The sampled form
    is ≤ C({JACC_HUB_CAP},2)=1128 rows per center — LINEAR in node count
    at any density. Width audit (ppm rule): common_ppm ≤ 1e6·d_max²/D —
    degree is entity-bounded (≈150 at any SF), so 1e6·common_ppm peaks
    ~1e12·d_max, far inside BIGINT; nothing here is a data-scaling sum.

    VALIDITY REGIME (measured, r7): an HT estimate ranks reliably only
    when per-pair evidence ≫ the inverse-inclusion weight — i.e. on
    hub-skewed graphs where strong pairs share MANY capped centers. On
    the testdata co-purchase graph the degree distribution is FLAT
    (p50≈115, max≈206 — no hubs) and the exact top-{JACC_TOPN} by Jaccard
    carries only common 5–9; there, top-k-by-estimate selects sampling
    noise (measured recall 0 at every SF, any cap < typical degree — a
    property of the fixture, not a bug), and the EXACT form with its
    cost-sized evidence exchange (now 8 GB-heap-safe at sf1, see
    `_jaccard_topk`) is the correct route. The estimator property itself
    is pinned by tests/test_eventflow_graph.py in its valid regime:
    exact equality (modulo the ppm scale) when the cap exceeds the max
    degree, and bounded relative error on the strongest-evidence pairs
    (true common 74–85 at sf0.001 → measured median rel-err 0.13, max
    0.25 — deterministic, the permutation is fixed)."""
    return _jaccard_topk(spark, sf_dir, hub_cap=JACC_HUB_CAP)


def _jaccard_topk(
    spark: SparkSession, sf_dir: str, hub_cap: int | None
) -> DataFrame:
    """Shared wedge→candidate→Jaccard→top-k pipeline. ``hub_cap=None`` is
    the exact form (unit wedge weights, plain counts); an integer cap
    switches to the HT-weighted sampled form, whose evidence column is
    ppm-scaled (`common_ppm`).

    SCRATCH-BOUNDED mode (shared with the triangle census, r8): when
    ${_CLOSURE_SCRATCH_ENV} sets a per-host scratch budget, the
    pair-evidence exchange splits into K slices by ``xxhash64(u, v) % K``
    — each (u, v) pair lives in exactly ONE slice, so the per-slice
    agg → min-common filter → anti-join (edge side sliced by the SAME
    hash of its join keys) → degree-join → Jaccard is complete for its
    pairs, and the global top-{JACC_TOPN} is the top-{JACC_TOPN} of the
    union of per-slice top-{JACC_TOPN}s (any global winner is a winner
    inside its own slice). Disk high-water drops K× for K extra probe
    passes over the pinned adjacency; the per-slice winners are
    metadata-scale (≤{JACC_TOPN} rows each). The adjacency is pinned
    hash(src)-partitioned + sorted + DISK_ONLY so every enumeration pass
    is a pure streaming merge-join (the triangle-census memory lesson:
    sort + SMJ + shuffle-write in one task exhausts the unified pool)."""
    from pyspark import StorageLevel

    edges = _edges(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    deg = _degrees(edges)
    if hub_cap is None:
        adj = edges.withColumn("w_ppm", F.lit(1).cast("bigint"))
        min_common = JACC_MIN_COMMON
        ev_col = "common"
        den = "(du + dv) - common"
    else:
        adj = _hub_capped(edges, deg, hub_cap)
        min_common = JACC_MIN_COMMON * _PPM
        ev_col = "common_ppm"
        # the estimate rides clamped at 1e6·min(du, dv) — true common never
        # exceeds the smaller neighborhood, and the clamp keeps the union
        # denominator strictly positive (negative-operand div/floor-div
        # semantics differ across engines; see the oracle comment)
        clamp = f"least(common_ppm, {_PPM}L * least(du, dv))"
        den = f"{_PPM}L * (du + dv) - {clamp}"
    try:
        base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        base_parts = 32
    adj = (
        adj.repartition(base_parts, "src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.DISK_ONLY)
    )
    x = adj.select(F.col("src").alias("c_"), F.col("dst").alias("u"), "w_ppm")
    y = adj.select(F.col("src").alias("c2"), F.col("dst").alias("v"))
    # Cost-based sizing of the pair-evidence exchange (the r6 48 GB-heap
    # lesson): the wedge row count is EXACTLY Σ C(min(d, cap), 2), a
    # node-scale aggregate over the degree frame we already need — size
    # the (u, v) shuffle so each task's hash-agg map stays small instead
    # of inheriting spark.sql.shuffle.partitions (32 partitions × ~40M
    # near-unique pair keys each is how sf1 OOMed an 8 GB heap). The
    # scalar fetch is metadata-scale, the same action class as the CC
    # convergence checks (dedup.py).
    eff = F.least(F.col("d"), F.lit(hub_cap)) if hub_cap else F.col("d")
    n_wedges = (
        deg.agg(F.sum(eff * (eff - F.lit(1)) / F.lit(2))).first()[0] or 0
    )
    parts = _evidence_partitions(int(n_wedges), base_parts)
    du = deg.select(F.col("src").alias("un"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("vn"), F.col("d").alias("dv"))
    ev_out = F.col(ev_col) if hub_cap is None else F.expr(clamp)
    num = ev_col if hub_cap is None else clamp

    def _slice_jac(pair_slice, edge_slice, p: int) -> DataFrame:
        pairs = x.join(
            y, (F.col("c_") == F.col("c2")) & (F.col("u") < F.col("v"))
        )
        if pair_slice is not None:
            pairs = pairs.filter(pair_slice)  # map-side, before the exchange
        wedges = (
            pairs.repartition(p, "u", "v")
            .groupBy("u", "v")
            .agg(F.sum("w_ppm").alias(ev_col))
            .filter(F.col(ev_col) >= min_common)
        )
        e = edges if edge_slice is None else edges.filter(edge_slice)
        cand = wedges.join(
            e,
            (wedges["u"] == e["src"]) & (wedges["v"] == e["dst"]),
            "left_anti",
        )
        return (
            cand.join(du, cand["u"] == du["un"])
            .join(dv, cand["v"] == dv["vn"])
            .select(
                "u",
                "v",
                ev_out.alias(ev_col),
                F.expr(f"({_PPM} * {num}) div ({den})")
                .cast("bigint")
                .alias("jaccard_ppm"),
            )
        )

    order = [F.col("jaccard_ppm").desc(), F.col("u"), F.col("v")]
    passes = _closure_passes(int(n_wedges), _PAIR_DISK_BYTES)
    # Both branches collect their top-{JACC_TOPN} winners (metadata-scale)
    # so the pinned edge/adjacency frames can be RELEASED before returning
    # (ADVICE r8: persisted edge-scale blocks otherwise linger for the
    # whole session, eroding the very scratch budget the grace passes
    # protect). The returned frame is rebuilt from the winners — it no
    # longer references the pins.
    try:
        if passes == 1:
            plan = _slice_jac(None, None, parts).orderBy(*order).limit(JACC_TOPN)
            _record_interior(
                "q_graph_jaccard_capped" if hub_cap else "q_graph_jaccard_neighbors",
                plan,
            )
            winners = plan.collect()
        else:
            p = _evidence_partitions(int(n_wedges) // passes, base_parts)
            winners = []
            for i in range(passes):
                winners += (
                    _slice_jac(
                        F.pmod(F.xxhash64("u", "v"), F.lit(passes)) == i,
                        F.pmod(F.xxhash64("src", "dst"), F.lit(passes)) == i,
                        p,
                    )
                    .orderBy(*order)
                    .limit(JACC_TOPN)
                    .collect()
                )
                _release_pass_shuffles(spark)
                _pass_log(
                    f"jaccard slice {i + 1}/{passes} done "
                    f"({len(winners)} winner rows so far)"
                )
    finally:
        adj.unpersist(blocking=False)
        edges.unpersist(blocking=False)
    top = (
        spark.createDataFrame(
            winners,
            f"u bigint, v bigint, {ev_col} bigint, jaccard_ppm bigint",
        )
        .orderBy(*order)
        .limit(JACC_TOPN)
    )
    w = Window.orderBy(*order)
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        ev_col,
        "jaccard_ppm",
    )


RULE_MIN_SUPPORT = 3  # minimum co-basket count for an association rule


@query(
    "q_assoc_rules",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
    nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM op),
    item AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY 1),
    pair AS (
      SELECT a.pk AS ante, b.pk AS cons, CAST(count(*) AS BIGINT) AS n_ab
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY 1, 2
      HAVING count(*) >= {RULE_MIN_SUPPORT}
    )
    SELECT p.ante, p.cons, p.n_ab,
           CAST((1000000 * p.n_ab) // nb.n_orders AS BIGINT) AS support_ppm,
           CAST((1000000 * p.n_ab) // ia.n AS BIGINT) AS confidence_ppm,
           CAST((1000000::HUGEINT * p.n_ab * nb.n_orders)
                // (CAST(ia.n AS HUGEINT) * ic.n) AS BIGINT)
             AS lift_ppm
    FROM pair p
    JOIN item ia ON ia.pk = p.ante
    JOIN item ic ON ic.pk = p.cons
    CROSS JOIN nb
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules A → B over order baskets: for every
    DIRECTED part pair co-bought in ≥{RULE_MIN_SUPPORT} orders, the three
    classic measures — support (share of all baskets), confidence
    (P(B|A) — the directed measure the symmetric q_cooccurrence_lift
    cannot express), and lift — all as integer floor-ppm (nonneg operands,
    `div` ≡ `//`). The lift ratio multiplies TWO data-scaling counts
    (1e6·n_ab·N over n_a·n_c), which passes int64 once N reaches ~1e9
    baskets — so it rides decimal(38,0)/HUGEINT (the q_crosstab_chi2
    width rule); support/confidence numerators are 1e6·n_ab, bounded by
    1e6·N with ~1e3x headroom at 100 TB.

    Scale shape: the basket self-join rides ONE hash(order) exchange with
    per-order fan-out bounded by basket size² (the _edges discipline); the
    pair count is map-side combined and the HAVING prunes the long tail
    BEFORE the two node-scale item joins. The basket-count scalar
    broadcasts."""
    op = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        # consumed three times (basket scalar, item counts, pair self-join
        # both sides) — pin once, the q_graph_triangles lesson
        .localCheckpoint()
    )
    nb = op.agg(F.countDistinct("ok").alias("n_orders"))
    item = op.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("ante"), F.col("b.pk").alias("cons"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= RULE_MIN_SUPPORT)
    )
    ia = item.select(F.col("pk").alias("ante"), F.col("n").alias("n_a"))
    ic = item.select(F.col("pk").alias("cons"), F.col("n").alias("n_c"))
    return (
        pair.join(ia, "ante")
        .join(ic, "cons")
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            "n_ab",
            F.expr("(1000000 * n_ab) div n_orders").cast("bigint").alias(
                "support_ppm"
            ),
            F.expr("(1000000 * n_ab) div n_a").cast("bigint").alias(
                "confidence_ppm"
            ),
            F.expr(
                "(1000000 * cast(n_ab as decimal(38,0)) * n_orders)"
                " div (cast(n_a as decimal(38,0)) * n_c)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


BFS_ROUNDS = 3
BFS_SEED_MOD = 100  # seeds = graph nodes with pk % BFS_SEED_MOD == 0


@query(
    "q_graph_bfs_hops",
    oracle=f"""
    WITH {_EDGE_SQL},
    h0 AS (SELECT DISTINCT src AS node FROM edges WHERE src % {BFS_SEED_MOD} = 0),
    h1 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN h0 ON e.src = h0.node),
    h2 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN h1 ON e.src = h1.node),
    h3 AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN h2 ON e.src = h2.node),
    lvl AS (
      SELECT node, 0 AS hop FROM h0
      UNION ALL SELECT node, 1 FROM h1
      UNION ALL SELECT node, 2 FROM h2
      UNION ALL SELECT node, 3 FROM h3
    ),
    dist AS (SELECT node, MIN(hop) AS hop FROM lvl GROUP BY node)
    SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY hop
    """,
)
def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the co-purchase graph: hop distance
    (0..BFS_ROUNDS) from the seed set (nodes with pk % BFS_SEED_MOD == 0),
    reported as a hop → node-count histogram — the reachability/radius
    diagnostic that pairs with q_graph_degree_dist.

    Spark side runs TEXTBOOK frontier BFS: each round expands only the
    CURRENT frontier (neighbors ⟕ anti-join visited), so per-round work is
    |frontier's incident edges|, not |reached set| — the form that survives
    graphs where the reached set keeps growing. The oracle expands full
    level sets and takes MIN(hop), which is level-set-equivalent to the
    frontier recurrence (a node first appears at exactly its BFS level;
    later reappearances are killed by the MIN). Three rounds are unrolled
    lazily — at this depth lineage stays shallow enough that no
    localCheckpoint pinning is needed (contrast: the open-ended min-label
    loop in dedup.min_label_components).
    """
    edges = _edges(spark, sf_dir).localCheckpoint()  # consumed once per round
    frontier = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % BFS_SEED_MOD == 0)
        .distinct()
    )
    visited = frontier.withColumn("hop", F.lit(0))
    for hop in range(1, BFS_ROUNDS + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.unionByName(nxt.withColumn("hop", F.lit(hop)))
        frontier = nxt
    return visited.groupBy("hop").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


CF_MIN_CO = 2  # pairs below this co-purchase support are noise
CF_TOPN = 3  # similar items kept per item
# Hot-basket cap: max distinct parts per customer a single pair-join task
# block may see (the embedding hot-cell policy, operators/cellpairs.py —
# worst task ~cap² pair rows, replication only on baskets over the cap).
CF_USER_CAP = 4096


@query(
    "q_item_item_cf",
    oracle=f"""
    WITH up AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS pk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nu AS (SELECT pk, CAST(count(*) AS HUGEINT) AS n FROM up GROUP BY pk),
    co AS (
      SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS HUGEINT) AS c
      FROM up a JOIN up b ON a.u = b.u AND a.pk <> b.pk
      GROUP BY 1, 2
      HAVING count(*) >= {CF_MIN_CO}
    ),
    scored AS (
      SELECT co.pa, co.pb, co.c,
             CAST((1000000 * co.c * co.c) // (na.n * nb.n) AS BIGINT)
               AS cos2_ppm
      FROM co
      JOIN nu na ON na.pk = co.pa
      JOIN nu nb ON nb.pk = co.pb
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY pa
                                   ORDER BY cos2_ppm DESC, pb) AS rn
      FROM scored
    )
    SELECT pa AS part_a, pb AS part_b, CAST(c AS BIGINT) AS co_users,
           cos2_ppm, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {CF_TOPN}
    """,
)
def q_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-CF_TOPN most-similar parts
    per part by SQUARED cosine over binary customer-purchase vectors —
    cos²(a,b) = co²/(nₐ·n_b) in floor-ppm, kept integer end-to-end (the
    q_crosstab_chi2 decimal(38,0)/HUGEINT recipe) so ranking is
    engine-identical with no sqrt. Squaring is rank-preserving on [0,1],
    so top-k by cos² IS top-k by cosine.

    Scale shape: collapse to DISTINCT (customer, part) first (user-grain,
    map-side combined), self-join on the customer key — fan-out is
    basket size² per customer, which is EXACTLY the hot-cell exposure
    q_dedup_embedding's r10 audit flagged (one bot/reseller account with
    10⁵ distinct parts = 10¹⁰ pairs through a single task), so the join
    goes through the shared bounded_cell_self_join guard
    (operators/cellpairs.py, cap {CF_USER_CAP}): baskets above the cap
    sub-split into hash blocks, every co-purchase pair still counted
    exactly once, worst task ~cap². The helper yields each unordered
    pair once; co-counts are symmetric, so the ordered (pa, pb) frame
    the ranking needs is the unordered count mirrored — half the agg
    input of the old both-orderings join. Then two ITEM-scale count
    joins onto the pair frame and one per-item top-k window. Item-count
    frames are vocabulary-scale (≪ pairs) and broadcast when small;
    co_users ≥ CF_MIN_CO prunes the pair tail before the joins.

    Two r12 exchange levers (VERDICT r11 item 3 — the raw pair exchange
    was the one pair-family term with no pruning knob):

    * EXACT min-support pre-prune: co(a,b) ≤ min(deg_a, deg_b), so a
      part whose distinct-user degree is < CF_MIN_CO cannot appear in
      any pair that survives the HAVING — dropping its (u, pk) rows
      BEFORE the pair join changes nothing (nu keeps pre-prune counts,
      though for surviving pairs even that is moot). On real
      market-basket corpora the degree-1 tail is typically 40–60% of
      the catalog; on this uniform TPC-H fixture it is measured EMPTY
      (0 of 2M parts at sf10, avg degree 30), so the prune is gated on
      a one-action probe and skipped when there is no tail (forceable
      via SPARK_GRAFT_CF_FORCE_PRUNE=1 — the equality pytest runs both
      paths). The probe doubles as the packed-key range guard.
    * PACKED pair key: the co-count exchange is the op's dominant term
      (~1.3e9 near-unique rows at sf10 — map-side combine can't help),
      so the unordered pair ships as ONE bigint (least<<32 | greatest)
      instead of two, halving the shuffled key bytes; decoded right
      after the agg. Falls back to the two-column key if max(pk) ≥
      2³¹ (TPC-H keys reach that around sf~10⁴ per scaling rules)."""
    from pyspark import StorageLevel

    from finegourmet_spark.operators.cellpairs import bounded_cell_self_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    up = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("pk"))
        .distinct()
        # consumed three times (pair self-join both sides, item counts) —
        # pinned DISK_ONLY, not localCheckpoint: the checkpoint's default
        # MEMORY_AND_DISK blocks held the data-scale (u, pk) frame in the
        # unified pool and starved the pair agg's pages on the default
        # 8 GB heap at sf10 (measured AGGREGATE_OUT_OF_MEMORY, r10);
        # disk blocks keep the reuse without the memory squeeze.
        .persist(StorageLevel.DISK_ONLY)
    )
    up.count()  # materialize the pin before fan-out
    nu = up.groupBy("pk").agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    # ONE item-scale action answers both adaptive questions: is there a
    # sub-support degree tail to prune, and do part keys fit the packed
    # 32-bit halves
    probe = nu.agg(
        F.sum((F.col("n") < CF_MIN_CO).cast("bigint")).alias("tail"),
        F.max("pk").alias("max_pk"),
    ).first()
    n_tail = int(probe["tail"] or 0)
    packable = int(probe["max_pk"] or 0) < (1 << 31) and (
        os.environ.get("SPARK_GRAFT_CF_PACK_DISABLE") != "1"
    )
    cf_input = up
    if n_tail or os.environ.get("SPARK_GRAFT_CF_FORCE_PRUNE") == "1":
        tail = nu.filter(F.col("n") < CF_MIN_CO).select("pk")
        # anti-join on the TAIL (≤ item-scale by construction; AQE
        # broadcasts it when small) — exact, see docstring
        cf_input = up.join(tail, "pk", "left_anti")
    pairs, parts = bounded_cell_self_join(
        cf_input, "u", "pk", CF_USER_CAP, return_parts=True
    )
    if packable:
        pair_key = [
            (
                F.shiftleft(F.least("a_pk", "b_pk").cast("bigint"), 32)
                + F.greatest("a_pk", "b_pk").cast("bigint")
            ).alias("pab")
        ]
        decode = [
            F.shiftright("pab", 32).alias("pa"),
            F.col("pab").bitwiseAND(F.lit((1 << 32) - 1)).alias("pb"),
        ]
    else:
        pair_key = [
            F.least("a_pk", "b_pk").alias("pa"),
            F.greatest("a_pk", "b_pk").alias("pb"),
        ]
        decode = [F.col("pa"), F.col("pb")]
    key_names = ["pab"] if packable else ["pa", "pb"]
    keyed = pairs.select(*pair_key)

    def _co_counts(df: DataFrame, width: int) -> DataFrame:
        # pair keys are near-unique, so the map-side combine barely
        # reduces and the agg's exchange must carry ~every pair row: size
        # it like the join (helper docstring — a session-width exchange
        # here re-created the 8 GB AGGREGATE_OUT_OF_MEMORY one stage
        # after the join fix)
        return (
            df.repartition(max(1, width), *key_names)
            .groupBy(*key_names)
            .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
            .filter(F.col("c") >= CF_MIN_CO)
        )

    # Scratch governor (VERDICT r11 item 3): the pair-agg exchange is the
    # op's dominant disk term (~1.3e9 rows at sf10, linear in SF — no
    # per-host scratch fits it forever). SPARK_GRAFT_CF_PASSES=K slices
    # the exchange into K hash-disjoint pair families (every occurrence
    # of one pair key lands in exactly one slice, so per-slice counts and
    # the ≥ CF_MIN_CO filter are exact); each slice is materialized with
    # a lineage-truncating localCheckpoint — the SURVIVOR frame (c ≥
    # CF_MIN_CO) is support-scale, far below the r11 320M-row heap-
    # promotion regime — and the slice's dead pair shuffle is released
    # before the next pass writes its own (the graph-grace pattern).
    # Compute is re-paid K times (the cell join re-runs per slice; its
    # own up-scale shuffle is reused across passes via Spark's shuffle
    # reuse), disk is bounded at ~exchange/K: the knob trades CPU for
    # scratch exactly like ${SPARK_GRAFT_CF_PASSES}=1 clusters with big
    # per-executor disks vs small ones. Default 1 (single exchange).
    try:
        passes = max(1, int(os.environ.get("SPARK_GRAFT_CF_PASSES", "1")))
    except ValueError:
        passes = 1
    if passes == 1:
        half = _co_counts(keyed, parts).select(*decode, "c")
    else:
        half = sliced_exchange(
            keyed,
            key_names,
            passes,
            lambda sl: _co_counts(sl, parts // passes),
            label="item-item CF pair slice",
        ).select(*decode, "c")
    co = half.unionByName(
        half.select(
            F.col("pb").alias("pa"), F.col("pa").alias("pb"), "c"
        )
    )
    na = nu.select(F.col("pk").alias("pa"), F.col("n").alias("na"))
    nb = nu.select(F.col("pk").alias("pb"), F.col("n").alias("nb"))
    w = Window.partitionBy("pa").orderBy(F.desc("cos2_ppm"), F.asc("pb"))
    return (
        co.join(na, "pa")
        .join(nb, "pb")
        .select(
            "pa",
            "pb",
            "c",
            F.expr("cast((1000000 * c * c) div (na * nb) as bigint)").alias(
                "cos2_ppm"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CF_TOPN)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("c").cast("bigint").alias("co_users"),
            "cos2_ppm",
            F.col("rn").cast("int").alias("rank"),
        )
    )


BOM_FANOUT = 8  # synthetic tree arity: parent(pk) = pk div 8 (roots: 1..7)
BOM_MAX_DEPTH = 8  # covers part keys up to 8^8 ≈ 16.7M (sf1 max ~2M)
BOM_TOPN = 20


@query(
    "q_bom_rollup",
    oracle=f"""
    WITH nodes AS (
      SELECT p_partkey AS pk,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS own_cents
      FROM part WHERE p_partkey >= 1
    ), anc AS (
      SELECT unnest(list_filter(
               list_transform(range(0, {BOM_MAX_DEPTH} + 1),
                              k -> pk // CAST(pow({BOM_FANOUT}, k) AS BIGINT)),
               a -> a >= 1)) AS node,
             own_cents
      FROM nodes
    ), roll AS (
      SELECT node, CAST(count(*) AS BIGINT) AS subtree_size,
             CAST(SUM(own_cents) AS BIGINT) AS subtree_cents
      FROM anc GROUP BY node
    )
    SELECT r.node, r.subtree_size, r.subtree_cents
    FROM roll r JOIN nodes n ON n.pk = r.node
    ORDER BY r.subtree_cents DESC, r.node LIMIT {BOM_TOPN}
    """,
)
def q_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup (bill-of-materials / org-chart /
    account-tree aggregation): every node's subtree total — itself plus
    ALL transitive descendants — over a synthetic part tree
    (parent = key div {BOM_FANOUT}; derived from the key so both engines
    build the identical hierarchy with no fixture file).

    The 100 TB trick is PATH ENUMERATION instead of iteration: a node m
    contributes to exactly its ≤{BOM_MAX_DEPTH} ancestors (m div fanout^k),
    so ONE bounded explode + ONE hash aggregate computes every subtree
    total simultaneously — no per-level loop, no recursive join, depth
    bounded by log_fanout(keyspace). Compare q_graph_pagerank (unrolled
    iteration — needed when edges are arbitrary); trees with computable
    ancestors skip iteration entirely. The semi-join back to real nodes
    drops phantom ancestors outside the part table, and the head is
    TakeOrderedAndProject. The same shape handles account hierarchies
    (path arrays instead of arithmetic parents)."""
    # tree domain is keys >= 1: key 0 is its own div-quotient fixpoint, so
    # it can be neither ancestor nor descendant — excluded on both sides
    nodes = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") >= 1)
        .select(
            F.col("p_partkey").alias("pk"),
            (F.col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("own_cents"),
        )
    )
    anc = nodes.select(
        F.explode(
            F.expr(
                f"filter(transform(sequence(0, {BOM_MAX_DEPTH}),"
                f" k -> pk div cast(pow({BOM_FANOUT}, k) as bigint)),"
                " a -> a >= 1)"
            )
        ).alias("node"),
        "own_cents",
    )
    roll = anc.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("subtree_size"),
        F.sum("own_cents").cast("bigint").alias("subtree_cents"),
    )
    real = nodes.select(F.col("pk").alias("node"))
    return (
        roll.join(real, "node")
        .orderBy(F.desc("subtree_cents"), F.asc("node"))
        .limit(BOM_TOPN)
    )


# ---------------------------------------------------------------------------
# Round-4 wave 28: label propagation (community detection)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 3


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous LPA round as SQL CTEs: each node adopts the most
    frequent label among its neighbors, ties to the smallest label."""
    return f"""
    n{out} AS (
      SELECT e.src AS node, l.label, count(*) AS c
      FROM edges e JOIN {prev} l ON l.node = e.dst
      GROUP BY 1, 2
    ),
    {out} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label)
                 AS rk
        FROM n{out}
      ) WHERE rk = 1
    )"""


@query(
    "q_graph_label_propagation",
    oracle=f"""
    WITH {_EDGE_SQL},
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {",".join(_lpa_round_sql(f"l{k - 1}", f"l{k}") for k in range(1, LPA_ROUNDS + 1))}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(label AS BIGINT) AS community,
           CAST(count(*) OVER (PARTITION BY label) AS BIGINT)
             AS community_size
    FROM l{LPA_ROUNDS}
    """,
)
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (community detection) on the part
    co-occurrence graph: labels start as node ids; each of the
    {LPA_ROUNDS} rounds every node adopts the MOST FREQUENT label among
    its neighbors, ties to the smallest label — fully deterministic (the
    async/random-order LPA variants are not reproducible across engines;
    the sync+min-tie-break variant is, so the oracle unrolls the rounds
    exactly like q_graph_pagerank's). Complements the min-label
    connected-components machinery (q_dedup_clusters): CC finds
    reachability classes, LPA finds densely-connected communities WITHIN
    a component.

    Scale shape per round: one edge⋈labels co-shuffle on the dst key +
    one (node, label)-keyed map-side-combined count + one node-keyed
    argmax window — edges never self-join, rounds are a fixed constant.
    At 100 TB you'd checkpoint label frames between rounds exactly as
    the CC loop does (dedup.py localCheckpoint rounds)."""
    return _lpa_communities(_edges(spark, sf_dir))


def _lpa_communities(edges: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """Synchronous min-tie-break LPA over a symmetric (src, dst) edge
    frame — the round loop shared by the part-graph and user-graph
    queries (one transition function, two graphs, like _jaccard_topk)."""
    labels = edges.select("src").distinct().select(
        F.col("src").alias("node"), F.col("src").alias("label")
    )
    for _ in range(rounds):
        neigh = edges.join(
            labels, edges["dst"] == labels["node"]
        ).select(F.col("src").alias("node"), "label")
        counted = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
        labels = (
            counted.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
        )
    w_size = Window.partitionBy("label")
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("community"),
        F.count(F.lit(1)).over(w_size).cast("bigint").alias("community_size"),
    )


_USER_EDGE_SQL = """
    seq AS (
      SELECT user_id AS u,
             lag(user_id) OVER (PARTITION BY event_type,
                                             date_trunc('day', CAST(ts AS TIMESTAMP))
                                ORDER BY ts, event_id) AS pu
      FROM events
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT u AS src, pu AS dst FROM seq WHERE pu IS NOT NULL AND pu <> u
        UNION ALL
        SELECT pu, u FROM seq WHERE pu IS NOT NULL AND pu <> u
      )
    )
"""


def _user_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-adjacency user-user graph over the event stream: each
    event connects its user to the user of the immediately preceding
    event in the same (event_type, day) stream — ONE candidate edge per
    event by construction, so the edge build is O(|events|) at any SF
    (contrast: bucketing users by shared (type, window) keys is
    (users-per-bucket)² — quadratic in density, the q_geo_nearest_grid
    class). The day split bounds every lag-window partition (~events per
    type-day); at 100 TB you'd narrow the bucket to hours — same
    semantics minus boundary edges, which this form already trades away
    deliberately at day boundaries. Deterministic: the stream orders by
    (ts, event_id) with the unique id as tie-break."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy(
        "event_type", F.date_trunc("day", F.col("ts"))
    ).orderBy("ts", "event_id")
    seq = e.select(
        F.col("user_id").alias("u"),
        F.lag("user_id").over(w).alias("pu"),
    ).filter(F.col("pu").isNotNull() & (F.col("pu") != F.col("u")))
    return (
        seq.select(F.col("u").alias("src"), F.col("pu").alias("dst"))
        .unionByName(seq.select(F.col("pu").alias("src"), F.col("u").alias("dst")))
        .distinct()
    )


@query(
    "q_graph_lpa_users",
    oracle=f"""
    WITH {_USER_EDGE_SQL},
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {",".join(_lpa_round_sql(f"l{k - 1}", f"l{k}") for k in range(1, LPA_ROUNDS + 1))}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(label AS BIGINT) AS community,
           CAST(count(*) OVER (PARTITION BY label) AS BIGINT)
             AS community_size
    FROM l{LPA_ROUNDS}
    """,
)
def q_graph_lpa_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPA community detection on the USER-USER interaction graph
    (VERDICT r6 item 5): nodes are users, an edge links users whose
    events are temporally adjacent within the same (event_type, day)
    stream — "who acts alongside whom" — then the same synchronous
    min-tie-break propagation as the part-graph query (shared
    _lpa_communities transition, shared unrolled-round oracle CTEs).
    Edge construction is one lag window over events (O(|events|), see
    _user_edges) + per-round the usual edge⋈labels co-shuffle — nothing
    quadratic at any density."""
    return _lpa_communities(_user_edges(spark, sf_dir))
