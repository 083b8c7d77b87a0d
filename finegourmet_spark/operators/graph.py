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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

PR_ROUNDS = 3
PR_INIT = 1_000_000
PR_BASE = 150_000  # 0.15 · PR_INIT, the damping complement
PR_TOPN = 20

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

    Plan shape per round: the pinned edge list (localCheckpoint — lineage
    would double per round otherwise, the CC lesson, dedup.py:204) is
    pre-partitioned on src; the per-node contribution (mass div degree) is
    resolved by a NODE-scale mass⋈deg join BEFORE touching edges, so each
    round shuffles only node-scale frames to the edge join and the
    contribution aggregate on dst; edge rows never re-exchange. Final
    ranking is top-{PR_TOPN} (TakeOrdered path), with the {PR_TOPN}-row
    rank window explicitly metadata-scale."""
    spread = max(spark.sparkContext.defaultParallelism, 8)
    ej = (
        _edges(spark, sf_dir)
        .repartition(spread, "src")
        .localCheckpoint()  # pin: 3 rounds reuse this, lineage stays flat
    )
    deg = _degrees(ej).localCheckpoint()  # node-scale, reused every round
    mass = deg.select("src", F.lit(PR_INIT).cast("long").alias("mass"))
    for _ in range(PR_ROUNDS):
        contrib = (
            mass.join(deg, "src")  # node ⋈ node, broadcast-scale per round
            .select("src", F.expr("mass div d").alias("c"))
        )
        mass = (
            ej.join(contrib, "src")
            .groupBy("dst")
            .agg(
                (F.lit(PR_BASE) + F.expr("(17 * sum(c)) div 20"))
                .cast("long")
                .alias("mass")
            )
            .select(F.col("dst").alias("src"), "mass")
        )
    mass = mass.select(F.col("src").alias("pk"), "mass")
    top = mass.orderBy(F.col("mass").desc(), F.col("pk")).limit(PR_TOPN)
    # rank over PR_TOPN rows only — metadata-scale single partition by design
    w = Window.orderBy(F.col("mass").desc(), F.col("pk"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("pk").alias("part_id"),
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
    edges = _edges(spark, sf_dir)
    deg = _degrees(edges)
    du = deg.select(F.col("src").alias("u_n"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v_n"), F.col("d").alias("dv"))
    oriented = (
        edges.join(du, edges["src"] == du["u_n"])
        .join(dv, edges["dst"] == dv["v_n"])
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v"), "dv")
        .localCheckpoint()  # three consumers (wedges x2, closure) — pin once
    )
    x = oriented.select(F.col("u"), F.col("v").alias("b"), F.col("dv").alias("db"))
    y = oriented.select(F.col("u"), F.col("v").alias("c"), F.col("dv").alias("dc"))
    wedges = x.join(y, "u").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closer = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    # shuffle-hash, not sort-merge: the wedge side is O(m^1.5) rows and
    # sorting it dominates the whole query; hash-building on the edge-scale
    # closer side streams the wedges unsorted (sf1: 411M wedges vs 12M
    # edges — the sort was the JVM-pressure hotspot)
    n_tri = wedges.join(closer.hint("shuffle_hash"), ["b", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # scalar sizes are metadata-scale (single-row aggregates); cross-joining
    # four 1-row frames is explicitly not a data-scale cartesian
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = oriented.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    out = (
        n_nodes.crossJoin(n_edges).crossJoin(n_wedges).crossJoin(n_tri)
    )
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("(3000000 * n_triangles) div n_wedges"))
        .cast("bigint")
        .alias("closure_ppm"),
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
    metadata-scale rank window runs on the thresholded candidate set."""
    edges = _edges(spark, sf_dir)
    x = edges.select(F.col("src").alias("c_"), F.col("dst").alias("u"))
    y = edges.select(F.col("src").alias("c2"), F.col("dst").alias("v"))
    wedges = (
        x.join(y, (F.col("c_") == F.col("c2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= JACC_MIN_COMMON)
    )
    cand = wedges.join(
        edges,
        (wedges["u"] == edges["src"]) & (wedges["v"] == edges["dst"]),
        "left_anti",
    )
    deg = _degrees(edges)
    du = deg.select(F.col("src").alias("un"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("vn"), F.col("d").alias("dv"))
    jac = (
        cand.join(du, cand["u"] == du["un"])
        .join(dv, cand["v"] == dv["vn"])
        .select(
            "u",
            "v",
            "common",
            F.expr("(1000000 * common) div (du + dv - common)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
    top = jac.orderBy(F.col("jaccard_ppm").desc(), "u", "v").limit(JACC_TOPN)
    w = Window.orderBy(F.col("jaccard_ppm").desc(), "u", "v")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        "common",
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
           CAST((1000000 * p.n_ab * nb.n_orders) // (ia.n * ic.n) AS BIGINT)
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
    `div` ≡ `//`; the lift numerator n_ab·N rides int64: ≤ 1e4·1.5e6 ≈
    1e10 per million-fold scale headroom).

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
            F.expr("(1000000 * n_ab * n_orders) div (n_a * n_c)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
