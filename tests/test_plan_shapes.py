"""Physical-plan regression tests: the 100 TB posture, asserted.

Correctness tests prove WHAT is computed; these prove HOW — filters reach the
parquet scan, projections prune the read schema, dims broadcast, top-k avoids
a global sort, aggregates partial-combine map-side. A refactor that silently
de-optimizes a plan fails here even though results stay identical."""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as contract

QUERIES = contract.queries()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(QUERIES["q_filter_pred"](spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "GreaterThan(l_quantity,30" in plan
    assert "In(l_returnflag" in plan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = plan_of(QUERIES["q_scan_project"](spark, sf_dir))
    read_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # 5 of 11 lineitem columns read — unused columns never leave parquet
    assert read_line.count(":") == 5 + 1  # 5 fields + the 'ReadSchema:' label
    assert "l_suppkey" not in read_line and "l_tax" not in read_line


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(QUERIES["q_star_join"](spark, sf_dir))
    # customer, nation, region all broadcast; only lineitem⋈orders may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("BroadcastExchange") >= 3


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(QUERIES["q_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_agg_partial_combine(spark, sf_dir):
    plan = plan_of(QUERIES["q_agg_basic"](spark, sf_dir))
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_join_inner_broadcasts_dim_side(spark, sf_dir):
    plan = plan_of(QUERIES["q_join_inner"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE hides codegen until the plan finalizes — execute, then inspect the
    # adaptively-final physical plan
    df = QUERIES["q_agg_basic"](spark, sf_dir)
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "*(" in final_plan  # '*(n)' = whole-stage-codegen stage markers
    assert "AQEShuffleRead coalesced" in final_plan  # AQE right-sized the shuffle


def test_dedup_exact_shuffles_digest_not_text(spark, sf_dir):
    """The dedup shuffle payload is (doc_id, md5) — the document text is
    projected away before the exchange."""
    df = QUERIES["q_dedup_exact"](spark, sf_dir)
    plan = plan_of(df)
    exchange_idx = plan.find("Exchange")
    assert exchange_idx != -1
    scan_section = plan[plan.find("(1) Scan parquet") :]
    read_line = next(l for l in scan_section.splitlines() if "ReadSchema" in l)
    assert "text" in read_line  # text IS read...
    # ...but the exchange partitions on the 16-byte hash, not the text column
    assert "hashpartitioning(content_hash" in plan


def test_asof_join_single_keyed_shuffle_no_single_partition(spark, sf_dir):
    """The as-of join is one window over a user_id-partitioned union: no
    SinglePartition exchange (global window) and no join operator at all —
    the per-key lookup is carried by last(ignorenulls)."""
    plan = plan_of(QUERIES["q_join_asof"](spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan
    assert "Join" not in plan  # union+window, not an actual join


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    """The interval join must run as an equi-join on (user_id, bucket) —
    never BroadcastNestedLoopJoin/CartesianProduct, which is what a raw
    theta join degenerates to."""
    plan = plan_of(QUERIES["q_join_range"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "user_id" in plan and "bucket" in plan


def test_surrogate_scalable_no_single_partition(spark, sf_dir):
    """dense_ids: no global-window SinglePartition exchange anywhere."""
    df = QUERIES["q_surrogate_keys_scalable"](spark, sf_dir)
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in final_plan


def test_pack_sequences_no_single_partition(spark, sf_dir):
    """Hierarchical running totals: the registered pack query has no
    global-window stage."""
    df = QUERIES["q_pack_sequences"](spark, sf_dir)
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in final_plan


def test_aqe_splits_skewed_join_partition(spark):
    """A hot-key join partition gets split by AQE's skew-join rule
    (SortMergeJoin(skew=true) + AQEShuffleRead skewed) — the runtime half
    of the skew story beside the deterministic salting operators
    (operators/skew.py). Thresholds are lowered to make the tiny local
    shuffle register as skewed; on a cluster the defaults (256MB) apply."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400000).select(
            F.when(F.col("id") % 10 < 8, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 400000  # every row joins; skew split is pure physical
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _tree_of(plan: str) -> str:
    return plan.split("== Physical Plan ==")[1].split("\n\n")[0]


def _plain_exchanges(tree: str) -> int:
    return sum(
        1
        for l in tree.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l and "Reused" not in l
    )


def test_tfidf_single_term_shuffle(spark, sf_dir):
    """q_tfidf_topterms: hash(term) from the explicit repartition must
    satisfy BOTH the tf aggregate and the df window — exactly 3 plain
    exchanges total (term repartition, the metadata-scale N count, the final
    per-doc window), no tf⋈df join exchange."""
    tree = _tree_of(plan_of(QUERIES["q_tfidf_topterms"](spark, sf_dir)))
    assert _plain_exchanges(tree) == 3, tree
    assert "SortMergeJoin" not in tree  # df comes from a window, not a join


def test_winnow_single_doc_shuffle(spark, sf_dir):
    """q_winnow_fingerprints: one doc_id shuffle feeds the count window, the
    sliding-min window AND the final (doc_id, fp) aggregate — hash(doc_id)
    satisfies all three."""
    tree = _tree_of(plan_of(QUERIES["q_winnow_fingerprints"](spark, sf_dir)))
    assert _plain_exchanges(tree) == 1, tree


def test_cooccurrence_self_join_shares_doc_exchange(spark, sf_dir):
    """q_cooccurrence_lift: hash(doc_id) from the explicit repartition must
    satisfy the (doc_id, term) distinct AND both presence self-join sides —
    no SortMergeJoin side may re-exchange on doc_id. Expected plain
    exchanges: the doc_id repartition (reused by both join branches), the
    df-count agg for the vocab, the vocab TakeOrdered collect path, and the
    final pair agg."""
    tree = _tree_of(plan_of(QUERIES["q_cooccurrence_lift"](spark, sf_dir)))
    # the join itself must not introduce hashpartitioning(doc_id) exchanges
    # beyond the single explicit repartition (which both branches reuse)
    doc_exchanges = [
        l for l in tree.splitlines()
        if "Exchange hashpartitioning(doc_id" in l and "Reused" not in l
    ]
    assert len(doc_exchanges) <= 1, tree


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path_factory):
    """Star query over the month-partitioned fact (star/load.py::write_fact)
    must prune fact partitions at RUNTIME from the filtered dim side —
    `dynamicpruningexpression` in the scan's PartitionFilters (SURVEY §4;
    VERDICT r2 item 6). At 100 TB this is the difference between scanning
    one month and scanning the whole table when the month predicate only
    exists on the dimension."""
    from pyspark.sql import functions as F

    from finegourmet_spark.star.load import write_fact

    out = str(tmp_path_factory.mktemp("dpp"))
    fact = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("Sale_ID"),
            F.col("o_orderdate").alias("Date"),
            F.col("o_totalprice").alias("Amount"),
        )
    )
    write_fact(fact, out)
    fact_p = spark.read.parquet(f"{out}/Fact_Sales")

    # month dimension with the quarter attribute; the query filters ONLY the
    # dim — the fact's partition predicate must come from the join at runtime
    dim_month = (
        fact_p.select("Sale_Month").distinct()
        .withColumn("quarter", F.quarter(F.to_date(F.concat("Sale_Month", F.lit("-01")))))
    )
    q = (
        fact_p.join(dim_month.filter(F.col("quarter") == 1), "Sale_Month")
        .groupBy("Sale_Month")
        .agg(F.count("*").alias("n"))
    )
    plan = plan_of(q)
    scan_filters = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("dynamicpruningexpression" in l for l in scan_filters), plan
    # and the pruned result is right: only Q1 months survive
    months = {r["Sale_Month"][5:7] for r in q.collect()}
    assert months <= {"01", "02", "03"} and months


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path_factory):
    """Identically-bucketed tables join with ZERO Exchange — the write-time
    shuffle investment that big recurring joins amortize at 100 TB."""
    from finegourmet_spark.operators.bucketing import bucketed_join, write_bucketed

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        ).withColumnRenamed("o_orderkey", "l_orderkey")
        write_bucketed(li, "bdb.lineitem_b", ["l_orderkey"], 8)
        write_bucketed(o, "bdb.orders_b", ["l_orderkey"], 8)

        joined = spark.table("bdb.lineitem_b").hint("merge").join(
            spark.table("bdb.orders_b"), ["l_orderkey"]
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-local merge, no shuffle
        # and the result is right
        assert joined.count() == li.join(o, "l_orderkey").count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def _extended_tree(df) -> str:
    """Pre-AQE physical tree from extended explain (operator details incl.
    hashpartitioning keys are inline, unlike formatted mode)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue().split("== Physical Plan ==")[1]


def test_funnel_one_event_scale_exchange(spark, sf_dir):
    """q_funnel: the three chained stage windows and the per-user reduction
    all ride ONE hash(user_id) exchange and ONE sort; the only other
    exchange is the metadata-scale SinglePartition for the 3-row summary."""
    tree = _extended_tree(QUERIES["q_funnel"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(user_id") == 1, tree
    assert tree.count("Exchange SinglePartition") == 1, tree
    assert tree.count("Window [") == 3, tree
    assert tree.count("Sort [") == 1, tree


def test_attribution_is_join_free_single_user_exchange(spark, sf_dir):
    """q_attribution: last-touch credit is a union+window carry — no join
    operator, one hash(user_id) exchange, then only the channel-grain agg."""
    tree = _extended_tree(QUERIES["q_attribution"](spark, sf_dir))
    assert "Join" not in tree, tree
    assert tree.count("Exchange hashpartitioning(user_id") == 1, tree


def test_retention_collapses_to_day_grain_before_shuffle(spark, sf_dir):
    """q_retention_cohorts: the distinct's map-side partial runs BEFORE its
    exchange, so the first event-scale shuffle carries (user_id, day) rows
    already collapsed per-partition — at 100 TB the shuffle is bounded by
    users x days, not raw events."""
    import re

    tree = _extended_tree(QUERIES["q_retention_cohorts"](spark, sf_dir))
    m = re.search(r"Exchange hashpartitioning\(user_id#\d+L?, d#\d+", tree)
    assert m, tree
    # the partial distinct aggregate must sit BELOW that exchange
    below = tree[m.end():]
    assert re.search(r"HashAggregate\(keys=\[user_id#\d+L?, d#\d+", below), tree
    assert tree.count("Window [") == 1, tree


def test_pagerank_no_cartesian_one_metadata_single_partition(spark, sf_dir):
    """q_graph_pagerank executed plan: bounded-fanout self-join (never a
    cartesian product) and at most one SinglePartition exchange — the
    20-row rank window documented as metadata-scale."""
    df = QUERIES["q_graph_pagerank"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_runtime_bloom_filter_reduces_probe_side(spark, sf_dir):
    """Spark's InjectRuntimeFilter: a selective filter on the build side of
    a shuffle join materializes a bloom filter that is pushed into the
    probe side's SCAN — rows that cannot join are dropped before the
    probe-side aggregate's shuffle. At 100 TB this is the difference
    between shuffling the whole fact table and shuffling the matching
    slice. Default thresholds (10 GB application-side scan) are tuned for
    real scale; the test lowers them to fire on toy data."""
    from pyspark.sql import functions as F

    old = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderstatus") == "P"
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "qty", "o_totalprice"
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # and the bloom probe must sit in the lineitem-side Filter,
        # upstream of that side's aggregate
        filter_lines = [
            l for l in plan.splitlines()
            if "might_contain" in l and "l_orderkey" in l
        ]
        assert filter_lines, plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old,
        )


def test_skyline_no_allpairs_dominance(spark, sf_dir):
    """q_skyline_pareto: the dominance test must NOT be an all-pairs join —
    the plan is per-size agg → metadata-scale frontier window → broadcast
    equi-join back. One SinglePartition exchange (the |sizes|-row window),
    never a nested-loop or cartesian dominance pass."""
    tree = _extended_tree(QUERIES["q_skyline_pareto"](spark, sf_dir))
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert tree.count("Exchange SinglePartition") == 1, tree
    assert "BroadcastHashJoin" in tree, tree


def test_histogram_equidepth_no_global_sort(spark, sf_dir):
    """q_histogram_equidepth: the naive ntile formulation would
    range-partition (globally sort) the fact table; the boundary-broadcast
    plan has NO rangepartitioning exchange and NO window — binning is a
    projection under the final hash agg."""
    tree = _extended_tree(QUERIES["q_histogram_equidepth"](spark, sf_dir))
    assert "rangepartitioning" not in tree, tree
    assert "Window [" not in tree, tree


def test_rfm_reads_orders_once(spark, sf_dir):
    """q_rfm_segmentation: the per-customer aggregate is pinned
    (localCheckpoint) before its three consumers, so the final plan reads
    the pinned customer frame — ZERO parquet re-scans of orders — and no
    window operator appears anywhere (boundary comparison replaced
    ntile)."""
    tree = _extended_tree(QUERIES["q_rfm_segmentation"](spark, sf_dir))
    assert "Scan parquet" not in tree, tree
    assert "Window [" not in tree, tree
    assert "rangepartitioning" not in tree, tree


def test_column_profile_single_scan(spark, sf_dir):
    """q_column_profile: all four columns' statistics come from ONE scan of
    orders (the multi-distinct Expand), not a per-column UNION of scans
    like the oracle states."""
    tree = _extended_tree(QUERIES["q_column_profile"](spark, sf_dir))
    assert tree.count("Scan parquet") == 1, tree
    assert "Expand" in tree, tree


def test_fuzzy_join_is_blocked_equi_join(spark, sf_dir):
    """q_fuzzy_join_levenshtein: the block key makes the candidate join an
    EQUI join (hash/sort-merge) — a nested-loop levenshtein over all name
    pairs is the anti-pattern this blocks."""
    tree = _extended_tree(QUERIES["q_fuzzy_join_levenshtein"](spark, sf_dir))
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_inverted_index_partial_distinct_below_exchange(spark, sf_dir):
    """q_inverted_index: the (term, doc_id) distinct must partially
    aggregate map-side BEFORE its exchange, so the shuffle carries
    per-partition-deduped pairs — the same collapse-first discipline as
    retention's day grain."""
    import re

    tree = _extended_tree(QUERIES["q_inverted_index"](spark, sf_dir))
    m = re.search(r"Exchange hashpartitioning\(term#\d+, doc_id#\d+", tree)
    assert m, tree
    below = tree[m.end():]
    assert re.search(r"HashAggregate\(keys=\[term#\d+, doc_id#\d+", below), tree


def _windows_are_pid_local(tree: str) -> bool:
    """True iff every Window operator partitions by the two-phase assigner's
    _pid column — i.e. runs partition-parallel, never as a global window."""
    return all(
        "_pid#" in line.split("windowspecdefinition", 1)[1][:120]
        for line in tree.splitlines()
        if "windowspecdefinition" in line
    )


def test_sample_weighted_no_global_window(spark, sf_dir):
    """q_sample_weighted: the corpus-wide cumulative weight comes from the
    hierarchical running_total — every window in the plan is the
    partition-LOCAL (_pid-keyed) cumsum, and the only SinglePartition
    exchange is the scalar total's 1-row aggregate; the oracle's global
    SUM OVER states semantics, not the plan."""
    tree = _extended_tree(QUERIES["q_sample_weighted"](spark, sf_dir))
    assert _windows_are_pid_local(tree), tree
    assert tree.count("Exchange SinglePartition") == 1, tree


def test_abc_no_global_window(spark, sf_dir):
    """q_abc_analysis: same contract — the revenue-ordered prefix sum is
    two-phase (range partition + driver offsets + _pid-local cumsum),
    never a SinglePartition sort over the part frame."""
    tree = _extended_tree(QUERIES["q_abc_analysis"](spark, sf_dir))
    assert _windows_are_pid_local(tree), tree
    assert tree.count("Exchange SinglePartition") == 1, tree


def test_bm25_prunes_tokens_before_tf(spark, sf_dir):
    """q_bm25_topk: the query-term filter must sit BELOW the tf aggregate
    (prune the exploded token stream to ≤|query| terms before any
    shuffle), and the final ranking is the TakeOrdered path."""
    tree = _extended_tree(QUERIES["q_bm25_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in tree, tree
    import re

    m = re.search(r"Exchange hashpartitioning\(doc_id#\d+L?, term#\d+", tree)
    assert m, tree
    below = tree[m.end():]
    assert re.search(r"Filter .*term#\d+ IN", below) or re.search(
        r"term#\d+ INSET", below
    ), tree


def test_funnel_windowed_shares_funnel_plan_shape(spark, sf_dir):
    """q_funnel_windowed: the deadline is a projection-level comparison, so
    the plan must be IDENTICAL in shape to q_funnel's — one hash(user_id)
    exchange, three chained windows on one sort, one metadata-scale
    SinglePartition."""
    tree = _extended_tree(QUERIES["q_funnel_windowed"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(user_id") == 1, tree
    assert tree.count("Exchange SinglePartition") == 1, tree
    assert tree.count("Window [") == 3, tree
    assert tree.count("Sort [") == 1, tree


def test_stickiness_mau_is_bounded_explode(spark, sf_dir):
    """q_stickiness: the MAU side must be the contribution explode (a
    Generate operator), never a range join — no nested-loop join operator
    anywhere."""
    tree = _extended_tree(QUERIES["q_stickiness"](spark, sf_dir))
    assert "Generate explode" in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_out_of_order_single_user_exchange(spark, sf_dir):
    """q_out_of_order_events: one user-keyed data-scale exchange (the
    running-max window) + the final 1-row reduction."""
    tree = _extended_tree(QUERIES["q_out_of_order_events"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(user_id") == 1, tree
    assert tree.count("Exchange SinglePartition") == 1, tree


def test_dedup_chunks_shuffles_digest_not_text(spark, sf_dir):
    """q_dedup_chunks: the chunk aggregation exchange partitions on the
    16-byte md5, and the chunk text is projected away before it (the
    q_dedup_exact discipline applied at sub-document grain)."""
    import re

    tree = _extended_tree(QUERIES["q_dedup_chunks"](spark, sf_dir))
    m = re.search(r"Exchange hashpartitioning\(chunk_hash#\d+", tree)
    assert m, tree
    below = tree[m.end():]
    assert re.search(r"HashAggregate\(keys=\[chunk_hash#\d+", below), tree


def test_geo_nearest_is_bucketed_equi_join(spark, sf_dir):
    """q_geo_nearest_grid: the candidate join must be an equi-join on the
    cell ids (broadcast or shuffled HASH join) — never a nested-loop over
    the raw radius predicate — and the nearest-pick is ONE customer-keyed
    window exchange."""
    tree = _extended_tree(QUERIES["q_geo_nearest_grid"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    assert "Generate explode" in tree, tree  # the bounded ×9 cell fan-out
    assert tree.count("Exchange hashpartitioning(c_custkey") == 1, tree


def test_bitmap_rollup_merges_bitmaps_not_ids(spark, sf_dir):
    """q_bitmap_distinct_rollup: day grain builds bitmaps (map-side
    combined partial agg), month grain merges with bitmap_or_agg — after
    the first exchange the shuffle payload is bitmaps, and no plain
    count-distinct (expand/distinct re-shuffle of raw ids) appears."""
    tree = _extended_tree(QUERIES["q_bitmap_distinct_rollup"](spark, sf_dir))
    assert "bitmap_construct_agg" in tree, tree
    assert "bitmap_or_agg" in tree, tree
    assert "partial_bitmap_construct_agg" in tree, tree  # map-side combine
    assert "distinct" not in tree.lower().replace("distinct_users", ""), tree


def test_simpson_diversity_no_global_stage(spark, sf_dir):
    """q_simpson_diversity: both aggregation levels partial-combine and
    nothing collapses to a single partition (the language rollup is a
    keyed exchange on lang, metadata-scale)."""
    tree = _extended_tree(QUERIES["q_simpson_diversity"](spark, sf_dir))
    assert "Exchange SinglePartition" not in tree, tree
    assert "partial_count" in tree or "partial_sum" in tree, tree


def test_bfs_frontier_uses_anti_join(spark, sf_dir):
    """q_graph_bfs_hops: frontier expansion subtracts the visited set with
    LeftAnti hash joins (per-round work bounded by the frontier, not the
    reached set)."""
    tree = _extended_tree(QUERIES["q_graph_bfs_hops"](spark, sf_dir))
    assert "LeftAnti" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_incremental_agg_pushes_split_filter_to_scan(spark, sf_dir):
    """q_incremental_agg_maintenance: base and delta each read a
    filter-pushed scan (the snapshot/delta split reaches parquet), both
    halves partial-combine, and the merge introduces no single-partition
    stage."""
    tree = _extended_tree(QUERIES["q_incremental_agg_maintenance"](spark, sf_dir))
    assert tree.count("PushedFilters: [IsNotNull(l_shipdate)") == 2, tree
    assert "partial_sum" in tree or "partial_count" in tree, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_weighted_median_two_phase_no_global_sort(spark, sf_dir):
    """q_weighted_median: both prefix-sum windows partition by flag on
    reduced frames (bucket grain, then one bucket's value grain) — never a
    SinglePartition sort; the straddle-bucket frame broadcasts back."""
    tree = _extended_tree(QUERIES["q_weighted_median"](spark, sf_dir))
    assert "Exchange SinglePartition" not in tree, tree
    assert tree.count("BroadcastHashJoin") >= 1, tree


def test_rrf_fusion_takeordered_no_global_window(spark, sf_dir):
    """q_rrf_fusion: ranks come from the hierarchical dense_ids assigner
    (no SinglePartition window) and the final top-k is
    TakeOrderedAndProject."""
    tree = _extended_tree(QUERIES["q_rrf_fusion"](spark, sf_dir))
    assert "TakeOrderedAndProject" in tree, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_vocab_oov_broadcasts_vocab_head(spark, sf_dir):
    """q_vocab_oov_rate: the vocabulary head is TakeOrderedAndProject and
    joins the token stream as a broadcast — the corpus side never
    re-shuffles for the membership check."""
    tree = _extended_tree(QUERIES["q_vocab_oov_rate"](spark, sf_dir))
    assert "TakeOrderedAndProject" in tree, tree
    assert tree.count("BroadcastHashJoin") == 1, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_udtf_is_arrow_not_pickled(spark, sf_dir):
    """q_udtf_installments: the Python table function must run through the
    Arrow serializer (ArrowEvalPythonUDTF), never row-pickling
    BatchEvalPythonUDTF — the UDTF extension of the scalar-UDF slow-path
    ban."""
    tree = _extended_tree(QUERIES["q_udtf_installments"](spark, sf_dir))
    assert "ArrowEvalPythonUDTF" in tree, tree
    assert "BatchEvalPythonUDTF" not in tree, tree


def test_variant_parse_stays_in_projection(spark, sf_dir):
    """q_variant_funcs: variant parse+extract is a pure projection feeding a
    map-side-combined agg — no shuffle of the variant column, no
    SinglePartition stage."""
    tree = _extended_tree(QUERIES["q_variant_funcs"](spark, sf_dir))
    assert "variant_get" in tree, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_pipe_syntax_plans_like_classic_sql(spark, sf_dir):
    """q_pipe_syntax: the pipe dialect must desugar to the same physical
    shape as classic SQL — filter pushed to the scan, partial/final hash
    agg."""
    tree = _extended_tree(QUERIES["q_pipe_syntax"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10" in tree, tree
    assert "partial_count" in tree or "partial_sum" in tree, tree


def test_snapshot_diff_single_cokeyed_join(spark, sf_dir):
    """q_snapshot_diff_cdc: exactly one full-outer join on the key; both
    snapshot sides hash-partition by the same key (the canonical diff
    shuffle), no nested-loop anywhere."""
    tree = _extended_tree(QUERIES["q_snapshot_diff_cdc"](spark, sf_dir))
    assert "FullOuter" in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_pit_features_one_customer_exchange(spark, sf_dir):
    """q_pit_features: both trailing-window feature columns ride ONE
    customer-keyed exchange and one sort — the shape that replaces
    per-feature point-in-time self-joins."""
    tree = _extended_tree(QUERIES["q_pit_features"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(o_custkey") == 1, tree
    assert "Join" not in tree, tree


def test_late_arriving_dim_anti_join_on_key_grain(spark, sf_dir):
    """q_late_arriving_dim: inferred members come from a key-grain distinct
    then a LeftAnti join — the fact table's non-key columns never shuffle."""
    tree = _extended_tree(QUERIES["q_late_arriving_dim"](spark, sf_dir))
    assert "LeftAnti" in tree, tree
    read = [l for l in tree.splitlines() if "ReadSchema" in l and "lineitem" in l]
    assert read and "l_partkey" in read[0] and "l_extendedprice" not in read[0], tree


def test_sql_function_inlines_into_plan(spark, sf_dir):
    """q_sql_scalar_function: the catalog SQL UDF must inline — the plan
    contains CASE logic and NO Python eval operator of any kind."""
    tree = _extended_tree(QUERIES["q_sql_scalar_function"](spark, sf_dir))
    assert "EvalPython" not in tree, tree
    assert "partial_count" in tree or "partial_sum" in tree, tree


def test_bitmap_overlap_builds_three_bitmaps_one_pass(spark, sf_dir):
    """q_bitmap_audience_overlap: all three bitmaps (A, B, union) build in
    the same aggregate — one pass, one exchange chain, no count-distinct
    expand."""
    tree = _extended_tree(QUERIES["q_bitmap_audience_overlap"](spark, sf_dir))
    assert tree.count("bitmap_construct_agg") >= 3, tree
    assert "Expand" not in tree, tree


def test_share_of_parent_data_scale_is_one_agg(spark, sf_dir):
    """q_share_of_parent: the data-scale work is one aggregate over the
    fact joined to broadcast dims; the share windows run on the tiny
    (region, nation) frame after it."""
    tree = _extended_tree(QUERIES["q_share_of_parent"](spark, sf_dir))
    assert tree.count("BroadcastHashJoin") == 3, tree
    assert "partial_sum" in tree, tree


def test_topn_others_never_sorts_the_tail(spark, sf_dir):
    """q_topn_others: the head comes from TakeOrderedAndProject; the tail
    is only ever summed (scalar agg), never ranked or globally sorted."""
    tree = _extended_tree(QUERIES["q_topn_others"](spark, sf_dir))
    assert "TakeOrderedAndProject" in tree, tree
    assert "Sort [rev_cents" not in tree.replace(
        "TakeOrderedAndProject", ""
    ), tree


def test_attribution_linear_user_keyed_pair_join(spark, sf_dir):
    """q_attribution_linear: the purchase × prior-clicks pair set comes
    from a user-keyed equi-join (hash or broadcast on the user key) with
    the time bounds as residual filters — not a pure-inequality
    nested-loop over unrelated users."""
    tree = _extended_tree(QUERIES["q_attribution_linear"](spark, sf_dir))
    assert "CartesianProduct" not in tree, tree
    joins = [l for l in tree.splitlines() if "Join" in l and "pu" in l]
    assert any("pu" in l and "cu" in l for l in joins), tree


def test_lambda_funcs_no_explode_no_python(spark, sf_dir):
    """q_lambda_funcs: the per-doc collection math stays in JVM lambda
    expressions — no Generate (explode), no Python eval operator, one
    map-side-combined rollup."""
    tree = _extended_tree(QUERIES["q_lambda_funcs"](spark, sf_dir))
    assert "Generate" not in tree, tree
    assert "EvalPython" not in tree, tree
    assert "partial_sum" in tree, tree


def test_json_quarantine_single_pass(spark, sf_dir):
    """q_json_quarantine: quarantine counting and clean-row aggregation
    share one scan and one hash agg — no second pass over the events."""
    tree = _extended_tree(QUERIES["q_json_quarantine"](spark, sf_dir))
    assert tree.count("FileScan parquet") == 1, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_event_pattern_single_user_exchange(spark, sf_dir):
    """q_event_pattern_match: sequence build + regex metrics ride one
    user-keyed exchange and one final 1-row reduction."""
    tree = _extended_tree(QUERIES["q_event_pattern_match"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(user_id") == 1, tree
    assert tree.count("Exchange SinglePartition") == 1, tree


def test_xml_roundtrip_stays_in_projection(spark, sf_dir):
    """q_xml_funcs: serialize + from_xml + xpath are projections feeding a
    map-side-combined agg — the XML string never shuffles."""
    tree = _extended_tree(QUERIES["q_xml_funcs"](spark, sf_dir))
    assert "from_xml" in tree or "FromXml" in tree.lower() or "xpath" in tree, tree
    assert "partial_count" in tree or "partial_sum" in tree, tree


def test_table_checksum_map_side_combines(spark, sf_dir):
    """q_table_checksum: the XOR fold partial-aggregates before the
    month-keyed exchange — the digest column shuffles as partials, not
    rows."""
    tree = _extended_tree(QUERIES["q_table_checksum"](spark, sf_dir))
    assert "partial_bit_xor" in tree or "partial_count" in tree, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_keyspace_gaps_takeordered(spark, sf_dir):
    """q_keyspace_gaps: bucket stats aggregate map-side; the worst-bucket
    head is TakeOrderedAndProject, never a global sort of all buckets."""
    tree = _extended_tree(QUERIES["q_keyspace_gaps"](spark, sf_dir))
    assert "TakeOrderedAndProject" in tree, tree


def test_snm_neighbor_joins_are_equi(spark, sf_dir):
    """q_dedup_sorted_neighborhood: the W neighbor joins are position-id
    equi-joins (the inequality band form would nested-loop), and no
    SinglePartition window assigns the positions."""
    tree = _extended_tree(QUERIES["q_dedup_sorted_neighborhood"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    # dense_ids assigns positions with _pid-partitioned windows, never a
    # SinglePartition global sort
    assert "Exchange SinglePartition" not in tree, tree
    assert "windowspecdefinition(_pid" in tree, tree


def test_retraction_scans_push_filters(spark, sf_dir):
    """q_incremental_agg_retraction: both partial frames partial-combine
    and the merge never collapses to a single partition."""
    tree = _extended_tree(QUERIES["q_incremental_agg_retraction"](spark, sf_dir))
    assert "partial_sum" in tree or "partial_count" in tree, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_interval_coverage_single_keyed_exchange(spark, sf_dir):
    """q_interval_coverage: all three windows + the island rollup ride one
    priority-keyed exchange (after the distinct's own exchange)."""
    tree = _extended_tree(QUERIES["q_interval_coverage"](spark, sf_dir))
    assert tree.count("Exchange hashpartitioning(pri") <= 2, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_business_days_hof_no_explosion(spark, sf_dir):
    """q_business_days_sla: the per-row date range lives inside one array
    expression (HOF filter), never exploding to rows."""
    tree = _extended_tree(QUERIES["q_business_days_sla"](spark, sf_dir))
    assert "Generate" not in tree, tree
    assert "partial_sum" in tree or "partial_count" in tree, tree


def test_percentile_cont_no_global_value_sort(spark, sf_dir):
    """q_percentile_cont_exact: both prefix sums partition by flag (bucket
    grain, then targeted bucket slices) — no SinglePartition pass over the
    value domain; the threshold frame broadcasts back."""
    tree = _extended_tree(QUERIES["q_percentile_cont_exact"](spark, sf_dir))
    assert "Exchange SinglePartition" not in tree, tree
    assert "BroadcastHashJoin" in tree, tree


def test_bom_rollup_no_iteration_no_recursion(spark, sf_dir):
    """q_bom_rollup: path enumeration — ONE bounded Generate + one hash
    agg + the node semi-join; no iterative join chain, head via
    TakeOrderedAndProject."""
    tree = _extended_tree(QUERIES["q_bom_rollup"](spark, sf_dir))
    assert tree.count("Generate") == 1, tree
    assert "TakeOrderedAndProject" in tree, tree
    assert "Exchange SinglePartition" not in tree, tree


def test_scd2_lookup_cokeyed_equi_join(spark, sf_dir):
    """q_scd2_lookup: the point-in-time join is a key equi-join with the
    validity dates as residual filters — never a nested loop over the
    interval predicate."""
    tree = _extended_tree(QUERIES["q_scd2_lookup"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    assert "LeftOuter" in tree, tree


def test_size_aware_broadcast_without_hint(spark, sf_dir):
    """VERDICT r5 item 2: the forced F.broadcast() hints on sf-SCALING
    tables (customer, part) were removed from q_join_inner, q_topk,
    q_star_join, q_null_repair, q_allocation_largest_remainder and
    q_share_of_parent — a hint overrides the size check and OOMs executors
    at 100×. This pins the other direction: at small sf the size-aware
    path (64 MB autoBroadcastJoinThreshold + AQE runtime re-plan) still
    chooses BroadcastHashJoin on its own, proving correctness AND speed
    both survive without the hint. Bounded frames (nation/region/probe
    sets) keep their hints — those are safe at any sf."""
    import inspect

    from finegourmet_spark.operators import relational

    expected_bhj = {
        "q_join_inner": 1,
        "q_topk": 1,
        "q_star_join": 3,  # customer via size check + nation/region hints
        "q_null_repair": 1,
        "q_allocation_largest_remainder": 2,
        "q_share_of_parent": 3,
    }
    for name, n in expected_bhj.items():
        plan = plan_of(QUERIES[name](spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= n, (name, plan)

    # and the hints really are gone from the source of these six queries
    for name in expected_bhj:
        fn = getattr(relational, name)
        src = inspect.getsource(fn)
        for scaling in ("(c)", "(c,", "(cdim", "(p)", "(p,"):
            assert f"F.broadcast{scaling}" not in src, (name, scaling)


def test_session_liveness_confs_applied(spark):
    """The factory's GC-pause liveness posture (r13 scale class #5) must
    actually reach the session: a 24 GB driver paused >133 s under the
    sf100-mut CF cell join and Spark's default 120 s network timeout let
    the HeartbeatReceiver evict the in-process executor. Unknown conf
    keys are accepted silently (the r3 sessionWindow lesson), so pin via
    conf.get — these are liveness-only knobs, never results or plans."""
    assert spark.conf.get("spark.network.timeout") == "600s"
    assert spark.conf.get("spark.executor.heartbeatInterval") == "20s"


def test_session_parquet_codec_applied(spark):
    """The factory's parquet sink codec (r14, guide §6): zstd measured
    −64% output bytes at wall-neutral build on the 10,000× star rung
    (OPTIMIZATION_r14.md). Write-side only — results and plans of every
    registered query are unaffected; pin via conf.get like the liveness
    knobs (unknown conf keys are accepted silently)."""
    import os

    expected = os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd")
    assert spark.conf.get("spark.sql.parquet.compression.codec") == expected
