"""Determinism stress for the two-phase hierarchical scan (VERDICT r2 #2).

q_pack_sequences' r2 driver hash-fail was ultimately an oracle typing issue
(HUGEINT vs BIGINT), but the verdict also asked for hard evidence that the
``_two_phase`` machinery (functions/ids.py) is repetition- and parallelism-
invariant: repartitionByRange samples boundaries, so any re-materialization
drift between the totals job and the output job would desynchronize ``_pid``
from the collected offsets. These tests run the operator many times and
across partition widths and assert bit-identical canonical results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — populates the full query registry
from finegourmet_spark.functions.ids import dense_ids, running_total
from finegourmet_spark.operators.registry import QUERIES
from tests.oracle_harness import canonical_rows


def _canon(df) -> tuple:
    return tuple(canonical_rows(df.columns, [tuple(r) for r in df.collect()]))


def test_pack_sequences_20x_repetition_stable(spark, sf_dir):
    """20 independent evaluations of q_pack_sequences must be identical —
    each call re-runs the full two-phase plan (new checkpoint, newly sampled
    range boundaries)."""
    results = {_canon(QUERIES["q_pack_sequences"](spark, sf_dir)) for _ in range(20)}
    assert len(results) == 1


def test_running_total_stable_across_partition_widths(spark, sf_dir):
    """running_total must give the same global cumsum regardless of how many
    range partitions the two-phase scan uses (1, 2, 3, 7, 8, 32)."""
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n"))
    )
    results = {
        _canon(running_total(toks, ["doc_id"], "n", "cum", num_partitions=n))
        for n in (1, 2, 3, 7, 8, 32)
    }
    assert len(results) == 1


def test_dense_ids_stable_across_partition_widths(spark, sf_dir):
    """dense_ids must equal row_number() over the total order for every
    partition width."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    results = {
        _canon(dense_ids(c, ["c_custkey"], "id", num_partitions=n))
        for n in (1, 2, 5, 8, 32)
    }
    assert len(results) == 1


def test_iterative_graph_ops_repetition_stable(spark, sf_dir):
    """q_graph_pagerank re-checkpoints its edge list per call (fresh
    localCheckpoint, fresh repartition) — 5 independent evaluations must be
    bit-identical, as must the (checkpoint-free) funnel and triangle
    census. Guards the class of bug the r2 pack_sequences scare was about:
    results that depend on which materialization a job happened to see."""
    for name in ("q_graph_pagerank", "q_funnel", "q_graph_triangles"):
        results = {_canon(QUERIES[name](spark, sf_dir)) for _ in range(5)}
        assert len(results) == 1, name


WAVE4 = [
    "q_markov_transitions", "q_user_streaks", "q_concurrency_peak",
    "q_ewma_revenue", "q_outlier_mad", "q_knn_classify", "q_vocab_growth",
    "q_lateral_topk", "q_setsim_join_prefix", "q_ohlc_bars",
    "q_time_weighted_avg", "q_containment_dedup",
]


def test_wave4_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every fourth-wave operator must produce the bit-identical canonical
    result at shuffle widths 1, 7, and 32 — the partitioning-invariance the
    registry's determinism rules (decimal/integer arithmetic, total tie
    orders) are supposed to buy. A flake here is exactly the class that
    becomes a driver hash-fail at a different parallelism."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE4:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE5678 = [
    "q_skyline_pareto", "q_allocation_largest_remainder", "q_benford_profile",
    "q_column_profile", "q_histogram_equidepth", "q_cusum_anomaly",
    "q_autocorr_lag", "q_rfm_segmentation", "q_inverted_index",
    "q_fuzzy_join_levenshtein", "q_graph_jaccard_neighbors",
    "q_bm25_topk", "q_sample_weighted", "q_assoc_rules", "q_cohort_ltv",
    "q_funnel_latency", "q_abc_analysis",
    "q_heavy_hitters", "q_rolling_median", "q_theil_sen", "q_session_paths",
    "q_knn_confusion", "q_funnel_windowed", "q_order_gaps", "q_dedup_chunks",
    "q_ab_experiment", "q_stickiness", "q_ols_trend", "q_out_of_order_events",
    "q_golden_record",
]


def test_wave5678_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every fifth-through-eighth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — including the two
    running_total-based ops (q_sample_weighted, q_abc_analysis), whose
    two-phase prefix sums re-sample range boundaries per evaluation."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE5678:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_prefix_sum_ops_repetition_stable(spark, sf_dir):
    """10 independent evaluations of the two prefix-sum-based wave-6 ops
    (fresh checkpoints, freshly sampled range boundaries each time) must be
    bit-identical — the q_pack_sequences hardening applied to its
    descendants."""
    for name in ("q_sample_weighted", "q_abc_analysis"):
        results = {_canon(QUERIES[name](spark, sf_dir)) for _ in range(10)}
        assert len(results) == 1, name


WAVE10 = [
    "q_graph_bfs_hops", "q_item_item_cf", "q_bitmap_distinct_rollup",
    "q_simpson_diversity", "q_geo_nearest_grid",
]


def test_wave10_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every tenth-wave operator must produce the bit-identical canonical
    result at shuffle widths 1, 7, and 32 — including the iterative BFS
    (frontier anti-joins re-plan per width) and the bitmap rollup (bucket
    bitmaps are built per-partition before the merge)."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE10:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE11 = [
    "q_incremental_agg_maintenance", "q_weighted_median", "q_rrf_fusion",
    "q_seasonal_forecast", "q_vocab_oov_rate",
]


def test_wave11_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every eleventh-wave operator must produce the bit-identical canonical
    result at shuffle widths 1, 7, and 32 — including the two dense_ids
    rankings inside q_rrf_fusion (range boundaries re-sample per width)."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE11:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE12 = [
    "q_udtf_installments", "q_variant_funcs", "q_pipe_syntax",
    "q_snapshot_diff_cdc", "q_growth_rates",
]


def test_wave12_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every twelfth-wave operator must produce the bit-identical canonical
    result at shuffle widths 1, 7, and 32."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE12:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE13 = [
    "q_pit_features", "q_late_arriving_dim", "q_sql_scalar_function",
    "q_bitmap_audience_overlap",
]


def test_wave13_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every thirteenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE13:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE14 = ["q_share_of_parent", "q_topn_others", "q_attribution_linear"]


def test_wave14_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every fourteenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — including the
    largest-remainder credit split (per-purchase click ranks re-sort per
    width)."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE14:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE15 = [
    "q_try_arithmetic", "q_bitwise_agg", "q_lambda_funcs", "q_mask_pii",
    "q_json_quarantine",
]


def test_wave15_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every fifteenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — bit_xor and the
    shifted-flag sums are algebra-invariant, the rest must prove it."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE15:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE16 = ["q_xml_funcs", "q_collation_compare", "q_event_pattern_match"]


def test_wave16_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every sixteenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — the CEP sequences
    rebuild their sort_array order per width."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE16:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE17 = ["q_table_checksum", "q_keyspace_gaps", "q_rank_wilson"]


def test_wave17_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every seventeenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — the XOR checksum is
    algebra-invariant, the Wilson doubles must prove their expression
    tree survives re-planning."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE17:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE18 = ["q_dedup_sorted_neighborhood", "q_incremental_agg_retraction"]


def test_wave18_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every eighteenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — the SNM position
    ids re-derive their range boundaries per width."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE18:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


WAVE19 = ["q_interval_coverage", "q_business_days_sla"]


def test_wave19_ops_stable_across_shuffle_partitions(spark, sf_dir):
    """Every nineteenth-wave operator must produce the bit-identical
    canonical result at shuffle widths 1, 7, and 32 — interval coverage
    found its duplicate-boundary nondeterminism through exactly this
    class of check (distinct-before-windows is the fix)."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in WAVE19:
            results = set()
            for n in ("1", "7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                results.add(_canon(QUERIES[name](spark, sf_dir)))
            assert len(results) == 1, f"{name} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_wave20_percentile_cont_stable_across_shuffle_partitions(spark, sf_dir):
    """q_percentile_cont_exact must produce the bit-identical canonical
    result at shuffle widths 1, 7, and 32 — six order statistics through
    the two-phase bucket machinery."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = set()
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.add(_canon(QUERIES["q_percentile_cont_exact"](spark, sf_dir)))
        assert len(results) == 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_wave21_bom_rollup_stable_across_shuffle_partitions(spark, sf_dir):
    """q_bom_rollup must produce the bit-identical canonical result at
    shuffle widths 1, 7, and 32."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = set()
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.add(_canon(QUERIES["q_bom_rollup"](spark, sf_dir)))
        assert len(results) == 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_wave22_scd2_lookup_stable_across_shuffle_partitions(spark, sf_dir):
    """q_scd2_lookup must produce the bit-identical canonical result at
    shuffle widths 1, 7, and 32."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = set()
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.add(_canon(QUERIES["q_scd2_lookup"](spark, sf_dir)))
        assert len(results) == 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
