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


def test_cooccurrence_matches_python_model(spark, sf_dir):
    """Full independent recomputation in plain Python (sf0.001 corpus is
    small): distinct presence, df, top-K vocab with the (df DESC, term)
    tie-break, per-doc pairs, counts, and the exact double-arithmetic lift
    — every output row and value must match the Spark result exactly."""
    from collections import Counter
    from itertools import combinations

    from finegourmet_spark.operators.textops import COOC_VOCAB

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    presence = {
        d: {t for t in txt.strip().lower().split(" ") if t} for d, txt in docs.items()
    }
    df = Counter(t for terms in presence.values() for t in terms)
    vocab = dict(sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:COOC_VOCAB])
    n = len(docs)
    c: Counter = Counter()
    for terms in presence.values():
        for a, b in combinations(sorted(t for t in terms if t in vocab), 2):
            c[(a, b)] += 1
    expected = {
        (a, b): (
            cnt,
            int(math.floor(1000000.0 * cnt * n / (float(vocab[a]) * float(vocab[b])))),
        )
        for (a, b), cnt in c.items()
    }
    got = {
        (r["term_a"], r["term_b"]): (r["n_docs_both"], r["lift_ppm"])
        for r in QUERIES["q_cooccurrence_lift"](spark, sf_dir).collect()
    }
    assert got == expected
    # and the documented bound: n_docs_both ≤ min(df_a, df_b)
    for (a, b), (cnt, _) in got.items():
        assert cnt <= min(vocab[a], vocab[b])


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
