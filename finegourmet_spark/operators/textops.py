"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §2B,
BASELINE.json north star): token stats, quality scoring, language-ID
heuristic, document fingerprinting.

All hot-path expressions are JVM-side built-ins (split/length/regexp/md5) —
whole-stage-codegen friendly, no Python in the per-document path. At 100 TB
these run as a single scan + projection per document partition with no
shuffle until the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finegourmet_spark.functions.ids import running_total
from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t

# stopword marker sets for the language-ID heuristic (counted via the
# replace-length trick so the same expression runs in Spark and DuckDB)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "das"],
    "es": ["el", "los", "que"],
}


def _occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a padded token — engine-portable
    exact arithmetic: (len(s) - len(replace(s, t, ''))) / len(t)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    tok = f" {needle} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(tok), F.lit(""))))
        / F.lit(len(tok))
    ).cast("bigint")


def _sql_occurrences(expr: str, needle: str) -> str:
    tok = f" {needle} "
    padded = f"(' ' || {expr} || ' ')"
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{tok}', ''))) / {len(tok)} AS BIGINT)"
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(length(text)) AS min_chars,
           MAX(length(text)) AS max_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token/char statistics per language (generalizes ref X1-X3
    string cleaning, etl/transform.py:53-70, to corpus analytics)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        d.select("lang", "source", F.size(toks).alias("n_tokens"), F.length("text").alias("len"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("len").cast("bigint").alias("total_chars"),
            F.min("len").cast("bigint").alias("min_chars"),
            F.max("len").cast("bigint").alias("max_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# the corpus length gate, shared by q_text_quality and q_corpus_curate so
# the composed pipeline can never drift from the standalone filter
QUALITY_MIN_CHARS = 50
QUALITY_MIN_TOKENS = 10


@query(
    "q_text_quality",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
           length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
           {the_count} AS stopword_hits,
           (length(text) >= {min_chars} AND len(string_split(text, ' ')) >= {min_tokens})
             AS passes_length_gate
    FROM documents
    """.format(
        the_count=_sql_occurrences("text", "the"),
        min_chars=QUALITY_MIN_CHARS,
        min_tokens=QUALITY_MIN_TOKENS,
    ),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals: length gates, punctuation density, stopword
    hits — the standard pre-training corpus filters, all as exact integer
    arithmetic (ratios are single IEEE divisions)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).cast("bigint").alias("n_punct"),
        _occurrences(F.col("text"), "the").alias("stopword_hits"),
        (
            (n_chars >= QUALITY_MIN_CHARS) & (n_tokens >= QUALITY_MIN_TOKENS)
        ).alias("passes_length_gate"),
    )


def _lang_score_cols() -> list[Column]:
    return [
        sum((_occurrences(F.col("text"), m) for m in markers), F.lit(0).cast("bigint")).alias(
            f"score_{lang}"
        )
        for lang, markers in LANG_MARKERS.items()
    ]


@query(
    "q_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             {en} AS score_en, {fr} AS score_fr, {de} AS score_de, {es} AS score_es
      FROM documents
    )
    SELECT doc_id, score_en, score_fr, score_de, score_es,
           CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es
                     AND score_en > 0 THEN 'en'
                WHEN score_fr >= score_de AND score_fr >= score_es AND score_fr > 0 THEN 'fr'
                WHEN score_de >= score_es AND score_de > 0 THEN 'de'
                WHEN score_es > 0 THEN 'es'
                ELSE 'unknown' END AS predicted_lang
    FROM scored
    """.format(
        en=" + ".join(_sql_occurrences("text", m) for m in LANG_MARKERS["en"]),
        fr=" + ".join(_sql_occurrences("text", m) for m in LANG_MARKERS["fr"]),
        de=" + ".join(_sql_occurrences("text", m) for m in LANG_MARKERS["de"]),
        es=" + ".join(_sql_occurrences("text", m) for m in LANG_MARKERS["es"]),
    ),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic with a deterministic argmax
    (priority order en > fr > de > es on ties)."""
    d = t(spark, sf_dir, "documents")
    scored = d.select("doc_id", *_lang_score_cols())
    en, fr, de, es = (F.col(f"score_{lg}") for lg in ("en", "fr", "de", "es"))
    pred = (
        F.when((en >= fr) & (en >= de) & (en >= es) & (en > 0), "en")
        .when((fr >= de) & (fr >= es) & (fr > 0), "fr")
        .when((de >= es) & (de > 0), "de")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return scored.select(
        "doc_id", "score_en", "score_fr", "score_de", "score_es", pred.alias("predicted_lang")
    )


# character-trigram profiles (language-characteristic SUBSTRINGS, not
# word-boundary markers — catches morphology inside words, the practical
# upgrade over stopword counting; ROADMAP round-2 item). Profiles are
# standard high-frequency trigrams per language.
CHAR_TRIGRAMS = {
    "en": ["the", "ing", "and", "ion"],
    "fr": ["les", "ent", "ais", "eur"],
    "de": ["der", "sch", "ein", "ich"],
    "es": ["que", "los", "ado", "nte"],
}


def _substr_count(col: Column, needle: str) -> Column:
    """Non-overlapping substring occurrence count (no word padding)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def _sql_substr_count(expr: str, needle: str) -> str:
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{needle}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


@query(
    "q_lang_id_chargram",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             {en} AS score_en, {fr} AS score_fr, {de} AS score_de, {es} AS score_es
      FROM documents
    )
    SELECT doc_id, score_en, score_fr, score_de, score_es,
           CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es
                     AND score_en > 0 THEN 'en'
                WHEN score_fr >= score_de AND score_fr >= score_es AND score_fr > 0 THEN 'fr'
                WHEN score_de >= score_es AND score_de > 0 THEN 'de'
                WHEN score_es > 0 THEN 'es'
                ELSE 'unknown' END AS predicted_lang
    FROM scored
    """.format(
        en=" + ".join(_sql_substr_count("lower(text)", m) for m in CHAR_TRIGRAMS["en"]),
        fr=" + ".join(_sql_substr_count("lower(text)", m) for m in CHAR_TRIGRAMS["fr"]),
        de=" + ".join(_sql_substr_count("lower(text)", m) for m in CHAR_TRIGRAMS["de"]),
        es=" + ".join(_sql_substr_count("lower(text)", m) for m in CHAR_TRIGRAMS["es"]),
    ),
)
def q_lang_id_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via character-trigram profile counts (the n-gram-profile
    method of Cavnar & Trenkle '94, reduced to a fixed profile): counts are
    exact integer arithmetic via the replace-length trick, argmax with the
    same deterministic priority tie-break as q_lang_id. Still one
    projection, no shuffle, no Python."""
    d = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scored = d.select(
        "doc_id",
        *[
            sum(
                (_substr_count(low, m) for m in grams), F.lit(0).cast("bigint")
            ).alias(f"score_{lang}")
            for lang, grams in CHAR_TRIGRAMS.items()
        ],
    )
    en, fr, de, es = (F.col(f"score_{lg}") for lg in ("en", "fr", "de", "es"))
    pred = (
        F.when((en >= fr) & (en >= de) & (en >= es) & (en > 0), "en")
        .when((fr >= de) & (fr >= es) & (fr > 0), "fr")
        .when((de >= es) & (de > 0), "de")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return scored.select(
        "doc_id", "score_en", "score_fr", "score_de", "score_es",
        pred.alias("predicted_lang"),
    )


@query(
    "q_tokenize_bpe",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens,
           regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')[1] AS first_piece
    FROM documents
    """,
)
def q_tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    tokenizer (letter runs / digit runs / single non-alnum pieces — the
    pre-tokenization split most BPE vocabularies assume). Both JVM-side
    regexp engines; counts feed corpus cost estimates at 100 TB."""
    d = t(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    return d.select(
        "doc_id",
        F.size(pieces).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.element_at(pieces, 1).alias("first_piece"),
    )


@query(
    "q_hypertable_rollup",
    oracle="""
    WITH minute_agg AS (
      SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS minute_start,
             event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,4))) AS val
      FROM events
      GROUP BY 1, 2
    )
    SELECT CAST(time_bucket(INTERVAL '1 hour', minute_start) AS TIMESTAMP) AS hour_start,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(val) AS DOUBLE) AS total_value
    FROM minute_agg
    GROUP BY 1, 2
    """,
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: minute partials →
    hourly rollup, re-aggregating the PARTIALS (counts and decimal sums are
    associative) rather than rescanning raw events. At 100 TB the minute
    layer is a materialized table and every coarser resolution derives from
    it — this query is the derivation plan."""
    e = t(spark, sf_dir, "events")
    minute = (
        e.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("val"),
        )
        .select(F.col("w.start").alias("minute_start"), "event_type", "n", "val")
    )
    return (
        minute.groupBy(F.window("minute_start", "1 hour").alias("w"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("val").cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "total_value")
    )


@query("q_hll_rollup")  # rows-only: DataSketches HLL binary is engine-specific
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: minute-level HLL sketches of distinct users
    → hourly rollup by UNIONING THE SKETCHES (hll_union_agg), never
    rescanning raw events — the count-distinct twin of q_hypertable_rollup
    (whose counts/sums are trivially associative; distinct counts need a
    sketch to re-aggregate). At 100 TB the minute sketches are the stored
    materialization and every coarser resolution derives from them.
    Estimate accuracy vs exact countDistinct is pytest-asserted
    (tests/test_approx_and_lsh.py)."""
    e = t(spark, sf_dir, "events")
    minute = (
        e.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.col("w.start").alias("minute_start"), "event_type", "sk")
    )
    return (
        minute.groupBy(F.window("minute_start", "1 hour").alias("w"), "event_type")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            F.hll_sketch_estimate("sk").alias("n_users_est"),
        )
    )


SAMPLE_K = 20  # docs kept per (lang, source) stratum


@query(
    "q_sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source, rn AS sample_rank
    FROM ranked WHERE rn <= {SAMPLE_K}
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep K documents per (lang,
    source) stratum, chosen by ordering on md5(doc_id) — a fixed
    pseudo-random permutation that is identical on every engine, run, and
    partitioning (engine-seeded RNG sampling is not reproducible across
    systems; hash-ordering is). This is the data-mixing primitive: per-
    stratum quotas compose into corpus mixture weights. One shuffle on the
    stratum key; per-stratum rank is window-local."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
    )


EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
URL_RE = r"https?://[^ ]+"
DIGITS_RE = r"[0-9][0-9 .-]{6,}[0-9]"


@query(
    "q_text_scrub_pii",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{DIGITS_RE}', '<NUM>', 'g') AS scrubbed,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{URL_RE}')) AS n_urls
    FROM documents
    """,
)
def q_text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: emails / URLs / long digit runs
    replaced with typed placeholders, plus per-doc detection counts —
    JVM-side regexp only (generalizes ref X2-X4 normalization to corpus
    redaction)."""
    d = t(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ),
        DIGITS_RE,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(URL_RE), 0)).cast("bigint").alias("n_urls"),
    )


CHUNK_TOKENS = 20


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    )
    SELECT doc_id,
           i AS chunk_id,
           array_to_string(tk[(i * {CHUNK_TOKENS} + 1):((i + 1) * {CHUNK_TOKENS})], ' ')
             AS chunk_text,
           least({CHUNK_TOKENS}, len(tk) - i * {CHUNK_TOKENS}) AS n_tokens
    FROM toks, unnest(range(0, CAST(ceil(len(tk) / {CHUNK_TOKENS}.0) AS BIGINT))) AS u(i)
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking — the context-window prep step of a training-data
    pipeline: fixed-size token windows exploded to (doc_id, chunk_id,
    chunk_text) rows. Collection-level slice per chunk (no per-element
    lambdas — see ARCHITECTURE.md §6); chunking is a pure projection +
    generate, no shuffle at any corpus size."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast("bigint")
    chunked = d.select(
        "doc_id",
        toks.alias("tk"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.array_join(
            F.slice(F.col("tk"), F.col("chunk_id") * CHUNK_TOKENS + 1, F.lit(CHUNK_TOKENS)),
            " ",
        ).alias("chunk_text"),
        F.least(
            F.lit(CHUNK_TOKENS).cast("bigint"),
            F.size("tk") - F.col("chunk_id") * CHUNK_TOKENS,
        ).alias("n_tokens"),
    )


PACK_BUDGET = 256


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM toks
    )
    SELECT CAST(floor((cum_tokens - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY 1
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents are laid out in a
    stable order and assigned to fixed-token bins by their running token
    offset (bin = ⌊start_offset / budget⌋) — the streaming-friendly
    approximation of bin packing that needs ONE scan, no iterative solver.
    The running offset is computed HIERARCHICALLY (functions/ids.py::
    running_total: per-partition token sums → driver offsets → partition-
    local cumsum) — value-identical to the oracle's global cumulative-sum
    window but with no single-task stage, so the packing scales out."""
    d = t(spark, sf_dir, "documents")

    toks = d.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))
    packed = running_total(toks, ["doc_id"], "n_tokens", "cum_tokens")
    return (
        packed.select(
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / float(PACK_BUDGET))
            .cast("bigint")
            .alias("bin_id"),
            "doc_id",
            "n_tokens",
        )
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "q_split_train_eval",
    oracle="""
    SELECT lang,
           COUNT(*) FILTER (WHERE doc_id % 10 < 8) AS n_train,
           COUNT(*) FILTER (WHERE doc_id % 10 IN (8)) AS n_val,
           COUNT(*) FILTER (WHERE doc_id % 10 IN (9)) AS n_test
    FROM documents
    GROUP BY lang
    """,
)
def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by key arithmetic (80/10/10):
    membership is a pure function of the stable doc key, so the split is
    identical on every run, cluster, and engine — the reproducibility
    property random sampling (engine-seeded RNGs) can't give across systems."""
    d = t(spark, sf_dir, "documents")
    bucket = F.col("doc_id") % 10
    return d.groupBy("lang").agg(
        F.count(F.when(bucket < 8, 1)).alias("n_train"),
        F.count(F.when(bucket == 8, 1)).alias("n_val"),
        F.count(F.when(bucket == 9, 1)).alias("n_test"),
    )


@query(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_hash,
           substring(md5(lower(trim(text))), 1, 8) AS short_fp,
           md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' '))
             AS bow_fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + order-insensitive
    bag-of-words fingerprint (md5 of the sorted distinct vocabulary — robust
    to token reordering, the cheap near-dup signal before MinHash). Shares
    the canonical normalization with the dedup family so content_hash here
    equals q_dedup_exact's content_hash for the same document."""
    from finegourmet_spark.operators.dedup import normalized_text

    d = t(spark, sf_dir, "documents")
    norm = normalized_text()
    bow = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " "))
    return d.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        F.substring(F.md5(norm), 1, 8).alias("short_fp"),
        bow.alias("bow_fingerprint"),
    )


def _sql_ngrams(n: int) -> str:
    """DuckDB distinct word-n-gram list over lower(trim(text))."""
    toks = "string_split(lower(trim(text)), ' ')"
    joined = " || ' ' || ".join(f"{toks}[i+{j}]" if j else f"{toks}[i]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 0) + 1), i -> {joined}))"
    )


@query(
    "q_repetition_ratio",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             greatest(len(string_split(lower(trim(text)), ' ')) - 2, 0) AS total_3g,
             len({_sql_ngrams(3)}) AS distinct_3g
      FROM documents
    )
    SELECT doc_id, total_3g, distinct_3g,
           CASE WHEN total_3g > 0
                THEN 1.0 - CAST(distinct_3g AS DOUBLE) / total_3g
                ELSE 0.0 END AS rep_ratio,
           (total_3g > 0 AND
            1.0 - CAST(distinct_3g AS DOUBLE) / total_3g > 0.2) AS is_repetitive
    FROM g
    """,
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style quality filter): fraction of
    3-gram occurrences that are repeats of an earlier 3-gram in the same
    document. Boilerplate/spam/failed-scrape pages score high and get
    gated out of pre-training corpora. Pure per-row projection — no
    shuffle, whole-stage codegen, linear at any scale."""
    from finegourmet_spark.operators.dedup import normalized_text, shingles

    d = t(spark, sf_dir, "documents")
    norm = normalized_text()
    total = F.greatest(F.size(F.split(norm, " ")) - 2, F.lit(0)).cast("bigint")
    distinct = F.size(shingles(norm)).cast("bigint")
    g = d.select(
        "doc_id", total.alias("total_3g"), distinct.alias("distinct_3g")
    )
    ratio = F.lit(1.0) - F.col("distinct_3g").cast("double") / F.col("total_3g")
    return g.select(
        "doc_id",
        "total_3g",
        "distinct_3g",
        F.when(F.col("total_3g") > 0, ratio).otherwise(F.lit(0.0)).alias("rep_ratio"),
        ((F.col("total_3g") > 0) & (ratio > 0.2)).alias("is_repetitive"),
    )


EVAL_MOD = 50  # doc_id % 50 == 0 → held-out eval set (deterministic stand-in)
DECON_N = 5  # 5-gram overlap (publicly standard is 8-13-grams; docs here are short)


@query(
    "q_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_sql_ngrams(DECON_N)}) AS gram FROM documents
    ), eval_grams AS (
      SELECT DISTINCT gram FROM sh WHERE doc_id % {EVAL_MOD} = 0
    ), hits AS (
      SELECT s.doc_id, COUNT(DISTINCT s.gram) AS n_overlap
      FROM sh s JOIN eval_grams e ON s.gram = e.gram
      WHERE s.doc_id % {EVAL_MOD} <> 0
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           (COALESCE(h.n_overlap, 0) > 0) AS is_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {EVAL_MOD} <> 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing any
    5-gram with the held-out eval set (the GPT-3/Pile n-gram-collision
    protocol). Shape: explode distinct n-grams, semi-join the train grams
    against the (small) distinct eval-gram set, count hits per doc. The
    shuffle carries (doc_id, gram) pairs; a 100 TB run hashes grams to
    64-bit first (xxhash64) so the exchange moves fixed-width keys — raw
    strings are kept here for engine-portable oracle parity."""
    from finegourmet_spark.operators.dedup import normalized_text, shingles

    from finegourmet_spark.functions.partitioning import spread

    d = t(spark, sf_dir, "documents")
    sh = spread(d).select(
        "doc_id", F.explode(shingles(normalized_text(), DECON_N)).alias("gram")
    )
    eval_grams = sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    hits = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(eval_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_overlap"))
    )
    train = d.filter(F.col("doc_id") % EVAL_MOD != 0).select("doc_id")
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) > 0).alias("is_contaminated"),
    )


@query(
    "q_corpus_curate",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
             md5(lower(trim(text))) AS h
      FROM documents
      WHERE length(text) >= {QUALITY_MIN_CHARS}
        AND len(string_split(text, ' ')) >= {QUALITY_MIN_TOKENS}
        AND lang IN ('en', 'fr', 'de', 'es')
    ), surv AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM base
    ), final AS (
      SELECT doc_id, lang, n_tokens,
             CASE WHEN doc_id % 10 < 8 THEN 'train'
                  WHEN doc_id % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM surv WHERE rn = 1
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM final GROUP BY split, lang
    """,
)
def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline: quality gate → exact dedup (lowest
    doc_id survives) → deterministic train/val/test split → per-split corpus
    accounting. One scan, one dedup shuffle on the 16-byte hash, one final
    agg — the end-to-end shape every pre-training data refresh runs, showing
    the individual operators (q_text_quality, q_dedup_exact,
    q_split_train_eval) compose without extra passes."""
    from pyspark.sql.window import Window

    from finegourmet_spark.operators.dedup import normalized_text

    d = t(spark, sf_dir, "documents")
    base = d.filter(
        (F.length("text") >= QUALITY_MIN_CHARS)
        & (F.size(F.split("text", " ")) >= QUALITY_MIN_TOKENS)
        & F.col("lang").isin("en", "fr", "de", "es")
    ).select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(normalized_text()).alias("h"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    surv = base.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    bucket = F.col("doc_id") % 10
    final = surv.select(
        "lang",
        "n_tokens",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias(
            "split"
        ),
    )
    return final.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# round-3 additions: term weighting, fingerprinting, LM scoring, mixing
# ---------------------------------------------------------------------------

TFIDF_TOP = 3


@query(
    "q_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE length(term) > 0 GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), nd AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
             CAST(tf.tf * CAST(floor(1000000.0 *
                    ln((nd.n_docs + 1.0) / (dfreq.df + 1.0))) AS BIGINT)
                  AS BIGINT) AS tfidf_micro
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_micro DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, tf, tfidf_micro FROM ranked WHERE rk <= {TFIDF_TOP}
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf keyword extraction: top-{3} terms per document by
    tf · idf_micro, ties broken lexicographically, where idf_micro =
    floor(1e6·ln((N+1)/(df+1))) — the idf is quantized to integer
    micro-nats ONCE per distinct df, then the score is exact integer
    arithmetic. round(tf·ln(...), k) would inherit the Java-vs-C
    round()-of-double divergence (see q_lm_bigram_score); floor of the
    scaled ln flips only if ln lands within an ulp of a 1e-6 grid point,
    and only per distinct df value rather than per output row (r3 review).

    Scale shape: TWO shuffles total, no tf⋈df join. The token stream is
    repartitioned on term ONCE; hash(term) satisfies the clustered
    distribution of both the (doc_id, term) tf-aggregate and the df window
    above it (df = COUNT(*) OVER (PARTITION BY term) on the tf table — one
    row per containing doc, so the window count IS the document frequency),
    so no exchange separates them (plan-asserted in test_plan_shapes.py).
    The only other shuffle is the final per-doc ranking window. N (one row)
    is a broadcast cross join, never a driver round-trip in the plan."""
    from pyspark.sql.window import Window

    from finegourmet_spark.operators.dedup import normalized_text

    d = t(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(normalized_text(), " ")).alias("term"))
        .filter(F.length("term") > 0)
        .repartition("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    w_term = Window.partitionBy("term")
    n_docs = d.agg(F.count("*").alias("n_docs"))
    idf_micro = F.floor(
        F.lit(1000000.0) * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    ).cast("long")
    scored = (
        tf.withColumn("df", F.count("*").over(w_term))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (F.col("tf") * idf_micro).cast("long").alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_micro").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP)
        .drop("rk")
    )


WINNOW_W = 4  # winnowing window: shingle positions per window


@query(
    "q_winnow_fingerprints",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, i - 1 AS pos,
             md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS h,
             greatest(len(t) - 2, 0) AS n_sh
      FROM tk, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
    ), w AS (
      SELECT doc_id, pos, n_sh,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
               AS fp
      FROM sh
    )
    SELECT doc_id, fp, COUNT(*) AS n_windows
    FROM w WHERE pos <= n_sh - {WINNOW_W}
    GROUP BY 1, 2
    """,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS algorithm): hash every positional 3-gram shingle, slide a
    {WINNOW_W}-wide window over the hash sequence, keep each window's MIN —
    guaranteeing any shared run of ≥ w+k-1 tokens between two documents
    shares a fingerprint, with ~2/(w+1) selection density. The portable hash
    is the md5 hex string (lexicographic MIN is identical on every engine;
    integer rolling hashes are engine-specific).

    Scale shape: explode positional shingles → ONE doc_id-keyed shuffle
    feeding both window passes (count + sliding min) → per-doc fingerprint
    distinct. Shuffle carries (doc_id, pos, 32-byte hash); window state is
    {WINNOW_W} rows. Docs shorter than w+2 tokens yield no full window and
    drop out (standard winnowing semantics)."""
    from pyspark.sql.window import Window

    from finegourmet_spark.operators.dedup import normalized_text, shingle_seq

    d = t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.posexplode(shingle_seq(normalized_text(), 3)).alias("pos", "sh")
    ).select("doc_id", "pos", F.md5("sh").alias("h"))
    w_doc = Window.partitionBy("doc_id")
    w_slide = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    fps = (
        sh.withColumn("n_sh", F.count("*").over(w_doc))
        .withColumn("fp", F.min("h").over(w_slide))
        .filter(F.col("pos") <= F.col("n_sh") - WINNOW_W)
    )
    return fps.groupBy("doc_id", "fp").agg(F.count("*").alias("n_windows"))


LM_PPM_SCALE = 1000000


@query(
    "q_lm_bigram_score",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM tk, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)
    ), cb AS (
      SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY 1
    ), cu AS (
      SELECT tok, COUNT(*) AS cu
      FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
            FROM documents)
      GROUP BY 1
    ), v AS (
      SELECT COUNT(*) AS v FROM cu
    ), pb AS (
      SELECT cb.bigram,
             CAST(floor({LM_PPM_SCALE}.0 * (cb.cb + 1) / (cu.cu + v.v)) AS BIGINT)
               AS p_ppm
      FROM cb JOIN cu ON split_part(cb.bigram, ' ', 1) = cu.tok CROSS JOIN v
    )
    SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(floor(1000.0 * SUM(pb.p_ppm) / COUNT(*)) AS BIGINT)
             AS avg_p_ppm_milli
    FROM bg JOIN pb USING (bigram)
    GROUP BY 1
    """,
)
def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-conditional bigram LM scoring (the KenLM-counts shape): build
    add-one-smoothed bigram probabilities P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V)
    from the corpus itself, then score each document by its mean bigram
    probability — the perplexity-style quality signal used to filter
    low-likelihood text. Probabilities are kept as FLOORED parts-per-million
    integers: every engine computes bigint arithmetic + one IEEE division
    identically, whereas ln() differs in the last ulp across libm
    implementations (a real deployment reports ln-space perplexity; the ppm
    scale is a deliberate cross-engine-determinism choice).

    Scale shape: two count passes (bigram, unigram — both map-side combined)
    → counts join keyed on the leading token → doc scoring join keyed on the
    bigram. Vocabulary size V (one row) broadcasts. No window, no driver
    materialization; everything shuffles on count-table keys, never text."""
    from finegourmet_spark.operators.dedup import normalized_text, shingle_seq

    d = t(spark, sf_dir, "documents")
    bg = d.select("doc_id", F.explode(shingle_seq(normalized_text(), 2)).alias("bigram"))
    cb = bg.groupBy("bigram").agg(F.count("*").alias("cb"))
    cu = (
        d.select(F.explode(F.split(normalized_text(), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cu"))
    )
    v = cu.agg(F.count("*").alias("v"))
    pb = (
        cb.withColumn("w1", F.split("bigram", " ").getItem(0))
        .join(cu, F.col("w1") == F.col("tok"))
        .crossJoin(F.broadcast(v))
        .select(
            "bigram",
            F.floor(
                F.lit(LM_PPM_SCALE) * (F.col("cb") + 1) / (F.col("cu") + F.col("v"))
            )
            .cast("bigint")
            .alias("p_ppm"),
        )
    )
    # mean reported as floor(1000·sum/count): exact long sum + one IEEE
    # division + floor — deterministic across engines. round(avg, 3) is NOT:
    # at sf1 a doc hit sum/count = …; round() then differs between Java
    # (BigDecimal.valueOf rounds the SHORTEST decimal repr of the double)
    # and C/DuckDB (rounds the exact binary value) — observed .388 vs .387.
    return (
        bg.join(pb, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.floor(F.lit(1000) * F.sum("p_ppm") / F.count("*"))
            .cast("bigint")
            .alias("avg_p_ppm_milli"),
        )
    )


MIX_BUDGET = 200
MIX_WEIGHTS = {"en": 0.4, "zh": 0.2, "es": 0.15, "fr": 0.15, "de": 0.1}
MIX_DEFAULT_W = 0.05

_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in MIX_WEIGHTS.items())


@query(
    "q_domain_mixture",
    oracle=f"""
    WITH weights(lang, w) AS (VALUES {_MIX_VALUES}),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS mix_rank
      FROM documents
    )
    SELECT doc_id, lang, mix_rank
    FROM ranked LEFT JOIN weights USING (lang)
    WHERE mix_rank <= CAST(floor(CAST(COALESCE(w, {MIX_DEFAULT_W}) AS DOUBLE)
                                 * {MIX_BUDGET}) AS BIGINT)
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture resampling (the DoReMi/data-mixing primitive): each
    language gets floor(weight × budget) documents, chosen by the same
    deterministic md5 permutation as q_sample_stratified — so the sampled
    corpus hits a TARGET domain mixture regardless of the raw corpus skew,
    reproducibly on any engine/cluster/run. Unknown domains fall back to a
    small default weight instead of silently dropping.

    Scale shape: one shuffle on lang (the window), weights broadcast; quota
    comparison is a projection. At 100 TB weights come from a config table
    and the budget is per-epoch tokens, not doc counts — same plan."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    weights = d.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in MIX_WEIGHTS.items()], "lang string, w double"
    )
    wspec = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    quota = F.floor(
        F.coalesce("w", F.lit(MIX_DEFAULT_W)) * MIX_BUDGET
    ).cast("bigint")
    return (
        d.select("doc_id", "lang", F.row_number().over(wspec).alias("mix_rank"))
        .join(F.broadcast(weights), "lang", "left")
        .filter(F.col("mix_rank") <= quota)
        .select("doc_id", "lang", "mix_rank")
    )


SEQLEN_BIN = 64


@query(
    "q_seqlen_histogram",
    oracle=f"""
    WITH n AS (
      SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT CAST((n_tokens // {SEQLEN_BIN}) * {SEQLEN_BIN} AS BIGINT) AS bin_start,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM((n_tokens // {SEQLEN_BIN} + 1) * {SEQLEN_BIN} - n_tokens)
                AS BIGINT) AS padding_waste
    FROM n GROUP BY 1
    """,
)
def q_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram with per-bin padding waste: how many tokens
    BUCKETED padding would burn per length bin — every sequence in bin b is
    padded to the bin's exclusive upper boundary (b+1)·64, the fixed-batch-
    shape policy. Deliberately NOT pad-to-next-multiple: a doc of exactly
    64 tokens sits in bin [64, 128) and pays 64 padding, because its batch
    shape is 128 (r3 review asked to pin this down). The planning
    input for choosing packing (q_pack_sequences) vs padding. Pure
    projection + one hash agg."""
    d = t(spark, sf_dir, "documents")
    n = d.select(F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))
    bin_start = (F.floor(F.col("n_tokens") / SEQLEN_BIN) * SEQLEN_BIN).cast("bigint")
    pad = (
        (F.floor(F.col("n_tokens") / SEQLEN_BIN) + 1) * SEQLEN_BIN - F.col("n_tokens")
    ).cast("bigint")
    return (
        n.select(bin_start.alias("bin_start"), "n_tokens", pad.alias("pad"))
        .groupBy("bin_start")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("pad").cast("bigint").alias("padding_waste"),
        )
    )


BPE_TOP_MERGES = 20


@query(
    "q_bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS w FROM documents
    ), pairs AS (
      SELECT substring(w, i, 2) AS pair
      FROM words, unnest(range(1, greatest(length(w) - 1, 0) + 1)) AS u(i)
      WHERE length(w) > 1
    )
    SELECT pair, COUNT(*) AS n_occ
    FROM pairs GROUP BY pair
    ORDER BY n_occ DESC, pair LIMIT {BPE_TOP_MERGES}
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE-training iteration: corpus-frequency counts of adjacent
    character pairs inside words (every word OCCURRENCE counts, as in real
    BPE training), top-{20} merge candidates with a lexicographic tie-break.
    Pairs with q_tokenize_bpe (the application side) to cover both halves of
    the tokenizer lifecycle; subsequent merge rounds re-segment with the
    chosen merge and repeat the same plan.

    Scale shape: explode (word stream), explode (pair positions) — both
    generate-only — then ONE hash agg with map-side combine on the tiny
    pair-vocabulary key space, finished by TakeOrderedAndProject (no global
    sort, no single-partition window)."""
    d = t(spark, sf_dir, "documents")
    from finegourmet_spark.operators.dedup import normalized_text

    words = d.select(
        F.explode(F.split(normalized_text(), " ")).alias("w")
    ).filter(F.length("w") > 1)
    pairs = words.select(
        "w", F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i")
    ).select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(BPE_TOP_MERGES)
    )


COOC_VOCAB = 32


@query(
    "q_cooccurrence_lift",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
        FROM documents
      ) WHERE length(term) > 0
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM toks GROUP BY 1
    ), vocab AS (
      SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT {COOC_VOCAB}
    ), pres AS (
      SELECT toks.doc_id, toks.term, vocab.df FROM toks JOIN vocab USING (term)
    ), nd AS (
      SELECT COUNT(*) AS n FROM documents
    ), pairs AS (
      SELECT a.term AS term_a, b.term AS term_b,
             a.df AS df_a, b.df AS df_b, COUNT(*) AS n_docs_both
      FROM pres a JOIN pres b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2, 3, 4
    )
    SELECT term_a, term_b, CAST(n_docs_both AS BIGINT) AS n_docs_both,
           CAST(floor(1000000.0 * n_docs_both * nd.n /
                      (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE)))
                AS BIGINT) AS lift_ppm
    FROM pairs CROSS JOIN nd
    """,
)
def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term co-occurrence statistics over the frequent vocabulary — the
    counting core of PMI / GloVe-style association mining: document-level
    presence pairs among the top-{32} terms, scored by lift
    P(a,b)/(P(a)P(b)) in FLOORED parts-per-million (integer-exact
    cross-engine, like q_lm_bigram_score; real deployments take ln of it
    for PMI — same counts).

    Scale shape: the token stream is repartitioned on doc_id ONCE —
    hash(doc_id) satisfies the (doc_id, term) distinct AND both sides of
    the presence self-join (same subset-clustering trick as
    q_tfidf_topterms), so no further exchange separates them
    (plan-asserted). Per-doc pair fan-out is bounded by K²/2, so the join
    is linear in docs; the final agg runs on the ≤K²/2 pair key space.
    Corpus size never appears squared anywhere."""
    from finegourmet_spark.operators.dedup import normalized_text

    d = t(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(normalized_text(), " ")).alias("term"))
        .filter(F.length("term") > 0)
        .repartition("doc_id")
        .distinct()
    )
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    vocab = dfreq.orderBy(F.col("df").desc(), "term").limit(COOC_VOCAB)
    pres = toks.join(F.broadcast(vocab), "term").select("doc_id", "term", "df")
    nd = d.agg(F.count("*").alias("n"))
    a = pres.alias("a")
    b = pres.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"),
            F.col("b.term").alias("term_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("n_docs_both"))
    )
    # lift computed ENTIRELY in double with the same left-assoc op order as
    # the oracle: ((1e6·c)·N)/(df_a·df_b). Long products would wrap silently
    # past 2^63 on the Spark side while DuckDB promotes to HUGEINT — double
    # everywhere makes the engines BIT-EQUAL at any scale (identical IEEE
    # sequence), with values exact while intermediates stay below 2^53
    # (c·N ≤ 9e9, i.e. corpora to ~billions of docs; beyond that both
    # engines round identically rather than diverging) — r3 review.
    return pairs.crossJoin(F.broadcast(nd)).select(
        "term_a",
        "term_b",
        "n_docs_both",
        F.floor(
            F.lit(1000000.0)
            * F.col("n_docs_both").cast("double")
            * F.col("n").cast("double")
            / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
        )
        .cast("bigint")
        .alias("lift_ppm"),
    )


VOCAB_BUCKET_DOCS = 100  # docs per growth-curve bucket


@query(
    "q_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), first_seen AS (
      SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1
    ), nv AS (
      SELECT fd // {VOCAB_BUCKET_DOCS} AS bucket,
             count(*) AS new_terms
      FROM first_seen GROUP BY 1
    ), per_bucket AS (
      SELECT doc_id // {VOCAB_BUCKET_DOCS} AS bucket,
             count(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY 1
    )
    SELECT p.bucket * {VOCAB_BUCKET_DOCS} AS first_doc_id,
           CAST(SUM(p.n_docs) OVER w AS BIGINT) AS cum_docs,
           CAST(SUM(p.n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(n.new_terms, 0)) OVER w AS BIGINT) AS cum_vocab
    FROM per_bucket p LEFT JOIN nv n ON n.bucket = p.bucket
    WINDOW w AS (ORDER BY p.bucket)
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): cumulative distinct terms vs
    cumulative tokens, in doc_id ingestion order, one point per
    {VOCAB_BUCKET_DOCS}-doc bucket — the diversity diagnostic a corpus
    builder reads before fixing a dedup/mixing strategy.

    A running count-distinct has no mergeable form, so the scalable exact
    trick is FIRST-OCCURRENCE ATTRIBUTION: a term adds 1 to the bucket of
    its minimum doc_id (one term-keyed map-side-combined agg — the same
    shuffle wordcount pays), and the cumulative curve is a prefix sum over
    the bucket spine. The spine is metadata-scale by construction (pick
    {VOCAB_BUCKET_DOCS} so corpus/width stays bounded — width is the 100 TB
    knob), so the single-partition cumulative window is calendar-like, never
    data-scale."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    nv = (
        tok.groupBy("term")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy(F.expr(f"fd div {VOCAB_BUCKET_DOCS}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    per_bucket = docs.groupBy(
        F.expr(f"doc_id div {VOCAB_BUCKET_DOCS}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(nv, "bucket", "left")
        .select(
            (F.col("bucket") * VOCAB_BUCKET_DOCS).alias("first_doc_id"),
            F.sum("n_docs").over(w).cast("bigint").alias("cum_docs"),
            F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_terms"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_vocab"),
        )
    )


POSTINGS_HEAD = 20  # posting-list head length kept in the index result


@query(
    "q_inverted_index",
    oracle=f"""
    WITH td AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS term, doc_id
      FROM documents
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           array_to_string((list(doc_id ORDER BY doc_id))[1:{POSTINGS_HEAD}], ',')
             AS postings
    FROM td GROUP BY term
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build — the IR core every search / retrieval pipeline
    materializes: term → document frequency + the posting list (sorted
    doc_ids), head-capped at {POSTINGS_HEAD} entries per term for the
    result contract (a production index stores the full list SHARDED by
    term — same shuffle shape, segmented sink).

    One explode → distinct (term, doc_id) — dedup BEFORE the heavy agg so a
    term repeated in a document costs one row, not tf rows — then ONE
    term-keyed agg computing df and the sorted posting head
    (sort_array(collect_list) is deterministic where collect_list alone is
    not: the q_string_agg lesson; per-group memory is bounded by df, and
    the head cap bounds the RESULT row width). Hot terms are the skew case:
    banded re-aggregation (the q_agg_salted pattern) is the knob when a
    stopword's df concentrates one reducer.

    Result contract: the posting head is serialized to a comma-joined
    STRING (not array<bigint>) so order-insensitive canonicalizers can
    hash the row — raw list columns are unhashable in a pandas
    sort_values (driver FAIL in round 4; VERDICT r4 item 1)."""
    td = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"), "doc_id")
        .distinct()
    )
    return td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_HEAD), ","
        ).alias("postings"),
    )


# BM25 parameters as exact rationals: k1 = 1.2 = 6/5, b = 0.75 = 3/4.
# Clearing denominators by 20·L (L = total corpus tokens) turns the
# per-term saturation ratio into pure integers:
#   tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))  ==  44·L·tf / (20·L·tf + 6·L + 18·dl·N)
BM25_QUERY = ("spark", "hash", "window")
BM25_TOP = 10


@query(
    "q_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ), toks_ok AS (
      SELECT doc_id, term FROM toks WHERE length(term) > 0
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks_ok GROUP BY 1
    ), scal AS (
      SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n,
             CAST((SELECT SUM(dl) FROM dl) AS BIGINT) AS l
    ), qtf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks_ok WHERE term IN {BM25_QUERY!r} GROUP BY 1, 2
    ), qdf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM qtf GROUP BY 1
    ), scored AS (
      SELECT q.doc_id,
             (CAST(floor(1000000.0 * ln(1.0 + (s.n - d.df + 0.5)
                                              / (d.df + 0.5))) AS HUGEINT)
              * 44 * s.l * q.tf)
             // (20 * s.l * q.tf + 6 * s.l + 18 * dl.dl * s.n) AS term_score
      FROM qtf q
      JOIN qdf d USING (term)
      JOIN dl ON dl.doc_id = q.doc_id
      CROSS JOIN scal s
    ), total AS (
      SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score_micro
      FROM scored GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT)
             AS rank,
           doc_id, score_micro
    FROM total
    ORDER BY score_micro DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-{BM25_TOP} documents for the fixed query
    {BM25_QUERY} — the ranking function behind Lucene/Elasticsearch and
    most retrieval-augmented pipelines, completing the IR family
    (q_inverted_index stores, q_tfidf_topterms summarizes, this ranks).

    Integer-exact scoring: the tf-saturation ratio is cleared of its
    rational constants (k1=6/5, b=3/4) by multiplying through with 20·L —
    44·L·tf / (20·L·tf + 6·L + 18·dl·N), every term an exact integer
    (decimal(38,0)/HUGEINT — the product idf·44·L·tf reaches ~1e19 at
    sf0.1) — and the idf is Lucene's nonnegative ln(1+(N−df+0.5)/(df+0.5))
    quantized once per distinct df to integer micro-nats (the
    q_tfidf_topterms convention; floor can flip only within an ulp of a
    1e-6 grid point, per DISTINCT df not per row). Division operands are
    nonnegative, so `div` ≡ `//`.

    Scale shape: the query-term filter prunes the token stream to the ≤3
    query terms BEFORE the tf aggregate (predicate pushdown against the
    explode — the corpus-wide work is only the doc-length agg), df and the
    two scalars broadcast, and the final rank runs on the matched-doc
    frame."""
    from finegourmet_spark.operators.dedup import normalized_text

    d = t(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(normalized_text(), " ")).alias("term"))
        .filter(F.length("term") > 0)
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n"))
    l_tot = dl.agg(F.sum("dl").alias("l"))
    scal = n_docs.crossJoin(l_tot)  # 1 row × 1 row
    qtf = (
        toks.filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_micro = F.floor(
        F.lit(1000000.0)
        * F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    ).cast("decimal(38,0)")
    scored = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            (
                (idf_micro * 44 * F.col("l") * F.col("tf"))
            ).alias("num"),
            (
                20 * F.col("l") * F.col("tf")
                + 6 * F.col("l")
                + 18 * F.col("dl") * F.col("n")
            )
            .cast("decimal(38,0)")
            .alias("den"),
        )
        .select("doc_id", F.expr("num div den").alias("term_score"))
    )
    total = scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("bigint").alias("score_micro")
    )
    top = total.orderBy(F.col("score_micro").desc(), "doc_id").limit(BM25_TOP)
    w = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "doc_id", "score_micro"
    )


SAMPLE_STRIDES = 100  # target picks for weighted systematic sampling


@query(
    "q_sample_weighted",
    oracle=f"""
    WITH cum AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
             SUM(n_chars) OVER () AS total
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST((cum - n_chars) // greatest(total // {SAMPLE_STRIDES}, 1)
                AS BIGINT) AS bucket
    FROM cum
    WHERE (cum - n_chars) // greatest(total // {SAMPLE_STRIDES}, 1)
          < cum // greatest(total // {SAMPLE_STRIDES}, 1)
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional SYSTEMATIC sampling of documents (weight =
    n_chars): lay all weights end to end, cut the line into
    {SAMPLE_STRIDES} equal strides, keep each document whose span crosses
    a stride boundary — every document is picked with probability
    proportional to its weight, deterministically (the integer-exact
    sibling of weighted reservoir sampling, whose u^(1/w) keys are
    FP-ambiguous across engines).

    The cumulative weight comes from the hierarchical two-phase
    running_total (functions/ids.py — per-partition sums, driver offsets,
    local cumsum), NOT a global window: the oracle's SUM OVER (ORDER BY)
    states the semantics, the engine never runs a SinglePartition stage
    over the corpus (the q_pack_sequences lesson, plan-asserted). Selection
    and bucket arithmetic are pure integer floor divisions on nonnegative
    operands."""
    from finegourmet_spark.functions.ids import running_total

    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    tot = d.agg(F.sum("n_chars").alias("total"))
    cum = running_total(d, ["doc_id"], "n_chars", "cum")
    return (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("_before", F.col("cum") - F.col("n_chars"))
        # stride floor of 1: a degenerate corpus with total < strides would
        # otherwise divide by zero — NULL under Spark's ANSI-off, an ERROR
        # in DuckDB — the one way this query could silently diverge
        .filter(
            F.expr(f"_before div greatest(total div {SAMPLE_STRIDES}, 1)")
            < F.expr(f"cum div greatest(total div {SAMPLE_STRIDES}, 1)")
        )
        .select(
            "doc_id",
            "n_chars",
            F.expr(f"_before div greatest(total div {SAMPLE_STRIDES}, 1)")
            .cast("bigint")
            .alias("bucket"),
        )
    )


HH_K = 50  # heavy-hitter threshold denominator: report terms with freq > n/K


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ), toks_ok AS (
      SELECT term FROM toks WHERE length(term) > 0
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM toks_ok
    )
    SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM toks_ok CROSS JOIN tot
    GROUP BY term, tot.n
    HAVING count(*) * {HH_K} > n
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters: every token with frequency > n/{HH_K} of the
    corpus token stream — via the two-phase SKETCH-THEN-VERIFY pattern that
    replaces a full vocabulary aggregation at 100 TB: a per-partition
    Misra-Gries summary (capacity {HH_K} counters, mapInPandas — Arrow
    batches, state carried across a partition's batches) nominates
    candidates, then ONE semi-joined exact recount confirms or rejects
    them. Pigeonhole guarantee: an item with global freq > n/{HH_K} has
    freq > n_p/{HH_K} in at least one partition, so it MUST survive that
    partition's summary — no false negatives; the recount removes the
    false positives, making the output exact and deterministic (the
    oracle is the plain GROUP BY/HAVING the sketch avoids).

    Scale shape: the candidate set is ≤ {HH_K}·partitions rows
    (metadata-scale, broadcast back); the only term-keyed shuffle
    aggregates the candidate-filtered stream. Python touches data ONLY
    through the Arrow-vectorized Misra-Gries pass."""
    import pandas as pd

    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("term"))
        .filter(F.length("term") > 0)
    )

    def mg(batches):
        # Merged Misra-Gries: fold each Arrow batch's value_counts into the
        # summary (vectorized — no per-token Python), then restore capacity
        # by subtracting the k-th largest count from everything and dropping
        # non-positives (the standard MG merge; total subtracted mass stays
        # ≤ n_p/(K+1), preserving the no-false-negative guarantee).
        counters: dict[str, int] = {}
        for pdf in batches:
            for term, cnt in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(cnt)
            if len(counters) > HH_K:
                cut = sorted(counters.values(), reverse=True)[HH_K]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        yield pd.DataFrame({"term": list(counters.keys())})

    cand = toks.mapInPandas(mg, "term string").distinct()
    n_tot = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("n_occurrences") * HH_K > F.col("n"))
        .select("term", "n_occurrences")
    )


@query(
    "q_simpson_diversity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ), tc AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY 1, 2, 3
    ), agg AS (
      SELECT doc_id, lang,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(count(*) AS BIGINT) AS dt
      FROM tc GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM((1000000 * (n * n - s2)) // (n * n)) // count(*) AS BIGINT)
             AS avg_simpson_ppm,
           CAST(SUM(dt) AS BIGINT) AS total_distinct,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM agg GROUP BY lang
    """,
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical diversity via the Gini–Simpson index,
    1 − Σ cᵢ²/N² per document in floor-ppm, averaged per language — the
    INTEGER-EXACT twin of Shannon-entropy diversity (entropy needs ln(),
    whose last-ulp behavior differs between Java's Math.log and DuckDB's
    libm — the q_lm_bigram_score lesson says never hash post-transcendental
    floats; Simpson's index is pure integer arithmetic, so it crosses
    engines bit-for-bit).

    A high-duplication / template-heavy document repeats tokens, pushing
    Σc² toward N² and the index toward 0; diverse prose stays near 1e6.
    This is the intra-doc diversity gate that complements
    q_repetition_ratio (n-gram repetition) in a curation stack.

    Scale shape: explode → per-(doc, token) count (map-side combined) →
    per-doc moment agg (N, Σc², distinct) on the same doc-keyed hash
    partitioning → metadata-scale language rollup. The shuffle carries
    (doc_id, token-hash groups) then 4 longs per doc — never document
    text. Per-doc ppm values are floored BEFORE the language average
    (itself a floor division), so the result is deterministic under any
    partitioning."""
    toks = F.split("text", " ")
    tc = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tc.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.count(F.lit(1)).alias("dt"),
    )
    return agg.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr(
            "cast(sum((1000000 * (n * n - s2)) div (n * n)) div count(*)"
            " as bigint)"
        ).alias("avg_simpson_ppm"),
        F.sum("dt").cast("bigint").alias("total_distinct"),
        F.sum("n").cast("bigint").alias("total_tokens"),
    )


VOCAB_K = 500  # tokenizer vocabulary size for the OOV-coverage audit


@query(
    "q_vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ), tok2 AS (
      SELECT doc_id, lang, w FROM tok WHERE w <> ''
    ), tf AS (
      SELECT w, count(*) AS n FROM tok2 GROUP BY w
    ), vocab AS (
      SELECT w FROM tf ORDER BY n DESC, w LIMIT {VOCAB_K}
    ), perdoc AS (
      SELECT t.doc_id, t.lang,
             CAST(count(*) AS BIGINT) AS n_tok,
             CAST(count(*) FILTER (WHERE v.w IS NULL) AS BIGINT) AS n_oov
      FROM tok2 t LEFT JOIN vocab v ON t.w = v.w
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM((1000000 * n_oov) // n_tok) // count(*) AS BIGINT)
             AS avg_oov_ppm,
           CAST(SUM(n_oov) AS BIGINT) AS total_oov,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM perdoc GROUP BY 1
    """,
)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: fit a top-VOCAB_K frequency vocabulary on
    the corpus (ties broken by term, so the cut is deterministic), then
    report each language's out-of-vocabulary token rate — the go/no-go
    metric before freezing a tokenizer (pairs with q_bpe_merge_candidates,
    which proposes merges; this measures what the finished vocab misses).

    Per-doc OOV is floored to ppm BEFORE the per-language average (itself
    a floor division) — the established two-level floor determinism rule
    (q_simpson_diversity). Scale shape: one explode + term-frequency agg
    (map-side combined), the vocabulary head via orderBy+limit
    (TakeOrderedAndProject — no global sort materialization), then the
    vocab — VOCAB_K rows, broadcast — LEFT-joins the token stream for the
    membership flag, and two grouped rollups (doc grain, then language
    grain). The token stream shuffles as (doc_id, hash-grouped tokens);
    text never travels whole."""
    toks = F.split("text", " ")
    tok2 = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = tok2.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        tf.orderBy(F.desc("n"), F.asc("w"))
        .limit(VOCAB_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    perdoc = (
        tok2.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )
    return perdoc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr(
            "cast(sum((1000000 * n_oov) div n_tok) div count(*) as bigint)"
        ).alias("avg_oov_ppm"),
        F.sum("n_oov").cast("bigint").alias("total_oov"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Round-4 wave 23: web-corpus curation verbs
# ---------------------------------------------------------------------------

# URL canonicalization (the web-crawl dedup pre-step: scheme/host case,
# trailing slashes, and tracking params must not split one logical page into
# many "distinct" URLs). The synthetic corpus carries no real URLs, so each
# doc deterministically derives one raw URL whose VARIANT class (doc_id % 3)
# perturbs exactly the things canonicalization must undo; docs sharing
# doc_id div 3 collapse to one canonical target.
URL_TRACKING_RE = r"(^|&)(utm_[a-z]+|ref)=[^&]*"


@query(
    "q_url_canonicalize",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 'https://example.com/d/' || CAST(doc_id // 3 AS VARCHAR)
               WHEN 1 THEN 'HTTP://EXAMPLE.Com/d/' || CAST(doc_id // 3 AS VARCHAR) || '/'
               ELSE 'https://example.com/d/' || CAST(doc_id // 3 AS VARCHAR)
                    || '?utm_source=feed&id=' || CAST((doc_id // 3) % 7 AS VARCHAR)
                    || '&utm_campaign=x'
             END AS url
      FROM documents
    ), parts AS (
      SELECT doc_id,
             regexp_replace(url, '^[hH][tT][tT][pP][sS]?://', '') AS rest
      FROM raw
    ), split AS (
      SELECT doc_id,
             lower(split_part(rest, '/', 1)) AS host,
             regexp_replace(regexp_replace(rest, '^[^/]*', ''), '\\?.*$', '')
               AS path,
             regexp_extract(rest, '\\?(.*)$', 1) AS q
      FROM parts
    ), cleaned AS (
      SELECT doc_id, host,
             regexp_replace(path, '/+$', '') AS path,
             regexp_replace(
               regexp_replace(q, '{URL_TRACKING_RE}', '', 'g'),
               '^&+', '') AS q
      FROM split
    )
    SELECT 'https://' || host || path
           || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id
    FROM cleaned
    GROUP BY 1
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first step of any web-corpus
    pipeline: case-fold scheme/host, strip trailing slashes, drop tracking
    params (utm_*/ref) while KEEPING content params, then group by the
    canonical form. All string surgery is JVM regexp expressions (no UDF,
    no shuffle until the final canonical-key rollup, which map-side
    combines); at 100 TB the canonical_url groupBy is the only exchange
    and text never moves with it.

    The three per-doc variants (scheme/host case + trailing slash +
    tracking-param noise) collapse 3:1, proving each canonicalization rule
    fires; the id= content param survives, proving the cleaner is not
    "strip the whole query string"."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    tgt = F.expr("doc_id div 3")  # == DuckDB // for nonneg ids
    raw = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://example.com/d/"), tgt.cast("string")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("HTTP://EXAMPLE.Com/d/"), tgt.cast("string"), F.lit("/")),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com/d/"),
                tgt.cast("string"),
                F.lit("?utm_source=feed&id="),
                (tgt % 7).cast("string"),
                F.lit("&utm_campaign=x"),
            )
        )
        .alias("url"),
    )
    rest = F.regexp_replace("url", r"^[hH][tT][tT][pP][sS]?://", "")
    parts = raw.select("doc_id", rest.alias("rest"))
    split = parts.select(
        "doc_id",
        F.lower(F.split_part(F.col("rest"), F.lit("/"), F.lit(1))).alias("host"),
        F.regexp_replace(
            F.regexp_replace("rest", r"^[^/]*", ""), r"\?.*$", ""
        ).alias("path"),
        F.regexp_extract("rest", r"\?(.*)$", 1).alias("q"),
    )
    cleaned = split.select(
        "doc_id",
        "host",
        F.regexp_replace("path", r"/+$", "").alias("path"),
        F.regexp_replace(
            F.regexp_replace("q", URL_TRACKING_RE, ""), r"^&+", ""
        ).alias("q"),
    )
    canonical = F.concat(
        F.lit("https://"),
        F.col("host"),
        F.col("path"),
        F.when(F.col("q") != "", F.concat(F.lit("?"), F.col("q"))).otherwise(
            F.lit("")
        ),
    )
    return (
        cleaned.select(canonical.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
    )


# BPE-style pre-tokenizer (GPT-2 family): text splits into letter runs,
# digit runs, and punctuation runs BEFORE any merge table applies — the
# token-count a training-data budget is actually measured in. Leftmost-first
# alternation semantics match between Java regex (Spark) and RE2 (DuckDB)
# for this pattern class.
PRETOK_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]+"
PRETOK_SUFFIX = ")—v2.0!"  # em-dash + punctuated version tag


@query(
    "q_token_count_pretokenizer",
    oracle=f"""
    WITH txts AS (
      SELECT doc_id,
             text || ' (sec. ' || CAST(doc_id AS VARCHAR) || '{PRETOK_SUFFIX}'
               AS txt
      FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(txt, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(txt, '{PRETOK_RE}')) AS BIGINT)
             AS n_pretokens,
           CAST(len(regexp_extract_all(txt, '[a-z]+')) AS BIGINT) AS n_word_runs,
           CAST(len(regexp_extract_all(txt, '[0-9]+')) AS BIGINT) AS n_digit_runs,
           CAST(len(regexp_extract_all(txt, '[^a-z0-9 ]+')) AS BIGINT)
             AS n_punct_runs
    FROM txts
    """,
)
def q_token_count_pretokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace split vs a BPE-ish regex
    pre-tokenizer (letter runs | digit runs | punctuation runs) — per
    document. Whitespace counts under-estimate the model-token budget the
    moment punctuation and digits appear, which is exactly what the
    deterministic ' (sec. <id>)—v2.0!' suffix injects; the per-class run
    counts make the divergence auditable (n_pretokens = word + digit +
    punct runs). Pure JVM regexp_extract_all projections — zero shuffles,
    embarrassingly parallel at any corpus size."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" (sec. "),
            F.col("doc_id").cast("string"),
            F.lit(PRETOK_SUFFIX),
        ).alias("txt"),
    )
    runs = lambda pat: F.size(F.regexp_extract_all("txt", F.lit(pat), F.lit(0)))  # noqa: E731
    return d.select(
        "doc_id",
        F.size(F.split("txt", " ")).cast("bigint").alias("n_ws_tokens"),
        runs(PRETOK_RE).cast("bigint").alias("n_pretokens"),
        runs("[a-z]+").cast("bigint").alias("n_word_runs"),
        runs("[0-9]+").cast("bigint").alias("n_digit_runs"),
        runs("[^a-z0-9 ]+").cast("bigint").alias("n_punct_runs"),
    )
