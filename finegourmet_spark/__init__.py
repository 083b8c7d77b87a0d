"""finegourmet_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (Foufou-exe/finegourmet, see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, explicit
schemas, broadcast-hinted star joins, decimal-exact money math, and
LLM-data-pipeline operators (dedup, similarity search, text analysis)
designed for 100 TB scale.

Layout:
    session     — SparkSession factory (AQE, UTC, tuned shuffle defaults)
    sources     — explicit-schema readers (csv/json/text/parquet), testdata loader
    functions   — pure Column-in/Column-out expression library
    operators   — relational query builders, dedup, similarity, multimodal
    streaming   — Structured Streaming windows + batch-equivalent forms
    star        — the reference's star-schema ETL rebuilt (dims, fact, analytics)
"""

__version__ = "0.1.0"
