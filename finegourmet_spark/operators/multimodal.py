"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no image/audio codecs (SURVEY.md north star: the decode
step is STUBBED), but everything Spark-side is real and tested: schema
(binary payload + metadata struct), partition-friendly batch shape
(mapInPandas processes one Arrow batch at a time — bounded memory per task
regardless of corpus size), and the UDF signatures a real decoder would slot
into. The synthetic payload is the utf-8 encoding of document text; the
"feature extraction" is a deterministic function of the bytes so the DuckDB
oracle can verify the plumbing end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finegourmet_spark.operators.registry import query
from finegourmet_spark.sources.testdata import load_table as t


def decode_image(payload: bytes) -> object:
    """REAL DECODER GOES HERE (PIL.Image.open / torchvision / ffmpeg frame
    sample). Stubbed: the container ships no codecs."""
    raise NotImplementedError("image/audio codecs are not available in this container")


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct — the canonical
    multimodal row layout: (id, payload binary, meta struct<...>)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").cast("bigint").alias("n_bytes_claimed"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'text/plain' AS mime,
           substring(md5(text), 1, 16) AS payload_digest
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload size + digest, all JVM-side.
    (For real images this is the cheap pre-decode audit: size/mime/digest
    dedup before any expensive decode.)"""
    d = with_binary_payload(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.substring(F.md5("payload"), 1, 16).alias("payload_digest"),
    )


FRAME_STRIDE_BYTES = 100


@query(
    "q_multimodal_frames",
    oracle=f"""
    WITH assets AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    )
    SELECT doc_id,
           i AS frame_no,
           i * {FRAME_STRIDE_BYTES} AS frame_offset,
           least({FRAME_STRIDE_BYTES}, n_bytes - i * {FRAME_STRIDE_BYTES}) AS frame_bytes
    FROM assets, unnest(range(0, CAST(ceil(n_bytes / {FRAME_STRIDE_BYTES}.0) AS BIGINT))) AS u(i)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one asset row explodes into per-frame rows at a fixed
    stride — the video/audio chunking shape (a real decoder yields frames
    from timestamps; the stride here is byte-based so the oracle can verify
    the explode/offset arithmetic). Downstream per-frame decode runs as
    q_multimodal_features does: mapInPandas over the frame rows, bounded
    batches, no shuffle."""
    d = with_binary_payload(t(spark, sf_dir, "documents")).select(
        "doc_id", F.octet_length("payload").cast("bigint").alias("n_bytes")
    )
    n_frames = F.ceil(F.col("n_bytes") / F.lit(float(FRAME_STRIDE_BYTES))).cast("bigint")
    # zero-byte payloads: sequence(0, -1) infers step -1 and would emit two
    # spurious frames (0 and -1) — guard to an empty array (ADVICE r1)
    frame_nos = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    return d.select(
        "doc_id",
        "n_bytes",
        F.explode(frame_nos).alias("frame_no"),
    ).select(
        "doc_id",
        "frame_no",
        (F.col("frame_no") * FRAME_STRIDE_BYTES).alias("frame_offset"),
        F.least(
            F.lit(FRAME_STRIDE_BYTES).cast("bigint"),
            F.col("n_bytes") - F.col("frame_no") * FRAME_STRIDE_BYTES,
        ).alias("frame_bytes"),
    )


@query(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) % 640 AS width,
           octet_length(encode(text)) % 480 AS height,
           CAST(octet_length(encode(text)) AS DOUBLE) / 1024.0 AS kb
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction via mapInPandas over binary payloads — the real
    shape of a distributed decode: iterator of Arrow batches in, feature
    frame out, one task per input split, no driver involvement. The decode
    itself is a deterministic fake (bytes-derived dims) standing in for
    `decode_image`; swap the two lines marked STUB for a real codec."""
    d = with_binary_payload(t(spark, sf_dir, "documents")).select("doc_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            # STUB: deterministic fake features; a real decoder would do
            #   img = decode_image(payload); width, height = img.size
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n_bytes % 640).astype("int64"),
                    "height": (n_bytes % 480).astype("int64"),
                    "kb": n_bytes.astype("float64") / 1024.0,
                }
            )

    return d.mapInPandas(extract, schema="doc_id long, width bigint, height bigint, kb double")
