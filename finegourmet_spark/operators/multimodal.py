"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no IMAGE codecs (that decode step is STUBBED behind
``decode_image``), but the AUDIO path is fully real: ``q_multimodal_audio``
encodes genuine WAV containers and ``decode_wav`` parses them back with the
stdlib codec, oracle-verified end-to-end. Everything Spark-side is real and
tested for all modalities: schema (binary payload + metadata struct),
partition-friendly batch shape (mapInPandas processes one Arrow batch at a
time — bounded memory per task regardless of corpus size), and the UDF
signatures a real image decoder would slot into. The synthetic image payload
is the utf-8 encoding of document text; its "feature extraction" is a
deterministic function of the bytes so the DuckDB oracle can verify the
plumbing end-to-end.
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
    sample). Stubbed: the container ships no image codecs. (The AUDIO path
    is NOT stubbed — see decode_wav below: WAV is parsed with the stdlib
    codec and oracle-verified end-to-end in q_multimodal_audio.)"""
    raise NotImplementedError("image codecs are not available in this container")


def decode_wav(payload: bytes) -> tuple[int, "object"]:
    """REAL audio decoder: parse a WAV container (stdlib ``wave``) and return
    (framerate, int16 numpy sample array). This is the actual decode step a
    training pipeline runs on audio columns — container parsing + PCM
    extraction — not a fake."""
    import io
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        assert w.getsampwidth() == 2 and w.getnchannels() == 1
        framerate = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return framerate, pcm


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


AUDIO_RATE = 8000


@query(
    "q_multimodal_audio",
    oracle=f"""
    SELECT doc_id,
           {AUDIO_RATE} AS framerate,
           CAST((length(text) % 400) + 100 AS BIGINT) AS n_samples,
           CAST((length(text) % 400) + 100 AS DOUBLE) * 1000.0 / {AUDIO_RATE}
             AS duration_ms,
           CAST(((doc_id % 100) + 1) * 300 AS DOUBLE) AS rms_amplitude,
           CAST(((doc_id % 100) + 1) * 300 AS BIGINT) AS peak
    FROM documents
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio roundtrip — encode genuine WAV containers, decode them
    with the stdlib codec, extract features — the one multimodal modality
    this container can run without external codecs.

    Per document a deterministic PCM16 mono square wave is synthesized
    (amplitude from doc_id, length from text length), wrapped in an actual
    WAV container (``wave`` module), then DECODED BACK by ``decode_wav``
    (container parse + PCM extraction) and reduced to features: duration,
    RMS, peak. The oracle knows the closed-form feature values (a ±A square
    wave has RMS exactly A; all arithmetic chosen integer-exact in float64),
    so a bug in EITHER the encoder or the real decoder breaks parity — the
    plumbing claim is verified, not asserted.

    Scale shape: one mapInPandas pass, bounded Arrow batches, no shuffle —
    identical to how a real corpus would decode opaque audio blobs."""
    import io
    import wave as wave_mod

    import numpy as np

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n_samples = int(n_chars) % 400 + 100
                amp = (int(doc_id) % 100 + 1) * 300
                signs = np.where(np.arange(n_samples) % 2 == 0, 1, -1)
                pcm = (amp * signs).astype("<i2")
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(AUDIO_RATE)
                    w.writeframes(pcm.tobytes())
                payload = buf.getvalue()  # a real, spec-compliant WAV file

                framerate, decoded = decode_wav(payload)  # REAL decode
                rms = float(np.sqrt(np.mean(decoded.astype(np.float64) ** 2)))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "framerate": framerate,
                        "n_samples": len(decoded),
                        "duration_ms": len(decoded) * 1000.0 / framerate,
                        "rms_amplitude": rms,
                        "peak": int(np.abs(decoded.astype(np.int64)).max()),
                    }
                )
            yield pd.DataFrame(rows)

    return d.mapInPandas(
        roundtrip,
        schema=(
            "doc_id long, framerate int, n_samples bigint, duration_ms double, "
            "rms_amplitude double, peak bigint"
        ),
    )
