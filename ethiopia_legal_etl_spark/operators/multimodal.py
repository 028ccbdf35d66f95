"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas UDFs (driver
mandate; generalizes the reference's binary PDF handling, A-9/A-11).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (decode_stub) — the Spark-side
plumbing (schema, mapInPandas batch shape, partitioning) is real and
tested. Swap decode_stub for PIL/ffmpeg on a real cluster.

Scale: binary payloads ride in the dataframe as BinaryType — at
100 TB, write the table partitioned so decode stages scan only needed
partitions; mapInPandas streams Arrow batches (maxRecordsPerBatch
bounds executor memory per batch regardless of payload count).
"""

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, byte_len long, width int, height int, "
    "n_frames int, sample_rate int"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. REAL decode is NOT implemented in
    this container (no PIL/ffmpeg) — this derives plausible metadata
    purely from the bytes so plumbing is testable. Replace with a real
    codec on deployment."""
    n = len(payload)
    head = payload[:8]
    checksum = sum(head) if head else 0
    return {
        "byte_len": n,
        "width": 16 + (checksum % 64) * 16,
        "height": 16 + ((checksum >> 2) % 64) * 16,
        "n_frames": 1 + (n % 24),
        "sample_rate": 8000 + (n % 5) * 8000,
    }


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a multimodal table: text docs with an opaque binary payload
    column + media_type, standing in for image/audio blobs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
    )


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, typed metadata out."""
    import pandas as pd

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(CAST(text AS BLOB))  AS byte_len,
           SHA256(text)                      AS payload_sha,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END             AS media_type
    FROM documents
    """,
    doc="binary-column plumbing: payload length + digest + typed media "
    "routing (pure column expressions — oracle-checkable)",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.sha2("payload", 256).alias("payload_sha"),
        "media_type",
    )


@register(
    "multimodal_decode_stub",
    oracle=None,  # decode is a stub; plumbing checked rows-only + unit tests
    doc="mapInPandas decode stage over binary payloads (STUBBED decode; "
    "real Arrow batch plumbing) + per-media-type aggregate",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = extract_media_metadata(media_table(spark, sf_dir))
    return meta.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("byte_len").alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("n_frames"), 2).alias("avg_frames"),
    )


@register(
    "multimodal_fake_embed",
    oracle=None,  # pandas-UDF featurizer -> rows-only
    doc="vectorized pandas-UDF feature extractor: binary payload → "
    "8-dim fake embedding (deterministic; stands in for a real "
    "image/audio encoder), then norm stats per media type",
)
def multimodal_fake_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def fake_embed(payloads: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for p in payloads:
            b = np.frombuffer(bytes(p), dtype=np.uint8)
            if len(b) == 0:
                out.append([0.0] * 8)
                continue
            # deterministic 8-bucket byte histogram, normalized
            hist = np.bincount(b % 8, minlength=8).astype("float64")
            out.append((hist / hist.sum()).tolist())
        return pd.Series(out)

    m = media_table(spark, sf_dir).withColumn("emb", fake_embed(F.col("payload")))
    l2 = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg(l2), 4).alias("avg_emb_norm"),
    )


def synth_media_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media payloads, synthesized distributed: even doc_ids get a
    genuine PCM WAV, odd doc_ids a genuine 24-bit BMP (functions/
    media.py — dependency-free encoders). mapInPandas so the bytes are
    built executor-side, never on the driver."""
    import pandas as pd

    from ethiopia_legal_etl_spark.functions.media import synth_bmp, synth_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": [
                        "audio" if i % 2 == 0 else "image" for i in ids
                    ],
                    "payload": [
                        synth_wav(i) if i % 2 == 0 else synth_bmp(i)
                        for i in ids
                    ],
                }
            )

    return docs.mapInPandas(
        synth, schema="doc_id long, media_type string, payload binary"
    )


@register(
    "multimodal_decode_real",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'image' END
             AS media_type,
           CASE WHEN doc_id % 2 = 0
                THEN 44 + 2 * (100 + doc_id % 50)
                ELSE 54 + (((4 + doc_id % 32) * 3 + 3) // 4) * 4
                       * (4 + (doc_id // 7) % 32)
           END AS byte_len,
           CASE WHEN doc_id % 2 = 0
                THEN 8000 * (1 + doc_id % 3) END AS sample_rate,
           CASE WHEN doc_id % 2 = 0
                THEN 100 + doc_id % 50 END AS n_samples,
           CASE WHEN doc_id % 2 = 0
                THEN (100 + doc_id % 50) * 1000000
                       // (8000 * (1 + doc_id % 3)) END AS duration_us,
           CASE WHEN doc_id % 2 = 1
                THEN 4 + doc_id % 32 END AS width,
           CASE WHEN doc_id % 2 = 1
                THEN 4 + (doc_id // 7) % 32 END AS height
    FROM documents
    """,
    doc="REAL multimodal decode, executed in-container: genuine PCM WAV "
    "and 24-bit BMP payloads are synthesized executor-side, then parsed "
    "back by dependency-free byte-format decoders (functions/media.py: "
    "RIFF chunk walk, BITMAPINFOHEADER). The oracle derives every "
    "metadata field from the doc_id formulas, so the hash match proves "
    "the decoder exactly inverts the encoder — including canonical "
    "file sizes (44-byte WAV header; BMP 4-byte row padding). "
    "Compressed codecs (JPEG/MP3) remain stubbed (multimodal_decode_"
    "stub) pending PIL/ffmpeg on deployment. Shuffle-free per-row "
    "pipeline: synth -> decode in back-to-back Arrow-batched "
    "mapInPandas stages.",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ethiopia_legal_etl_spark.functions.media import decode_bmp, decode_wav

    media = synth_media_real(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                if mt == "audio":
                    m = decode_wav(b)
                    rows.append(
                        (doc_id, mt, m["byte_len"], m["sample_rate"],
                         m["n_samples"], m["duration_us"], None, None)
                    )
                else:
                    m = decode_bmp(b)
                    rows.append(
                        (doc_id, mt, m["byte_len"], None, None, None,
                         m["width"], m["height"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "byte_len", "sample_rate",
                    "n_samples", "duration_us", "width", "height",
                ],
            )

    return media.mapInPandas(
        decode,
        schema=(
            "doc_id long, media_type string, byte_len long, "
            "sample_rate long, n_samples long, duration_us long, "
            "width long, height long"
        ),
    )
