"""Multimodal-column pack (SURVEY.md §2.10 X5 + north-star): image/
audio/video as opaque binary columns + typed metadata structs, with
decode / feature-extract / frame-sample as Arrow-batched Pandas
transforms over ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is
STUBBED (``decode_media`` raises NotImplementedError unless the
deterministic fake decoder is selected) — but everything Spark-side is
real and tested: binary column synthesis, metadata schema, partition-
preserving mapInPandas plumbing, Arrow batch shapes, frame-index
explosion.

Scale: binary payloads ride parquet natively; metadata-only queries
never touch the blob column (columnar projection), and the Pandas
stages are the one place this engine uses Python — Arrow-batched,
per-partition, no driver collects.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import register

# Media manifest schema: the typed envelope around the opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_DECODE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from `documents`: payload = UTF-8
    bytes of the text (a stand-in blob), typed metadata derived
    deterministically from doc_id. Real pipelines read this manifest
    from parquet directly — blobs inline or as object-store pointers."""
    docs = load(spark, sf_dir, "documents")
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract stage over mapInPandas (Arrow batches).

    ``fake=True`` runs the deterministic stand-in decoder (byte stats
    per payload — numpy-vectorized inside the batch). ``fake=False``
    is the real-codec path, STUBBED: raises NotImplementedError (no
    image/audio libraries in this container)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decoding needs PIL/librosa/av; "
                    "only the deterministic fake decoder ships here"
                )
            payloads = pdf["payload"]
            sums = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()))
            lens = payloads.map(len)
            out = pdf[["media_id", "media_type"]].copy()
            out["payload_bytes"] = lens.astype("int64")
            out["byte_sum"] = sums.astype("int64")
            out["byte_mean"] = out["byte_sum"] / out["payload_bytes"]
            yield out

    return df.mapInPandas(batches, schema=_DECODE_OUT_SCHEMA)


@register(
    "multimodal_manifest_stats",
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX((doc_id % 8 + 1) * 64) AS max_width,
       CAST(SUM(doc_id % 30 + 1) AS BIGINT) AS total_frames
FROM documents
GROUP BY 1
""",
    tags=("X5", "multimodal"),
)
def multimodal_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata analytics over the media manifest (X5): byte
    volume, dimensions, frame counts per media type — the blob column
    is never read (columnar projection prunes it)."""
    m = media_manifest(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
        F.sum("meta.n_frames").cast("bigint").alias("total_frames"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT media_id, frame_idx FROM (
  SELECT doc_id AS media_id, doc_id % 30 + 1 AS n_frames,
         unnest(range(0, CAST(doc_id % 30 + 1 AS BIGINT), 5)) AS frame_idx
  FROM documents
  WHERE doc_id % 3 = 2 AND doc_id < 150
)
""",
    tags=("X5", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (X5): every-5th frame index per
    video, exploded into (media_id, frame_idx) work units — the fan-out
    a distributed frame extractor consumes. Explode happens executor-
    side; no driver involvement."""
    m = media_manifest(spark, sf_dir).filter(
        (F.col("media_type") == "video") & (F.col("media_id") < 150)
    )
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames").cast("long") - 1, F.lit(5).cast("long")
    )
    return m.select("media_id", F.explode(idx).alias("frame_idx"))


@register(
    "multimodal_decode_stats",
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       COUNT(*) AS n_decoded,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_payload_bytes
FROM documents
WHERE doc_id < 200
GROUP BY 1
""",
    tags=("X5", "multimodal"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decode pipeline (X5): manifest → mapInPandas fake
    decoder (Arrow batches, numpy byte stats) → grouped rollup. The
    oracle checks the Spark-side plumbing (row routing, byte lengths)
    — byte_sum/byte_mean correctness is asserted separately in
    tests/test_llm_pack.py against an expression-computed truth."""
    m = media_manifest(spark, sf_dir).filter(F.col("media_id") < 200)
    decoded = decode_media(m, fake=True)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.sum("payload_bytes").cast("bigint").alias("total_payload_bytes"),
    )
