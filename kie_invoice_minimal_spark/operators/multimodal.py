"""Multimodal columns — binary payloads with typed metadata, processed by
Arrow-batched UDFs.

Image/audio/video payloads are opaque ``binary`` columns; decode /
feature-extract / resize / frame-sample run as vectorized pandas UDFs over
``mapInPandas``.  The decode libraries (PIL/ffmpeg) are NOT in this
container, so the byte->pixels step is a clearly-marked deterministic fake
(`_fake_decode`) behind the same schema/partitioning/batch shape a real
decoder would use — swap `_fake_decode` for the real library call and
nothing else changes.

Scale notes: payloads never pass through Python row-at-a-time — whole Arrow
batches; metadata extraction is a narrow map; frame sampling explodes
bounded arrays.  Real deployments put payloads in their own parquet column
chunk so metadata-only queries never read the bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAME_STEP = 1000  # fake: one "frame" per 1000 payload bytes


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload column (UTF-8 bytes of the text
    stand in for media bytes)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


def _fake_decode(n_bytes: np.ndarray) -> dict[str, np.ndarray]:
    """STUB for the real image/audio decoder (no media libs in this
    container).  Deterministic metadata derived from payload size — a real
    implementation returns the actual decoded dimensions/duration."""
    return {
        "width": 320 + (n_bytes % 320),
        "height": 240 + (n_bytes % 240),
        "n_frames": 1 + n_bytes // FRAME_STEP,
    }


MEDIA_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint"
)


def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> payload -> Arrow-batched 'decode' -> typed metadata."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    payloads = with_payload(docs).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            meta = _fake_decode(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "width": meta["width"],
                    "height": meta["height"],
                    "n_frames": meta["n_frames"],
                }
            )

    return payloads.mapInPandas(run, schema=MEDIA_META_SCHEMA)


# DuckDB twin of the deterministic fake — proves the Spark-side plumbing
# (binary encode, Arrow batching, schema) produces exactly the declared
# metadata.
MM_DECODE_SQL = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       320 + (octet_length(encode(text)) % 320) AS width,
       240 + (octet_length(encode(text)) % 240) AS height,
       1 + octet_length(encode(text)) // {FRAME_STEP} AS n_frames
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per sampled frame index (every 2nd frame) —
    the explode pattern a video pipeline uses, bounded per row."""
    meta = mm_decode_metadata(spark, sf_dir)
    return meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(2))).alias("fi"),
    ).select("doc_id", F.col("fi").cast("bigint").alias("frame_idx"))


MM_FRAME_SAMPLE_SQL = f"""
WITH meta AS ({MM_DECODE_SQL.strip()})
SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx
FROM meta
"""
