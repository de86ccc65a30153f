"""Multimodal queries (X4): binary-column pipelines over a media table
derived deterministically from ``documents``. ``media_metadata``
exercises the REAL pandas/mapInPandas path (hashlib sha256 in Python
workers, Arrow-batched) and still has an exact DuckDB oracle
(sha256/octet_length over the same utf-8 payload bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    documents_as_media,
    extract_media_meta,
    fake_decode_meta,
    sample_frames,
)
from ..sources.batch import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas metadata extraction — size + sha256 per payload."""
    return extract_media_meta(_media(spark, sf_dir))


ORACLE_MEDIA_METADATA = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def media_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in decode (schema/batch shape of the real
    codec path). No SQL oracle — sha256-derived dimensions are not
    expressible without the same byte-level digest access; driver
    records the rows-only check."""
    return fake_decode_meta(_media(spark, sf_dir))


def video_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-window frame sampling over video payloads; emits frame
    count + bytes per frame for verification."""
    frames = sample_frames(_media(spark, sf_dir), n_frames=4, frame_bytes=32)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame_bytes")).cast("bigint").alias("total_frame_bytes"),
        )
        .orderBy("media_id")
    )


# frame i offset = trunc(i * max(total-32, 1) / 3); frame length =
# min(32, total - off) — pure arithmetic over octet_length, so the
# byte-slicing is verifiable without blob functions.
ORACLE_VIDEO_FRAMES = """
WITH vids AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS total
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT media_id,
         least(32, total - CAST(floor(i * greatest(total - 32, 1) / 3.0) AS INT))
           AS frame_len
  FROM vids, unnest(generate_series(0, 3)) AS t(i)
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(frame_len) AS BIGINT) AS total_frame_bytes
FROM frames GROUP BY media_id ORDER BY media_id
"""
