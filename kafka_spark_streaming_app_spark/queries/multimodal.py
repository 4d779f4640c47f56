"""Multimodal queries: typed-metadata projection (oracle-checked) and
the mapInPandas feature/frame stages (rows-only — Python UDF bodies
are not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, sample_frames, synthesize_media
from ..registry import query
from ..sources.batch import load_table

_META_ORACLE = """
SELECT
    doc_id AS media_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio'
         ELSE 'video' END AS media_type,
    octet_length(encode(text)) AS n_bytes,
    CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 640 + 16 AS INTEGER) END AS width,
    CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 480 + 16 AS INTEGER) END AS height,
    CASE WHEN doc_id % 3 = 1 THEN 16000 END AS sample_rate,
    CASE WHEN doc_id % 3 = 2 THEN CAST(n_chars % 32 + 2 AS INTEGER) END AS n_frames
FROM documents
"""


@query("multimodal_metadata", _META_ORACLE)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct: the JVM-side projection
    (payload length, struct field access) that prunes/filters media
    before any Python decode cost."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )


@query("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-feature extraction (mapInPandas). Rows-only:
    the Pandas stage has no SQL twin."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media)


@query("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampler over video rows (mapInPandas)."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_n=2)
