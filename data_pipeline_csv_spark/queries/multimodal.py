"""Multimodal pipeline queries (binary columns over mapInPandas).

The SGV1 synthetic codec's header fields are pure arithmetic on
asset_id (codecs.asset_dims), so the decode round-trip — encode bytes
in one mapInPandas stage, decode them in another — is verifiable by a
DuckDB oracle computing the same arithmetic directly: if any byte of
the binary plumbing (Arrow transfer, header pack/unpack, payload
sizing) were wrong, the hashes would diverge.

Feature extraction / frame sampling produce values only the payload
bytes determine, so those register rows-only (non-SQL-expressible),
with invariants pinned in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_assets, frame_sample, image_features, synthetic_assets
from .registry import query


@query(
    "multimodal_decode_roundtrip",
    oracle="""
    SELECT
      doc_id AS asset_id,
      'video' AS modality,
      CAST(8 + doc_id % 9 AS INT)  AS width,
      CAST(8 + doc_id % 7 AS INT)  AS height,
      CAST(4 + doc_id % 5 AS INT)  AS frames,
      CAST((8 + doc_id % 9) * (8 + doc_id % 7) * (4 + doc_id % 5) AS BIGINT)
        AS n_payload_bytes
    FROM documents
    """,
    doc="Encode->decode SGV1 video blobs; decoded header fields must equal "
    "the id-arithmetic the oracle computes without touching bytes.",
    tags=("multimodal", "binary", "mapInPandas"),
)
def multimodal_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthetic_assets(spark, sf_dir, modality="video")
    return decode_assets(assets).filter(F.col("decode_error").isNull()).drop("decode_error")


@query(
    "multimodal_image_features",
    doc="Gray-level stats + 16-bin histogram per synthetic image "
    "(payload-determined; rows-only check, invariants in tests).",
    tags=("multimodal", "features"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_features(synthetic_assets(spark, sf_dir, modality="image"))


@query(
    "multimodal_frame_stats",
    oracle="""
    SELECT
      doc_id AS asset_id,
      CAST(CEIL((4 + doc_id % 5) / 2.0) AS BIGINT) AS n_sampled,
      CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS frame_bytes
    FROM documents
    """,
    doc="Video -> every-2nd-frame explosion; per-asset sampled-frame count "
    "and frame byte size are id-arithmetic the oracle checks.",
    tags=("multimodal", "video", "fanout"),
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(synthetic_assets(spark, sf_dir, modality="video"), every_k=2)
    return frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.first(F.length("frame").cast("long")).alias("frame_bytes"),
    )
