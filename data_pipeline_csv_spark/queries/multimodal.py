"""Multimodal pipeline queries (binary columns over mapInPandas).

The SGV1 synthetic codec's header fields are pure arithmetic on
asset_id (codecs.asset_dims), so the decode round-trip — encode bytes
in one mapInPandas stage, decode them in another — is verifiable by a
DuckDB oracle computing the same arithmetic directly: if any byte of
the binary plumbing (Arrow transfer, header pack/unpack, payload
sizing) were wrong, the hashes would diverge.

The payload bytes themselves are a splitmix64 stream — pure 64-bit
integer arithmetic — which DuckDB replays exactly in HUGEINT limb math
(mod-2^64 multiplies via 32-bit limbs, xor via 32-bit halves, shifts as
integer division). That upgrades the feature-extraction query from
rows-only to a FULL value oracle: DuckDB regenerates every pixel byte
in SQL and recomputes sum/mean/min/max/histogram. Frame sampling's
per-frame payload stats remain pinned by tests (the only non-replayed
surface); its count/shape query is oracle-checked below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_assets, frame_sample, image_features, synthetic_assets
from .registry import query

# ---- splitmix64 in DuckDB SQL (see multimodal/codecs.py) ------------
# All values live in HUGEINT (128-bit) and are reduced mod 2^64; a
# 64x64 multiply-low goes through 32-bit limbs so no intermediate
# exceeds 2^65; xor splits into 32-bit halves (BIGINT xor). Verified
# byte-identical to codecs._splitmix64_bytes for arbitrary seeds.
_M64 = "CAST('18446744073709551616' AS HUGEINT)"
_PHI = "CAST('11400714819323198485' AS HUGEINT)"  # 0x9E3779B97F4A7C15
_C1 = "CAST('13787848793156543929' AS HUGEINT)"  # 0xBF58476D1CE4E5B9
_C2 = "CAST('10723151780598845931' AS HUGEINT)"  # 0x94D049BB133111EB


def _lo32(e: str) -> str:
    return f"(({e}) % 4294967296)"


def _hi32(e: str) -> str:
    return f"(({e}) // 4294967296)"


def _xor64(a: str, b: str) -> str:
    return (
        f"(CAST(xor(CAST({_hi32(a)} AS BIGINT), CAST({_hi32(b)} AS BIGINT)) AS HUGEINT)"
        f" * 4294967296"
        f" + CAST(xor(CAST({_lo32(a)} AS BIGINT), CAST({_lo32(b)} AS BIGINT)) AS HUGEINT))"
    )


def _mul64(a: str, b: str) -> str:
    return (
        f"(({_lo32(a)} * {_lo32(b)}"
        f" + (({_lo32(a)} * {_hi32(b)} + {_hi32(a)} * {_lo32(b)}) % 4294967296)"
        f" * 4294967296) % {_M64})"
    )


def _shr64(a: str, n: str) -> str:
    return f"(({a}) // CAST(power(2, {n}) AS HUGEINT))"


# CTE chain regenerating the image payload bytes: word i of asset id is
# splitmix64(id + i*PHI); bytes unpack little-endian. Image assets have
# frames=1, so n_px = width*height <= 16*14 — the byte fan-out is
# bounded at ~224 rows per asset.
_PIXEL_CTE = f"""
    dims AS (
      SELECT doc_id,
             CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS n_px
      FROM documents
    ),
    words AS (
      SELECT doc_id, n_px, r.i,
             (doc_id + r.i * {_PHI}) % {_M64} AS x
      FROM dims JOIN range(1, 29) r(i) ON r.i <= (n_px + 7) // 8
    ),
    s1 AS (SELECT doc_id, n_px, i,
           {_mul64(_xor64('x', _shr64('x', '30')), _C1)} AS z FROM words),
    s2 AS (SELECT doc_id, n_px, i,
           {_mul64(_xor64('z', _shr64('z', '27')), _C2)} AS z FROM s1),
    s3 AS (SELECT doc_id, n_px, i,
           {_xor64('z', _shr64('z', '31'))} AS z FROM s2),
    px AS (
      SELECT doc_id, n_px,
             CAST({_shr64('z', '8 * b')} % 256 AS INT) AS v
      FROM s3, range(0, 8) rb(b)
      WHERE (i - 1) * 8 + b < n_px
    )
"""


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
    # Full value oracle: DuckDB regenerates every payload byte via the
    # splitmix64 CTE and recomputes the features. pixel_sum is exact
    # integer arithmetic; mean is one correctly-rounded division of an
    # exact integer sum (pixel values are integers, so numpy's pairwise
    # summation is exact too); min/max/histogram are integers. std_val
    # stays out of the checked projection: its sum of (x-mean)^2 terms
    # is accumulation-order-dependent across engines.
    oracle=f"""
    WITH {_PIXEL_CTE},
    agg AS (
      SELECT doc_id,
             ANY_VALUE(n_px) AS n_px,
             CAST(SUM(v) AS BIGINT) AS pixel_sum,
             CAST(MIN(v) AS DOUBLE) AS min_val,
             CAST(MAX(v) AS DOUBLE) AS max_val
      FROM px GROUP BY doc_id
    ),
    bins AS (
      SELECT a.doc_id, hb.b,
             COALESCE(p.cnt, 0) AS c
      FROM agg a
      CROSS JOIN range(0, 16) hb(b)
      LEFT JOIN (
        SELECT doc_id, v // 16 AS b, COUNT(*) AS cnt FROM px GROUP BY 1, 2
      ) p ON p.doc_id = a.doc_id AND p.b = hb.b
    ),
    hist AS (
      SELECT doc_id,
             '[' || string_agg(CAST(c AS VARCHAR), ',' ORDER BY b) || ']' AS histogram
      FROM bins GROUP BY doc_id
    )
    SELECT a.doc_id AS asset_id,
           a.n_px,
           a.pixel_sum,
           CAST(a.pixel_sum AS DOUBLE) / a.n_px AS mean_val,
           a.min_val,
           a.max_val,
           h.histogram
    FROM agg a JOIN hist h ON a.doc_id = h.doc_id
    """,
    doc="Gray-level stats + 16-bin histogram per synthetic image, "
    "Arrow-batched mapInPandas over the binary column — verified "
    "byte-for-byte: the oracle regenerates the splitmix64 payload in "
    "HUGEINT SQL and recomputes sum/mean/min/max/histogram.",
    tags=("multimodal", "features"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = image_features(synthetic_assets(spark, sf_dir, modality="image"))
    n_px = ((F.lit(8) + F.col("asset_id") % 9) * (F.lit(8) + F.col("asset_id") % 7)).cast(
        "bigint"
    )
    return feats.select(
        "asset_id",
        n_px.alias("n_px"),
        # exact integer recovery: |mean*n - sum| << 0.5 for n<=224
        F.round(F.col("mean_val") * n_px).cast("bigint").alias("pixel_sum"),
        "mean_val",
        "min_val",
        "max_val",
        "histogram",
    )


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
