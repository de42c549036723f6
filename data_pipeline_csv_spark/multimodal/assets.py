"""Asset table: opaque binary content + typed metadata columns.

``synthetic_assets`` derives a deterministic asset per document row —
the id-seeded SGV1 codec means content is reproducible anywhere with
no media files shipped. At 100 TB the same schema holds: content is
an opaque ``binary`` column in parquet (stored/split per row group),
metadata is ordinary columns Catalyst can prune and push filters into
WITHOUT touching the bytes — e.g. ``WHERE meta.width >= 512`` prunes
row groups before a single payload byte is read.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .codecs import MOD_AUDIO, MOD_IMAGE, MOD_VIDEO, encode_sgv1

META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", META_SCHEMA),
    ]
)

_MODALITY_CODE = {"image": MOD_IMAGE, "audio": MOD_AUDIO, "video": MOD_VIDEO}


def synthetic_assets(spark: SparkSession, sf_dir: str, modality: str = "image") -> DataFrame:
    """One SGV1 asset per documents row (asset_id = doc_id).

    Encoding runs distributed in mapInPandas — each Arrow batch of ids
    becomes a batch of blobs on the executor; the driver never sees
    content bytes.
    """
    mod_code = _MODALITY_CODE[modality]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            blobs = [encode_sgv1(int(i), mod_code) for i in ids]
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = ids.mapInPandas(encode, schema="asset_id long, content binary")
    return raw.select(
        "asset_id",
        F.lit(modality).alias("modality"),
        "content",
        F.struct(
            F.lit("SGV1").alias("format"),
            F.when(F.lit(modality) == "audio", F.lit(0))
            .otherwise((F.lit(8) + F.col("asset_id") % 9).cast("int"))
            .alias("width"),
            F.when(F.lit(modality) == "audio", F.lit(0))
            .otherwise((F.lit(8) + F.col("asset_id") % 7).cast("int"))
            .alias("height"),
            F.when(F.lit(modality) == "image", F.lit(1))
            .when(F.lit(modality) == "audio", (F.lit(256) + F.col("asset_id") % 512).cast("int"))
            .otherwise((F.lit(4) + F.col("asset_id") % 5).cast("int"))
            .alias("frames"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def synthetic_assets_with_variants(
    spark: SparkSession,
    sf_dir: str,
    every_k: int = 10,
    id_offset: int = 10_000_000,
    perturb_mod: int = 37,
) -> DataFrame:
    """Image asset table seeded with NEAR-DUPLICATES: every document
    yields its SGV1 image, and every ``every_k``-th document ALSO
    yields a variant — the same image upscaled 2x (nearest neighbor)
    with every ``perturb_mod``-th pixel of the upscaled raster
    inverted (v -> 255 - v). That is exactly the perceptual-dedup
    scenario (same picture re-encoded at another resolution with
    sparse pixel damage), and every byte stays pure arithmetic on
    doc_id, so a DuckDB oracle can recompute any variant pixel without
    decoding anything (queries/multimodal.py multimodal_phash_neardup).
    """
    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import HEADER, MAGIC, decode_sgv1, encode_sgv1

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = encode_sgv1(i, MOD_IMAGE)
                ids.append(i)
                blobs.append(blob)
                if i % every_k == 0:
                    img = decode_sgv1(blob)["data"][0]
                    up = img.repeat(2, axis=0).repeat(2, axis=1)
                    flat = up.ravel().copy()
                    mask = (np.arange(flat.size) % perturb_mod) == 0
                    flat[mask] = 255 - flat[mask]
                    h2, w2 = up.shape
                    ids.append(i + id_offset)
                    blobs.append(
                        HEADER.pack(MAGIC, MOD_IMAGE, w2, h2, 1) + flat.tobytes()
                    )
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return ids.mapInPandas(encode, schema="asset_id long, content binary")


def synthetic_videos_with_variants(
    spark: SparkSession,
    sf_dir: str,
    every_k: int = 10,
    id_offset: int = 10_000_000,
    perturb_mod: int = 37,
    trim: int = 1,
) -> DataFrame:
    """Video asset table seeded with TRIMMED RE-ENCODES: every document
    yields its SGV1 video (4 + id%5 frames), and every ``every_k``-th
    document ALSO yields a variant with the FIRST ``trim`` frame(s)
    dropped and every remaining frame 2x-upscaled (nearest neighbor)
    with every ``perturb_mod``-th pixel of that frame's upscaled
    raster inverted — the re-encoded-with-a-trimmed-intro copy that
    defeats single-frame perceptual hashing (the whole point of
    frame-SET voting). Every byte stays pure arithmetic on doc_id, so
    the DuckDB oracle recomputes any sampled variant pixel in SQL
    (queries/multimodal.py multimodal_video_neardup)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import HEADER, MAGIC, decode_sgv1, encode_sgv1

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = encode_sgv1(i, MOD_VIDEO)
                ids.append(i)
                blobs.append(blob)
                if i % every_k == 0:
                    vid = decode_sgv1(blob)["data"][trim:]
                    # all frames at once: upscale on the frame axes and
                    # apply the per-frame raster mask across the whole
                    # clip (same bytes as the per-frame loop — reshape
                    # order IS frame-major concatenation)
                    up = vid.repeat(2, axis=1).repeat(2, axis=2)
                    nf, h2, w2 = up.shape
                    # explicit column count: reshape(nf, -1) cannot infer
                    # a dimension when a trimmed clip has zero frames
                    flat = up.reshape(nf, h2 * w2).copy()
                    mask = (np.arange(flat.shape[1]) % perturb_mod) == 0
                    flat[:, mask] = 255 - flat[:, mask]
                    ids.append(i + id_offset)
                    blobs.append(
                        HEADER.pack(MAGIC, MOD_VIDEO, w2, h2, nf) + flat.tobytes()
                    )
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return ids.mapInPandas(encode, schema="asset_id long, content binary")


def synthetic_audio_with_variants(
    spark: SparkSession,
    sf_dir: str,
    every_k: int = 10,
    id_offset: int = 10_000_000,
    dropout_mod: int = 41,
) -> DataFrame:
    """Audio asset table seeded with NEAR-DUPLICATES: every document
    yields its SGV1 PCM clip (256 + id%512 int16 samples), and every
    ``every_k``-th document ALSO yields a variant with every
    ``dropout_mod``-th sample zeroed — the lossy-reencode/dropout
    scenario audio dedup exists for. Like the image variants, every
    sample stays pure arithmetic on doc_id (splitmix64 byte pairs),
    so the DuckDB oracle recomputes any variant sample in SQL."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import HEADER, MAGIC, MOD_AUDIO, decode_sgv1, encode_sgv1

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = encode_sgv1(i, MOD_AUDIO)
                ids.append(i)
                blobs.append(blob)
                if i % every_k == 0:
                    s = decode_sgv1(blob)["data"].copy()
                    s[::dropout_mod] = 0
                    ids.append(i + id_offset)
                    blobs.append(
                        HEADER.pack(MAGIC, MOD_AUDIO, 0, 0, s.size) + s.tobytes()
                    )
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return ids.mapInPandas(encode, schema="asset_id long, content binary")
