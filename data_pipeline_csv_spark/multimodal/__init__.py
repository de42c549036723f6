"""Multimodal (image/audio/video) column support.

The reference has no binary/multimodal surface at all (SURVEY.md §1:
no nested/array/binary types anywhere); this module is the scale-out
extension for training-data pipelines: opaque ``binary`` content
columns + typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

Real image/audio codecs are not in this container, so the DECODE step
is split:

- ``codecs.py`` defines a deterministic synthetic format ("SGV1")
  whose encode/decode are pure numpy — the Spark-side plumbing
  (schema, batch shape, partitioning) is fully real and tested.
- ``decode_real_image`` try-imports PIL and raises a clearly-marked
  ``NotImplementedError`` when absent — the single seam to swap in a
  production codec.

Scale design: content bytes never pass through Python row-at-a-time —
every stage is ``mapInPandas`` over Arrow record batches; batch byte
size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(set it so batch_rows x avg_asset_bytes fits executor memory, e.g.
1 MiB images -> 64-256 rows/batch at 100 TB scale). Assets hash-
partition on ``asset_id`` so a skewed source file can't hot-spot one
executor.
"""

from .assets import (
    ASSET_SCHEMA,
    synthetic_assets,
    synthetic_assets_with_variants,
    synthetic_audio_with_variants,
    synthetic_videos_with_variants,
)
from .codecs import decode_sgv1, decode_real_image, encode_sgv1_batch
from .ops import (
    audio_fingerprint,
    decode_assets,
    dhash_frames,
    dhash_images,
    frame_sample,
    image_features,
    resize_images,
)

__all__ = [
    "ASSET_SCHEMA",
    "synthetic_assets",
    "synthetic_assets_with_variants",
    "synthetic_audio_with_variants",
    "synthetic_videos_with_variants",
    "decode_sgv1",
    "decode_real_image",
    "encode_sgv1_batch",
    "decode_assets",
    "dhash_frames",
    "dhash_images",
    "audio_fingerprint",
    "frame_sample",
    "image_features",
    "resize_images",
]
