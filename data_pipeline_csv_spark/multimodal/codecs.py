"""SGV1: a deterministic synthetic binary media format (numpy-only).

Layout (little-endian):

    magic   4s   b"SGV1"
    mod     u8   0=image 1=audio 2=video
    width   u32  image/video frame width   (audio: 0)
    height  u32  image/video frame height  (audio: 0)
    frames  u32  video frame count (image: 1; audio: sample count)
    payload      gray8 pixels (w*h*frames) | i16 PCM samples

Payload bytes are a splitmix64 stream seeded by ``asset_id`` so every
byte is reproducible from the id alone — tests and oracles can verify
the decode round-trip without shipping real media. The real-codec
seam is ``decode_real_image`` (PIL try-import, stubbed here).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"SGV1"
HEADER = struct.Struct("<4sBIII")

MOD_IMAGE, MOD_AUDIO, MOD_VIDEO = 0, 1, 2
_MOD_NAMES = {MOD_IMAGE: "image", MOD_AUDIO: "audio", MOD_VIDEO: "video"}


def _splitmix64_bytes(seed: int, n: int) -> np.ndarray:
    """First n bytes of the splitmix64 stream for seed — vectorized."""
    k = (n + 7) // 8
    x = (np.uint64(seed) + (np.arange(1, k + 1, dtype=np.uint64)) * np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z.view(np.uint8)[:n]


def asset_dims(asset_id: int, modality: int) -> tuple[int, int, int]:
    """(width, height, frames) as pure arithmetic on the id.

    Deliberately SQL-expressible (width = 8 + id % 9, ...) so a DuckDB
    oracle can verify the decoded metadata independently.
    """
    if modality == MOD_AUDIO:
        return 0, 0, 256 + (asset_id % 512)
    w, h = 8 + (asset_id % 9), 8 + (asset_id % 7)
    frames = 1 if modality == MOD_IMAGE else 4 + (asset_id % 5)
    return w, h, frames


def encode_sgv1(asset_id: int, modality: int) -> bytes:
    w, h, frames = asset_dims(asset_id, modality)
    n = frames * 2 if modality == MOD_AUDIO else w * h * frames
    payload = _splitmix64_bytes(asset_id, n)
    return HEADER.pack(MAGIC, modality, w, h, frames) + payload.tobytes()


def encode_sgv1_batch(asset_ids: np.ndarray, modality: int) -> list[bytes]:
    return [encode_sgv1(int(a), modality) for a in asset_ids]


def decode_sgv1(blob: bytes) -> dict:
    """Parse an SGV1 blob -> {modality, width, height, frames, data}.

    ``data`` is uint8 (frames, h, w) for image/video, int16 (frames,)
    for audio. Raises ValueError on a bad magic so malformed blobs
    surface as per-row errors the caller can route to a dead-letter
    column instead of killing the task.
    """
    magic, mod, w, h, frames = HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError(f"not an SGV1 blob (magic={magic!r})")
    payload = np.frombuffer(blob, dtype=np.uint8, offset=HEADER.size)
    if mod == MOD_AUDIO:
        data = payload.view(np.int16)[:frames]
    else:
        data = payload[: w * h * frames].reshape(frames, h, w)
    return {"modality": _MOD_NAMES[mod], "width": w, "height": h, "frames": frames, "data": data}


def decode_real_image(blob: bytes) -> np.ndarray:
    """Decode a real image (JPEG/PNG/...) — the production-codec seam.

    The container ships no imaging libraries; swap-in point for PIL /
    torchvision / ffmpeg in a real deployment. Everything upstream and
    downstream (schemas, Arrow batching, partitioning) works unchanged.
    """
    try:
        from io import BytesIO

        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode requires PIL/pillow, not present in this "
            "container; use the SGV1 synthetic codec (decode_sgv1) or "
            "install pillow and this function decodes via PIL"
        ) from e
    return np.asarray(Image.open(BytesIO(blob)).convert("L"))
