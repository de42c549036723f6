"""Multimodal operators: decode / features / resize / frame-sample.

Every operator is a ``mapInPandas`` stage: Arrow delivers the binary
column as zero-copy buffers, numpy does the per-asset work, and the
output is again a columnar batch. Nothing here is per-row Python over
Spark rows; the per-batch loop is over in-memory numpy arrays.

Error handling is dead-letter style: a malformed blob yields a null
result + error string instead of failing the task — at 100 TB some
corrupt assets are a certainty and one bad byte must not kill a
900-task stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .codecs import decode_sgv1

DECODED_SCHEMA = (
    "asset_id long, modality string, width int, height int, frames int, "
    "n_payload_bytes long, decode_error string"
)

# Bit-position weights for packing <=64 boolean flags into one int64.
_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _pack_bits64(bits: np.ndarray) -> np.ndarray:
    """Pack a (..., n<=64) boolean array into signed int64 rows,
    little-endian bit order (bit i = element i) — one vectorized dot
    per call instead of a per-set-bit Python loop (the loop was the
    hot path of every fingerprint batch: ~64 Python ops per row)."""
    flat = bits.reshape(-1, bits.shape[-1]).astype(np.uint64)
    packed = flat @ _BIT_WEIGHTS[: bits.shape[-1]]
    return packed.view(np.int64)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode headers + payload sizes; malformed rows -> decode_error."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "modality", "width", "height", "frames", "n_payload_bytes", "decode_error")}
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                out["asset_id"].append(aid)
                try:
                    d = decode_sgv1(bytes(blob))
                    out["modality"].append(d["modality"])
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["frames"].append(d["frames"])
                    out["n_payload_bytes"].append(int(d["data"].nbytes))
                    out["decode_error"].append(None)
                except Exception as e:  # noqa: BLE001 - dead-letter
                    out["modality"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["frames"].append(None)
                    out["n_payload_bytes"].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return assets.select("asset_id", "content").mapInPandas(run, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = (
    "asset_id long, mean_val double, std_val double, min_val double, "
    "max_val double, histogram string"
)


def image_features(assets: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Per-asset gray-level stats + histogram (the embed-precursor stage).

    The histogram is serialized as a compact JSON int array ("[5,0,...]")
    — scalar columns survive any downstream hasher/canonicalizer (the
    driver's pandas path cannot hash array cells), and json parsing
    back to an array is one ``from_json`` away.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                d = decode_sgv1(bytes(blob))
                px = d["data"].astype(np.float64).ravel()
                hist, _ = np.histogram(px, bins=hist_bins, range=(0, 256))
                hist_json = "[" + ",".join(str(int(c)) for c in hist) + "]"
                rows.append(
                    (aid, float(px.mean()), float(px.std()), float(px.min()), float(px.max()), hist_json)
                )
            yield pd.DataFrame(rows, columns=["asset_id", "mean_val", "std_val", "min_val", "max_val", "histogram"])

    return assets.select("asset_id", "content").mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize each frame to (out_w, out_h).

    Output is the resized raw gray8 bytes per asset — the shape every
    vision-model preprocessing pipeline needs. Index math is pure
    numpy fancy-indexing, vectorized over the whole frame stack.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                d = decode_sgv1(bytes(blob))
                frames, h, w = d["data"].shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = d["data"][:, ys[:, None], xs[None, :]]
                rows.append((aid, out_w, out_h, frames, resized.tobytes()))
            yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "frames", "content"])

    return assets.select("asset_id", "content").mapInPandas(
        run, schema="asset_id long, width int, height int, frames int, content binary"
    )


def frame_sample(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode video assets into every k-th frame (frame-level rows).

    One input row fans out to ceil(frames/k) rows — mapInPandas allows
    output cardinality != input cardinality, which is exactly the
    video->frames explosion a training pipeline runs before per-frame
    embedding. Downstream repartition on (asset_id, frame_no) spreads
    a long video across the cluster.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                d = decode_sgv1(bytes(blob))
                for fno in range(0, d["frames"], every_k):
                    frame = d["data"][fno]
                    rows.append((aid, fno, d["width"], d["height"], float(frame.mean()), frame.tobytes()))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "width", "height", "frame_mean", "frame"]
            )

    return assets.select("asset_id", "content").mapInPandas(
        run,
        schema="asset_id long, frame_no int, width int, height int, frame_mean double, frame binary",
    )


def dhash_images(assets: DataFrame) -> DataFrame:
    """64-bit difference hash (dHash) per image asset — the standard
    perceptual fingerprint (Krawetz, "Kind of Like That", 2013 — the
    gradient-hash member of the aHash/pHash/dHash family; original
    implementation): nearest-neighbor downsample to a 9x8
    gray grid, then bit (r, c) = 1 iff grid[r][c] > grid[r][c+1]
    (8 comparisons per row x 8 rows), packed little-endian into one
    signed int64. Resolution-invariant by construction (any
    NN-upscaled copy samples back to the SAME source pixels, so its
    dHash is identical), which is what makes hamming distance on it a
    near-duplicate signal. Videos hash their FIRST frame only — a
    trimmed re-encode defeats this; use :func:`dhash_frames` + the
    frame-set containment vote for video near-dup. Output:
    (asset_id, dhash) — one small row per asset; banding/joins happen
    downstream in JVM bit-ops (operators/dedup.py
    hamming_neardup_pairs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                d = decode_sgv1(bytes(blob))
                img = d["data"][0]
                h, w = img.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = img[np.ix_(ys, xs)].astype(np.int16)
                bits = (g[:, :-1] > g[:, 1:]).ravel()  # bit index r*8+c
                ids.append(aid)
                hashes.append(int(_pack_bits64(bits)[0]))
            yield pd.DataFrame({"asset_id": ids, "dhash": hashes})

    return assets.select("asset_id", "content").mapInPandas(
        run, schema="asset_id long, dhash long"
    )


def dhash_frames(assets: DataFrame, every_f: int = 1) -> DataFrame:
    """Per-FRAME 64-bit dHash of video assets (every ``every_f``-th
    frame) — the frame-set fingerprint for multi-frame video near-dup
    (:func:`~..operators.dedup.frameset_containment_pairs`). Same
    9x8-grid gradient hash as :func:`dhash_images` (Krawetz 2013,
    implementation original), applied per sampled frame, so it keeps
    the NN-upscale invariance per frame; a trimmed/re-encoded copy's
    frame hashes are a (damaged) SUBSET of the original's, which is
    what the downstream containment vote detects where any
    single-frame hash fails. Output: (asset_id, frame_no, fhash) —
    frame_no is the index AFTER sampling, i.e. the position in the
    hashed frame sequence."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, hashes = [], [], []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                d = decode_sgv1(bytes(blob))
                fidx = np.arange(0, d["frames"], every_f)
                _nf, h, w = d["data"].shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                # all sampled frames of the asset in one fancy-index +
                # one vectorized pack (the per-frame Python loop with
                # a per-set-bit inner loop was ~64*frames ops per row)
                g = d["data"][np.ix_(fidx, ys, xs)].astype(np.int16)
                bits = (g[:, :, :-1] > g[:, :, 1:]).reshape(len(fidx), 64)
                hvs = _pack_bits64(bits)
                ids.extend([aid] * len(fidx))
                fnos.extend(range(len(fidx)))
                hashes.extend(int(v) for v in hvs)
            yield pd.DataFrame({"asset_id": ids, "frame_no": fnos, "fhash": hashes})

    return assets.select("asset_id", "content").mapInPandas(
        run, schema="asset_id long, frame_no int, fhash long"
    )


def audio_fingerprint(assets: DataFrame) -> DataFrame:
    """64-bit acoustic fingerprint per audio asset — the energy-
    contour sign hash (the shape of Haitsma & Kalker's "A Highly
    Robust Audio Fingerprint System", ISMIR 2002 — band-energy
    difference signs; simplified here to time-windows over PCM since
    the container ships no FFT dependency, implementation original): the PCM clip is cut into 65 contiguous
    index windows (window of sample j is (j*65)//n — pure integer
    arithmetic both engines agree on), each window's energy is the
    exact integer sum of |sample|, and bit k = 1 iff E_k > E_{k+1}
    (the energy-gradient sign contour, robust to volume scaling and
    sparse sample damage), packed into one signed int64. Pairing then
    rides the same pigeonhole banders as every other fingerprint
    (operators/dedup.py hamming_neardup_pairs). Output:
    (asset_id, afp)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                s = np.abs(decode_sgv1(bytes(blob))["data"].astype(np.int64))
                n = s.size
                k = (np.arange(n) * 65) // n
                # float64 bincount sums are exact here: max energy
                # 768 * 32768 << 2^53
                energy = np.bincount(k, weights=s, minlength=65).astype(np.int64)
                bits = energy[:-1] > energy[1:]
                ids.append(aid)
                hashes.append(int(_pack_bits64(bits)[0]))
            yield pd.DataFrame({"asset_id": ids, "afp": hashes})

    return assets.select("asset_id", "content").mapInPandas(
        run, schema="asset_id long, afp long"
    )
