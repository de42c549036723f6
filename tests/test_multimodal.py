"""Multimodal binary-column pipeline: codec, plumbing, operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipeline_csv_spark.multimodal import (
    decode_assets,
    decode_real_image,
    decode_sgv1,
    frame_sample,
    image_features,
    resize_images,
    synthetic_assets,
)
from data_pipeline_csv_spark.multimodal.codecs import (
    MOD_AUDIO,
    MOD_IMAGE,
    MOD_VIDEO,
    asset_dims,
    encode_sgv1,
)


def test_codec_roundtrip_deterministic():
    for aid in (0, 1, 17, 123456789):
        for mod in (MOD_IMAGE, MOD_AUDIO, MOD_VIDEO):
            blob = encode_sgv1(aid, mod)
            assert blob == encode_sgv1(aid, mod)  # bit-reproducible
            d = decode_sgv1(blob)
            w, h, frames = asset_dims(aid, mod)
            assert (d["width"], d["height"], d["frames"]) == (w, h, frames)
            if mod == MOD_AUDIO:
                assert d["data"].dtype == np.int16 and d["data"].shape == (frames,)
            else:
                assert d["data"].shape == (frames, h, w)


def test_codec_rejects_garbage():
    with pytest.raises(ValueError, match="SGV1"):
        decode_sgv1(b"JPEGnotreally" + b"\x00" * 32)


def test_real_decoder_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_real_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_synthetic_assets_schema_and_meta(spark, sf_dir):
    assets = synthetic_assets(spark, sf_dir, modality="image")
    assert [f.name for f in assets.schema.fields] == ["asset_id", "modality", "content", "meta"]
    row = assets.filter(F.col("asset_id") == 5).collect()[0]
    w, h, frames = asset_dims(5, MOD_IMAGE)
    assert row["meta"]["width"] == w and row["meta"]["height"] == h
    # content really is the SGV1 blob for this id
    assert bytes(row["content"]) == encode_sgv1(5, MOD_IMAGE)


def test_decode_assets_dead_letters_bad_blobs(spark, sf_dir):
    good = synthetic_assets(spark, sf_dir, modality="image").limit(10)
    bad = (
        good.limit(1)
        .withColumn("asset_id", F.lit(999999).cast("long"))
        .withColumn("content", F.lit(b"garbage-bytes-here"))
    )
    out = decode_assets(good.unionByName(bad)).collect()
    errs = [r for r in out if r["decode_error"] is not None]
    assert len(errs) == 1 and errs[0]["asset_id"] == 999999
    assert "ValueError" in errs[0]["decode_error"]
    assert all(r["width"] is not None for r in out if r["decode_error"] is None)


def test_image_features_match_numpy(spark, sf_dir):
    feats = {r["asset_id"]: r for r in image_features(synthetic_assets(spark, sf_dir, "image")).collect()}
    for aid in list(feats)[:5]:
        px = decode_sgv1(encode_sgv1(aid, MOD_IMAGE))["data"].astype(np.float64).ravel()
        r = feats[aid]
        assert r["mean_val"] == pytest.approx(px.mean())
        assert r["std_val"] == pytest.approx(px.std())
        import json

        assert sum(json.loads(r["histogram"])) == px.size


def test_resize_shapes(spark, sf_dir):
    out = resize_images(synthetic_assets(spark, sf_dir, "image").limit(20), 4, 4).collect()
    for r in out:
        assert r["width"] == 4 and r["height"] == 4
        assert len(bytes(r["content"])) == 4 * 4 * r["frames"]


def test_frame_sample_fanout(spark, sf_dir):
    vids = synthetic_assets(spark, sf_dir, "video").limit(25)
    frames = frame_sample(vids, every_k=2)
    got = {r["asset_id"]: r["n"] for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()}
    for aid, n in got.items():
        _, _, total = asset_dims(aid, MOD_VIDEO)
        assert n == -(-total // 2)  # ceil(frames / 2)


def test_dhash_resolution_invariant(spark, sf_dir):
    """A nearest-neighbor 2x upscale must hash IDENTICALLY (the NN
    downsample lands on the same source pixels: floor(floor(2x)/2) ==
    floor(x)) — the property that makes dHash a perceptual signal."""
    import numpy as np

    from data_pipeline_csv_spark.multimodal import dhash_images, synthetic_assets
    from data_pipeline_csv_spark.multimodal.codecs import HEADER, MAGIC, MOD_IMAGE, decode_sgv1, encode_sgv1

    def up_blob(i):
        img = decode_sgv1(encode_sgv1(i, MOD_IMAGE))["data"][0]
        up = img.repeat(2, axis=0).repeat(2, axis=1)
        h2, w2 = up.shape
        return HEADER.pack(MAGIC, MOD_IMAGE, w2, h2, 1) + up.tobytes()

    rows = []
    for i in range(40):
        rows.append((i, bytearray(encode_sgv1(i, MOD_IMAGE))))
        rows.append((i + 1000, bytearray(up_blob(i))))
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    got = {r["asset_id"]: r["dhash"] for r in dhash_images(df).collect()}
    for i in range(40):
        assert got[i] == got[i + 1000]


def test_phash_banding_equals_brute_force(spark, sf_dir):
    """Pigeonhole banding must lose NO pair at hamming <= max_hamming:
    compare the banded pair set against a python brute force over the
    collected fingerprints (every pair, exact popcount)."""
    from itertools import combinations

    from data_pipeline_csv_spark.multimodal import (
        dhash_images,
        synthetic_assets_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import hamming_neardup_pairs

    fp = dhash_images(synthetic_assets_with_variants(spark, sf_dir))
    hashes = {r["asset_id"]: r["dhash"] for r in fp.collect()}
    want = set()
    for (a, ha), (b, hb) in combinations(sorted(hashes.items()), 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            want.add((a, b, d))
    got = {
        (r["d1"], r["d2"], r["hamming"])
        for r in hamming_neardup_pairs(fp, max_hamming=3).collect()
    }
    assert got == want and len(want) > 0


def test_phash_pairs_plan_has_no_all_pairs_join(spark, sf_dir):
    """Candidate generation is band equi-joins, never a cartesian."""
    import contextlib
    import io

    from data_pipeline_csv_spark.queries import REGISTRY

    df = REGISTRY["multimodal_phash_neardup"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_incremental_equals_oneshot(spark, sf_dir):
    """Incremental probe (corpus index vs arriving batch + within-
    batch) must equal the one-shot pairing restricted to pairs that
    touch the batch — for any old/new split."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.multimodal import (
        dhash_images,
        synthetic_assets_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import (
        hamming_neardup_pairs,
        hamming_probe_pairs,
    )

    fp = dhash_images(synthetic_assets_with_variants(spark, sf_dir)).persist()
    for split in (F.col("asset_id") >= 10_000_000, F.col("asset_id") % 3 == 0):
        new = fp.filter(split)
        old = fp.filter(~split)
        new_ids = {r["asset_id"] for r in new.select("asset_id").collect()}
        got = {
            (r["d1"], r["d2"], r["hamming"])
            for r in hamming_probe_pairs(old, new, max_hamming=3).collect()
        }
        want = {
            (r["d1"], r["d2"], r["hamming"])
            for r in hamming_neardup_pairs(fp, max_hamming=3).collect()
            if r["d1"] in new_ids or r["d2"] in new_ids
        }
        assert got == want
    fp.unpersist()


def test_audio_fingerprint_banding_equals_brute_force(spark, sf_dir):
    """Same pigeonhole-losslessness pin as the image pHash, for the
    audio fingerprint at hamming <= 7 (8x8-bit bands)."""
    from itertools import combinations

    from data_pipeline_csv_spark.multimodal import (
        audio_fingerprint,
        synthetic_audio_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import hamming_neardup_pairs

    fp = audio_fingerprint(synthetic_audio_with_variants(spark, sf_dir))
    hashes = {r["asset_id"]: r["afp"] for r in fp.collect()}
    want = set()
    for (a, ha), (b, hb) in combinations(sorted(hashes.items()), 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 7:
            want.add((a, b, d))
    got = {
        (r["d1"], r["d2"], r["hamming"])
        for r in hamming_neardup_pairs(
            fp, max_hamming=7, hash_col="afp"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_audio_fingerprint_volume_invariant(spark, sf_dir):
    """Energy-gradient SIGNS are unchanged by a uniform volume scale
    (the monotone map preserves every E_k > E_{k+1} comparison) — the
    robustness property that makes the contour a fingerprint."""
    import numpy as np

    from data_pipeline_csv_spark.multimodal import audio_fingerprint
    from data_pipeline_csv_spark.multimodal.codecs import (
        HEADER,
        MAGIC,
        MOD_AUDIO,
        decode_sgv1,
        encode_sgv1,
    )

    rows = []
    for i in range(30):
        blob = encode_sgv1(i, MOD_AUDIO)
        rows.append((i, bytearray(blob)))
        s = decode_sgv1(blob)["data"].astype(np.int32)
        half = (s // 2).astype(np.int16)  # uniform volume cut
        rows.append((i + 1000, bytearray(HEADER.pack(MAGIC, MOD_AUDIO, 0, 0, half.size) + half.tobytes())))
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    got = {r["asset_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    # s//2 floors toward -inf for negatives: |floor(s/2)| = ceil(|s|/2)
    # for s<0 — still monotone nondecreasing in |s|, so window-energy
    # ORDER can only change where energies were within rounding of
    # each other; require hamming <= 2 rather than exact equality.
    for i in range(30):
        d = bin((got[i] ^ got[i + 1000]) & ((1 << 64) - 1)).count("1")
        assert d <= 2, (i, d)


def test_video_variants_defeat_first_frame_hash(spark, sf_dir):
    """The scenario multi-frame voting exists for: a trimmed re-encode
    shares NO first frame with its original, so first-frame dHash
    pairing finds zero variant pairs — while the frame-set containment
    vote finds every planted one."""
    from data_pipeline_csv_spark.multimodal import (
        dhash_frames,
        dhash_images,
        synthetic_videos_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import (
        frameset_containment_pairs,
        hamming_neardup_pairs,
    )

    assets = synthetic_videos_with_variants(spark, sf_dir).persist()
    planted = {
        (r["asset_id"], r["asset_id"] + 10_000_000)
        for r in assets.filter("asset_id % 10 = 0 AND asset_id < 10000000")
        .select("asset_id")
        .collect()
    }
    assert planted
    # first-frame hashing: zero planted pairs survive the trim
    ff = {
        (r["d1"], r["d2"])
        for r in hamming_neardup_pairs(dhash_images(assets), max_hamming=3).collect()
    }
    assert not (ff & planted)
    # frame-set containment vote: high recall on the planted pairs
    # (perceptual recall < 1 by nature — the sparse pixel damage
    # pushes SOME frames past hamming 3, and a 3-4 frame variant
    # needs half of them to match; measured 45/50 at sf0.001, same
    # as the image-variant query) and zero false pairs.
    votes = frameset_containment_pairs(dhash_frames(assets), max_hamming=3)
    got = {(r["d1"], r["d2"]) for r in votes.collect()}
    assert len(got & planted) >= 0.85 * len(planted)
    assert got <= planted  # nothing but true re-encodes pairs
    assets.unpersist()


def test_frameset_vote_equals_bruteforce(spark, sf_dir):
    """Banding losslessness + vote arithmetic vs a driver-side brute
    force over all frame pairs."""
    from collections import defaultdict

    from data_pipeline_csv_spark.multimodal import (
        dhash_frames,
        synthetic_videos_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import frameset_containment_pairs

    frames = dhash_frames(synthetic_videos_with_variants(spark, sf_dir)).persist()
    rows = frames.collect()
    by_vid = defaultdict(list)
    for r in rows:
        by_vid[r["asset_id"]].append((r["frame_no"], r["fhash"]))
    vids = sorted(by_vid)
    want = set()
    for i, v1 in enumerate(vids):
        for v2 in vids[i + 1 :]:
            m1 = {
                f1
                for f1, h1 in by_vid[v1]
                for _f2, h2 in by_vid[v2]
                if bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3
            }
            m2 = {
                f2
                for f2, h2 in by_vid[v2]
                for _f1, h1 in by_vid[v1]
                if bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3
            }
            n1, n2 = len(by_vid[v1]), len(by_vid[v2])
            if m1 and (2 * len(m1) >= n1 or 2 * len(m2) >= n2):
                want.add((v1, v2, n1, n2, len(m1), len(m2)))
    got = {
        (r["d1"], r["d2"], r["n1"], r["n2"], r["m1"], r["m2"])
        for r in frameset_containment_pairs(frames, max_hamming=3).collect()
    }
    assert got == want
    frames.unpersist()


@pytest.mark.slow
def test_video_incremental_equals_oneshot(spark, sf_dir):
    """Incremental probe (corpus frame index vs arriving batch +
    within-batch) must equal the one-shot frame-set voting restricted
    to pairs that touch the batch — for any old/new split."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.multimodal import (
        dhash_frames,
        synthetic_videos_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import (
        frameset_containment_pairs,
        frameset_containment_probe,
    )

    frames = dhash_frames(synthetic_videos_with_variants(spark, sf_dir)).persist()
    for split in (F.col("asset_id") >= 10_000_000, F.col("asset_id") % 3 == 0):
        new = frames.filter(split)
        old = frames.filter(~split)
        new_ids = {r["asset_id"] for r in new.select("asset_id").distinct().collect()}
        got = {
            tuple(r[c] for c in ("d1", "d2", "n1", "n2", "m1", "m2"))
            for r in frameset_containment_probe(old, new, max_hamming=3).collect()
        }
        want = {
            tuple(r[c] for c in ("d1", "d2", "n1", "n2", "m1", "m2"))
            for r in frameset_containment_pairs(frames, max_hamming=3).collect()
            if r["d1"] in new_ids or r["d2"] in new_ids
        }
        assert got == want
    frames.unpersist()
