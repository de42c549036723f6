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
