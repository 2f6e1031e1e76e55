"""Multimodal plumbing: schema, batch shapes, stub gating, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from hoover_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media_df(spark):
    return synthetic_media(spark, 60, payload_bytes=128).persist()


def test_media_schema(spark, media_df):
    assert [f.name for f in media_df.schema.fields] == ["asset_id", "kind", "payload", "meta"]
    row = media_df.where("asset_id = 0").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert len(row["payload"]) == 128
    assert row["meta"]["codec"] == "fake"


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 64, "image", {"width": 4, "height": 4})


def test_decode_fake_shapes():
    payload = b"\x01" * 64
    img = decode_media(payload, "image", {"width": 9, "height": 5}, fake=True)
    assert img.shape == (5, 8, 3)
    aud = decode_media(payload, "audio", {"sample_rate": 16000}, fake=True)
    assert aud.shape == (1024,)
    vid = decode_media(payload, "video", {"n_frames": 10}, fake=True)
    assert vid.shape == (4, 8, 8, 3)


def test_extract_features(spark, media_df):
    feats = extract_features(media_df, fake=True).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["payload_bytes"] == 128
    # deterministic across runs
    again = {r["asset_id"]: r["feature"] for r in extract_features(media_df, fake=True).collect()}
    for r in feats:
        assert np.allclose(r["feature"], again[r["asset_id"]])


def test_sample_frames_expansion(spark, media_df):
    frames = sample_frames(media_df, every_n=60, fake=True).collect()
    vids = media_df.where("kind = 'video'").select("asset_id", "meta.n_frames").collect()
    expected = sum(-(-r["n_frames"] // 60) for r in vids)
    assert len(frames) == expected
    for r in frames:
        assert len(r["frame"]) == 8 * 8 * 3 * 4  # float32 8x8x3 frame
