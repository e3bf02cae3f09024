"""Multimodal column plumbing tests (binary payloads + mapInPandas)."""

import pytest

from pyspark_entity_resolution_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-aaaa", "image/png", "s3://x/1.png"),
        (2, "image", b"\xff\xd8JPEG-fake-bytes-bb", "image/jpeg", "s3://x/2.jpg"),
        (3, "image", None, "image/png", "s3://x/3.png"),
        (4, "video", b"MP4-fake" * 4000, "video/mp4", "s3://x/4.mp4"),
        (5, "audio", b"RIFF-fake", "audio/wav", "s3://x/5.wav"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_feature_extraction(spark, media):
    feats = {
        r["media_id"]: r
        for r in extract_image_features(media, fake=True).collect()
    }
    assert set(feats) == {1, 2, 3}  # only images
    f1 = feats[1]
    assert f1["n_bytes"] == 20
    assert 64 <= f1["width"] <= 2047 and 64 <= f1["height"] <= 2047
    assert 1 <= f1["channels"] <= 4
    assert len(f1["content_hash"]) == 32
    # deterministic: same payload -> same features
    again = {
        r["media_id"]: r
        for r in extract_image_features(media, fake=True).collect()
    }
    assert again[1] == f1
    # null payload handled
    assert feats[3]["n_bytes"] == 0


def test_default_is_fail_loud_not_fake(spark, media):
    # fake features must never ship silently: the DEFAULT raises at plan
    # build when the real codec is absent (PIL is not in this container)
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed here — the real path would run")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        extract_image_features(media)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_video_frames(media)


def test_video_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_n_seconds=10, fake=True).collect()
    assert all(r["media_id"] == 4 for r in frames)
    assert len(frames) == 3  # 32000 bytes -> 3 fake frames
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert len({r["frame_hash"] for r in frames}) == 3
