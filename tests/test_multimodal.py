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


# ------------------------- real header-probe kernel (no codec needed) --

def _png_bytes(width, height, color_type=6):
    """A structurally valid PNG: signature + IHDR + minimal IDAT + IEND."""
    import struct
    import zlib

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"\x00" + b"\x00" * 4 * width  # one filter byte + one RGBA row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(width, height, n_comp=3):
    """Minimal JPEG: SOI + APP0 + SOF0 carrying the dimensions."""
    import struct

    # length 16 = 2 length bytes + 14 body bytes
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * n_comp)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([n_comp])
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"[: 3 * n_comp]
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(width, height):
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 5


def _bmp_bytes(width, height, bit_count=24):
    import struct

    dib = struct.pack("<IiiHH", 40, width, height, 1, bit_count) + b"\x00" * 20
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib


def test_probe_image_metadata_real_headers(spark):
    from pyspark_entity_resolution_spark.operators.multimodal import (
        probe_image_metadata,
    )

    rows = [
        (1, "image", _png_bytes(640, 480), "image/png", "s3://x/a.png"),
        (2, "image", _jpeg_bytes(1920, 1080), "image/jpeg", "s3://x/b.jpg"),
        (3, "image", _gif_bytes(320, 200), "image/gif", "s3://x/c.gif"),
        (4, "image", _bmp_bytes(800, 600), "image/bmp", "s3://x/d.bmp"),
        (5, "image", b"not an image at all", "image/png", "s3://x/e.png"),
        (6, "image", _png_bytes(1, 1)[:12], "image/png", "s3://x/trunc.png"),
        (7, "video", _png_bytes(9, 9), "video/mp4", "s3://x/f.mp4"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in probe_image_metadata(media).collect()}

    assert set(got) == {1, 2, 3, 4, 5, 6}  # media_type == image only
    assert (got[1]["format"], got[1]["width"], got[1]["height"], got[1]["channels"]) == ("png", 640, 480, 4)
    assert (got[2]["format"], got[2]["width"], got[2]["height"], got[2]["channels"]) == ("jpeg", 1920, 1080, 3)
    assert (got[3]["format"], got[3]["width"], got[3]["height"], got[3]["channels"]) == ("gif", 320, 200, 3)
    assert (got[4]["format"], got[4]["width"], got[4]["height"], got[4]["channels"]) == ("bmp", 800, 600, 3)
    # corrupt / truncated payloads quarantine as NULL format, no task failure
    assert got[5]["format"] is None and got[5]["width"] is None
    assert got[6]["format"] is None
    assert got[5]["n_bytes"] == 19 and len(got[5]["content_hash"]) == 32


def test_probe_grayscale_png_channels(spark):
    from pyspark_entity_resolution_spark.operators.multimodal import (
        probe_image_metadata,
    )

    rows = [(1, "image", _png_bytes(32, 16, color_type=0), "image/png", "u")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = probe_image_metadata(media).collect()[0]
    assert (r["format"], r["width"], r["height"], r["channels"]) == ("png", 32, 16, 1)
