"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in DataFrames as ``binary`` columns next to typed
metadata, processed with Arrow-batched ``mapInPandas`` so payload bytes
never round-trip through Python row objects one at a time.

Decode kernels FAIL LOUD by default: ``fake=False`` (the default)
requires a real codec — PIL for images (imported at plan-build time so a
missing library errors on the driver, not mid-job) and ffmpeg for video
frame sampling (not probed here). Where the codec is absent this raises
``NotImplementedError``. Tests and environments without the libs opt
into ``fake=True``, a deterministic md5-derived stand-in that exercises
the full Spark-side plumbing — schema, batching, partitioning — with
real data flow and an output shape identical to the real kernel's.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("payload", BinaryType()),      # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("source_uri", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("content_hash", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real image decode: derives plausible
    dimensions from the payload hash. Replace with PIL in production."""
    import hashlib

    h = hashlib.md5(payload or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1984       # 64..2047
    height = 64 + int(h[4:8], 16) % 1984
    channels = 1 + int(h[8], 16) % 4
    return width, height, channels, h


def _real_decode(payload: bytes) -> tuple[int, int, int, str]:
    """PIL-backed decode (only reached when PIL imported successfully)."""
    import hashlib
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    channels = len(img.getbands())
    return width, height, channels, hashlib.md5(payload).hexdigest()


def decode_image_batch(
    batches: Iterator[pd.DataFrame], fake: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, payload) -> IMAGE_FEATURES_SCHEMA."""
    decode = _fake_decode if fake else _real_decode
    for pdf in batches:
        rows = []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            payload = bytes(payload) if payload is not None else b""
            w, h, c, digest = decode(payload)
            rows.append((media_id, len(payload), w, h, c, digest))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id", "n_bytes", "width", "height", "channels",
                "content_hash",
            ],
        )


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract an image column.

    Plan shape: column-prune to (media_id, payload) BEFORE the Python
    boundary (payload bytes cross via Arrow once), mapInPandas with an
    explicit output schema. Partitioning is preserved; at scale,
    repartition upstream by size estimate so Arrow batches stay bounded.

    Default ``fake=False`` needs PIL and fails loud AT PLAN BUILD if it
    is missing — fabricated features never ship silently; opt into
    ``fake=True`` for the deterministic stub kernel.
    """
    if not fake:
        try:
            import PIL.Image  # noqa: F401  (driver-side availability check)
        except ImportError as exc:
            raise NotImplementedError(
                "real image decoding requires PIL/libjpeg, which is not "
                "installed; pass fake=True to run the deterministic stub "
                "kernel (clearly-fabricated features for plumbing tests)"
            ) from exc
    pruned = media.filter(F.col("media_type") == "image").select(
        "media_id", "payload"
    )
    return pruned.mapInPandas(
        lambda it: decode_image_batch(it, fake=fake), IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: int = 10, fake: bool = False
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame with a deterministic fake frame hash (real
    implementation would shell to ffmpeg per Arrow batch).

    Default ``fake=False`` fails loud at plan build — ffmpeg is not
    shipped here; opt into ``fake=True`` for the stub kernel."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg, which is not installed; "
            "pass fake=True to run the deterministic stub kernel"
        )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_sec", IntegerType()),
            StructField("frame_hash", StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                # fake duration: 1 sec per 1000 bytes, at least one frame
                n_frames = max(1, len(payload) // (1000 * every_n_seconds))
                for i in range(n_frames):
                    digest = hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    rows.append((media_id, i, i * every_n_seconds, digest))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_sec", "frame_hash"]
            )

    pruned = media.filter(F.col("media_type") == "video").select(
        "media_id", "payload"
    )
    return pruned.mapInPandas(kernel, schema)
