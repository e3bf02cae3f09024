"""Hand-rolled minimal AVI/RIFF muxer for MJPEG test fixtures.

Independent test oracle for the engine's MJPEG-in-AVI frame sampler
(pyspark_entity_resolution_spark/operators/multimodal.py,
``sample_video_frames(codec="mjpeg-stdlib")``): same discipline as
tools/jpeg_fixture.py — this writer deliberately shares NO code with
the parser it tests; both are written independently against the public
AVI RIFF layout (Microsoft AVI RIFF File Reference: 'RIFF(AVI ' with a
'hdrl' LIST carrying avih/strl headers and a 'movi' LIST carrying
per-frame '##dc' chunks).

Structures emitted:
- ``avih`` (MainAVIHeader, 56 bytes): dwMicroSecPerFrame at +0,
  dwTotalFrames at +16, dwStreams at +24, dwWidth/dwHeight at +32/+36.
- ``strh`` (AVISTREAMHEADER): fccType 'vids' at +0, fccHandler 'MJPG'
  at +4, dwScale at +20, dwRate at +24 (frame clock = dwRate/dwScale
  frames per second), dwLength at +32.
- ``strf`` (BITMAPINFOHEADER, 40 bytes): biCompression 'MJPG' at +16.
- ``movi``: one '00dc' chunk per frame, each a complete baseline JPEG.

Every chunk is padded to even length per RIFF; sizes are little-endian.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def mux_mjpeg_avi(
    frames: list[bytes],
    width: int,
    height: int,
    rate: int = 1,
    scale: int = 1,
    handler: bytes = b"MJPG",
    compression: bytes = b"MJPG",
) -> bytes:
    """AVI bytes holding ``frames`` (complete baseline JPEGs) as one
    MJPEG video stream at ``rate / scale`` frames per second.

    ``handler`` / ``compression`` are overridable so tests can mux a
    non-MJPG stream and pin the parser's fail-loud guard.
    """
    if not frames:
        raise ValueError("need at least one frame")
    usec_per_frame = scale * 1_000_000 // rate
    avih = struct.pack(
        "<14I",
        usec_per_frame,  # dwMicroSecPerFrame
        0,               # dwMaxBytesPerSec
        0,               # dwPaddingGranularity
        0x10,            # dwFlags: AVIF_HASINDEX clear, AVIF_WASCAPTUREFILE-ish
        len(frames),     # dwTotalFrames
        0,               # dwInitialFrames
        1,               # dwStreams
        max(len(f) for f in frames),  # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,      # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", handler,
        0,               # dwFlags
        0, 0,            # wPriority, wLanguage
        0,               # dwInitialFrames
        scale, rate,     # dwScale, dwRate
        0,               # dwStart
        len(frames),     # dwLength
        max(len(f) for f in frames),  # dwSuggestedBufferSize
        0,               # dwQuality
        0,               # dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,              # biSize
        width, height,
        1, 24,           # biPlanes, biBitCount
        compression,     # biCompression
        0,               # biSizeImage (may be 0 for compressed)
        0, 0, 0, 0,      # pels/meter, clr used/important
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
