"""MJPEG-in-AVI frame sampling (operators/multimodal.py,
``sample_video_frames(codec="mjpeg-stdlib")``).

Fixture discipline mirrors tests/test_jpeg_stdlib.py: the container is
written by :func:`tools.avi_fixture.mux_mjpeg_avi` — a hand-rolled
muxer deliberately sharing NO code with the parser — and expected
frame pixels come from :func:`tools.jpeg_fixture.reference_pixels`,
the spec-formula IDCT independent of the decoder. So an exact
frame_hash match pins container walking + the frame clock + sampling
semantics + pixel decode end to end.
"""

import hashlib
import struct

import pytest

from pyspark_entity_resolution_spark.operators.multimodal import (
    _avi_mjpeg_frames,
    sample_video_frames,
)
from tools.avi_fixture import mux_mjpeg_avi
from tools.jpeg_fixture import encode_jpeg, reference_pixels

Q_ONES = [1] * 64


def _frame(dc: int):
    """One 8x8 gray baseline JPEG and its independent expected pixels."""
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
              "blocks": {(0, 0): [dc] + [0] * 63}}]
    jpeg = encode_jpeg(8, 8, comps, {0: Q_ONES})
    want = reference_pixels(8, 8, comps, {0: Q_ONES})
    return jpeg, hashlib.md5(want).hexdigest()


def test_parser_clock_and_frame_payloads():
    jpegs = [_frame(d)[0] for d in (0, 80, 160)]
    avi = mux_mjpeg_avi(jpegs, 8, 8, rate=30, scale=1)
    (num, den), frames = _avi_mjpeg_frames(avi)
    assert (num, den) == (1_000_000, 30)
    assert list(frames) == jpegs


def test_exact_frame_hashes_all_frames_sampled():
    # 1 fps, sample every second -> every frame, ts 0,1,2
    made = [_frame(d) for d in (0, 80, 160)]
    avi = mux_mjpeg_avi([j for j, _ in made], 8, 8, rate=1, scale=1)
    (num, den), frames = _avi_mjpeg_frames(avi)
    import pyspark_entity_resolution_spark.operators.multimodal as mm

    out = []
    next_us = 0
    for idx, jpeg in enumerate(frames):
        t_us = idx * num // den
        if t_us >= next_us:
            _, _, _, rgb = mm._jpeg_decode(jpeg)
            out.append((idx, t_us // 1_000_000,
                        hashlib.md5(rgb).hexdigest()))
            next_us = t_us + 1_000_000
    assert out == [(i, i, h) for i, (_, h) in enumerate(made)]


def test_sampling_keeps_first_frame_at_or_after_each_boundary(spark):
    # 2 fps (0.5 s per frame), every_n_seconds=1 -> frames 0,2,4,6,8
    made = [_frame(16 * d) for d in range(10)]
    avi = mux_mjpeg_avi([j for j, _ in made], 8, 8, rate=2, scale=1)
    df = spark.createDataFrame(
        [(7, "video", bytearray(avi))], "media_id long, media_type string, payload binary"
    )
    rows = sorted(
        sample_video_frames(df, every_n_seconds=1, codec="mjpeg-stdlib")
        .collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_ts_sec) for r in rows] == [
        (0, 0), (2, 1), (4, 2), (6, 3), (8, 4)
    ]
    assert [r.frame_hash for r in rows] == [made[i][1] for i in (0, 2, 4, 6, 8)]


def test_avih_fallback_clock_when_strh_scale_rate_zero():
    jpegs = [_frame(d)[0] for d in (0, 80)]
    avi = mux_mjpeg_avi(jpegs, 8, 8, rate=4, scale=1)
    # zero strh dwScale/dwRate in place (offsets +20..+28 from 'vids')
    i = avi.index(b"vids")
    broken = avi[:i + 20] + struct.pack("<II", 0, 0) + avi[i + 28:]
    (num, den), frames = _avi_mjpeg_frames(broken)
    assert (num, den) == (250_000, 1)  # avih dwMicroSecPerFrame at 4 fps
    assert len(list(frames)) == 2


def test_rec_grouped_movi_chunks_walk_in_order():
    from tools.avi_fixture import _chunk

    jpegs = [_frame(d)[0] for d in (0, 80, 160)]
    avi = mux_mjpeg_avi(jpegs, 8, 8)
    i = avi.index(b"movi") - 8
    (size,) = struct.unpack("<I", avi[i + 4:i + 8])
    inner = avi[i + 12:i + 8 + size]
    # first frame stays bare; the last two move into a 'rec ' group
    first_len = 8 + len(jpegs[0]) + (len(jpegs[0]) & 1)
    regrouped = (inner[:first_len]
                 + _chunk(b"LIST", b"rec " + inner[first_len:]))
    new = avi[:i] + _chunk(b"LIST", b"movi" + regrouped)
    new = new[:4] + struct.pack("<I", len(new) - 8) + new[8:]
    _, frames = _avi_mjpeg_frames(new)
    assert list(frames) == jpegs


def test_guards_fail_loud():
    jpegs = [_frame(0)[0]]
    ok = mux_mjpeg_avi(jpegs, 8, 8)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        _avi_mjpeg_frames(b"GIF89a not an avi")
    with pytest.raises(ValueError, match="RIFF/AVI"):
        # RIFF but a WAVE, not AVI
        _avi_mjpeg_frames(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="not MJPG"):
        _avi_mjpeg_frames(
            mux_mjpeg_avi(jpegs, 8, 8, handler=b"H264", compression=b"H264")
        )
    with pytest.raises(ValueError, match="truncated"):
        _avi_mjpeg_frames(ok[:40])
    # handler may be junk if biCompression says MJPG (common in the wild)
    clock, frames = _avi_mjpeg_frames(
        mux_mjpeg_avi(jpegs, 8, 8, handler=b"\x00\x00\x00\x00")
    )
    assert len(list(frames)) == 1
    # the codec argument itself is validated at plan build
    with pytest.raises(ValueError, match="codec must be"):
        sample_video_frames(None, codec="avi-stdlib")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_video_frames(None, codec="ffmpeg")


def test_truncated_jpeg_frame_fails_inside_decoder(spark):
    jpeg, _ = _frame(80)
    avi = mux_mjpeg_avi([jpeg[:-6]], 8, 8)  # frame cut before EOI
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi))], "media_id long, media_type string, payload binary"
    )
    out = sample_video_frames(df, every_n_seconds=1, codec="mjpeg-stdlib")
    with pytest.raises(Exception, match="EOI|truncated|exhausted"):
        out.collect()


def test_truncated_strh_and_avih_raise_valueerror_not_struct_error():
    """The parser's stated contract is 'everything else raises
    ValueError, never a silent wrong parse' — a strh shorter than its
    28 header bytes (or an avih shorter than 4) must raise ValueError,
    not leak struct.error (r10 ADVICE)."""
    from tools.avi_fixture import _chunk, _list

    def riff(hdrl_body: bytes) -> bytes:
        body = (b"AVI "
                + _list(b"hdrl", hdrl_body)
                + _list(b"movi", _chunk(b"00dc", b"\xff\xd8\xff\xd9")))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    short_strh = _list(b"strl", _chunk(b"strh", b"vids" + b"\x00" * 6))
    with pytest.raises(ValueError, match="truncated strh"):
        _avi_mjpeg_frames(riff(short_strh))

    short_avih = _chunk(b"avih", b"\x00\x00")
    with pytest.raises(ValueError, match="truncated avih"):
        _avi_mjpeg_frames(riff(short_avih))
