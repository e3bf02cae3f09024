"""Stdlib baseline-JPEG pixel decoder (operators/multimodal.py).

Every pin is against either a HAND-COMPUTED value (flat blocks: DC-only
IDCT is (coeff * q)/8 + 128 exactly; single-AC blocks: one cosine term)
or :func:`tools.jpeg_fixture.reference_pixels` — a plain double-loop
T.81 spec-formula IDCT sharing no code with the decoder. The encoder
writes chosen quantized coefficients directly, so the decoder's
Huffman + dequant + IDCT + upsample + color-convert pipeline is what's
under test, not a round-trip of itself.
"""

import math

import pytest

from pyspark_entity_resolution_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _jpeg_decode,
    _jpeg_stdlib_decode,
    extract_image_features,
)
from tools.jpeg_fixture import encode_jpeg, reference_pixels

Q_ONES = [1] * 64


def _gray(width, height, blocks, qtables=None, **kw):
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]
    return encode_jpeg(width, height, comps, qtables or {0: Q_ONES}, **kw)


def test_flat_gray_block_exact():
    # DC-only block: every pixel is 128 + coeff*q/8 exactly -> 200
    payload = _gray(8, 8, {(0, 0): [576] + [0] * 63})
    w, h, c, raw = _jpeg_decode(payload)
    assert (w, h, c) == (8, 8, 1)
    assert raw == bytes([200] * 64)


def test_quant_table_applied():
    # same stream value, 16x quant: 128 + 36*16/8 = 200
    q = [16] + [1] * 63
    payload = _gray(8, 8, {(0, 0): [36] + [0] * 63}, qtables={0: q})
    _, _, _, raw = _jpeg_decode(payload)
    assert raw == bytes([200] * 64)


def test_single_ac_coefficient_cosine_pin():
    # natural index 1 = horizontal frequency (0,1): pixel(y, x) =
    # 128 + K/(4*sqrt(2)) * cos((2x+1)pi/16), hand-computed per column
    K = 100
    coeffs = [0] * 64
    coeffs[1] = K
    payload = _gray(8, 8, {(0, 0): coeffs})
    _, _, _, raw = _jpeg_decode(payload)
    for x in range(8):
        want = 128 + K / (4 * math.sqrt(2)) * math.cos(
            (2 * x + 1) * math.pi / 16
        )
        want = min(255, max(0, round(want)))
        for y in range(8):
            assert raw[8 * y + x] == want, (x, y)


def test_dc_prediction_across_blocks():
    # encoder emits DIFFS; the decoder must accumulate per component
    payload = _gray(16, 8, {
        (0, 0): [80] + [0] * 63,     # 128 + 10 = 138
        (0, 1): [120] + [0] * 63,    # 128 + 15 = 143
    })
    w, h, c, raw = _jpeg_decode(payload)
    assert (w, h, c) == (16, 8, 1)
    for y in range(8):
        assert raw[16 * y:16 * y + 8] == bytes([138] * 8)
        assert raw[16 * y + 8:16 * y + 16] == bytes([143] * 8)


def test_ycbcr_420_flat_color_pin():
    # 16x16, Y at 2x2, chroma at 1x1 (4:2:0). Flat Y=150 Cb=100 Cr=180:
    # R = 150 + 1.402*52 = 222.904 -> 223
    # G = 150 - 0.344136*(-28) - 0.714136*52 = 122.5007 -> 123 (hand)
    # B = 150 + 1.772*(-28) = 100.384 -> 100
    y_blocks = {(r, c): [176] + [0] * 63 for r in range(2) for c in range(2)}
    comps = [
        {"id": 1, "h": 2, "v": 2, "tq": 0, "blocks": y_blocks},
        {"id": 2, "h": 1, "v": 1, "tq": 0,
         "blocks": {(0, 0): [-224] + [0] * 63}},
        {"id": 3, "h": 1, "v": 1, "tq": 0,
         "blocks": {(0, 0): [416] + [0] * 63}},
    ]
    payload = encode_jpeg(16, 16, comps, {0: Q_ONES})
    w, h, c, raw = _jpeg_decode(payload)
    assert (w, h, c) == (16, 16, 3)
    assert raw == bytes([223, 123, 100]) * (16 * 16)


def test_textured_gray_matches_spec_formula():
    # several AC terms + ZRL-range runs + multi-block: expected pixels
    # from the independent double-loop spec IDCT
    b0 = [0] * 64
    b0[0], b0[1], b0[8], b0[9], b0[35] = 400, 90, -60, 25, 17  # long run
    b1 = [0] * 64
    b1[0], b1[2], b1[60] = -200, -45, 30                       # run > 15
    blocks = {(0, 0): b0, (0, 1): b1}
    q = [8] + [2] * 63
    payload = _gray(16, 8, blocks, qtables={0: q})
    _, _, _, raw = _jpeg_decode(payload)
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]
    assert raw == reference_pixels(16, 8, comps, {0: q})


def test_textured_color_422_matches_spec_formula():
    # 4:2:2 (Y 2x1), non-flat chroma: exercises asymmetric upsample +
    # color convert against the spec-formula reference
    yb = {}
    for c in range(2):
        b = [0] * 64
        b[0], b[1 + c], b[16] = 100 + 50 * c, 40, -30
        yb[(0, c)] = b
    cbb = [0] * 64
    cbb[0], cbb[3] = -80, 22
    crb = [0] * 64
    crb[0], crb[10] = 120, -18
    comps = [
        {"id": 1, "h": 2, "v": 1, "tq": 0, "blocks": yb},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "blocks": {(0, 0): cbb}},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "blocks": {(0, 0): crb}},
    ]
    q0, q1 = [4] * 64, [6] * 64
    payload = encode_jpeg(16, 8, comps, {0: q0, 1: q1})
    w, h, c, raw = _jpeg_decode(payload)
    assert (w, h, c) == (16, 8, 3)
    assert raw == reference_pixels(16, 8, comps, {0: q0, 1: q1})


def test_non_multiple_of_8_dimensions_cropped():
    # 10x5 image: one MCU padded to 16x8 internally, cropped on output
    blocks = {(0, 0): [240] + [0] * 63, (0, 1): [400] + [0] * 63}
    payload = _gray(10, 5, blocks)
    w, h, c, raw = _jpeg_decode(payload)
    assert (w, h, c) == (10, 5, 1)
    assert len(raw) == 50
    for y in range(5):
        assert raw[10 * y:10 * y + 8] == bytes([158] * 8)
        assert raw[10 * y + 8:10 * y + 10] == bytes([178] * 2)


def test_restart_markers_reset_dc_prediction():
    blocks = {(0, c): [8 * (10 * c + 10)] + [0] * 63 for c in range(4)}
    payload = _gray(32, 8, blocks, restart_interval=2)
    assert b"\xff\xd0" in payload  # a restart marker was really emitted
    _, _, _, raw = _jpeg_decode(payload)
    for c in range(4):
        assert raw[8 * c] == 128 + 10 * c + 10
    # the same stream with the DRI segment's interval zeroed must fail
    # loudly (the decoder would read past the restart marker otherwise)
    import struct

    i = payload.index(b"\xff\xdd")
    broken = (payload[:i + 4] + struct.pack(">H", 0) + payload[i + 6:])
    with pytest.raises(ValueError):
        _jpeg_decode(broken)


def test_guards_fail_loud():
    ok = _gray(8, 8, {(0, 0): [576] + [0] * 63})
    with pytest.raises(ValueError, match="SOI"):
        _jpeg_decode(b"\x89PNG not a jpeg")
    # SOF2 is SUPPORTED since r11 — a baseline stream re-marked SOF2
    # must still fail loud, now on its progressive-invalid scan header
    # (a DC scan with Se=63), never silently mis-decode
    i = ok.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="DC scan .Ss=0. must have Se=0"):
        _jpeg_decode(ok[:i] + b"\xff\xc2" + ok[i + 2:])
    # arithmetic coding (SOF9) keeps the codec-absent guard
    with pytest.raises(ValueError, match="arithmetic"):
        _jpeg_decode(ok[:i] + b"\xff\xc9" + ok[i + 2:])
    # 12-bit precision
    with pytest.raises(ValueError, match="precision"):
        _jpeg_decode(ok[:i + 4] + bytes([12]) + ok[i + 5:])
    # pixel budget
    with pytest.raises(ValueError, match="pixel budget"):
        _jpeg_decode(ok, max_pixels=32)
    # truncated entropy stream (cut before EOI)
    with pytest.raises(ValueError, match="exhausted|EOI|truncated"):
        _jpeg_decode(ok[:-12])
    # truncated segment stream
    with pytest.raises(ValueError, match="truncated"):
        _jpeg_decode(ok[:20])
    # non-JPEG on the wrapper keeps the codec-absent guard loud
    with pytest.raises(NotImplementedError, match="jpeg-stdlib"):
        _jpeg_stdlib_decode(b"\x89PNG...")


def test_fill_bytes_and_tem_markers_tolerated():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    # id, and TEM (FF01) is a standalone length-less marker — both are
    # legal in the segment stream and must not desync the parse.
    ok = _gray(8, 8, {(0, 0): [576] + [0] * 63})
    _, _, _, want = _jpeg_decode(ok)
    # inject fill bytes + a TEM marker right after SOI
    padded = ok[:2] + b"\xff\xff\xff" + b"\xff\x01" + ok[2:]
    w, h, c, raw = _jpeg_decode(padded)
    assert (w, h, c) == (8, 8, 1)
    assert raw == want
    # fill bytes immediately before a later segment too
    i = ok.index(b"\xff\xdb")
    padded2 = ok[:i] + b"\xff\xff" + ok[i:]
    assert _jpeg_decode(padded2)[3] == want
    # a stray RSTn in the header stream is a clear error, not a
    # misparsed length field
    with pytest.raises(ValueError, match="restart markers belong"):
        _jpeg_decode(ok[:2] + b"\xff\xd3" + ok[2:])


def test_extract_image_features_jpeg_stdlib_spark_e2e(spark):
    import hashlib

    flat = _gray(8, 8, {(0, 0): [576] + [0] * 63})
    color = encode_jpeg(16, 16, [
        {"id": 1, "h": 2, "v": 2, "tq": 0,
         "blocks": {(r, c): [176] + [0] * 63
                    for r in range(2) for c in range(2)}},
        {"id": 2, "h": 1, "v": 1, "tq": 0,
         "blocks": {(0, 0): [-224] + [0] * 63}},
        {"id": 3, "h": 1, "v": 1, "tq": 0,
         "blocks": {(0, 0): [416] + [0] * 63}},
    ], {0: Q_ONES})
    rows = [
        (1, "image", flat, "image/jpeg", "s3://m/flat.jpg"),
        (2, "image", color, "image/jpeg", "s3://m/color.jpg"),
        (3, "audio", b"skip me", "audio/wav", "s3://m/skip.wav"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_image_features(
        media, codec="jpeg-stdlib").collect()}
    assert set(got) == {1, 2}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (8, 8, 1)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (16, 16, 3)
    assert got[1]["content_hash"] == hashlib.md5(flat).hexdigest()
    # a PNG payload under the jpeg codec fails the whole task loudly —
    # the codec guard, not a quiet skip
    png_row = [(4, "image", b"\x89PNG\r\n\x1a\nxx", "image/png", "s")]
    bad = spark.createDataFrame(png_row, MEDIA_SCHEMA)
    with pytest.raises(Exception, match="jpeg-stdlib"):
        extract_image_features(bad, codec="jpeg-stdlib").collect()
