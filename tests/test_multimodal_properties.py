"""Property tests for the codec-free header probes: arbitrary dimensions
and rates round-trip through container bytes, and no byte string can
crash the parsers (quarantine contract)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_entity_resolution_spark.operators.multimodal import (
    _probe_audio_header,
    _probe_header,
    _probe_video_header,
)
from tests.test_multimodal import (
    _avi_bytes,
    _bmp_bytes,
    _flac_bytes,
    _gif_bytes,
    _jpeg_bytes,
    _mp4_bytes,
    _png_bytes,
    _wav_bytes,
)

dims = st.integers(min_value=1, max_value=65535)
# PNG/BMP headers hold 32-bit dims, but the PNG fixture builds an
# O(width) pixel row, so bound the generated sizes
big_dims = st.integers(min_value=1, max_value=20000)


@settings(max_examples=50, deadline=None)
@given(w=big_dims, h=big_dims)
def test_png_roundtrip(w, h):
    assert _probe_header(_png_bytes(w, h)) == ("png", w, h, 4)


@settings(max_examples=50, deadline=None)
@given(w=dims, h=dims, n_comp=st.integers(min_value=1, max_value=3))
def test_jpeg_roundtrip(w, h, n_comp):
    assert _probe_header(_jpeg_bytes(w, h, n_comp)) == ("jpeg", w, h, n_comp)


@settings(max_examples=50, deadline=None)
@given(w=dims, h=dims)
def test_gif_roundtrip(w, h):
    assert _probe_header(_gif_bytes(w, h)) == ("gif", w, h, 3)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(min_value=1, max_value=2**30), h=st.integers(min_value=1, max_value=2**30))
def test_bmp_roundtrip(w, h):
    fmt, pw, ph, _ = _probe_header(_bmp_bytes(w, h))
    assert (fmt, pw, ph) == ("bmp", w, h)


@settings(max_examples=50, deadline=None)
@given(rate=st.integers(min_value=1, max_value=655350),
       ch=st.integers(min_value=1, max_value=8),
       bits=st.sampled_from([8, 16, 24, 32]),
       n=st.integers(min_value=0, max_value=10**4))
def test_wav_roundtrip(rate, ch, bits, n):
    fmt, prate, pch, pbits, dur = _probe_audio_header(_wav_bytes(rate, ch, bits, n))
    assert (fmt, prate, pch, pbits) == ("wav", rate, ch, bits)
    assert dur == int(n * ch * bits // 8 * 8000 / (rate * ch * bits))


@settings(max_examples=50, deadline=None)
@given(rate=st.integers(min_value=1, max_value=655350),
       ch=st.integers(min_value=1, max_value=8),
       bits=st.integers(min_value=4, max_value=32),
       total=st.integers(min_value=0, max_value=2**36 - 1))
def test_flac_roundtrip(rate, ch, bits, total):
    fmt, prate, pch, pbits, dur = _probe_audio_header(
        _flac_bytes(rate, ch, bits, total)
    )
    assert (fmt, prate, pch, pbits) == ("flac", rate, ch, bits)
    assert dur == int(total * 1000 / rate)


@settings(max_examples=50, deadline=None)
@given(dur_ms=st.integers(min_value=0, max_value=10**8),
       w=dims, h=dims)
def test_mp4_roundtrip(dur_ms, w, h):
    fmt, pdur, pw, ph = _probe_video_header(_mp4_bytes(dur_ms, 1000, w, h))
    assert (fmt, pdur, pw, ph) == ("mp4", dur_ms, w, h)


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=256))
def test_arbitrary_bytes_never_crash(payload):
    for probe in (_probe_header, _probe_audio_header, _probe_video_header):
        out = probe(payload)  # must return, never raise
        assert isinstance(out, tuple)


@settings(max_examples=100, deadline=None)
@given(data=st.data(),
       cut=st.integers(min_value=0, max_value=200))
def test_truncated_valid_headers_never_crash(data, cut):
    """Any prefix of a valid container must parse or quarantine cleanly."""
    full = data.draw(
        st.sampled_from([
            _png_bytes(640, 480), _jpeg_bytes(64, 64), _gif_bytes(9, 9),
            _bmp_bytes(5, 5), _wav_bytes(), _flac_bytes(), _mp3_like(),
            _mp4_bytes(), _avi_bytes(),
        ])
    )
    payload = full[: min(cut, len(full))]
    for probe in (_probe_header, _probe_audio_header, _probe_video_header):
        out = probe(payload)
        assert isinstance(out, tuple)


def _mp3_like():
    return bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 16
