"""Property-based round-trips for the library-free media decoders: any
payload our minimal encoders can produce must decode back to EXACTLY the
samples/pixels that went in. Complements the hand-computed cases in
test_multimodal.py with generated ones (hypothesis drives sizes, sample
values, palettes, frame layouts)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_multimodal import _gif_anim, _wav_pcm


@settings(max_examples=40, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 3),
    n=st.integers(0, 200),
    data=st.data(),
)
def test_wav_roundtrip_16bit(rate, channels, n, data):
    import numpy as np

    from pyspark_entity_resolution_spark.operators.multimodal import (
        _wav_pcm_decode,
    )

    frames = [
        tuple(data.draw(st.integers(-32768, 32767)) for _ in range(channels))
        for _ in range(n)
    ]
    got_rate, got_ch, got = _wav_pcm_decode(_wav_pcm(rate, channels, 16, frames))
    assert (got_rate, got_ch, got.shape) == (rate, channels, (n, channels))
    want = np.array(frames, dtype=np.float64).reshape(n, channels) / 32768.0
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 200),
    data=st.data(),
)
def test_wav_roundtrip_8bit(n, data):
    import numpy as np

    from pyspark_entity_resolution_spark.operators.multimodal import (
        _wav_pcm_decode,
    )

    frames = [(data.draw(st.integers(0, 255)),) for _ in range(n)]
    _, _, got = _wav_pcm_decode(_wav_pcm(8000, 1, 8, frames))
    want = (np.array([f[0] for f in frames], dtype=np.float64)
            .reshape(n, 1) - 128.0) / 128.0
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    width=st.integers(1, 12),
    height=st.integers(1, 12),
    n_colors=st.sampled_from([2, 4, 8]),
    data=st.data(),
)
def test_gif_single_frame_roundtrip(width, height, n_colors, data):
    from pyspark_entity_resolution_spark.operators.multimodal import (
        _gif_decode_frames,
    )

    palette = bytes(range(3 * n_colors))
    idxs = [data.draw(st.integers(0, n_colors - 1))
            for _ in range(width * height)]
    gif = _gif_anim(width, height, palette, [{"indices": idxs}])
    (_, _, w, h, rgb), = _gif_decode_frames(gif)
    assert (w, h) == (width, height)
    want = b"".join(palette[3 * i:3 * i + 3] for i in idxs)
    assert rgb == want


@settings(max_examples=20, deadline=None)
@given(
    width=st.integers(2, 8),
    height=st.integers(2, 8),
    data=st.data(),
)
def test_gif_two_frame_patch_compositing_roundtrip(width, height, data):
    """Frame 1 is a random patch at a random offset: the composited
    canvas must equal frame 0 with exactly the patch cells replaced."""
    from pyspark_entity_resolution_spark.operators.multimodal import (
        _gif_decode_frames,
    )

    palette = bytes(range(12))  # 4 colors
    base = [data.draw(st.integers(0, 3)) for _ in range(width * height)]
    fw = data.draw(st.integers(1, width))
    fh = data.draw(st.integers(1, height))
    left = data.draw(st.integers(0, width - fw))
    top = data.draw(st.integers(0, height - fh))
    patch = [data.draw(st.integers(0, 3)) for _ in range(fw * fh)]
    gif = _gif_anim(width, height, palette, [
        {"indices": base},
        {"indices": patch, "left": left, "top": top, "fw": fw, "fh": fh},
    ])
    frames = list(_gif_decode_frames(gif))
    assert len(frames) == 2
    want = list(base)
    for r in range(fh):
        for c in range(fw):
            want[(top + r) * width + (left + c)] = patch[r * fw + c]
    got = frames[1][4]
    assert got == b"".join(palette[3 * i:3 * i + 3] for i in want)
