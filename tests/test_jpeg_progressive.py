"""Progressive-JPEG (SOF2) decoder pins (r11, r10 verdict task 6).

Same independent-fixture discipline as the baseline suite: the
progressive ENCODER (tools/jpeg_fixture.encode_jpeg_progressive)
shares no decode code with the engine's decoder, and both encodings of
the SAME chosen quantized coefficients must decode to byte-identical
pixels — which must equal tools/jpeg_fixture.reference_pixels' plain
double-loop spec IDCT. Coverage: the default successive-approximation
ladder, custom spectral bands and deeper ladders, 4:2:0 color, sparse
corpora whose EOB runs span many blocks, refinement sign/correction
bits on negative-heavy blocks, restart markers inside progressive
scans, and the fail-loud guards (truncated stream, arithmetic SOF).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_entity_resolution_spark.operators.multimodal import (
    _jpeg_decode,
)
from tools.jpeg_fixture import (
    encode_jpeg,
    encode_jpeg_progressive,
    reference_pixels,
)

QT = {0: [4] + [2] * 63, 1: [6] + [3] * 63}


def _gray(size, rng, density=0.5, amp=300):
    nb = size // 8
    blocks = {}
    for by in range(nb):
        for bx in range(nb):
            coeffs = [0] * 64
            coeffs[0] = int(rng.randint(-amp, amp + 1))
            for idx in range(1, 64):
                if rng.rand() < density:
                    coeffs[idx] = int(rng.randint(-60, 61))
            blocks[(by, bx)] = coeffs
    return [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]


def _pin(width, height, comps, qt, scans=None, restart_interval=0):
    """progressive decode == baseline decode == spec reference."""
    base = encode_jpeg(width, height, comps, qt)
    prog = encode_jpeg_progressive(
        width, height, comps, qt, scans=scans,
        restart_interval=restart_interval,
    )
    wb, hb, cb, rawb = _jpeg_decode(base)
    wp, hp, cp, rawp = _jpeg_decode(prog)
    assert (wb, hb, cb) == (wp, hp, cp) == (width, height, cb)
    assert rawp == rawb
    assert rawp == reference_pixels(width, height, comps, qt)
    return prog


def test_default_ladder_grayscale_dense():
    rng = np.random.RandomState(7)
    _pin(32, 32, _gray(32, rng, density=0.6), QT)


def test_default_ladder_grayscale_sparse_eobrun_spans_blocks():
    # nearly-empty blocks: the AC first scans are dominated by EOBn
    # codes whose runs span many consecutive blocks
    rng = np.random.RandomState(11)
    comps = _gray(48, rng, density=0.02, amp=120)
    prog = _pin(48, 48, comps, QT)
    # sanity: the progressive stream really is multi-scan
    assert prog.count(b"\xff\xda") > 3


def test_negative_heavy_refinement_sign_bits():
    rng = np.random.RandomState(13)
    comps = _gray(16, rng, density=0.0)
    blk = comps[0]["blocks"]
    # hand-planted negatives at every magnitude parity around the
    # successive-approximation cut points (Al=2/1/0 of the default
    # ladder): -1 invisible until the last refinement, -2/-3 appearing
    # at Al=1, -4..-7 at Al=2, plus large +/- values
    blk[(0, 0)] = [0] * 64
    blk[(0, 0)][0] = -257
    for i, v in zip((1, 8, 9, 2, 16, 10, 3, 24),
                    (-1, -2, -3, -4, -5, -7, 6, 33)):
        blk[(0, 0)][i] = v
    blk[(1, 1)] = [0] * 64
    blk[(1, 1)][0] = 255
    for i, v in zip((1, 8, 9, 2), (1, -1, 2, -33)):
        blk[(1, 1)][i] = v
    _pin(16, 16, comps, QT)


def test_color_420_subsampled():
    rng = np.random.RandomState(17)

    def blocks(nb, density, amp):
        out = {}
        for by in range(nb):
            for bx in range(nb):
                coeffs = [0] * 64
                coeffs[0] = int(rng.randint(-amp, amp + 1))
                for idx in range(1, 64):
                    if rng.rand() < density:
                        coeffs[idx] = int(rng.randint(-40, 41))
                out[(by, bx)] = coeffs
        return out

    comps = [
        {"id": 1, "h": 2, "v": 2, "tq": 0, "blocks": blocks(4, 0.4, 300)},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "blocks": blocks(2, 0.3, 100)},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "blocks": blocks(2, 0.3, 100)},
    ]
    _pin(32, 32, comps, QT)


def test_custom_bands_and_deeper_ladder():
    rng = np.random.RandomState(19)
    comps = _gray(24, rng, density=0.5, amp=500)
    scans = (
        [{"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 3}]
        + [{"comps": [1], "ss": 1, "se": 2, "ah": 0, "al": 3},
           {"comps": [1], "ss": 3, "se": 20, "ah": 0, "al": 3},
           {"comps": [1], "ss": 21, "se": 63, "ah": 0, "al": 3}]
        + [{"comps": [1], "ss": 1, "se": 63, "ah": 3, "al": 2},
           {"comps": [1], "ss": 1, "se": 63, "ah": 2, "al": 1},
           {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0}]
        + [{"comps": [1], "ss": 0, "se": 0, "ah": 3, "al": 2},
           {"comps": [1], "ss": 0, "se": 0, "ah": 2, "al": 1},
           {"comps": [1], "ss": 0, "se": 0, "ah": 1, "al": 0}]
    )
    _pin(24, 24, comps, QT, scans=scans)


def test_no_successive_approximation_spectral_only():
    # Al=0 everywhere: pure spectral selection, no refinement scans
    rng = np.random.RandomState(23)
    comps = _gray(16, rng, density=0.7, amp=700)
    scans = [
        {"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 0},
        {"comps": [1], "ss": 1, "se": 9, "ah": 0, "al": 0},
        {"comps": [1], "ss": 10, "se": 63, "ah": 0, "al": 0},
    ]
    _pin(16, 16, comps, QT, scans=scans)


def test_restart_markers_inside_progressive_scans():
    rng = np.random.RandomState(29)
    comps = _gray(32, rng, density=0.3)
    prog = _pin(32, 8, comps, QT, restart_interval=2)
    assert b"\xff\xd0" in prog  # restarts really emitted


def test_fuzz_vs_baseline_many_seeds():
    for seed in range(40, 52):
        rng = np.random.RandomState(seed)
        size = int(rng.choice([8, 16, 24]))
        comps = _gray(size, rng, density=float(rng.uniform(0.0, 0.9)),
                      amp=int(rng.randint(1, 900)))
        _pin(size, size, comps, QT)


def test_truncated_progressive_stream_fails_loud():
    rng = np.random.RandomState(31)
    prog = encode_jpeg_progressive(16, 16, _gray(16, rng), QT)
    with pytest.raises(ValueError, match="exhausted|EOI|truncated"):
        _jpeg_decode(prog[:-8])
    with pytest.raises(ValueError, match="exhausted|EOI|truncated"):
        _jpeg_decode(prog[: len(prog) // 2])


def test_progressive_partial_mcu_image():
    # 20x12: partial MCUs on both axes (grayscale: block grid 3x2
    # covers ceil(20/8) x ceil(12/8))
    rng = np.random.RandomState(37)
    nb_x, nb_y = 3, 2
    blocks = {}
    for by in range(nb_y):
        for bx in range(nb_x):
            coeffs = [0] * 64
            coeffs[0] = int(rng.randint(-300, 301))
            coeffs[1] = int(rng.randint(-50, 51))
            coeffs[9] = int(rng.randint(-50, 51))
            blocks[(by, bx)] = coeffs
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]
    _pin(20, 12, comps, QT)
