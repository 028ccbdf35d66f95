"""Tests for functions/imageops.py: nearest-neighbor resize
(integer-exact, the oracle path), bilinear resize vs an INDEPENDENT
numpy float model, and the audio feature extractors vs hand-computed
expectations."""

from __future__ import annotations

import numpy as np

from ethiopia_legal_etl_spark.functions.imageops import (
    audio_features,
    resize_bilinear,
    resize_nearest,
)


def _grad(w: int, h: int, seed: int = 3):
    return [[(seed * 7 + x * 11 + y * 3) % 256 for x in range(w)] for y in range(h)]


def test_nearest_matches_floor_index_map():
    px = _grad(13, 9)
    out = resize_nearest(px, 8, 8)
    for y in range(8):
        for x in range(8):
            assert out[y][x] == px[y * 9 // 8][x * 13 // 8]


def test_nearest_identity_when_same_size():
    px = _grad(6, 5)
    assert resize_nearest(px, 6, 5) == px


def test_nearest_upscale_replicates():
    px = [[1, 2], [3, 4]]
    out = resize_nearest(px, 4, 4)
    assert out == [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]


def _bilinear_numpy(px: list[list[int]], out_w: int, out_h: int) -> np.ndarray:
    """Independent float bilinear model (align-corners false), written
    against the textbook definition rather than the fixed-point code."""
    a = np.asarray(px, dtype=np.float64)
    in_h, in_w = a.shape
    out = np.empty((out_h, out_w))
    for y in range(out_h):
        sy = max(0.0, (y + 0.5) * in_h / out_h - 0.5)
        y0 = min(int(sy), in_h - 1)
        y1 = min(y0 + 1, in_h - 1)
        fy = sy - y0
        for x in range(out_w):
            sx = max(0.0, (x + 0.5) * in_w / out_w - 0.5)
            x0 = min(int(sx), in_w - 1)
            x1 = min(x0 + 1, in_w - 1)
            fx = sx - x0
            top = a[y0, x0] * (1 - fx) + a[y0, x1] * fx
            bot = a[y1, x0] * (1 - fx) + a[y1, x1] * fx
            out[y, x] = top * (1 - fy) + bot * fy
    return out


def test_bilinear_within_one_of_independent_float_model():
    for w, h, ow, oh in [(13, 9, 8, 8), (5, 6, 8, 8), (16, 15, 4, 4), (3, 3, 9, 7)]:
        px = _grad(w, h, seed=w + h)
        got = np.asarray(resize_bilinear(px, ow, oh), dtype=np.float64)
        want = _bilinear_numpy(px, ow, oh)
        assert np.max(np.abs(got - want)) <= 1.0, (w, h, ow, oh)


def test_bilinear_flat_image_is_exact():
    px = [[77] * 10 for _ in range(7)]
    assert resize_bilinear(px, 4, 5) == [[77] * 4 for _ in range(5)]


def test_audio_features_hand_computed():
    s = [3, -2, 0, -1, 4]
    f = audio_features(s)
    assert f["energy"] == 9 + 4 + 0 + 1 + 16
    # sign-change pairs: (3,-2) cross, (-2,0) cross (0 is non-negative),
    # (0,-1) cross, (-1,4) cross
    assert f["zero_crossings"] == 4
    assert f["peak"] == 4
    assert audio_features([]) == {"energy": 0, "zero_crossings": 0, "peak": 0}
