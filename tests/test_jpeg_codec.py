"""Baseline JPEG codec (functions/jpeg.py): analytic flat-block
exactness, an INDEPENDENT numpy DCT-pipeline differential, quality
degradation bounds, and strict rejection of the unsupported subset."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ethiopia_legal_etl_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_baseline_jpeg,
    synth_jpeg,
)


def _np_reference_pipeline(img: np.ndarray, quant: int) -> np.ndarray:
    """Independent model of DCT -> quantize -> dequantize -> IDCT with
    edge-replicated 8x8 blocks, built from numpy cosine matrices (no
    code shared with the codec's per-coefficient loops)."""
    h, w = img.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.empty((ph, pw))
    pad[:h, :w] = img
    pad[h:, :w] = img[-1:, :]
    pad[:h, w:] = img[:, -1:]
    pad[h:, w:] = img[-1, -1]
    x = np.arange(8)
    u = np.arange(8)
    M = np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)
    c = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    out = np.empty_like(pad)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            b = pad[by : by + 8, bx : bx + 8] - 128.0
            coef = 0.25 * np.outer(c, c) * (M.T @ b @ M)
            q = np.round(coef / quant) * quant
            rec = 0.25 * (M @ (np.outer(c, c) * q) @ M.T)
            out[by : by + 8, bx : bx + 8] = np.clip(
                np.round(rec + 128.0), 0, 255
            )
    return out[:h, :w]


def test_flat_blocks_decode_exactly():
    for v in (0, 1, 73, 128, 200, 254, 255):
        img = [[v] * 20 for _ in range(12)]
        out = decode_jpeg(encode_baseline_jpeg(img, quant=1))
        assert out["width"] == 20 and out["height"] == 12
        assert all(px == v for row in out["pixels"] for px in row), v


@pytest.mark.parametrize("quant", [1, 8])
def test_decoder_matches_independent_numpy_model(quant):
    """encoder -> decoder must land within +-1 of the independent
    numpy DCT/quant/IDCT model on seeded random images with
    non-multiple-of-8 dims (the +-1 is final-pixel float rounding at
    values within an ulp of .5; coefficients themselves are integers
    in both models)."""
    rng = np.random.default_rng(7)
    for h, w in ((12, 20), (17, 9), (24, 24)):
        img = rng.integers(0, 256, size=(h, w))
        got = decode_jpeg(
            encode_baseline_jpeg([list(map(int, r)) for r in img], quant)
        )
        expect = _np_reference_pipeline(img.astype(float), quant)
        diff = np.abs(np.array(got["pixels"], dtype=float) - expect)
        assert diff.max() <= 1, (quant, h, w, diff.max())


def test_quality_degrades_boundedly_with_quant():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16))
    rows = [list(map(int, r)) for r in img]
    errs = {}
    for q in (1, 4, 16):
        out = decode_jpeg(encode_baseline_jpeg(rows, q))
        errs[q] = np.abs(np.array(out["pixels"]) - img).mean()
    assert errs[1] <= 1.0
    assert errs[1] <= errs[4] <= errs[16]  # monotone in quant step


def test_synth_jpeg_deterministic_and_dims():
    for i in (0, 7, 37, 499):
        a, b = synth_jpeg(i), synth_jpeg(i)
        assert a == b
        d = decode_jpeg(a)
        assert d["width"] == 9 + i % 23
        assert d["height"] == 10 + (i // 5) % 19
        assert d["n_components"] == 1


def test_rejects_unsupported_and_malformed():
    good = synth_jpeg(1)
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-segments
    # progressive: rewrite SOF0 marker (FFC0) to SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # multi-component: patch the SOF0 component count byte
    i = good.index(b"\xff\xc0")
    sof = bytearray(good)
    sof[i + 9] = 3  # precision(1)+h(2)+w(2) after the 2+2 header = +9
    with pytest.raises(ValueError):
        decode_jpeg(bytes(sof))
    # restart interval marker before SOS
    dri = good[: i] + b"\xff\xdd" + struct.pack(">HH", 4, 8) + good[i:]
    with pytest.raises(ValueError):
        decode_jpeg(dri)


def test_zigzag_is_the_spec_order():
    # spot-pin the well-known prefix and the involution property
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
