"""Image and audio feature operators over REAL decoded media (the
multimodal mandate's resize / feature-extract verbs, applied to pixels
and samples produced by the from-scratch codecs, not to stub
metadata): nearest-neighbor and bilinear image resize, audio RMS
energy / zero-crossing / peak features.

Exactness strategy (what makes these oracle-checkable):
- resize_nearest uses the standard floor source-index map
  src = dst * in_size // out_size — pure integer arithmetic, so a
  DuckDB oracle can recompute every output pixel of a formula image.
- resize_bilinear uses 8-bit fixed-point weights (the common codec
  implementation), deterministic across platforms; pinned in tests
  against an independent numpy float model within ±1.
- audio features are integer sums over decoded PCM (energy as sum of
  squares, sign-change zero crossings, peak |sample|) — exactly
  recomputable in SQL from the G.711 closed form.
"""

from __future__ import annotations


def resize_nearest(pixels: list[list[int]], out_w: int, out_h: int) -> list[list[int]]:
    """Nearest-neighbor resize of a grayscale pixel grid using the
    floor map src = dst * in // out (integer-exact, SQL-recomputable)."""
    in_h, in_w = len(pixels), len(pixels[0])
    return [
        [pixels[y * in_h // out_h][x * in_w // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


def resize_bilinear(pixels: list[list[int]], out_w: int, out_h: int) -> list[list[int]]:
    """Bilinear resize with 8-bit fixed-point weights (align-corners
    false, the OpenCV/PIL convention: sample at (dst + 0.5) * scale
    - 0.5, clamped). Deterministic integer arithmetic end-to-end."""
    in_h, in_w = len(pixels), len(pixels[0])
    out = []
    for y in range(out_h):
        # fixed-point source coordinate, 8 fractional bits
        sy = max(0, ((2 * y + 1) * in_h * 256) // (2 * out_h) - 128)
        y0 = min(sy >> 8, in_h - 1)
        y1 = min(y0 + 1, in_h - 1)
        fy = sy & 0xFF
        row = []
        for x in range(out_w):
            sx = max(0, ((2 * x + 1) * in_w * 256) // (2 * out_w) - 128)
            x0 = min(sx >> 8, in_w - 1)
            x1 = min(x0 + 1, in_w - 1)
            fx = sx & 0xFF
            top = pixels[y0][x0] * (256 - fx) + pixels[y0][x1] * fx
            bot = pixels[y1][x0] * (256 - fx) + pixels[y1][x1] * fx
            row.append((top * (256 - fy) + bot * fy + 32768) >> 16)
        out.append(row)
    return out


def audio_features(samples: list[int]) -> dict:
    """Integer feature extraction over decoded PCM16: energy (sum of
    squares), zero crossings (strict sign change, zero counted with
    the non-negatives), peak |sample|. All exactly SQL-recomputable."""
    energy = sum(s * s for s in samples)
    zcr = sum(
        1
        for a, b in zip(samples, samples[1:])
        if (a < 0) != (b < 0)
    )
    peak = max((abs(s) for s in samples), default=0)
    return {"energy": energy, "zero_crossings": zcr, "peak": peak}
