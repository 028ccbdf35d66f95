"""Tests for the PNG codec (functions/png.py). Strategy per the codec
family: round-trip exactness (PNG is lossless, so the round trip is
the spec's own guarantee), an INDEPENDENT unfilter model in the test
(spec filter math re-derived, not shared with the production code),
and rejected-not-mis-decoded coverage for out-of-scope features."""

from __future__ import annotations

import struct
import zlib

import pytest

from ethiopia_legal_etl_spark.functions.png import decode_png, encode_png


def _grad_rgb(w: int, h: int, seed: int):
    return [
        [
            (
                (seed * 7 + x * 11 + y * 3) % 256,
                (x + y * 5 + seed) % 256,
                (x * y + seed * 13) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]


def test_rgb_round_trip_exact_all_filters():
    # h >= 5 so the encoder's filter cycle exercises all five filters
    px = _grad_rgb(13, 9, 42)
    d = decode_png(encode_png(px))
    assert (d["width"], d["height"], d["n_channels"]) == (13, 9, 3)
    assert d["pixels"] == px


def test_grayscale_round_trip_exact():
    g = [[(x * 31 + y * 7) % 256 for x in range(6)] for y in range(11)]
    d = decode_png(encode_png(g, grayscale=True))
    assert d["n_channels"] == 1
    assert d["pixels"] == g


def test_one_pixel_and_one_row_edge_shapes():
    assert decode_png(encode_png([[200]], grayscale=True))["pixels"] == [[200]]
    row = [[(v, v, v) for v in range(10)]]
    assert decode_png(encode_png(row))["pixels"] == row


def test_decode_against_independent_unfilter_model():
    # independently reconstruct pixels from the raw IDAT stream using
    # re-derived spec math (recursive definition, channel-major),
    # sharing no code with the production decoder
    px = _grad_rgb(7, 10, 5)
    payload = encode_png(px)
    # pull IDAT out by chunk walk
    i, idat = 8, b""
    while i + 8 <= len(payload):
        ln = struct.unpack(">I", payload[i : i + 4])[0]
        if payload[i + 4 : i + 8] == b"IDAT":
            idat += payload[i + 8 : i + 8 + ln]
        i += 12 + ln
    raw = zlib.decompress(idat)
    w, h, bpp = 7, 10, 3
    stride = w * bpp

    def paeth_predictor(a, b, c):
        # spec pseudocode, Section 6.6 of RFC 2083
        p = a + b - c
        if abs(p - a) <= abs(p - b) and abs(p - a) <= abs(p - c):
            return a
        if abs(p - b) <= abs(p - c):
            return b
        return c

    recon = []
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        out = []
        for i2, v in enumerate(line):
            a = out[i2 - bpp] if i2 >= bpp else 0
            b = recon[y - 1][i2] if y > 0 else 0
            c = recon[y - 1][i2 - bpp] if (y > 0 and i2 >= bpp) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth_predictor(a, b, c)}[f]
            out.append((v + pred) % 256)
        recon.append(out)
    flat_expected = [c for row in px for t in row for c in t]
    flat_model = [c for row in recon for c in row]
    assert flat_model == flat_expected
    # and the production decoder agrees with the model
    dec = decode_png(payload)
    flat_prod = [c for row in dec["pixels"] for t in row for c in t]
    assert flat_prod == flat_model


def test_crc_corruption_detected():
    payload = bytearray(encode_png(_grad_rgb(5, 6, 1)))
    payload[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def _hack_ihdr(payload: bytes, offset: int, value: int) -> bytes:
    # rewrite one IHDR byte and fix the CRC so only the feature check fires
    ihdr = bytearray(payload[16:29])
    ihdr[offset] = value
    crc = zlib.crc32(b"IHDR" + bytes(ihdr))
    return payload[:16] + bytes(ihdr) + struct.pack(">I", crc) + payload[33:]


def test_out_of_scope_features_rejected_not_misdecoded():
    good = encode_png(_grad_rgb(5, 6, 2))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff" + good)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_hack_ihdr(good, 8, 16))  # 16-bit
    with pytest.raises(ValueError, match="color type"):
        decode_png(_hack_ihdr(good, 9, 3))  # palette
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_hack_ihdr(good, 12, 1))  # Adam7
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated
    with pytest.raises(ValueError):
        encode_png([])  # empty image
    with pytest.raises(ValueError):
        encode_png([[1, 2], [3]], grayscale=True)  # ragged


def test_decompression_bomb_rejected_without_inflating():
    # a 5x6 IHDR with an IDAT that inflates to 10 MB: the bounded
    # inflate must reject at expected+1 bytes, never materialize it
    bomb_raw = b"\x00" * 10_000_000
    good = encode_png(_grad_rgb(5, 6, 8))
    # splice the bomb IDAT into the valid header structure
    i, parts = 8, [good[:8]]
    while i + 8 <= len(good):
        ln = struct.unpack(">I", good[i : i + 4])[0]
        ctype = good[i + 4 : i + 8]
        if ctype == b"IDAT":
            body = zlib.compress(bomb_raw)
            parts.append(
                struct.pack(">I", len(body)) + b"IDAT" + body
                + struct.pack(">I", zlib.crc32(b"IDAT" + body))
            )
        else:
            parts.append(good[i : i + 12 + ln])
        i += 12 + ln
    with pytest.raises(ValueError, match="IDAT length"):
        decode_png(b"".join(parts))


def test_corrupt_idat_rejected_as_valueerror():
    good = bytearray(encode_png(_grad_rgb(5, 6, 9)))
    # find IDAT and flip a deflate byte, then fix the chunk CRC so the
    # error surfaces from the inflate, not the CRC check
    i = bytes(good).index(b"IDAT") - 4
    ln = struct.unpack(">I", bytes(good[i : i + 4]))[0]
    good[i + 8 + 2] ^= 0xFF
    body = bytes(good[i + 4 : i + 8 + ln])
    good[i + 8 + ln : i + 12 + ln] = struct.pack(">I", zlib.crc32(body))
    with pytest.raises(ValueError):
        decode_png(bytes(good))
