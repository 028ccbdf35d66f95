"""Uniform hostile-input fuzz over EVERY binary decoder in the repo:
arbitrary bytes and noise-spliced valid payloads must either decode or
raise ValueError — never hang, never leak struct.error / IndexError /
KeyError / zlib.error past the pipelines' except-ValueError isolation.

Why this exists: round 5 shipped two instances of exactly this class
(negative WARC Content-Length looping forever; short avih/fmt chunks
raising struct.error), both found by an external reviewer reading the
code. This fuzz makes the whole class regression-tested mechanically
for every decoder at once."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from ethiopia_legal_etl_spark.functions.avi import parse_avi, write_mjpeg_avi
from ethiopia_legal_etl_spark.functions.g711 import (
    decode_compressed_wav,
    write_mulaw_wav,
)
from ethiopia_legal_etl_spark.functions.jpeg import (
    decode_jpeg,
    encode_baseline_jpeg,
)
from ethiopia_legal_etl_spark.functions.media import (
    decode_bmp,
    decode_wav,
    synth_bmp,
    synth_wav,
)
from ethiopia_legal_etl_spark.functions.mpeg1 import parse_layer1, parse_layer2
from ethiopia_legal_etl_spark.functions.png import decode_png, encode_png
from ethiopia_legal_etl_spark.sources.warc import parse_warc, write_warc

DECODERS = {
    "wav": decode_wav,
    "bmp": decode_bmp,
    "compressed_wav": decode_compressed_wav,
    "avi": parse_avi,
    "jpeg": decode_jpeg,
    "png": decode_png,
    "mpeg1": parse_layer1,
    "mpeg1_l2": parse_layer2,
    "warc": parse_warc,
}


def _valid_payloads() -> dict:
    frames = [[[(x * 7 + y) % 256 for x in range(8)] for y in range(8)]]
    jpeg = encode_baseline_jpeg(frames[0], quant=1)
    return {
        "wav": synth_wav(7),
        "bmp": synth_bmp(7),
        "compressed_wav": write_mulaw_wav(bytes(range(40)), 8000),
        "avi": write_mjpeg_avi([jpeg], 8, 8),
        "jpeg": jpeg,
        "png": encode_png([[(x, y, x ^ y) for x in range(5)] for y in range(4)]),
        "mpeg1": None,  # covered in test_mpeg1_codec.py's own fuzz
        "mpeg1_l2": None,  # covered in test_mpeg1_codec.py's own fuzz
        "warc": write_warc(
            [{"type": "response", "uri": "http://x/1", "date": "d",
              "payload": b"pp", "record_id": "r1"}],
            compress=True,
        ),
    }


@settings(max_examples=300, deadline=None)
@given(hst.binary(max_size=400), hst.sampled_from(sorted(DECODERS)))
def test_fuzz_arbitrary_bytes_all_decoders(payload, which):
    try:
        DECODERS[which](payload)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(
    hst.binary(min_size=1, max_size=60),
    hst.integers(0, 10_000),
    hst.sampled_from(
        ["compressed_wav", "avi", "jpeg", "png", "warc", "wav", "bmp"]
    ),
)
def test_fuzz_spliced_noise_all_decoders(noise, cut, which):
    """Mutations of VALID payloads hit the deep parsing paths (past the
    magic-byte gate) where the r5 bugs lived."""
    good = _valid_payloads()[which]
    if good is None:
        pytest.skip("covered elsewhere")
    cut = min(cut, len(good))
    mutated = good[:cut] + noise + good[cut + len(noise):]
    try:
        DECODERS[which](mutated)
    except ValueError:
        pass
