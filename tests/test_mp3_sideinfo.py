"""MPEG-1 Audio Layer III frame-syntax codec (functions/mp3.py):
field-exact round trips through the mirror encoder, the analytic
part2 bit-length identity, genuine bit-reservoir reassembly, scfsi
scalefactor reuse, and the documented Table B.7 rejection contract.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from ethiopia_legal_etl_spark.functions.mp3 import (
    SCFSI_BANDS,
    SLEN,
    _granule_part2_bits,
    layer3_frame_bytes,
    parse_layer3,
    write_layer3_stream,
)


def _granule(seed: int, sfc: int) -> dict:
    slen1, slen2 = SLEN[sfc]
    return {
        "global_gain": (seed * 7) % 256,
        "scalefac_compress": sfc,
        "preflag": seed % 2,
        "scalefac_scale": (seed // 2) % 2,
        "scalefactors": [
            ((seed + b) % (1 << (slen1 if b < 11 else slen2)))
            if (slen1 if b < 11 else slen2)
            else 0
            for b in range(21)
        ],
    }


def _specs(n_frames: int, base_seed: int = 0) -> list[dict]:
    return [
        {
            "scfsi": (base_seed + i * 5) % 16,
            "granules": [
                _granule(base_seed + 2 * i, (base_seed + i) % 16),
                _granule(base_seed + 2 * i + 1, (base_seed + 3 * i + 1) % 16),
            ],
        }
        for i in range(n_frames)
    ]


def _expected_scalefactors(spec: dict, gr: int) -> list[int]:
    exp = list(spec["granules"][gr]["scalefactors"])
    if gr == 1:
        for g, (lo, hi) in enumerate(SCFSI_BANDS):
            if (spec["scfsi"] >> (3 - g)) & 1:
                exp[lo:hi] = spec["granules"][0]["scalefactors"][lo:hi]
    return exp


@pytest.mark.parametrize("use_reservoir", [False, True])
def test_roundtrip_every_field(use_reservoir):
    specs = _specs(4, base_seed=3)
    data = write_layer3_stream(specs, use_reservoir=use_reservoir)
    frames = parse_layer3(data)
    assert len(frames) == 4
    for f, spec in zip(frames, specs):
        assert f["scfsi"] == spec["scfsi"]
        assert f["frame_bytes"] == layer3_frame_bytes(
            f["bitrate"], f["sample_rate"]
        )
        for gr in range(2):
            g, sg = f["granules"][gr], spec["granules"][gr]
            assert g["global_gain"] == sg["global_gain"]
            assert g["scalefac_compress"] == sg["scalefac_compress"]
            assert g["preflag"] == sg["preflag"]
            assert g["scalefac_scale"] == sg["scalefac_scale"]
            assert g["big_values"] == 0
            assert g["scalefactors"] == _expected_scalefactors(spec, gr)
            # analytic identity: part2_3_length is exactly the closed
            # form 11*slen1 + 10*slen2 minus scfsi-reused groups
            assert g["part2_3_length"] == _granule_part2_bits(
                sg["scalefac_compress"], spec["scfsi"], gr
            )


def test_reservoir_produces_nonzero_main_data_begin():
    specs = _specs(4, base_seed=9)
    frames = parse_layer3(write_layer3_stream(specs, use_reservoir=True))
    begins = [f["main_data_begin"] for f in frames]
    assert begins[0] == 0
    assert any(b > 0 for b in begins[1:]), begins
    assert all(b <= 511 for b in begins)
    # the same specs decode identically with and without the reservoir
    plain = parse_layer3(write_layer3_stream(specs, use_reservoir=False))
    for a, b in zip(frames, plain):
        for gr in range(2):
            assert (
                a["granules"][gr]["scalefactors"]
                == b["granules"][gr]["scalefactors"]
            )


def test_gr0_part2_is_11_slen1_plus_10_slen2():
    for sfc, (slen1, slen2) in enumerate(SLEN):
        assert _granule_part2_bits(sfc, 0, 0) == 11 * slen1 + 10 * slen2


def test_scfsi_all_reused_transmits_nothing_for_gr1():
    for sfc in range(16):
        assert _granule_part2_bits(sfc, 0b1111, 1) == 0


def test_big_values_rejects_with_table_b7_note():
    data = bytearray(write_layer3_stream(_specs(1)))
    # side info bit layout after the 4-byte header: main_data_begin(9)
    # private(5) scfsi(4) part2_3_length(12) -> big_values starts at
    # side-info bit 30; set its MSB (bit 30 = byte 3 of side info,
    # bit offset 6)
    data[4 + 3] |= 0b00000010
    with pytest.raises(ValueError, match="B.7"):
        parse_layer3(bytes(data))


def test_window_switching_rejects():
    data = bytearray(write_layer3_stream(_specs(1)))
    # window_switching_flag is side-info bit 9+5+4+12+9+8+4 = 51
    # -> byte 6, bit offset 3 (MSB-first)
    data[4 + 6] |= 0b00010000
    with pytest.raises(ValueError, match="window_switching"):
        parse_layer3(bytes(data))


def test_reservoir_underrun_rejects():
    data = bytearray(write_layer3_stream(_specs(1)))
    # force main_data_begin = 1 on the FIRST frame: nothing before it
    data[4] = 0  # main_data_begin[8:1]
    data[5] |= 0b10000000  # main_data_begin[0] -> value 1
    with pytest.raises(ValueError, match="underrun"):
        parse_layer3(bytes(data))


def test_part2_3_length_mismatch_rejects():
    specs = _specs(1, base_seed=2)
    data = bytearray(write_layer3_stream(specs))
    # part2_3_length field starts at side-info bit 18 (byte 2, bit 2);
    # flipping its lowest bit desynchronizes it from the scalefactor
    # width. part2_3_length occupies bits 18..29 -> low bit is bit 29
    # = byte 3, offset 5
    data[4 + 3] ^= 0b00000100
    with pytest.raises(ValueError, match="part2_3_length|count1"):
        parse_layer3(bytes(data))


def test_stereo_and_other_layers_reject():
    data = bytearray(write_layer3_stream(_specs(1)))
    mono = bytes(data)
    # mode field: header bits 24-25; 00 = stereo
    stereo = bytearray(mono)
    stereo[3] &= 0b00111111
    with pytest.raises(ValueError, match="single_channel"):
        parse_layer3(bytes(stereo))
    # layer bits 13-14: 11 = Layer I
    l1 = bytearray(mono)
    l1[1] |= 0b00000110
    with pytest.raises(ValueError, match="not Layer III"):
        parse_layer3(bytes(l1))


@settings(max_examples=300, deadline=None)
@given(hst.binary(max_size=300))
def test_fuzz_arbitrary_bytes(payload):
    try:
        parse_layer3(payload)
    except ValueError:
        pass


@settings(max_examples=300, deadline=None)
@given(hst.binary(min_size=1, max_size=40), hst.integers(0, 2000))
def test_fuzz_spliced_noise(noise, cut):
    good = write_layer3_stream(_specs(2, base_seed=5), use_reservoir=True)
    cut = min(cut, len(good))
    mutated = good[:cut] + noise + good[cut + len(noise):]
    try:
        parse_layer3(mutated)
    except ValueError:
        pass
