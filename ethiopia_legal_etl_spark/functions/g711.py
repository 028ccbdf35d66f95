"""Dependency-free COMPRESSED-audio codecs: ITU-T G.711 mu-law and
IMA ADPCM (DVI4), plus the WAV container plumbing for both — closing
the "compressed audio decode" tier of the multimodal mandate the same
way functions/jpeg.py closed compressed images: a from-scratch
byte-level implementation of the public spec, exercised end-to-end
in-container. (MP3 remains honestly stubbed: a perceptual codec has no
in-container-constructible exact ground truth; these two do.)

Why these two codecs:
- G.711 mu-law (ITU-T Rec. G.711, 1972; the telephony standard) is a
  2:1 logarithmic companding codec whose DECODE is a closed-form
  integer formula — so the DuckDB oracle can recompute the decoded
  PCM values themselves in SQL (bit ops on the encoded byte), giving a
  VALUE-exact cross-engine decode parity check, stronger than the
  metadata-only oracles possible for JPEG.
- IMA ADPCM (IMA Digital Audio Focus Group spec, also RFC 3551 DVI4)
  is a 4:1 adaptive-differential codec with per-block state
  (predictor + step index) — the representative of the
  stateful-decoder family, exactly deterministic, block-parallel by
  design (each WAV block restates the predictor, which is precisely
  what makes the format seekable AND embarrassingly parallel at
  100 TB: blocks can decode independently in any partition).

Parity note: generalizes the reference's opaque-binary handling
(fetch_legal_docs.py) to the compressed-audio formats a multimodal
training pipeline carries.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------ G.711 mu-law

_BIAS = 0x84  # 132, the mu-law bias (G.711 / Sun implementation form)
_CLIP = 32635


def mulaw_encode(sample: int) -> int:
    """PCM16 -> one mu-law byte (G.711). Integer-exact public spec."""
    sign = 0x80 if sample < 0 else 0
    if sample < 0:
        sample = -sample
    if sample > _CLIP:
        sample = _CLIP
    sample += _BIAS
    exp = 7
    mask = 0x4000
    while exp > 0 and not (sample & mask):
        mask >>= 1
        exp -= 1
    mantissa = (sample >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mantissa) & 0xFF


def mulaw_decode(byte: int) -> int:
    """One mu-law byte -> PCM16 (exact inverse companding expansion).

    Closed form: with c = 255 - byte (the wire complement),
    magnitude = ((8*(c & 15) + 132) << ((c >> 4) & 7)) - 132,
    negated when c & 0x80 — the same formula the DuckDB oracle
    recomputes in SQL for value-exact cross-engine parity.
    """
    c = ~byte & 0xFF
    mag = (((c & 0x0F) << 3) + _BIAS) << ((c >> 4) & 0x07)
    mag -= _BIAS
    return -mag if c & 0x80 else mag


# mu-law decode as a SQL expression template over an encoded-byte column
# name, for DuckDB oracles (DuckDB integer bit ops: & >> <<).
MULAW_DECODE_SQL = (
    "(CASE WHEN ((255 - {b}) & 128) <> 0 THEN -1 ELSE 1 END) * "
    "((((((255 - {b}) & 15) * 8) + 132) << (((255 - {b}) >> 4) & 7)) - 132)"
)


# ------------------------------------------------------------- IMA ADPCM

IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 158, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def ima_decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One 4-bit code -> (new predictor sample, new step index); the
    core IMA ADPCM state transition (IMA spec / RFC 3551 DVI4)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    index += IMA_INDEX_TABLE[nibble]
    index = 0 if index < 0 else (88 if index > 88 else index)
    return pred, index


def ima_encode_nibble(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One PCM16 sample -> (nibble, new predictor, new step index),
    mirroring the decoder's reconstruction so encoder and decoder
    state stay in lockstep (the property the round-trip test pins)."""
    step = IMA_STEP_TABLE[index]
    diff = sample - pred
    nibble = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    new_pred, new_index = ima_decode_nibble(nibble, pred, index)
    return nibble, new_pred, new_index


def ima_encode_block(samples: list[int], block_align: int = 256) -> bytes:
    """Encode one mono IMA block: 4-byte header (initial predictor
    int16, step index, reserved) then low-nibble-first code bytes.
    len(samples) must be 1 + (block_align - 4) * 2."""
    want = 1 + (block_align - 4) * 2
    if len(samples) != want:
        raise ValueError(f"block needs {want} samples, got {len(samples)}")
    pred, index = samples[0], 0
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    for s in samples[1:]:
        nib, pred, index = ima_encode_nibble(s, pred, index)
        nibbles.append(nib)
    for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


def ima_decode_block(block: bytes) -> list[int]:
    """Decode one mono IMA block -> PCM16 samples. Blocks are
    self-contained (header restates predictor+index), so a 100 TB
    audio corpus decodes block-parallel with no cross-block state."""
    if len(block) < 4:
        raise ValueError("IMA block shorter than its 4-byte header")
    pred, index, _rsv = struct.unpack("<hBB", block[:4])
    if index > 88:
        raise ValueError(f"IMA step index {index} out of range")
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            pred, index = ima_decode_nibble(nib, pred, index)
            out.append(pred)
    return out


# --------------------------------------------------- WAV container (both)

WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011


def _wav(fmt_chunk: bytes, data: bytes, fact_samples: int | None) -> bytes:
    chunks = [b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk]
    if fact_samples is not None:  # required for compressed formats
        chunks.append(b"fact" + struct.pack("<II", 4, fact_samples))
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        chunks[-1] += b"\x00"  # RIFF word alignment
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def write_mulaw_wav(encoded: bytes, rate: int) -> bytes:
    """mu-law bytes -> canonical WAV (format tag 7, mono, 8 bit)."""
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_MULAW, 1, rate, rate, 1, 8, 0)
    return _wav(fmt, encoded, len(encoded))


def write_ima_wav(blocks: list[bytes], rate: int, block_align: int) -> bytes:
    """IMA ADPCM blocks -> canonical WAV (format tag 0x11, mono)."""
    spb = 1 + (block_align - 4) * 2  # samples per block
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, 1, rate,
        rate * block_align // spb, block_align, 4, 2, spb,
    )
    return _wav(fmt, b"".join(blocks), spb * len(blocks))


def decode_compressed_wav(payload: bytes) -> dict:
    """Parse a compressed-format WAV (mu-law or IMA ADPCM) and decode
    the payload to PCM16. Returns codec, sample_rate, n_samples,
    samples. Raises ValueError for other format tags — a pipeline must
    reject what it cannot decode, not mis-decode it."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + sz]
        if len(body) < sz:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt) < 16:
        # struct.error would escape except-ValueError isolation
        raise ValueError("short fmt chunk")
    tag, ch, rate, _br, align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if ch != 1:
        raise ValueError(f"only mono supported, got {ch} channels")
    if tag == WAVE_FORMAT_MULAW:
        if bits != 8:
            raise ValueError("mu-law requires 8 bits per sample")
        samples = [mulaw_decode(b) for b in data]
        codec = "g711-mulaw"
    elif tag == WAVE_FORMAT_IMA_ADPCM:
        if align < 8 or len(data) % align:
            raise ValueError("IMA data not a whole number of blocks")
        samples = []
        for off in range(0, len(data), align):
            samples.extend(ima_decode_block(data[off : off + align]))
        codec = "ima-adpcm"
    else:
        raise ValueError(f"unsupported compressed format tag 0x{tag:04x}")
    return {
        "codec": codec,
        "sample_rate": rate,
        "n_samples": len(samples),
        "samples": samples,
    }
