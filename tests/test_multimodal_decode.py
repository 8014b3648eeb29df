"""Real BMP/WAV codec tests (round-3 verdict task 5): the decoders must
round-trip the encoders AND survive the format details a lazy parser gets
wrong — stride padding, bottom-up row order, RIFF chunk walking, sample
signedness. The cross-engine stats are covered by the `multimodal_features`
contract oracle; these tests pin the byte-level behavior directly."""

from __future__ import annotations

import hashlib
import struct

import pytest

from cdc_engine.multimodal import (
    BMP_W,
    BMP_H,
    WAV_N_SAMPLES,
    _decode_bmp,
    _decode_wav,
    _encode_bmp,
    _encode_wav,
)

DIGEST = hashlib.md5(b"multimodal codec fixture").digest()


def test_bmp_round_trip():
    blob = _encode_bmp(DIGEST)
    w, h, vals = _decode_bmp(blob)
    assert (w, h) == (BMP_W, BMP_H)
    assert vals == [DIGEST[j % 16] for j in range(BMP_W * BMP_H * 3)]


def test_bmp_pad_bytes_excluded():
    # poisoned 0xAA stride pad: a decoder that reads full strides would
    # leak 0xAA values into the stream
    blob = _encode_bmp(DIGEST)
    _, _, vals = _decode_bmp(blob)
    assert 0xAA not in vals or 0xAA in DIGEST


def test_bmp_top_down_variant():
    # negative height = top-down row order; decode must NOT flip
    blob = bytearray(_encode_bmp(DIGEST))
    stride = (BMP_W * 3 + 3) // 4 * 4
    h_bytes = struct.pack("<i", -BMP_H)
    blob[22:26] = h_bytes
    # rewrite rows in top-down order
    logical = bytes(DIGEST[j % 16] for j in range(BMP_W * BMP_H * 3))
    rows = b"".join(
        logical[r * BMP_W * 3 : (r + 1) * BMP_W * 3]
        + b"\xaa" * (stride - BMP_W * 3)
        for r in range(BMP_H)
    )
    blob[54:] = rows
    w, h, vals = _decode_bmp(bytes(blob))
    assert (w, h) == (BMP_W, BMP_H)
    assert vals == list(logical)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        _decode_bmp(b"PNG\x00" + b"\0" * 60)


def test_wav_round_trip_signed():
    blob = _encode_wav(DIGEST)
    samples = _decode_wav(blob)
    assert len(samples) == WAV_N_SAMPLES
    want = [
        struct.unpack("<h", bytes([DIGEST[(2 * i) % 16], DIGEST[(2 * i + 1) % 16]]))[0]
        for i in range(WAV_N_SAMPLES)
    ]
    assert samples == want
    # the fixture digest has high bytes >= 0x80, so signedness is exercised
    assert any(s < 0 for s in samples)


def test_wav_chunk_walk_skips_unknown_chunks():
    # insert a LIST chunk (odd size -> word-align pad) between fmt and data;
    # a parser that assumes data at byte 36 breaks
    blob = _encode_wav(DIGEST)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # align pad
    patched = blob[:fmt_end] + extra + blob[fmt_end:]
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    assert _decode_wav(patched) == _decode_wav(blob)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        _decode_wav(b"OggS" + b"\0" * 60)
