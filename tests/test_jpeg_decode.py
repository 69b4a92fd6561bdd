"""Baseline-JPEG decoder correctness (no Spark).

synth_jpeg exercises the 4:4:4 interleaved path end-to-end against
the generator's known pixel field; the grayscale / 4:2:0 / restart
streams are hand-assembled here so the decoder features the encoder
doesn't emit are still proven against independently computed values.
"""

from __future__ import annotations

import struct

import numpy as np

from documentindex_spark.functions.multimodal import (
    _BitWriter,
    _HT_AC_LUMA,
    _HT_DC_LUMA,
    _decode_real,
    _huff_encoder_map,
    decode_jpeg,
    synth_jpeg,
)


def _field(i, w, h):
    ys = np.arange(h)[:, None, None].astype(np.float64)
    xs = np.arange(w)[None, :, None].astype(np.float64)
    cs = np.arange(3)[None, None, :].astype(np.float64)
    return np.clip(
        np.rint(
            128.0
            + 90.0 * np.cos((xs / 13.0) + (ys / 9.0) + 0.7 * cs + 0.31 * (i % 17))
        ),
        0,
        255,
    )


def test_roundtrip_within_quantization_noise():
    """q=90 over a smooth field: every pixel within ±6, mean ≤ 1.5 —
    i.e. the decode is the DCT inverse, not an approximation."""
    for i, w, h in [(0, 16, 16), (3, 24, 32), (7, 5, 11), (11, 40, 24)]:
        px = decode_jpeg(synth_jpeg(i, w, h))
        assert px is not None and px.shape == (h, w, 3)
        err = np.abs(px.astype(np.float64) - _field(i, w, h))
        assert err.max() <= 6.0, (i, err.max())
        assert err.mean() <= 1.5, (i, err.mean())


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc, th, spec):
    bits, vals = spec
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _write_dc_only_block(bw, dc_map, ac_map, diff):
    size = int(diff != 0 and int(abs(diff)).bit_length())
    code, ln = dc_map[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    code, ln = ac_map[0x00]  # EOB
    bw.write(code, ln)


def test_grayscale_dc_only_exact():
    """Hand-built 8×8 grayscale, flat qt=16, constant 100: DC −14·16 =
    −224 = (100−128)·8 exactly, so decode is EXACT (no tolerance)."""
    dc_map = _huff_encoder_map(_HT_DC_LUMA)
    ac_map = _huff_encoder_map(_HT_AC_LUMA)
    bw = _BitWriter()
    _write_dc_only_block(bw, dc_map, ac_map, -14)
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([16] * 64))
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _dht(0, 0, _HT_DC_LUMA)
        + _dht(1, 0, _HT_AC_LUMA)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    px = decode_jpeg(payload)
    assert px is not None and px.shape == (8, 8, 3)
    assert np.all(px == 100), np.unique(px)


def test_420_subsampled_constant_color():
    """Hand-built 16×16 4:2:0 MCU (4 Y + Cb + Cr blocks), constant
    RGB: subsampled chroma must upsample back to the constant within
    quantization rounding (±2)."""
    rgb = np.array([58.0, 120.0, 200.0])
    r, g, b = rgb
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qt0 = 16
    dc_map = _huff_encoder_map(_HT_DC_LUMA)
    ac_map = _huff_encoder_map(_HT_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    # 4 luma blocks (diff then zeros), then one Cb, one Cr
    for val, count, reset in ((y, 4, True), (cb, 1, True), (cr, 1, True)):
        if reset:
            pred = 0
        dc = int(np.rint((val - 128.0) * 8.0 / qt0))
        for k in range(count):
            _write_dc_only_block(bw, dc_map, ac_map, dc - pred)
            pred = dc
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([qt0] * 64))
        + _seg(
            0xC0,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + _dht(0, 0, _HT_DC_LUMA)
        + _dht(1, 0, _HT_AC_LUMA)
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    px = decode_jpeg(payload)
    assert px is not None and px.shape == (16, 16, 3)
    for c in range(3):
        chan = px[:, :, c].astype(np.float64)
        assert np.all(np.abs(chan - rgb[c]) <= 2.0), (c, np.unique(chan))


def test_restart_markers_reset_predictor():
    """DRI=1 with two 8×8 grayscale MCUs separated by RST0: the DC
    predictor must reset, so the second block's diff is absolute."""
    dc_map = _huff_encoder_map(_HT_DC_LUMA)
    ac_map = _huff_encoder_map(_HT_AC_LUMA)
    chunks = []
    for dc in (-14, 6):  # 100 and 140 with qt=16: (v-128)*8/16
        bw = _BitWriter()
        _write_dc_only_block(bw, dc_map, ac_map, dc)
        chunks.append(bw.flush())
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([16] * 64))
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        + _dht(0, 0, _HT_DC_LUMA)
        + _dht(1, 0, _HT_AC_LUMA)
        + _seg(0xDD, struct.pack(">H", 1))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + chunks[0]
        + b"\xff\xd0"
        + chunks[1]
        + b"\xff\xd9"
    )
    px = decode_jpeg(payload)
    assert px is not None and px.shape == (8, 16, 3)
    assert np.all(px[:, :8] == 100), np.unique(px[:, :8])
    assert np.all(px[:, 8:] == 140), np.unique(px[:, 8:])


def test_rejects_unsupported():
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff") is None  # truncated
    good = synth_jpeg(1, 16, 16)
    assert decode_jpeg(good[: len(good) // 2]) is None  # cut mid-scan
    # progressive: flip SOF0 marker to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None
    # 12-bit precision in SOF
    idx = good.find(b"\xff\xc0")
    bad = bytearray(good)
    bad[idx + 4] = 12
    assert decode_jpeg(bytes(bad)) is None


def test_jpeg_real_feature_path():
    feat = _decode_real(synth_jpeg(2, 16, 16), "image", 8)
    assert feat is not None and feat.shape == (8,)
    assert all(0.0 <= v < 1.0 for v in feat)
