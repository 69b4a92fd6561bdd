"""Byte-level decoder correctness (no Spark): the BMP and WAV
parsers must recover exact pixels/samples from hand-built files."""

from __future__ import annotations

import struct

import numpy as np

from documentindex_spark.functions.multimodal import (
    _decode_real,
    decode_bmp,
    decode_wav,
    synth_bmp,
    synth_wav,
)


def test_bmp_exact_pixels_with_padding():
    """3×2 image → rows need 1 padding byte (9 → 12); decoded pixels
    must match the generator formula exactly, top-down order."""
    payload = synth_bmp(5, w=3, h=2)
    px = decode_bmp(payload)
    assert px is not None and px.shape == (2, 3, 3)
    for y in range(2):
        for x in range(3):
            want = (7 * x + 13 * y + 31 * 5) % 256
            assert list(px[y, x]) == [want] * 3, (x, y)


def test_bmp_rejects_non_bmp():
    assert decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64) is None
    assert decode_bmp(b"BM") is None  # truncated header


def test_wav_roundtrip_sine():
    payload = synth_wav(3, n_samples=800, rate=8000)
    decoded = decode_wav(payload)
    assert decoded is not None
    samples, rate = decoded
    assert rate == 8000 and len(samples) == 800
    # reconstruct the generator's sine and compare bit-for-bit after
    # the same int16 quantization
    t = np.arange(800, dtype=np.float64)
    freq = 100.0 + 50.0 * (3 % 20)
    want = (np.sin(2 * np.pi * freq * t / rate) * 20000).astype("<i2")
    assert np.array_equal((samples * 32768.0).astype("<i2"), want)
    # sine RMS ≈ amplitude/√2
    rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
    assert abs(rms - (20000 / 32768.0) / np.sqrt(2)) < 0.01


def test_wav_stereo_downmix():
    # hand-build a 2-channel file: L=1000, R=3000 constant → mono 2000
    n = 100
    frames = np.empty(n * 2, dtype="<i2")
    frames[0::2] = 1000
    frames[1::2] = 3000
    data = frames.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 2, 8000, 8000 * 4, 4, 16, b"data", len(data),
    )
    samples, rate = decode_wav(hdr + data)
    assert len(samples) == n
    assert np.allclose(samples, 2000 / 32768.0)


def test_real_feature_paths():
    img_feat = _decode_real(synth_bmp(1, 16, 16), "image", 8)
    assert img_feat is not None and img_feat.shape == (8,)
    assert img_feat.dtype == np.float32
    wav_feat = _decode_real(synth_wav(1), "audio", 8)
    assert wav_feat is not None and wav_feat.shape == (8,)
    assert _decode_real(b"not media", "image", 8) is None
    assert _decode_real(b"\x00" * 100, "video", 8) is None


def test_png_exact_pixels_all_filters():
    """synth_png cycles rows through all five filter types; the
    decoder must reproduce the exact pixel formula for every one."""
    from documentindex_spark.functions.multimodal import (
        decode_png,
        synth_png,
    )

    for i, w, h in [(0, 16, 16), (3, 24, 32), (7, 5, 11)]:
        px = decode_png(synth_png(i, w, h))
        assert px is not None and px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert px[y, x, c] == (7 * x + 13 * y + 31 * i + 5 * c) % 256


def test_png_gray_and_rgba():
    import zlib

    from documentindex_spark.functions.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    # 2x2 grayscale, filter 0: pixels 10,20 / 30,40
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    scan = b"\x00\x0a\x14" + b"\x00\x1e\x28"
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(scan))
           + _png_chunk(b"IEND", b""))
    px = decode_png(png)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [10, 10, 10]  # gray broadcast
    assert px[1, 1].tolist() == [40, 40, 40]
    # 1x1 RGBA, filter 0: alpha dropped
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    scan = b"\x00\x01\x02\x03\xff"
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(scan))
           + _png_chunk(b"IEND", b""))
    assert decode_png(png)[0, 0].tolist() == [1, 2, 3]


def test_png_rejects_unsupported():
    import zlib

    from documentindex_spark.functions.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        synth_png,
    )

    assert decode_png(b"not a png") is None
    assert decode_png(synth_png(1)[:40]) is None  # truncated
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 7))
           + _png_chunk(b"IEND", b""))
    assert decode_png(png) is None
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
           + _png_chunk(b"IEND", b""))
    assert decode_png(png) is None
    # corrupt deflate stream
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", b"\xde\xad\xbe\xef")
           + _png_chunk(b"IEND", b""))
    assert decode_png(png) is None


def test_png_real_feature_path():
    from documentindex_spark.functions.multimodal import (
        _decode_real,
        synth_png,
    )

    feat = _decode_real(synth_png(2, 16, 16), "image", 8)
    assert feat is not None and feat.shape == (8,)
    assert all(0.0 <= v < 1.0 for v in feat)


def test_mp4_container_roundtrip():
    from documentindex_spark.functions.multimodal import (
        parse_mp4_meta,
        synth_mp4,
    )

    meta = parse_mp4_meta(synth_mp4(3, dur_ms=2500, w=96, h=64))
    assert meta == {"duration_ms": 2500, "width": 96, "height": 64}
    assert parse_mp4_meta(b"not an mp4 container") is None
    assert parse_mp4_meta(b"\x00" * 4 + b"ftyp") is None  # truncated
