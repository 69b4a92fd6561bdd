"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs, processed by Arrow-batched pandas UDFs.

Decode status (round 3): REAL decoders for uncompressed 24-bit BMP,
8-bit PNG (gray/RGB/RGBA, full None/Sub/Up/Average/Paeth unfilter
bank — zlib inflate + numpy, no imaging library), baseline sequential
JPEG (SOF0: parsed DQT/DHT, canonical Huffman, float IDCT, chroma
upsampling, restart markers — pure numpy per ITU-T T.81), and PCM-16
WAV — byte-level parsers in this file — feeding real features
(mean-pooled grayscale bands for images, RMS envelope for audio).
Only MP4/video still falls back to a clearly-marked deterministic
stub (or raises under ``strict=True``): a video codec is out of scope
for a no-dependency container, and the fallback keeps the plan shape
identical so wiring ffmpeg later changes one function body.

The Spark-side plumbing — schemas, partitioning, UDF signatures,
batch shapes, frame-expansion explode — is real and tested
throughout. Task-brief scope; no reference analog (text-only
reference).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

_KINDS = [
    ("image", "image/bmp"),
    ("audio", "audio/wav"),
    ("image", "image/png"),
    ("video", "video/mp4"),
    ("image", "image/jpeg"),
]


# ------------------------------------------------- real media synthesis


def synth_bmp(i: int, w: int = 16, h: int = 16) -> bytes:
    """A VALID uncompressed 24-bit bottom-up BMP, deterministic in
    ``i`` (pixel (x,y) value = (7x + 13y + 31i) mod 256 on all three
    channels)."""
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        vals = [(7 * x + 13 * y + 31 * i) % 256 for x in range(w)]
        row = bytes(v for v in vals for _ in range(3))
        rows.append(row + b"\x00" * (row_size - len(row)))
    return header + b"".join(rows)


def synth_wav(i: int, n_samples: int = 2000, rate: int = 8000) -> bytes:
    """A VALID mono PCM-16 WAV: a sine at 100 + 50·(i mod 20) Hz."""
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + 50.0 * (i % 20)
    samples = (np.sin(2 * np.pi * freq * t / rate) * 20000).astype("<i2")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def synth_assets(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic asset table. Image and audio payloads
    are REAL media files (valid BMP / WAV, decoded by the real path
    below); video payloads are opaque bytes (stub decode — no codec
    libs here). Distributed generation, one pure function of
    asset_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                kind, mime = _KINDS[i % len(_KINDS)]
                if kind == "image":
                    w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
                    if mime == "image/png":
                        payload = synth_png(i, w, h)
                    elif mime == "image/jpeg":
                        payload = synth_jpeg(i, w, h)
                    else:
                        payload = synth_bmp(i, w, h)
                    meta = {"width": w, "height": h,
                            "duration_ms": None, "n_bytes": len(payload)}
                elif kind == "audio":
                    n_s = 2000 + (i % 5) * 400
                    payload = synth_wav(i, n_s)
                    meta = {"width": None, "height": None,
                            "duration_ms": int(n_s * 1000 / 8000),
                            "n_bytes": len(payload)}
                else:
                    dur = 1000 + (i % 30) * 500
                    vw, vh = 64 + (i % 4) * 16, 48 + (i % 3) * 16
                    payload = synth_mp4(i, dur_ms=dur, w=vw, h=vh)
                    meta = {"width": vw, "height": vh,
                            "duration_ms": dur,
                            "n_bytes": len(payload)}
                rows.append(
                    {
                        "asset_id": i,
                        "doc_id": i % max(1, n // 4),
                        "kind": kind,
                        "mime": mime,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, max(2, n // 512)).mapInPandas(
        gen, schema=ASSET_SCHEMA
    )


# ------------------------------------------------------ real decoders


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP → H×W×3 uint8 (BGR, top-down). None
    when the payload isn't a BMP this parser handles."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    row_size = (w * 3 + 3) & ~3
    need = row_size * abs(h)
    if data_off + need > len(payload):
        return None
    px = np.frombuffer(
        payload, dtype=np.uint8, offset=data_off, count=need
    ).reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    return px[::-1] if h > 0 else px  # positive h = bottom-up storage


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray | RGB | RGBA (8-bit only)


def decode_png(payload: bytes) -> np.ndarray | None:
    """8-bit non-interlaced PNG (gray / RGB / RGBA) → H×W×3 uint8.
    Pure zlib-inflate + per-row unfilter (None/Sub/Up/Average/Paeth —
    the full filter bank), no external imaging library. Gray
    broadcasts to 3 channels; RGBA drops alpha. None for payloads
    this parser doesn't handle (16-bit, palette, interlaced,
    truncated, non-PNG)."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos, idat = 8, []
    w = h = bitd = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR" and len(body) == 13:
            w, h, bitd, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + body + crc
    ch = _PNG_CHANNELS.get(ctype if ctype is not None else -1)
    if w is None or bitd != 8 or interlace != 0 or ch is None:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.int32)
    zero = np.zeros(ch, dtype=np.int32)
    off = 0
    for y in range(h):
        ftype = raw[off]
        cur = (
            np.frombuffer(raw, np.uint8, stride, off + 1)
            .reshape(w, ch)
            .astype(np.int32)
        )
        off += stride + 1
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — no left dependency, one vector op
            cur = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # left-dependent: walk pixels,
            for x in range(w):  # vectorized across channels
                left = cur[x - 1] if x else zero
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + prev[x]) >> 1
                else:
                    up = prev[x]
                    ul = prev[x - 1] if x else zero
                    p = left + up - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc = np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up, ul),
                    )
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        prev = cur
        out[y] = cur.astype(np.uint8)
    if ch == 1:
        return np.repeat(out, 3, axis=2)
    return out[:, :, :3]  # RGBA → drop alpha


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body))
    )


def synth_png(i: int, w: int = 16, h: int = 16) -> bytes:
    """A VALID 8-bit RGB PNG, deterministic in ``i`` (pixel (x,y)
    channel c = (7x + 13y + 31i + 5c) mod 256). Rows cycle through
    ALL FIVE filter types (y mod 5) so the decoder's whole unfilter
    bank is exercised, not just filter 0."""
    import zlib

    px = np.empty((h, w, 3), dtype=np.int32)
    xs = np.arange(w)[None, :, None]
    ys = np.arange(h)[:, None, None]
    cs = np.arange(3)[None, None, :]
    px[:] = (7 * xs + 13 * ys + 31 * i + 5 * cs) % 256
    scan = []
    prev = np.zeros((w, 3), dtype=np.int32)
    zero = np.zeros(3, dtype=np.int32)
    for y in range(h):
        cur = px[y]
        ftype = y % 5
        filt = np.empty((w, 3), dtype=np.int32)
        for x in range(w):
            left = cur[x - 1] if x else zero
            up = prev[x]
            ul = prev[x - 1] if x else zero
            if ftype == 0:
                pred = zero
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, ul),
                )
            filt[x] = (cur[x] - pred) & 0xFF
        scan.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(scan)))
        + _png_chunk(b"IEND", b"")
    )


# ----------------------------------------------------- baseline JPEG
#
# Pure-numpy baseline sequential JPEG (ITU-T T.81): DQT/DHT parsed
# from the FILE (nothing shared with the encoder but the public spec
# constants), canonical Huffman decode, dequant + float IDCT, chroma
# upsampling, YCbCr→RGB. The entropy loop is per-symbol Python — fine
# for the asset sizes synth_assets produces and for correctness tests;
# a production deployment swaps in libjpeg behind the same function
# signature (the Spark plumbing above is unchanged).

# zig-zag scan order (T.81 Figure A.6 — public spec constant)
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K reference tables (public spec constants)
_QT_LUMA_K1 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA_K2 = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)
# Annex K example Huffman specs: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(length, code) pairs in symbol order for a canonical Huffman
    table spec (T.81 Annex C code-assignment algorithm)."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((ln, code))
            code += 1
        code <<= 1
    return out


def _dct_basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix C: C[u,x] = a(u)·cos((2x+1)uπ/16)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16.0)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a ``size``-bit magnitude to its
    signed coefficient value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _unstuff_scan(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start`` until the next real marker →
    (restart-interval chunks with 0xFF00 unstuffed, end position)."""
    chunks, cur = [], bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: chunk boundary
                chunks.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker ends the scan
        cur.append(b)
        i += 1
    chunks.append(bytes(cur))
    return chunks, i


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline sequential JPEG (SOF0, 8-bit, Huffman) → H×W×3 uint8
    RGB. Grayscale broadcasts; 2×2/2×1/1×2 chroma subsampling handled
    via nearest upsampling; restart markers supported. None for
    progressive (SOF2), arithmetic, 12-bit, or malformed payloads."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, qt_id)
    w = h = None
    restart = 0
    i = 2
    try:
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            ln = struct.unpack_from(">H", payload, i + 2)[0]
            body = payload[i + 4 : i + 2 + ln]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(body):
                    pq, tq = body[p] >> 4, body[p] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables: not baseline-8
                    qts[tq] = np.frombuffer(
                        body, np.uint8, 64, p + 1
                    ).astype(np.int64)
                    p += 65
            elif marker == 0xC4:  # DHT
                p = 0
                while p + 17 <= len(body):
                    tc, th = body[p] >> 4, body[p] & 0xF
                    bits = list(body[p + 1 : p + 17])
                    nv = sum(bits)
                    vals = list(body[p + 17 : p + 17 + nv])
                    hts[(tc, th)] = {
                        lc: sym
                        for lc, sym in zip(_canonical_codes(bits), vals)
                    }
                    p += 17 + nv
            elif marker == 0xC0:  # SOF0 baseline
                if body[0] != 8:
                    return None
                h, w = struct.unpack_from(">HH", body, 1)
                nc = body[5]
                comps = [
                    (
                        body[6 + 3 * k],
                        body[7 + 3 * k] >> 4,
                        body[7 + 3 * k] & 0xF,
                        body[8 + 3 * k],
                    )
                    for k in range(nc)
                ]
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline SOF
            elif marker == 0xDD:  # DRI
                restart = struct.unpack_from(">H", body, 0)[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if w is None or not comps:
                    return None
                ns = body[0]
                scan_tabs = {
                    body[1 + 2 * k]: (
                        body[2 + 2 * k] >> 4,
                        body[2 + 2 * k] & 0xF,
                    )
                    for k in range(ns)
                }
                chunks, i = _unstuff_scan(payload, i + 2 + ln)
                return _decode_scan(
                    w, h, comps, scan_tabs, qts, hts, chunks, restart
                )
            i += 2 + ln
    except (struct.error, IndexError, ValueError, EOFError, KeyError):
        return None
    return None


def _decode_scan(w, h, comps, scan_tabs, qts, hts, chunks, restart):
    basis = _dct_basis()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
        for cid, ch, cv, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    n_mcus = mcus_x * mcus_y
    chunk_idx = 0
    reader = _BitReader(chunks[0])
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            chunk_idx += 1
            if chunk_idx >= len(chunks):
                return None
            reader = _BitReader(chunks[chunk_idx])
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcus_x)
        for cid, ch, cv, tq in comps:
            dc_t = hts.get((0, scan_tabs[cid][0]))
            ac_t = hts.get((1, scan_tabs[cid][1]))
            qt = qts.get(tq)
            if dc_t is None or ac_t is None or qt is None:
                return None
            for by in range(cv):
                for bx in range(ch):
                    zz = np.zeros(64, dtype=np.int64)
                    size = _huff_decode(reader, dc_t)
                    pred[cid] += _extend(reader.read_bits(size), size)
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(reader, ac_t)
                        run, size = sym >> 4, sym & 0xF
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            return None
                        zz[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = zz * qt
                    block = basis.T @ coef.reshape(8, 8) @ basis + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full resolution, crop, color-convert
    full = []
    for cid, ch, cv, _ in comps:
        p = np.repeat(
            np.repeat(planes[cid], vmax // cv, axis=0), hmax // ch, axis=1
        )
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        return None
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _huff_encoder_map(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    bits, vals = spec
    return {
        sym: (code, ln)
        for (ln, code), sym in zip(_canonical_codes(bits), vals)
    }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.nbits += ln
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def synth_jpeg(i: int, w: int = 16, h: int = 16, quality: int = 90) -> bytes:
    """A VALID baseline 4:4:4 JPEG, deterministic in ``i``: smooth
    two-axis cosine field per channel (low-frequency by construction,
    so quality-90 quantization keeps pixels within a small tolerance —
    pinned in tests). Annex-K tables scaled by the IJG quality rule."""
    ys = np.arange(h)[:, None, None].astype(np.float64)
    xs = np.arange(w)[None, :, None].astype(np.float64)
    cs = np.arange(3)[None, None, :].astype(np.float64)
    px = 128.0 + 90.0 * np.cos(
        (xs / 13.0) + (ys / 9.0) + 0.7 * cs + 0.31 * (i % 17)
    )
    rgb = np.clip(np.rint(px), 0, 255).astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    qt_l = _scale_qt(_QT_LUMA_K1, quality)
    qt_c = _scale_qt(_QT_CHROMA_K2, quality)
    basis = _dct_basis()
    enc = {
        "dc": [_huff_encoder_map(_HT_DC_LUMA), _huff_encoder_map(_HT_DC_CHROMA)],
        "ac": [_huff_encoder_map(_HT_AC_LUMA), _huff_encoder_map(_HT_AC_CHROMA)],
    }
    bw = _BitWriter()
    bw_x, bw_y = -(-w // 8), -(-h // 8)
    pred = [0, 0, 0]
    for my in range(bw_y):
        for mx in range(bw_x):
            for ci, plane in enumerate(planes):
                qt = qt_l if ci == 0 else qt_c
                t = 0 if ci == 0 else 1
                blk = np.full((8, 8), 128.0)
                ys0, xs0 = my * 8, mx * 8
                sub = plane[ys0 : ys0 + 8, xs0 : xs0 + 8]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                # edge-replicate padding (avoids ringing at borders)
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, : sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1 : sub.shape[1]]
                coef = basis @ (blk - 128.0) @ basis.T
                q = np.rint(coef.reshape(64) / qt.astype(np.float64))
                zz = q[_ZIGZAG].astype(np.int64)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = int(diff != 0 and int(abs(diff)).bit_length())
                code, ln = enc["dc"][t][size]
                bw.write(code, ln)
                if size:
                    mag = diff if diff > 0 else diff + (1 << size) - 1
                    bw.write(mag, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    if k > last_nz:
                        break
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = enc["ac"][t][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    size = int(abs(v)).bit_length()
                    code, ln = enc["ac"][t][(run << 4) | size]
                    bw.write(code, ln)
                    mag = v if v > 0 else v + (1 << size) - 1
                    bw.write(mag, size)
                    run = 0
                if last_nz < 63:
                    code, ln = enc["ac"][t][0x00]  # EOB
                    bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht_body(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
        + seg(0xDB, b"\x01" + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        + seg(0xC4, dht_body(0, 0, _HT_DC_LUMA))
        + seg(0xC4, dht_body(0, 1, _HT_DC_CHROMA))
        + seg(0xC4, dht_body(1, 0, _HT_AC_LUMA))
        + seg(0xC4, dht_body(1, 1, _HT_AC_CHROMA))
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """PCM-16 WAV → (mono float32 samples in [-1,1), sample_rate).
    None for anything else."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        return None
    raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    samples = raw.astype(np.float32) / 32768.0
    if n_ch > 1:
        usable = len(samples) // n_ch * n_ch
        samples = samples[:usable].reshape(-1, n_ch).mean(axis=1)
    return samples, int(rate)


# ------------------------------------------------------ MP4 container
#
# Codec-free CONTAINER parsing (ISO/IEC 14496-12 box structure): the
# sample data stays opaque (no H.264 decode without a codec lib), but
# duration / track dimensions come from real mvhd/tkhd boxes — so the
# video pipeline's metadata is parsed, not trusted from the catalog.


def synth_mp4(i: int, dur_ms: int = 2000, w: int = 64, h: int = 48) -> bytes:
    """A structurally valid minimal MP4: ftyp + moov(mvhd, trak(tkhd))
    + mdat with deterministic opaque payload bytes."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    timescale = 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">IIII", 0, 0, timescale, dur_ms)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, dur_ms)
        + b"\x00" * 52
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed point
    )
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    payload = hashlib.sha256(f"mdat-{i}".encode()).digest() * (4 + (i % 7))
    return ftyp + moov + box(b"mdat", payload)


def parse_mp4_meta(payload: bytes) -> dict | None:
    """(duration_ms, width, height) from the box tree, or None when the
    payload isn't an ISO-BMFF file. Walks top-level + moov/trak
    children; versions 0 and 1 of mvhd; ignores everything it doesn't
    know (forward-compatible by construction)."""

    def walk(data: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack_from(">I", data, pos)[0]
            typ = data[pos + 4 : pos + 8]
            body_off = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    return
                size = struct.unpack_from(">Q", data, pos + 8)[0]
                body_off = pos + 16
            if size < 8 or pos + size > end:
                return
            yield typ, body_off, pos + size
            pos += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    out = {"duration_ms": None, "width": None, "height": None}
    try:
        for typ, b0, b1 in walk(payload, 0, len(payload)):
            if typ != b"moov":
                continue
            for t2, c0, c1 in walk(payload, b0, b1):
                if t2 == b"mvhd":
                    ver = payload[c0]
                    if ver == 0:
                        _, _, ts, dur = struct.unpack_from(">IIII", payload, c0 + 4)
                    else:
                        _, _, ts, dur = struct.unpack_from(">QQIQ", payload, c0 + 4)
                    if ts:
                        out["duration_ms"] = int(dur * 1000 // ts)
                elif t2 == b"trak":
                    for t3, d0, d1 in walk(payload, c0, c1):
                        if t3 == b"tkhd" and d1 - d0 >= 84:
                            wfx, hfx = struct.unpack_from(">II", payload, d1 - 8)
                            if wfx and hfx:
                                out["width"] = wfx >> 16
                                out["height"] = hfx >> 16
    except struct.error:
        return None
    if out["duration_ms"] is None and out["width"] is None:
        return None
    return out


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoder", T.StringType()),  # 'real' | 'stub'
    ]
)


def _bucket_means(v: np.ndarray, dim: int) -> np.ndarray:
    """Mean over ``dim`` contiguous buckets (ragged tail folded into
    the last bucket)."""
    if len(v) == 0:
        return np.zeros(dim, dtype=np.float32)
    idx = np.linspace(0, len(v), dim + 1).astype(np.int64)
    return np.array(
        [
            v[idx[j] : max(idx[j + 1], idx[j] + 1)].mean()
            for j in range(dim)
        ],
        dtype=np.float32,
    )


def _decode_real(payload: bytes, kind: str, dim: int) -> np.ndarray | None:
    """REAL decode path: BMP → mean-pooled grayscale column bands in
    [0,1); WAV → per-band RMS envelope. Returns None for formats this
    build can't decode (compressed codecs) — caller falls back to the
    stub."""
    if kind == "image":
        px = decode_bmp(payload)
        if px is None:
            px = decode_png(payload)
        if px is None:
            px = decode_jpeg(payload)
        if px is None:
            return None
        gray = px.mean(axis=2).mean(axis=0) / 255.0  # per-column mean
        return _bucket_means(gray, dim)
    if kind == "audio":
        decoded = decode_wav(payload)
        if decoded is None:
            return None
        samples, _ = decoded
        rms_src = samples.astype(np.float64) ** 2
        idx = np.linspace(0, len(rms_src), dim + 1).astype(np.int64)
        return np.array(
            [
                np.sqrt(rms_src[idx[j] : max(idx[j + 1], idx[j] + 1)].mean())
                if len(rms_src)
                else 0.0
                for j in range(dim)
            ],
            dtype=np.float32,
        )
    return None  # video: no codec libraries in this container


def _feature_stub(payload: bytes, dim: int) -> np.ndarray:
    """STUB: deterministic fake feature — sha256-expanded payload
    bytes scaled to [0,1). NOT a real embedding; placeholder with the
    exact shape/dtype a real decoder would produce."""
    raw = hashlib.sha256(payload).digest()
    while len(raw) < dim:
        raw += hashlib.sha256(raw).digest()
    return np.frombuffer(raw[:dim], dtype=np.uint8).astype(np.float32) / 256.0


def extract_features(
    assets: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """asset → fixed-dim feature vector via mapInPandas (the real
    decode/feature batch shape: one Arrow batch of payloads in, one
    float array column out). ``decoder`` column records which path
    produced each row ('real' for BMP/WAV, 'stub' for codecs absent
    here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, decoders = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                real = _decode_real(bytes(payload), kind, dim)
                if real is not None:
                    feats.append(real)
                    decoders.append("real")
                elif strict:
                    raise NotImplementedError(
                        "no decoder for this format in this environment"
                    )
                else:
                    feats.append(_feature_stub(bytes(payload), dim))
                    decoders.append("stub")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "decoder": decoders,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-sampling plan: one row per planned frame
    (asset_id, frame_idx, t_ms). The EXPANSION is real Spark
    (sequence + explode — this is the operator that matters at scale:
    a 2-hour video becomes 7200 rows before any decode); the frame
    decode itself is the stubbed step."""
    vids = assets.filter(F.col("kind") == "video")
    return vids.select(
        "asset_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_idx", "t_ms"),
    )
