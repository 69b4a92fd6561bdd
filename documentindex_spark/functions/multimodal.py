"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs, processed by Arrow-batched pandas UDFs.

Decode status (round 3): REAL decoders for uncompressed 24-bit BMP,
8-bit PNG (gray/RGB/RGBA, full None/Sub/Up/Average/Paeth unfilter
bank — zlib inflate + numpy, no imaging library), and PCM-16 WAV —
byte-level parsers in this file — feeding real features (mean-pooled
grayscale bands for images, RMS envelope for audio). JPEG/MP4 still
fall back to a clearly-marked deterministic stub (or raise under
``strict=True``): this container has no codec libraries, and the
fallback keeps the plan shape identical so wiring PIL/ffmpeg later
changes one function body.

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
                    payload = (
                        synth_png(i, w, h)
                        if mime == "image/png"
                        else synth_bmp(i, w, h)
                    )
                    meta = {"width": w, "height": h,
                            "duration_ms": None, "n_bytes": len(payload)}
                elif kind == "audio":
                    n_s = 2000 + (i % 5) * 400
                    payload = synth_wav(i, n_s)
                    meta = {"width": None, "height": None,
                            "duration_ms": int(n_s * 1000 / 8000),
                            "n_bytes": len(payload)}
                else:
                    payload = hashlib.sha256(
                        f"asset-{i}".encode()
                    ).digest() * (4 + (i % 7))
                    meta = {"width": None, "height": None,
                            "duration_ms": 1000 + (i % 30) * 500,
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
