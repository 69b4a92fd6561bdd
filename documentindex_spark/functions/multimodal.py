"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing — schemas, partitioning, UDF signatures,
batch shapes — is real and tested; the actual media DECODE is stubbed
(this container has no image/audio libraries): each decode function
first tries the real library import and otherwise falls back to a
clearly-marked deterministic fake (or raises NotImplementedError when
``strict=True``). Swapping in a real decoder changes ONE function
body, no plan shape.

Task-brief scope; no reference analog (text-only reference).
"""

from __future__ import annotations

import hashlib
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

_KINDS = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]


def synth_assets(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic asset table (seeded bytes — stands in
    for real media the same way the text corpus stands in for repos).
    Distributed generation, one pure function of asset_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                kind, mime = _KINDS[i % len(_KINDS)]
                payload = hashlib.sha256(f"asset-{i}".encode()).digest() * (
                    4 + (i % 7)
                )
                rows.append(
                    {
                        "asset_id": i,
                        "doc_id": i % max(1, n // 4),
                        "kind": kind,
                        "mime": mime,
                        "payload": payload,
                        "meta": {
                            "width": 64 + (i % 16) * 8 if kind == "image" else None,
                            "height": 64 + (i % 12) * 8 if kind == "image" else None,
                            "duration_ms": 1000 + (i % 30) * 500
                            if kind != "image"
                            else None,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, max(2, n // 512)).mapInPandas(
        gen, schema=ASSET_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoder", T.StringType()),  # 'real' | 'stub'
    ]
)


def _decode_real(payload: bytes, kind: str, dim: int) -> np.ndarray | None:
    """Real decode path — returns None when the media libraries are
    unavailable (this container), so the caller falls back to the
    stub. Wiring a real decoder = filling in this body."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
        else:
            return None
    except ImportError:
        return None
    return None  # library present but decoder intentionally not wired yet


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
    float array column out)."""

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
                        "media decoding unavailable in this environment"
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
