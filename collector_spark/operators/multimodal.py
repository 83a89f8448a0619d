"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with the full Spark plumbing (schema, batching, partitioning)
real and the codec-dependent decode step STUBBED.

The sandbox has no image/audio libraries, so actual decoding raises
NotImplementedError behind ``strict=True``; the default path produces a
deterministic fake feature vector from the bytes (so schema, Arrow batch
shape, and the mapInPandas pipeline are fully exercised and tested).
Swap ``_decode_stub`` with a PIL/libav call on a real cluster — the
operator contract does not change.

Scale notes: media bytes never leave the executor that read them (no
shuffle of binary columns — features are extracted in the scan stage via
mapInPandas, then the binary column is DROPPED before any wide
operation); metadata travels as a small struct.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(data: bytes, media_type: str, strict: bool = False) -> np.ndarray:
    """Decode step. Real decoders (PIL / soundfile / pyav) are not in this
    container; strict mode surfaces that honestly."""
    if strict:
        raise NotImplementedError(
            "media decoding requires PIL/libsndfile/libav, not present in "
            "this environment; run with strict=False for the deterministic "
            "byte-level fake features"
        )
    # deterministic fake: FEATURE_DIM-byte histogram sketch of the payload
    d = hashlib.sha256(data).digest()
    arr = np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    media_type: str = "image",
    fmt: str = "bin",
    strict: bool = False,
) -> DataFrame:
    """(id, binary, ...) → (media_id, meta struct, features array<float>).

    mapInPandas so each Arrow batch is processed vectorized; the binary
    column is consumed here and not carried downstream.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(data) if data is not None else b""
                feats = _decode_stub(b, media_type, strict=strict)
                out.append(
                    {
                        "media_id": int(mid),
                        "meta": {
                            "media_type": media_type,
                            "format": fmt,
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                            "n_bytes": len(b),
                        },
                        "features": [float(x) for x in feats],
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "meta", "features"])

    return df.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx, frame
    binary) — the decode is stubbed to fixed-size byte slices standing in
    for frames, keeping the explode/partition shape real. ``every_ms``
    scales the stride: the stub models ~1024 bytes per second of media,
    so every_ms=2000 samples half as many, twice-as-large frames."""
    frame_bytes = max(64, (1024 * every_ms) // 1000)
    n_frames = F.least(
        F.greatest((F.length(bytes_col) / frame_bytes).cast("int"), F.lit(1)),
        F.lit(16),
    )
    return (
        df.select(
            F.col(id_col),
            F.col(bytes_col),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            F.substring(
                F.col(bytes_col),
                F.col("frame_idx") * frame_bytes + 1,
                frame_bytes,
            ).alias("frame"),
        )
    )
