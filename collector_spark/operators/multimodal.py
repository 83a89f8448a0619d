"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with the full Spark plumbing (schema, batching, partitioning)
real, METADATA PARSED FROM REAL CONTAINER HEADERS (pure Python — PNG /
GIF / JPEG dimensions, WAV duration; no codec libraries needed), and
only the pixel/sample DECODE step stubbed.

The sandbox has no image/audio codec libraries, so actual sample
decoding raises NotImplementedError behind ``strict=True``; the default
path produces a deterministic fake feature vector from the bytes (so
schema, Arrow batch shape, and the mapInPandas pipeline are fully
exercised and tested). Swap ``_decode_stub`` with a PIL/libav call on a
real cluster — the operator contract does not change. Header metadata
(``parse_media_header``) is NOT stubbed: width/height/duration come
from the actual bytes, pinned against real fixture files in
tests/test_multimodal.py.

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


#: JPEG start-of-frame markers that carry dimensions (SOF0..SOF15 minus
#: DHT/JPG/DAC which share the 0xC0 nibble but are not frames)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_header(data: bytes) -> dict | None:
    """Typed metadata from real container headers, pure Python (no codec
    libraries): PNG / GIF / JPEG width+height, WAV duration. Returns
    ``{"media_type", "format", "width", "height", "duration_ms"}`` or
    None when the bytes match no known container (caller falls back to
    its declared media_type/format with NULL dimensions).

    Formats (all public specs):
    - PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
      width/height are big-endian uint32 at offsets 16/20.
    - GIF: 'GIF87a'/'GIF89a', logical screen width/height are
      little-endian uint16 at offsets 6/8.
    - JPEG: SOI then a marker-segment scan to the first SOFn frame
      header; height/width are big-endian uint16 at +5/+7 in the
      segment. Segments are length-prefixed, so the scan is O(#segments)
      over the header region only, not the entropy-coded body.
    - WAV: RIFF/WAVE chunk scan; duration_ms = data-chunk size * 1000 //
      the fmt chunk's byte-rate (avg bytes/sec, little-endian uint32 at
      +8 in the fmt chunk).
    """
    n = len(data)
    if n >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        return {
            "media_type": "image",
            "format": "png",
            "width": int.from_bytes(data[16:20], "big"),
            "height": int.from_bytes(data[20:24], "big"),
            "duration_ms": None,
        }
    if n >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "media_type": "image",
            "format": "gif",
            "width": int.from_bytes(data[6:8], "little"),
            "height": int.from_bytes(data[8:10], "little"),
            "duration_ms": None,
        }
    if n >= 4 and data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= n:
            if data[pos] != 0xFF:  # not at a marker: corrupt/entropy data
                break
            marker = data[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
                pos += 2
                continue
            if marker == 0xD9:  # EOI before any frame header
                break
            seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
            if seg_len < 2:
                break
            if marker in _JPEG_SOF and pos + 9 <= n:
                return {
                    "media_type": "image",
                    "format": "jpeg",
                    "width": int.from_bytes(data[pos + 7 : pos + 9], "big"),
                    "height": int.from_bytes(data[pos + 5 : pos + 7], "big"),
                    "duration_ms": None,
                }
            pos += 2 + seg_len
        return {
            "media_type": "image",
            "format": "jpeg",
            "width": None,
            "height": None,
            "duration_ms": None,
        }
    if n >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        byte_rate = None
        data_size = None
        pos = 12
        while pos + 8 <= n:
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cid == b"fmt " and pos + 20 <= n:
                byte_rate = int.from_bytes(data[pos + 16 : pos + 20], "little")
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        dur = (
            data_size * 1000 // byte_rate
            if byte_rate and data_size is not None
            else None
        )
        return {
            "media_type": "audio",
            "format": "wav",
            "width": None,
            "height": None,
            "duration_ms": dur,
        }
    return None


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
    column is consumed here and not carried downstream. ``meta`` comes
    from ``parse_media_header`` (real container headers); the declared
    ``media_type``/``fmt`` are the fallback for unrecognized bytes.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(data) if data is not None else b""
                feats = _decode_stub(b, media_type, strict=strict)
                header = parse_media_header(b)
                meta = header if header is not None else {
                    "media_type": media_type,
                    "format": fmt,
                    "width": None,
                    "height": None,
                    "duration_ms": None,
                }
                out.append(
                    {
                        "media_id": int(mid),
                        "meta": {**meta, "n_bytes": len(b)},
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
