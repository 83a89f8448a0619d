"""Multimodal metadata: parse_media_header against REAL container bytes
(round-4 VERDICT #3 — width/height/duration must come from the binary,
not be fabricated), plus the Spark mapInPandas path end-to-end."""

import base64

import pytest

from collector_spark.operators import multimodal
from collector_spark.operators.multimodal import parse_media_header

# a genuine 1x1 transparent PNG (the canonical smallest PNG)
PNG_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)

# a genuine 1x1 GIF89a
GIF_1x1 = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def _jpeg(width: int, height: int) -> bytes:
    """Minimal spec-valid JPEG header region: SOI, APP0/JFIF, a comment
    segment (exercises the marker-scan), SOF0 with the dimensions."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def _wav(byte_rate: int, data_size: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header declaring a PCM data chunk of
    ``data_size`` bytes at ``byte_rate`` average bytes/sec."""
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")       # PCM
        + (1).to_bytes(2, "little")       # mono
        + (byte_rate // 2).to_bytes(4, "little")  # sample rate (16-bit)
        + byte_rate.to_bytes(4, "little")         # avg bytes/sec
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + data_size.to_bytes(4, "little")
    riff_size = 4 + len(fmt) + len(data) + data_size
    return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt + data


def test_png_header():
    m = parse_media_header(PNG_1x1)
    assert m == {
        "media_type": "image", "format": "png",
        "width": 1, "height": 1, "duration_ms": None,
    }


def test_gif_header():
    m = parse_media_header(GIF_1x1)
    assert m == {
        "media_type": "image", "format": "gif",
        "width": 1, "height": 1, "duration_ms": None,
    }


def test_jpeg_header_scans_to_sof():
    m = parse_media_header(_jpeg(640, 480))
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 640, 480)
    # truncated after SOI: recognized as jpeg, dimensions unknown
    t = parse_media_header(b"\xff\xd8\xff\xe0")
    assert t["format"] == "jpeg" and t["width"] is None


def test_wav_duration():
    # 32000 B/s, 64000 B of samples -> exactly 2000 ms
    m = parse_media_header(_wav(32000, 64000))
    assert m == {
        "media_type": "audio", "format": "wav",
        "width": None, "height": None, "duration_ms": 2000,
    }
    # odd-sized chunk before data exercises word-alignment skip
    odd = _wav(8000, 4000)
    inject = odd[:12] + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00" + odd[12:]
    m2 = parse_media_header(inject)
    assert m2["duration_ms"] == 500


def test_unknown_bytes_return_none():
    assert parse_media_header(b"plain text, no container") is None
    assert parse_media_header(b"") is None
    # PNG signature but no IHDR: not parseable as PNG
    assert parse_media_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) is None


def test_spark_meta_comes_from_headers(spark):
    rows = [
        (0, bytearray(PNG_1x1)),
        (1, bytearray(GIF_1x1)),
        (2, bytearray(_jpeg(320, 200))),
        (3, bytearray(_wav(16000, 8000))),
        (4, bytearray(b"opaque blob")),
    ]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    out = {
        r.media_id: r.meta
        for r in multimodal.extract_media_features(
            df, media_type="image", fmt="bin"
        ).collect()
    }
    assert (out[0].format, out[0].width, out[0].height) == ("png", 1, 1)
    assert (out[1].format, out[1].width, out[1].height) == ("gif", 1, 1)
    assert (out[2].format, out[2].width, out[2].height) == ("jpeg", 320, 200)
    assert (out[3].media_type, out[3].duration_ms) == ("audio", 500)
    # unrecognized bytes fall back to the declared type with NULL dims
    assert (out[4].media_type, out[4].format, out[4].width) == ("image", "bin", None)
    assert all(out[i].n_bytes == len(bytes(rows[i][1])) for i in range(5))
