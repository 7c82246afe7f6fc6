"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schemas, Arrow batching, partition-friendly
layout); the codec work is stubbed behind a deterministic fake because the
media libraries aren't in this container — the UDF signature, batch shape
and schema contract are exactly what a real decoder would plug into
(swap ``_fake_decode`` for PIL/librosa/ffmpeg calls).

Design rules for 100TB media tables:
- binary payloads ride in their own column; metadata (format, width, ...)
  is typed columns so pruning/pushdown works WITHOUT touching bytes —
  every operator below projects the narrowest schema it can;
- mapInPandas with bounded Arrow batches (session caps maxRecordsPerBatch)
  so a batch of 4K-frame videos can't OOM an executor;
- features come back as fixed-size float arrays → joinable with the
  similarity operators (operators/similarity.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),     # png | wav | mp4 | ...
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("decode_ok", StringType(), False),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def decode_png_header(payload: bytes | None) -> tuple[int, int] | None:
    """REAL PNG header parse (pure stdlib): validates the 8-byte PNG
    signature and the IHDR chunk, returns (width, height) or None.
    No media libs needed — this is the production decode for dimensions;
    only the pixel-level feature extraction remains stubbed."""
    import struct

    if payload is None or len(payload) < 24:
        return None
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length < 8:
        return None
    width, height = struct.unpack(">II", payload[16:24])
    return int(width), int(height)


def decode_wav_header(payload: bytes | None) -> int | None:
    """REAL WAV (RIFF) header parse: walks chunks, reads fmt + data sizes,
    returns duration in ms or None."""
    import struct

    if payload is None or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    byte_rate = None
    data_size = None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            _fmt, _ch, _rate, brate, _align, _bits = struct.unpack("<HHIIHH", body[:16])
            byte_rate = brate
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        return None
    return int(data_size * 1000 // byte_rate)


def probe_media(media: DataFrame) -> DataFrame:
    """media → (media_id, modality, width, height, duration_ms, decode_ok):
    REAL header decode (PNG dimensions, WAV duration) replacing the
    declared metadata — the production metadata-extraction pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ds, oks = [], [], [], []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                w = h = d = None
                if modality == "image":
                    wh = decode_png_header(payload)
                    if wh:
                        w, h = wh
                elif modality == "audio":
                    d = decode_wav_header(payload)
                ok = (w is not None) or (d is not None)
                ws.append(w)
                hs.append(h)
                ds.append(d)
                oks.append("ok" if ok else "decode_error")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": pd.Series(ws, dtype="Int64"),
                    "height": pd.Series(hs, dtype="Int64"),
                    "duration_ms": pd.Series(ds, dtype="Int64"),
                    "decode_ok": pd.Series(oks, dtype="string"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("modality", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("decode_ok", StringType(), False),
        ]
    )
    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=schema
    )


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """Build a REAL (stdlib-only) grayscale PNG — deterministic test/bench
    media bytes so the decode path runs on genuine files in-container."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(
        b"\x00" + bytes((seed + x + y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(duration_ms: int, sample_rate: int = 8000) -> bytes:
    """Build a REAL mono 8-bit WAV of the given duration (stdlib-only)."""
    import struct

    n = sample_rate * duration_ms // 1000
    data = bytes((i * 7) % 256 for i in range(n))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fake_decode(payload: bytes | None, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded feature.

    Replace with a real decode+model call; everything around it (batching,
    schema, null handling) is production-shaped.
    """
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    seed = np.frombuffer(h, dtype=np.uint32)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / (np.linalg.norm(v) + 1e-9)


def extract_image_features(media: DataFrame, *, dim: int = 64) -> DataFrame:
    """media → (media_id, feature: array<float>, decode_ok).

    Arrow-batched; only (media_id, payload) are shipped to Python — the
    projection is explicit so the parquet scan never reads other columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                # REAL header validation gates the decode status; only the
                # pixel→vector step is the documented sha-seeded stand-in
                if decode_png_header(payload) is None:
                    feats.append(np.zeros(dim, dtype=np.float32).tolist())
                    oks.append("decode_error")
                else:
                    feats.append(_fake_decode(payload, dim).tolist())
                    oks.append("ok")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.where(F.col("modality") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, *, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """video rows → one row per sampled frame (deterministic timestamps).

    Frame *positions* are computed JVM-side from metadata (no payload
    touch); the payload slice is the stubbed decode step.
    """
    frames = (
        media.where(F.col("modality") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.least(
                        F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms,
                        F.lit(max_frames - 1),
                    ).cast("long"),
                )
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, idx in zip(pdf["payload"], pdf["frame_idx"]):
                if payload is None:
                    payloads.append(None)
                else:
                    # STUB: a real implementation seeks the container to
                    # frame_ts_ms and decodes; we slice bytes deterministically
                    n = len(payload)
                    lo = int(idx) * 16 % max(n, 1)
                    payloads.append(bytes(payload[lo : lo + 16]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int64"),
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int64"),
                    "frame_payload": payloads,
                }
            )

    return frames.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Schema-preserving resize slot. Real implementation decodes, resizes,
    re-encodes; the stub marks the metadata and passes bytes through so the
    pipeline contract (schema in = schema out) is testable end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = np.int64(width)
            out["height"] = np.int64(height)
            yield out

    return media.where(F.col("modality") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )
