"""Real stdlib PNG/WAV codecs (kernel/media.py) + the now-real
multimodal feature/resize operators."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from graphrag_rs_spark.kernel.media import (
    audio_feature_vector,
    decode_png,
    decode_wav,
    encode_png,
    image_feature_vector,
    resize_nearest,
)
from graphrag_rs_spark.operators.multimodal import make_png, make_wav


def _png_with_filters(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Build a PNG whose row r uses scanline filter ftypes[r] — forward-
    filters the raw data so the decoder must invert each type."""
    h, w = pixels.shape[:2]
    c = 1 if pixels.ndim == 2 else pixels.shape[2]
    flat = pixels.reshape(h, w * c).astype(np.int32)
    raw = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        f = ftypes[y]
        out = line.copy()
        for i in range(w * c):
            a = int(line[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_decode_all_five_filters_gray():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    png = _png_with_filters(px, [0, 1, 2, 3, 4])
    got = decode_png(png)
    assert got is not None and (got == px).all()


def test_decode_all_five_filters_rgb():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _png_with_filters(px, [4, 3, 2, 1, 0])
    got = decode_png(png)
    assert got is not None and (got == px).all()


def test_encode_decode_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(6, 5), (6, 5, 2), (6, 5, 3), (6, 5, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(px))
        want = px if px.ndim == 3 else px
        assert (got == want).all(), shape


def test_decode_rejects_garbage():
    assert decode_png(None) is None
    assert decode_png(b"not a png") is None
    assert decode_png(make_png(4, 4)[:20]) is None


def test_make_png_pixels_match_formula():
    px = decode_png(make_png(10, 6, seed=3))
    want = np.array(
        [[(3 + x + y) % 256 for x in range(10)] for y in range(6)], dtype=np.uint8
    )
    assert (px == want).all()


def test_resize_nearest_identity_and_downscale():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (resize_nearest(px, 6, 4) == px).all()
    small = resize_nearest(px, 3, 2)
    assert small.shape == (2, 3)
    assert (small == px[[1, 3]][:, [1, 3, 5]]).all()


def test_decode_wav_8bit_and_16bit():
    rate, samples = decode_wav(make_wav(125, sample_rate=8000))
    assert rate == 8000 and len(samples) == 1000
    assert samples.min() >= -1.0 and samples.max() <= 1.0
    # 16-bit stereo, hand-built
    n = 100
    data = np.zeros(2 * n, dtype="<i2")
    data[0::2] = 16384   # left
    data[1::2] = -16384  # right
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data.nbytes) + data.tobytes())
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate2, mono = decode_wav(wav)
    assert rate2 == 16000 and len(mono) == n
    assert np.allclose(mono, 0.0)  # stereo averaged to silence


def test_feature_vectors_deterministic_and_discriminative():
    a = image_feature_vector(decode_png(make_png(16, 8, seed=1)), 64)
    a2 = image_feature_vector(decode_png(make_png(16, 8, seed=1)), 64)
    b = image_feature_vector(np.zeros((16, 8), dtype=np.uint8), 64)
    assert (a == a2).all()
    assert float(np.dot(a, b)) < 0.999  # different images → different vecs
    rate, s = decode_wav(make_wav(200))
    av = audio_feature_vector(rate, s, 64)
    assert av.shape == (64,) and abs(float(np.linalg.norm(av)) - 1.0) < 1e-5


def test_operator_image_features_real_pixels(spark):
    from pyspark.sql import functions as F

    from graphrag_rs_spark.operators.multimodal import extract_image_features

    rows = [
        ("m1", "image", "png", make_png(8, 8, seed=1), None, None, None),
        ("m2", "image", "png", b"broken", None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, modality string, format string, payload binary, "
        "width long, height long, duration_ms long",
    )
    got = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert got["m1"]["decode_ok"] == "ok"
    assert got["m2"]["decode_ok"] == "decode_error"
    # matches the kernel computed locally — REAL pixels, not a hash
    want = image_feature_vector(decode_png(make_png(8, 8, seed=1)), 64)
    assert np.allclose(got["m1"]["feature"], want, atol=1e-6)


def test_operator_audio_features(spark):
    from graphrag_rs_spark.operators.multimodal import extract_audio_features

    rows = [
        ("a1", "audio", "wav", make_wav(150), None, None, None),
        ("a2", "audio", "wav", b"xx", None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, modality string, format string, payload binary, "
        "width long, height long, duration_ms long",
    )
    got = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert got["a1"]["decode_ok"] == "ok"
    assert got["a2"]["decode_ok"] == "decode_error"
    rate, s = decode_wav(make_wav(150))
    want = audio_feature_vector(rate, s, 64)
    assert np.allclose(got["a1"]["feature"], want, atol=1e-6)


def test_operator_resize_real_roundtrip(spark):
    from graphrag_rs_spark.operators.multimodal import resize_images

    rows = [("m1", "image", "png", make_png(16, 12, seed=2), 16, 12, None)]
    media = spark.createDataFrame(
        rows,
        "media_id string, modality string, format string, payload binary, "
        "width long, height long, duration_ms long",
    )
    out = resize_images(media, width=8, height=6).collect()[0]
    assert out["width"] == 8 and out["height"] == 6
    px = decode_png(bytes(out["payload"]))
    assert px.shape == (6, 8)
    want = resize_nearest(decode_png(make_png(16, 12, seed=2)), 8, 6)
    assert (px == want).all()
