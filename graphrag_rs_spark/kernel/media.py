"""Real (stdlib + numpy) media codecs for the multimodal operators.

The container has no image/audio libraries, but PNG and WAV don't need
any: PNG is zlib (stdlib) + scanline unfiltering, WAV is struct
unpacking. These codecs make the multimodal feature/resize operators
fully REAL for the formats the pipeline generates and ingests in tests —
the only remaining stub is video container parsing (sample_video_frames),
which genuinely needs ffmpeg-class demuxers.

Supported: PNG 8-bit, color types 0 (gray) / 2 (RGB) / 4 (gray+alpha) /
6 (RGBA), all five scanline filters (None/Sub/Up/Average/Paeth),
non-interlaced. WAV: PCM 8/16-bit, any channel count (averaged to mono).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes | None) -> np.ndarray | None:
    """→ H×W (gray) or H×W×C uint8 array, or None if not decodable."""
    if payload is None or not payload.startswith(_PNG_MAGIC):
        return None
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = b""
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + length]
            if len(body) != length:
                return None
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", body)
                )
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            pos += 12 + length  # len + type + body + crc
        if (
            width is None
            or bit_depth != 8
            or color_type not in _CHANNELS
            or interlace != 0
            or not idat
        ):
            return None
        channels = _CHANNELS[color_type]
        raw = zlib.decompress(idat)
        stride = width * channels
        if len(raw) != height * (stride + 1):
            return None
        out = np.zeros((height, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        bpp = channels  # bytes per pixel at bit depth 8
        for y in range(height):
            row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
            ftype = row[0]
            line = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
            if ftype == 0:
                rec = line
            elif ftype == 1:  # Sub — per-channel prefix sum mod 256
                rec = line.copy()
                for c in range(bpp):
                    rec[c::bpp] = np.cumsum(rec[c::bpp]) & 0xFF
            elif ftype == 2:  # Up
                rec = (line + prev) & 0xFF
            elif ftype == 3:  # Average
                rec = line.copy()
                for i in range(stride):
                    left = rec[i - bpp] if i >= bpp else 0
                    rec[i] = (rec[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                rec = line.copy()
                for i in range(stride):
                    a = int(rec[i - bpp]) if i >= bpp else 0
                    b = int(prev[i])
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (rec[i] + pred) & 0xFF
            else:
                return None
            out[y] = rec.astype(np.uint8)
            prev = out[y]
        pixels = out.reshape(height, width, channels)
        return pixels[:, :, 0] if channels == 1 else pixels
    except Exception:
        return None


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 H×W (gray) or H×W×{2,3,4} → PNG bytes (filter 0 rows)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    height, width, channels = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    flat = pixels.astype(np.uint8).reshape(height, width * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(height))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic; the classic sampling grid
    ``floor((i + 0.5) · src/dst)``)."""
    src_h = pixels.shape[0]
    src_w = pixels.shape[1]
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return pixels[ys][:, xs]


def decode_wav(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """→ (sample_rate, float32 mono samples in [-1, 1]) or None."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    rate = None
    bits = channels = None
    data = None
    try:
        while pos + 8 <= len(payload):
            ctype = payload[pos : pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + length]
            if ctype == b"fmt ":
                fmt_code, channels, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if fmt_code != 1:  # PCM only
                    return None
            elif ctype == b"data":
                data = body
            pos += 8 + length + (length & 1)  # chunks are word-aligned
        if rate is None or data is None or channels in (None, 0):
            return None
        if bits == 8:
            samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        else:
            return None
        if channels > 1:
            n = len(samples) // channels * channels
            samples = samples[:n].reshape(-1, channels).mean(axis=1)
        return rate, samples
    except Exception:
        return None


def image_feature_vector(pixels: np.ndarray, dim: int = 64) -> np.ndarray:
    """Real pixel features, unit-normalized: 32-bin intensity histogram +
    16-point row-mean profile + 16-point column-mean profile (resampled),
    truncated/zero-padded to ``dim``. Deterministic, library-free — the
    classic pre-CNN global descriptor family."""
    gray = pixels.astype(np.float32)
    if gray.ndim == 3:
        gray = gray.mean(axis=2)
    hist, _ = np.histogram(gray, bins=32, range=(0.0, 256.0))
    hist = hist.astype(np.float32) / max(gray.size, 1)
    rows = resize_nearest(gray.mean(axis=1, keepdims=True), 1, 16).ravel() / 255.0
    cols = resize_nearest(gray.mean(axis=0, keepdims=True).T, 1, 16).ravel() / 255.0
    v = np.concatenate([hist, rows, cols]).astype(np.float32)
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    v = v[:dim]
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def audio_feature_vector(rate: int, samples: np.ndarray, dim: int = 64) -> np.ndarray:
    """Real audio features, unit-normalized: log-magnitude spectrum
    resampled to dim−2 bins (rfft) + RMS energy + zero-crossing rate."""
    if len(samples) == 0:
        return np.zeros(dim, dtype=np.float32)
    spec = np.abs(np.fft.rfft(samples.astype(np.float64)))
    spec = np.log1p(spec).astype(np.float32)
    k = max(dim - 2, 1)
    idx = np.minimum(
        ((np.arange(k) + 0.5) * len(spec) / k).astype(np.int64), len(spec) - 1
    )
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.sign(samples))) > 0)) if len(samples) > 1 else 0.0
    v = np.concatenate([spec[idx], np.float32([rms, zcr])]).astype(np.float32)[:dim]
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v
