"""Pure-stdlib/numpy media codecs: PNG, BMP, WAV.

Round 2 shipped the multimodal plumbing with STUBBED codecs because
PIL/ffmpeg are absent from this container. These three formats need
neither — their specs are public and the container has zlib/struct/
numpy — so decode is now REAL for:

- PNG (W3C PNG spec / RFC 2083): chunk parse, IDAT zlib inflate,
  scanline unfilter (None/Sub/Up/Average/Paeth), bit depth 8, color
  types 0 (gray) / 2 (RGB) / 6 (RGBA), non-interlaced.
- BMP (BITMAPINFOHEADER): 24-bit uncompressed, bottom-up rows,
  4-byte row padding.
- WAV: RIFF/PCM via the stdlib `wave` module (8/16-bit mono/stereo).

Formats that genuinely need external codecs (JPEG, GIF, MP3, FLAC,
video) still raise ``UnsupportedMediaError`` — the honest capability
boundary, now much smaller.

Encoders for the same subsets exist so the synthetic corpus carries
REAL media bytes (fixtures + the multimodal_featurize driver query).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "UnsupportedMediaError",
    "decode_png",
    "encode_png",
    "decode_bmp",
    "encode_bmp",
    "decode_wav",
    "encode_wav",
    "decode_image",
    "decode_audio",
    "resize_nearest",
    "image_feature",
    "audio_feature",
]


class UnsupportedMediaError(ValueError):
    """Payload format outside the pure-python codec subset."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (C in {1, 3, 4})."""
    if not payload.startswith(_PNG_MAGIC):
        raise UnsupportedMediaError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    if bit_depth != 8 or color_type not in (0, 2, 6) or interlace != 0:
        raise UnsupportedMediaError(
            f"PNG subset is 8-bit gray/RGB/RGBA non-interlaced "
            f"(got depth={bit_depth} color={color_type} interlace={interlace})"
        )
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise UnsupportedMediaError("PNG scanline size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if f == 0:
            cur = line.copy()
        elif f == 2:  # Up
            cur = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential along x
            cur = np.zeros(stride, dtype=np.uint8)
            li = line.tolist()
            pv = prev.tolist()
            cl = cur.tolist()
            for x in range(stride):
                a = cl[x - nch] if x >= nch else 0
                if f == 1:
                    v = li[x] + a
                elif f == 3:
                    v = li[x] + ((a + pv[x]) >> 1)
                else:
                    c = pv[x - nch] if x >= nch else 0
                    v = li[x] + _paeth(a, pv[x], c)
                cl[x] = v & 0xFF
            cur = np.array(cl, dtype=np.uint8)
        else:
            raise UnsupportedMediaError(f"PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, nch)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 -> PNG bytes (filter 0 scanlines)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise UnsupportedMediaError("BMP core header unsupported")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(f"BMP subset is 24-bit uncompressed (got bpp={bpp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows[::-1] if flip else rows  # bottom-up storage
    return img[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP bytes."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + bytes(body)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM via stdlib wave)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a WAV")
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            nch = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except wave.Error as exc:
        raise UnsupportedMediaError(f"WAV parse: {exc}") from exc
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"WAV subset is 8/16-bit PCM (got width={width})")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float mono samples in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Routing + real feature kernels
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Route image bytes to a real decoder (PNG/BMP subset)."""
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise UnsupportedMediaError(
        "image decode implemented for PNG/BMP; JPEG/GIF need PIL (absent here)"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Route audio bytes to a real decoder (WAV PCM subset)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise UnsupportedMediaError(
        "audio decode implemented for WAV PCM; MP3/FLAC need ffmpeg/soundfile (absent here)"
    )


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) -> (h, w, C) — pure indexing."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def image_feature(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Real image embedding: grayscale mean-pool to a sqrt(dim) grid,
    L2-normalized float32 (the classic tiny-image descriptor)."""
    g = int(np.sqrt(dim))
    gray = img[:, :, :3].mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    cell = resize_nearest(gray[:, :, None].astype(np.uint8), g * 8, g * 8)[:, :, 0]
    pooled = cell.reshape(g, 8, g, 8).mean(axis=(1, 3)).reshape(-1)
    v = np.zeros(dim, dtype=np.float32)
    v[: g * g] = pooled.astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / (n if n else 1.0)


def audio_feature(samples: np.ndarray, dim: int = 64) -> tuple[int, np.ndarray]:
    """Real audio features: per-window RMS + zero-crossing-rate over
    dim/2 equal windows, L2-normalized float32. Returns (n_windows,
    feature)."""
    nw = max(1, dim // 2)
    n = len(samples)
    if n == 0:
        return 0, np.zeros(dim, dtype=np.float32)
    edges = (np.arange(nw + 1) * n) // nw
    rms = np.empty(nw, dtype=np.float32)
    zcr = np.empty(nw, dtype=np.float32)
    sign = np.signbit(samples)
    for i in range(nw):
        a, b = int(edges[i]), max(int(edges[i + 1]), int(edges[i]) + 1)
        win = samples[a:b]
        rms[i] = np.sqrt(float(np.mean(win * win)))
        zcr[i] = float(np.mean(sign[a + 1 : b] != sign[a : b - 1])) if b - a > 1 else 0.0
    v = np.zeros(dim, dtype=np.float32)
    v[0::2][:nw] = rms
    v[1::2][:nw] = zcr
    norm = float(np.linalg.norm(v))
    return nw, v / (norm if norm else 1.0)
