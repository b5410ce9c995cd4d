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

Baseline sequential-DCT JPEG lives in the sibling module
(functions/jpeg_codec.py, ITU-T T.81) and is routed by decode_image.
Formats that genuinely need external codecs (progressive/subsampled
JPEG, MP3, FLAC, compressed video) still raise
``UnsupportedMediaError`` — the honest capability boundary, now much
smaller.

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
# GIF (87a/89a, LZW — first frame)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width
    starting at min_code_size+1, CLEAR resets the table, EOI ends."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise UnsupportedMediaError("corrupt LZW stream")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    return bytes(out[:n_pixels])


def _lzw_encode_literals(indices: bytes, min_code_size: int) -> bytes:
    """Minimal VALID LZW stream emitting every pixel as a literal code
    (no compression) — tracks the decoder's table growth so code
    widths stay in sync. Test/encoder-side helper."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    width = min_code_size + 1
    put(clear, width)
    next_code = eoi + 1
    prev = False
    for px in indices:
        put(px, width)
        if prev:  # decoder adds one table entry per code after the first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = True
    put(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a -> (H, W, 3) uint8 RGB (interlace
    supported, transparency rendered as its palette color)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMediaError("not a GIF")
    if len(payload) < 14:
        raise UnsupportedMediaError("truncated GIF header")
    sw, sh, flags = struct.unpack("<HHB", payload[6:11])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 3 * (2 << (flags & 7))
        gct = np.frombuffer(payload, np.uint8, n, pos).reshape(-1, 3)
        pos += n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 3 * (2 << (iflags & 7))
                ct = np.frombuffer(payload, np.uint8, n, pos).reshape(-1, 3)
                pos += n
            if ct is None:
                raise UnsupportedMediaError("GIF frame without a color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(data), min_code, w * h), np.uint8)
            if len(idx) < w * h:
                raise UnsupportedMediaError("GIF pixel data truncated")
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # 4-pass interlace
                de = np.empty_like(grid)
                rows = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                de[rows] = grid
                grid = de
            return ct[np.minimum(grid, len(ct) - 1)]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise UnsupportedMediaError(f"unknown GIF block 0x{b0:02x}")
    raise UnsupportedMediaError("GIF contains no image frame")


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> single-frame GIF89a with an exact 256-color
    palette built from the image's distinct colors (<= 256 required)
    and a literal-code LZW stream."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    ct = np.zeros((1 << depth, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    stream = _lzw_encode_literals(inverse.astype(np.uint8).tobytes(), min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


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
# AVI (RIFF, uncompressed '00db' DIB frames) — real video frame access
# ---------------------------------------------------------------------------


def _avi_chunks(payload: bytes):
    """Yield (fourcc, offset, size) for every chunk, descending into
    RIFF/LIST containers (RIFF spec: chunks are word-aligned)."""
    stack = [(12, len(payload))]  # skip 'RIFF' size 'AVI '
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if fourcc == b"LIST":
                stack.append((pos + 8 + size + (size & 1), end))
                stack.append((pos + 12, pos + 8 + size))  # inside, past list type
                break
            yield fourcc, pos + 8, size
            pos += 8 + size + (size & 1)
        else:
            continue


def decode_avi(
    payload: bytes, frame_indices: list[int] | None = None
) -> tuple[list[np.ndarray], float, int]:
    """Uncompressed AVI -> (sampled RGB frames, fps, total_frames).
    Only the REQUESTED frames decode (frame sampling never touches the
    rest of the byte stream); '00dc' compressed streams are outside
    the subset."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedMediaError("not an AVI")
    w = h = None
    usec_per_frame = 0
    frames: list[tuple[int, int]] = []
    for fourcc, off, size in _avi_chunks(payload):
        if fourcc == b"avih":
            usec_per_frame, _mbps, _pad, _flags, _total = struct.unpack(
                "<IIIII", payload[off : off + 20]
            )
            w, h = struct.unpack("<II", payload[off + 32 : off + 40])
        elif fourcc[2:] == b"db":
            frames.append((off, size))
        elif fourcc[2:] == b"dc":
            raise UnsupportedMediaError("compressed AVI stream (00dc) needs ffmpeg")
    if w is None or not frames:
        raise UnsupportedMediaError("AVI missing avih header or frames")
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    stride = (w * 3 + 3) & ~3
    wanted = range(len(frames)) if frame_indices is None else frame_indices
    out = []
    for i in wanted:
        if not 0 <= i < len(frames):
            continue
        off, size = frames[i]
        if size < stride * h:
            raise UnsupportedMediaError("AVI frame truncated")
        rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up DIB
        out.append(bgr[:, :, ::-1].copy())  # BGR -> RGB
    return out, fps, len(frames)


def encode_avi(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """(H, W, 3) uint8 RGB frames -> minimal uncompressed AVI (avih +
    vids/DIB stream headers + movi list of 00db chunks)."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)

    def dib(img: np.ndarray) -> bytes:
        bgr = img[:, :, ::-1]
        return b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))

    frame_bytes = [dib(f) for f in frames]
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1e6 / fps), stride * h * int(fps), 0, 0x10, len(frames), 0, 1,
        stride * h, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, int(fps), 0, len(frames),
        stride * h, 0xFFFFFFFF, 0, 0, 0, 0, 0,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + list_type + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


# ---------------------------------------------------------------------------
# Routing + real feature kernels
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Route image bytes to a real decoder (PNG/BMP/GIF/baseline-JPEG
    subset)."""
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        # lazy import: jpeg_codec imports UnsupportedMediaError from here
        from pdf_extractor_ray.functions.jpeg_codec import decode_jpeg

        return decode_jpeg(payload)
    raise UnsupportedMediaError(
        "image decode implemented for PNG/BMP/GIF/baseline-JPEG; "
        "other formats need PIL (absent here)"
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
