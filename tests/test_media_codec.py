"""Tests for the pure-python media codecs (functions/media_codec.py):
PNG / BMP / WAV roundtrips, every PNG filter type, the subset
boundary, and the real feature kernels."""

import struct
import zlib

import numpy as np
import pytest

from pdf_extractor_ray.functions.media_codec import (
    UnsupportedMediaError,
    audio_feature,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    image_feature,
    resize_nearest,
)


def _gradient(h, w, c=3):
    img = np.zeros((h, w, c), dtype=np.uint8)
    for ch in range(c):
        img[:, :, ch] = (np.arange(w)[None, :] * (ch + 3) + np.arange(h)[:, None] * 7) % 256
    return img


def test_png_roundtrip_gray_rgb_rgba():
    for c in (1, 3, 4):
        img = _gradient(9, 13, c)
        back = decode_png(encode_png(img))
        assert back.shape == (9, 13, c)
        assert (back == img).all()


def test_png_all_filter_types_decode():
    """Hand-build a PNG whose scanlines use filters 1 (Sub), 2 (Up),
    3 (Average) and 4 (Paeth) — the encoder only emits 0, so the
    decoder's filter math is pinned here against a reference
    implementation of the spec recursions."""
    img = np.random.RandomState(5).randint(0, 255, (5, 6, 3), dtype=np.uint8)
    h, w, nch = img.shape
    stride = w * nch

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)

    filters = [0, 1, 2, 3, 4]
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y, f in enumerate(filters):
        cur = img[y].reshape(-1).astype(np.int64)
        line = np.empty(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - ((a + b) >> 1)
            else:
                v = cur[x] - paeth(a, b, c)
            line[x] = v & 0xFF
        raw.append(f)
        raw += bytes(line.astype(np.uint8))
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


def test_png_subset_boundary():
    img = _gradient(4, 4)
    png = encode_png(img)
    # 16-bit depth rejected
    bad = png.replace(struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
                      struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
    with pytest.raises(UnsupportedMediaError):
        decode_png(bad)
    with pytest.raises(UnsupportedMediaError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(UnsupportedMediaError):
        decode_image(b"\xff\xd8\xffjpeg")


def test_bmp_roundtrip_with_padding():
    # width 5 -> 15-byte rows padded to 16: exercises the stride math
    img = _gradient(3, 5)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(b"XXnot a bmp")


def test_wav_roundtrip_and_stereo_downmix():
    import io
    import wave

    t = np.arange(800) / 8000.0
    x = 0.3 * np.sin(2 * np.pi * 200 * t)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and np.abs(y - x).max() < 1e-3
    # stereo 16-bit: decode downmixes to mono
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(4000)
        inter = np.empty(400, dtype="<i2")
        inter[0::2] = 1000
        inter[1::2] = 3000
        f.writeframes(inter.tobytes())
    y2, rate2 = decode_wav(buf.getvalue())
    assert rate2 == 4000 and len(y2) == 200
    assert np.allclose(y2, 2000 / 32768.0, atol=1e-6)


def test_feature_kernels():
    img = _gradient(16, 16)
    f = image_feature(img, 64)
    assert f.shape == (64,) and abs(np.linalg.norm(f) - 1.0) < 1e-5
    # feature reflects pixels: a different image gives a different vector
    f2 = image_feature(255 - img, 64)
    assert not np.allclose(f, f2)

    t = np.arange(1600) / 8000.0
    nw, af = audio_feature(np.sin(2 * np.pi * 100 * t).astype(np.float64), 16)
    assert nw == 8 and af.shape == (16,)
    # a silent signal has zero RMS in every window
    nw0, af0 = audio_feature(np.zeros(100), 16)
    assert af0[0::2].sum() == 0.0

    r = resize_nearest(img, 4, 4)
    assert r.shape == (4, 4, 3)


def test_gif_roundtrip_and_table_growth():
    from pdf_extractor_ray.functions.media_codec import decode_gif, decode_image, encode_gif

    img = np.zeros((10, 14, 3), dtype=np.uint8)
    img[:, :7] = [200, 30, 30]
    img[5:, 7:] = [30, 200, 30]
    img[:5, 7:] = [30, 30, 200]
    gif = encode_gif(img)
    assert gif.startswith(b"GIF89a") and gif.endswith(b"\x3b")
    assert (decode_gif(gif) == img).all()
    assert (decode_image(gif) == img).all()
    # 200 distinct colors: codes widen past the initial width and the
    # decoder's table-growth tracking must stay in sync
    rng = np.random.RandomState(2)
    pal = rng.randint(0, 255, (200, 3), dtype=np.uint8)
    img2 = pal[rng.randint(0, 200, (30, 40))]
    assert (decode_gif(encode_gif(img2)) == img2).all()
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8))


def test_gif_interlaced_frame():
    """Hand-build an interlaced GIF (pass order 0,8 / 4,8 / 2,4 / 1,2)
    and check the decoder restores row order."""
    from pdf_extractor_ray.functions.media_codec import _lzw_encode_literals, decode_gif

    h, w = 11, 4
    grid = np.arange(h * w, dtype=np.uint8).reshape(h, w) % 16
    pal = np.stack([np.arange(16) * 16] * 3, axis=1).astype(np.uint8)
    rows = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    stored = grid[rows]  # what an interlaced file stores
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0)  # 16-color GCT
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace flag
    out.append(4)
    stream = _lzw_encode_literals(stored.reshape(-1).tobytes(), 4)
    for i in range(0, len(stream), 255):
        c = stream[i : i + 255]
        out.append(len(c))
        out += c
    out += b"\x00\x3b"
    back = decode_gif(bytes(out))
    assert (back == pal[grid]).all()


def test_gif_boundary_errors():
    from pdf_extractor_ray.functions.media_codec import UnsupportedMediaError, decode_gif

    with pytest.raises(UnsupportedMediaError):
        decode_gif(b"GIF89a")  # no frame
    with pytest.raises(UnsupportedMediaError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_avi_roundtrip_and_selective_decode():
    from pdf_extractor_ray.functions.media_codec import decode_avi, encode_avi

    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 255, (10, 14, 3), dtype=np.uint8) for _ in range(7)]
    avi = encode_avi(frames, fps=5.0)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    got, fps, total = decode_avi(avi)
    assert total == 7 and abs(fps - 5.0) < 1e-6
    assert all((a == b).all() for a, b in zip(got, frames))
    # frame sampling decodes ONLY the requested indices
    sampled, _, _ = decode_avi(avi, frame_indices=[0, 3, 6])
    assert len(sampled) == 3 and (sampled[1] == frames[3]).all()
    # metadata-only pass: no frames decoded
    none, fps2, total2 = decode_avi(avi, frame_indices=[])
    assert none == [] and total2 == 7
    with pytest.raises(UnsupportedMediaError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(UnsupportedMediaError):
        decode_avi(avi.replace(b"00db", b"00dc"))  # compressed stream
