"""Baseline JPEG codec (functions/jpeg_codec.py, ITU-T T.81): lossy
round-trip error bounds, marker structure, restart markers, the
unsupported-feature boundary, and the decode_image routing."""

import numpy as np
import pytest

from pdf_extractor_ray.functions.jpeg_codec import (
    _DCT_M,
    decode_jpeg,
    encode_jpeg,
)
from pdf_extractor_ray.functions.media_codec import UnsupportedMediaError, decode_image


def _gradient(h, w):
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    return np.stack([x, y, (x + y) / 2], axis=2).astype(np.uint8)


def test_dct_matrix_orthonormal():
    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)


def test_roundtrip_error_bound_smooth():
    """Quantization is the ONLY loss at 4:4:4: a smooth gradient at
    q90 reconstructs within a few counts per channel."""
    img = _gradient(40, 56)
    back = decode_jpeg(encode_jpeg(img, quality=90))
    assert back.shape == img.shape and back.dtype == np.uint8
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 2.0


def test_roundtrip_non_multiple_of_8_dims():
    """Edge-replicated padding: odd dimensions decode back to the
    exact declared size."""
    img = _gradient(33, 47)
    back = decode_jpeg(encode_jpeg(img, quality=85))
    assert back.shape == (33, 47, 3)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 3.0


def test_roundtrip_grayscale():
    g = _gradient(24, 40)[:, :, 0]
    back = decode_jpeg(encode_jpeg(g, quality=90))
    assert back.shape == (24, 40, 3)  # gray expands to 3 identical channels
    assert (back[:, :, 0] == back[:, :, 1]).all() and (back[:, :, 1] == back[:, :, 2]).all()
    assert np.abs(back[:, :, 0].astype(int) - g.astype(int)).mean() < 2.5


def test_quality_tradeoff_and_determinism():
    img = _gradient(32, 32)
    lo, hi = encode_jpeg(img, quality=10), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)  # coarser quantization -> smaller file
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    assert err_hi < err_lo


def test_marker_structure():
    jp = encode_jpeg(_gradient(16, 16), quality=85)
    assert jp[:2] == b"\xff\xd8" and jp[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in jp[:24]
    assert b"\xff\xc0" in jp and b"\xff\xc4" in jp and b"\xff\xdb" in jp and b"\xff\xda" in jp


def test_restart_markers_roundtrip():
    """DRI + RSTn boundaries: the encoder segments the scan, the
    decoder resets DC predictors at each boundary — the image still
    reconstructs within the lossy bound."""
    img = _gradient(48, 64)  # 6x8 = 48 MCUs
    jp = encode_jpeg(img, quality=90, restart_interval=5)
    assert b"\xff\xdd" in jp  # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in jp for k in range(8))
    back = decode_jpeg(jp)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.array_equal(back, plain)  # segmentation is bit-neutral


def test_noise_image_is_lossy_but_sane():
    rng = np.random.default_rng(11)
    noisy = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(noisy, quality=50))
    err = np.abs(back.astype(int) - noisy.astype(int)).mean()
    assert 0 < err < 64  # heavily quantized, but not garbage


def test_unsupported_features_raise():
    jp = encode_jpeg(_gradient(16, 16))
    # progressive (SOF2)
    with pytest.raises(UnsupportedMediaError, match="progressive"):
        decode_jpeg(jp.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # sampling factors beyond 2 per axis: patch Y's byte (0x11 -> 0x33)
    i = jp.index(b"\xff\xc0")
    patched = bytearray(jp)
    patched[i + 11] = 0x33
    with pytest.raises(UnsupportedMediaError, match="sampling factors"):
        decode_jpeg(bytes(patched))
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(jp[: len(jp) // 3])  # truncated mid-markers


def test_decode_image_routes_jpeg():
    img = _gradient(20, 28)
    out = decode_image(encode_jpeg(img, quality=90))
    assert out.shape == (20, 28, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0


def test_420_subsampled_roundtrip():
    """4:2:0 (the dominant wild layout: MCU = 4 Y + Cb + Cr): smooth
    image reconstructs within the lossy bound; chroma is 2x2
    box-averaged so the bound is looser than 4:4:4 but tight on a
    gradient."""
    img = _gradient(40, 56)
    jp420 = encode_jpeg(img, quality=90, subsample="420")
    jp444 = encode_jpeg(img, quality=90)
    assert len(jp420) < len(jp444)  # 6 blocks/MCU vs 3 per 4x pixels
    i = jp420.index(b"\xff\xc0")
    assert jp420[i + 11] == 0x22  # Y sampling 2x2 declared
    back = decode_jpeg(jp420)
    assert back.shape == img.shape
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.mean() < 4.0 and err.max() <= 24


def test_420_odd_dimensions_and_restarts():
    """Odd (non-multiple-of-16) dims pad per MCU grid and crop back;
    restart markers compose with subsampling."""
    img = _gradient(37, 51)
    back = decode_jpeg(encode_jpeg(img, quality=85, subsample="420"))
    assert back.shape == (37, 51, 3)
    jp = encode_jpeg(img, quality=85, subsample="420", restart_interval=3)
    assert b"\xff\xdd" in jp
    assert np.array_equal(decode_jpeg(jp), back)  # segmentation bit-neutral


def test_420_luma_is_not_subsampled():
    """Only chroma is subsampled: a grayscale-content image (chroma
    flat) round-trips 4:2:0 essentially as well as 4:4:4."""
    g = _gradient(32, 32)[:, :, 0]
    img = np.repeat(g[:, :, None], 3, axis=2)
    e420 = np.abs(decode_jpeg(encode_jpeg(img, 90, subsample="420")).astype(int) - img.astype(int)).mean()
    e444 = np.abs(decode_jpeg(encode_jpeg(img, 90)).astype(int) - img.astype(int)).mean()
    assert abs(e420 - e444) < 0.5


def test_progressive_decodes_identical_to_baseline():
    """The progressive scan script (DC first Al=1, AC first Al=1 per
    component, AC refinement, DC refinement) reconstructs the SAME
    pixels as the baseline encoding of the same quantized
    coefficients — bit-exact, since both carry the full coefficient
    precision by the end."""
    rng = np.random.RandomState(3)
    cases = [
        (_gradient(12, 16), "444"),
        (_gradient(17, 23), "444"),
        (_gradient(17, 23), "420"),
        (_gradient(32, 40), "420"),
        (rng.randint(0, 256, (24, 33, 3)).astype(np.uint8), "444"),  # AC churn
    ]
    for img, sub in cases:
        base = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        pj = encode_jpeg(img, quality=90, subsample=sub, progressive=True)
        assert b"\xff\xc2" in pj  # SOF2 on disk
        assert pj.count(b"\xff\xda") >= 4  # multiple scans
        assert np.array_equal(decode_jpeg(pj), base), (img.shape, sub)
    g = (np.arange(20)[:, None] * np.arange(30)[None, :] % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=85, progressive=True)),
        decode_jpeg(encode_jpeg(g, quality=85)),
    )


def test_progressive_eobrun_handbuilt():
    """EOBn runs (> 1 block) never come out of the in-repo producer
    (Annex-K tables lack EOBn symbols), so pin the decoder's EOB-run
    branch with a hand-built two-scan progressive stream using a
    custom AC table that carries the EOB2 symbol 0x10: the result
    must equal the baseline encoding of the same coefficients."""
    import struct

    from pdf_extractor_ray.functions.jpeg_codec import (
        _HT_DC_LUM,
        _BitWriter,
        _build_codes,
    )

    # grayscale 8x24 -> three 8x8 blocks, flat quant table
    h, w = 8, 24
    qt_zz = bytes([1] * 64)
    # custom AC table: symbols 0x00 (EOB), 0x01 (r0 s1), 0x10 (EOB2), 0xF0
    ac_bits = [0, 2, 2] + [0] * 13
    ac_vals = [0x00, 0x01, 0x10, 0xF0]
    ac = _build_codes(ac_bits, ac_vals)
    dc = _build_codes(*_HT_DC_LUM)

    def headers(sof: int) -> bytearray:
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt_zz
        out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 11, 8, h, w, 1)
        out += bytes([1, 0x11, 0])
        out += b"\xff\xc4" + struct.pack(">H", 19 + 12) + b"\x00"
        out += bytes(_HT_DC_LUM[0]) + bytes(_HT_DC_LUM[1])
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(ac_vals)) + b"\x10"
        out += bytes(ac_bits) + bytes(ac_vals)
        return out

    # progressive: scan 1 = DC first Al=0 (three zero diffs), scan 2 =
    # AC first with block0 carrying coef k=1 == +1 then EOB2(extra=1)
    # covering blocks 1 and 2
    prog = headers(0xC2)
    bw = _BitWriter()
    for _ in range(3):
        c, ln = dc[0]
        bw.put(c, ln)
    prog += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + bytes([0, 0, 0x00])
    prog += bw.finish()
    bw = _BitWriter()
    c, ln = ac[0x01]
    bw.put(c, ln)  # r=0 s=1 at k=1
    bw.put(1, 1)  # value +1
    c, ln = ac[0x10]
    bw.put(c, ln)  # EOB2
    bw.put(1, 1)  # extra bit -> eobrun covers this break + 2 more blocks? no:
    # (1<<1)-1+1 = 2 more blocks after this one -> blocks 1 and 2
    prog += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + bytes([1, 63, 0x00])
    prog += bw.finish()
    prog += b"\xff\xd9"

    # baseline twin: same coefficients, per-block EOBs
    base = headers(0xC0)
    bw = _BitWriter()
    c, ln = dc[0]
    bw.put(c, ln)  # block0 DC 0
    c, ln = ac[0x01]
    bw.put(c, ln)
    bw.put(1, 1)  # k=1 -> +1
    c, ln = ac[0x00]
    bw.put(c, ln)  # EOB
    for _ in range(2):  # blocks 1, 2: DC 0, EOB
        c, ln = dc[0]
        bw.put(c, ln)
        c, ln = ac[0x00]
        bw.put(c, ln)
    base += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + bytes([0, 63, 0x00])
    base += bw.finish()
    base += b"\xff\xd9"

    got = decode_jpeg(bytes(prog))
    want = decode_jpeg(bytes(base))
    assert np.array_equal(got, want)
    assert got.shape == (8, 24, 3)
    assert len(np.unique(got[:, :8])) > 1  # block0 carries the AC ripple
    assert len(np.unique(got[:, 8:])) == 1  # EOB-run blocks stay flat


def test_progressive_restart_combination_raises():
    with pytest.raises(ValueError, match="not implemented"):
        encode_jpeg(_gradient(16, 16), progressive=True, restart_interval=2)
