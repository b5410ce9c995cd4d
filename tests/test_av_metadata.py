"""Tests for the compressed-AV header parsers (functions/av_metadata.py)
and the `av_metadata` Ray stage: MP3 frame-chain walks across
MPEG-1/2/2.5 (ID3 tags, VBR, padding), H.264 Annex-B NAL split +
Exp-Golomb SPS (cropping, high-profile branch, interlaced, emulation
prevention), and the strict UnsupportedMediaError boundaries."""

import pyarrow as pa
import pytest
import ray.data

from pdf_extractor_ray.functions.av_metadata import (
    _BitWriter,
    _ep_insert,
    _ep_strip,
    encode_h264,
    encode_mp3,
    h264_metadata,
    mp3_metadata,
)
from pdf_extractor_ray.functions.media_codec import UnsupportedMediaError


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


def test_mp3_mpeg1_cbr_roundtrip():
    payload = encode_mp3(38, bitrate_kbps=128, sample_rate=44100)
    m = mp3_metadata(payload)
    assert m["container"] == "mp3"
    assert m["version"] == "mpeg1"
    assert m["layer"] == 3
    assert m["sample_rate"] == 44100
    assert m["channel_mode"] == "stereo"
    assert m["n_frames"] == 38
    assert m["duration_s"] == pytest.approx(38 * 1152 / 44100)
    assert m["bitrate_kbps"] == 128
    assert m["vbr"] is False
    assert m["n_bytes"] == len(payload)


def test_mp3_mpeg25_lsf_mono():
    # MPEG-2.5 Layer III: 576 samples/frame, halved length coefficient
    payload = encode_mp3(20, bitrate_kbps=64, sample_rate=8000, mono=True)
    m = mp3_metadata(payload)
    assert m["version"] == "mpeg2.5"
    assert m["channel_mode"] == "mono"
    assert m["n_frames"] == 20
    assert m["duration_s"] == pytest.approx(20 * 576 / 8000)
    assert m["bitrate_kbps"] == 64


def test_mp3_mpeg2_rates():
    payload = encode_mp3(10, bitrate_kbps=96, sample_rate=22050)
    m = mp3_metadata(payload)
    assert m["version"] == "mpeg2"
    assert m["sample_rate"] == 22050
    assert m["n_frames"] == 10


def test_mp3_id3v2_prefix_and_id3v1_tail():
    body = encode_mp3(7, id3_title=b"Fixture Title")
    assert body[:3] == b"ID3"
    payload = body + b"TAG" + b"\x00" * 125  # ID3v1 tail is exactly 128 bytes
    m = mp3_metadata(payload)
    assert m["n_frames"] == 7
    assert m["n_bytes"] == len(payload)


def test_mp3_vbr_weighted_mean():
    # two CBR runs at the same sample rate concatenate into a valid
    # VBR chain; bitrate is the frame-byte-weighted mean, between the two
    a = encode_mp3(10, bitrate_kbps=64, sample_rate=44100)
    b = encode_mp3(10, bitrate_kbps=192, sample_rate=44100)
    m = mp3_metadata(a + b)
    assert m["vbr"] is True
    assert m["n_frames"] == 20
    assert 64 < m["bitrate_kbps"] < 192


def test_mp3_error_boundaries():
    good = encode_mp3(3, sample_rate=48000)  # no padding bit at 48k -> fixed frames
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(good[:-5])  # truncated final frame
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(good + b"\x00\x00\x00\x00\x00")  # sync lost after last frame
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(b"not audio at all")
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(b"")
    # free-format bitrate index (0) is a documented unsupported layout
    free = bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 100
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(free)
    # reserved version bits (01)
    resv = bytes([0xFF, 0xEB, 0x90, 0x00]) + b"\x00" * 100
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(resv)
    # sample rate must not change mid-stream
    with pytest.raises(UnsupportedMediaError):
        mp3_metadata(encode_mp3(2, sample_rate=44100) + encode_mp3(2, sample_rate=32000))


# ---------------------------------------------------------------------------
# H.264
# ---------------------------------------------------------------------------


def test_h264_exact_macroblock_dims():
    payload = encode_h264(128, 96, n_frames=6, idr_interval=3)
    m = h264_metadata(payload)
    assert m["container"] == "h264"
    assert (m["width"], m["height"]) == (128, 96)
    assert m["profile_idc"] == 66
    assert m["level_idc"] == 30
    assert m["chroma_format_idc"] == 1
    assert m["interlaced"] is False
    assert m["n_nals"] == 2 + 6  # SPS + PPS + slices
    assert m["n_slices"] == 6
    assert m["n_idr"] == 2  # frames 0 and 3


def test_h264_cropped_dims():
    # 100x62 is not a multiple of 16 -> SPS frame cropping carries the
    # conformance window; the parser must recover the display size
    m = h264_metadata(encode_h264(100, 62, n_frames=2))
    assert (m["width"], m["height"]) == (100, 62)
    m = h264_metadata(encode_h264(1280, 720, n_frames=1, profile_idc=77, level_idc=31))
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["profile_idc"] == 77


def _wrap_sps(rbsp: bytes, extra_nals: bytes = b"") -> bytes:
    return b"\x00\x00\x00\x01" + b"\x67" + _ep_insert(rbsp) + extra_nals


def _high_profile_sps(scaling_matrix: bool = False, frame_mbs_only: int = 1) -> bytes:
    """Hand-built High-profile (100) SPS: exercises the chroma/bit-depth
    branch the fixture writer refuses to emit."""
    w = _BitWriter()
    w.u(100, 8)  # profile_idc = High
    w.u(0, 8)
    w.u(40, 8)  # level 4.0
    w.ue(0)  # sps id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime
    w.u(1 if scaling_matrix else 0, 1)  # seq_scaling_matrix_present_flag
    if scaling_matrix:
        return _wrap_sps(w.rbsp())  # parser must bail before reading further
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(120 - 1)  # 1920 wide
    w.ue(68 - 1)  # map units
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field_flag
    w.u(1, 1)  # direct_8x8
    w.u(1, 1)  # frame_cropping_flag
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.ue(4)  # crop_bottom: 1088 - 2*ch*4
    return _wrap_sps(w.rbsp())


def test_h264_high_profile_branch():
    m = h264_metadata(_high_profile_sps())
    assert m["profile_idc"] == 100
    assert (m["width"], m["height"]) == (1920, 1080)  # 68*16 - 2*4 = 1080
    assert m["interlaced"] is False


def test_h264_interlaced_height_doubles():
    m = h264_metadata(_high_profile_sps(frame_mbs_only=0))
    assert m["interlaced"] is True
    # (2 - 0) * 68 * 16 = 2176 minus ch(=4 when interlaced 4:2:0) * 4
    assert m["height"] == 2 * 68 * 16 - 4 * 4


def test_h264_error_boundaries():
    with pytest.raises(UnsupportedMediaError):
        h264_metadata(_high_profile_sps(scaling_matrix=True))
    with pytest.raises(UnsupportedMediaError):
        h264_metadata(b"\x00\x00\x01\x41\x10\x20")  # slices but no SPS
    with pytest.raises(UnsupportedMediaError):
        h264_metadata(b"mp4 ftyp box, not Annex-B")
    with pytest.raises(UnsupportedMediaError):
        h264_metadata(b"\x00\x00\x01\xe7\x42")  # forbidden_zero_bit set
    # SPS cut off right after profile/constraint/level bytes -> the
    # Exp-Golomb reader runs out of bits mid-parse
    with pytest.raises(UnsupportedMediaError):
        h264_metadata(b"\x00\x00\x01\x67\x42\x00\x1e")


def test_ep_insert_strip_roundtrip():
    for raw in (b"\x00\x00\x00\x00", b"\x00\x00\x01\x02\x00\x00\x02", b"\xff\x00\x00\x03", b""):
        guarded = _ep_insert(raw)
        assert b"\x00\x00\x00" not in guarded and b"\x00\x00\x01" not in guarded
        assert _ep_strip(guarded) == raw


# ---------------------------------------------------------------------------
# Ray stage
# ---------------------------------------------------------------------------


def test_av_metadata_stage_mixed_batch(ray_session):
    from pdf_extractor_ray.ops.multimodal import AV_META_SCHEMA, av_metadata

    payloads = [
        encode_mp3(12, bitrate_kbps=128, sample_rate=44100),
        encode_mp3(5, bitrate_kbps=64, sample_rate=8000, mono=True, id3_title=b"t"),
        encode_h264(100, 62, n_frames=4, idr_interval=2),
        encode_mp3(3)[:-7],  # truncated -> error row, still sniffed as mp3
        b"\x89PNG not an av payload",  # unknown container -> error row
    ]
    tbl = pa.table(
        {
            "media_id": pa.array(list(range(len(payloads))), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = av_metadata(ray.data.from_arrow(tbl), batch_size=2)
    assert out.schema().base_schema == AV_META_SCHEMA
    df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert df.loc[0, "container"] == "mp3" and df.loc[0, "n_frames"] == 12
    assert df.loc[0, "bitrate_kbps"] == 128 and df.loc[0, "error"] is None
    assert df.loc[1, "channel_mode"] == "mono" and df.loc[1, "sample_rate"] == 8000
    assert df.loc[2, "container"] == "h264"
    assert (df.loc[2, "width"], df.loc[2, "height"]) == (100, 62)
    assert df.loc[2, "n_idr"] == 2 and df.loc[2, "n_slices"] == 4
    assert df.loc[3, "container"] == "mp3" and "UnsupportedMediaError" in df.loc[3, "error"]
    assert df.loc[4, "container"] == "unknown" and df.loc[4, "error"] is not None
    assert (df["n_bytes"] == [len(p) for p in payloads]).all()
