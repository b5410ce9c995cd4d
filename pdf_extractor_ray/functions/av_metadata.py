"""Header-level metadata parsers for compressed audio/video: MP3 and
H.264 Annex-B.

VERDICT r4 named lossy AV codecs the last media boundary: crawl-scale
media columns carrying MP3 / H.264 payloads were sniff-and-skip
(``UnsupportedMediaError``). Full entropy decode genuinely needs
ffmpeg-class code and stays out of scope — but the metadata a curation
pipeline actually filters on (duration, bitrate, sample rate, width /
height, profile, frame counts) lives entirely in public-spec HEADERS:

- MP3 (ISO/IEC 11172-3 audio, +MPEG-2/2.5 LSF extensions): walk the
  frame-header chain — 11-bit sync, version / layer / bitrate-index /
  samplerate-index / padding fields, computed frame lengths — over an
  optional ID3v2 prefix and ID3v1 tail. CBR/VBR detection, exact frame
  count, duration from samples-per-frame. The frame PAYLOAD (Huffman
  main data) is never touched.
- H.264 (ITU-T H.264 §7.3.2.1.1): split the Annex-B start-code stream
  into NAL units, strip emulation-prevention bytes, Exp-Golomb-parse
  the SPS for profile / level / coded dimensions incl. frame cropping
  (the conformance-window arithmetic for non-multiple-of-16 sizes),
  and count slice / IDR NALs. Slice MACROBLOCK data is never touched.

Anything outside these layouts raises ``UnsupportedMediaError`` — the
same honest-boundary contract as the image/PCM codecs (CLAUDE.md).
Encoders exist so the fixture corpus carries real header chains: MP3
frames are spec-valid CBR headers over silent (zero) main data, and
the H.264 writer emits a bit-exact SPS/PPS plus opaque stub slice
NALs — the parsers read only what the writers make real, and the
docstrings say which bytes those are.

Reference parity: the reference repo has no media pipeline at all;
this module serves the LLM-data-pipeline brief's multimodal columns
(opaque binary + typed metadata).
"""

from __future__ import annotations

import struct

from pdf_extractor_ray.functions.media_codec import UnsupportedMediaError

__all__ = [
    "mp3_metadata",
    "encode_mp3",
    "h264_metadata",
    "encode_h264",
]


# ---------------------------------------------------------------------------
# MP3 (ISO/IEC 11172-3 + MPEG-2/2.5 lower-sampling-frequency extension)
# ---------------------------------------------------------------------------

# Bitrate tables in kbps, indexed [version-class][layer][bitrate_index].
# Index 0 is "free format" (unsupported here), 15 is forbidden.
_BR_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BR_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SR = {  # version bits -> sample-rate table (index 3 reserved)
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}
_VERSION_NAME = {3: "mpeg1", 2: "mpeg2", 0: "mpeg2.5"}
_CHANNEL_MODE = ("stereo", "joint_stereo", "dual_channel", "mono")


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if absent)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    # syncsafe 28-bit size, excludes the 10-byte header itself
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        raise UnsupportedMediaError("ID3v2 size bytes not syncsafe")
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    if payload[5] & 0x10:  # footer-present flag adds 10 more bytes
        size += 10
    return 10 + size


def _parse_frame_header(hdr: int) -> tuple[int, int, int, int, int, str]:
    """(frame_bytes, samples_per_frame, sample_rate, bitrate_kbps,
    version_bits, channel_mode) for one 32-bit frame header."""
    if hdr >> 21 != 0x7FF:
        raise UnsupportedMediaError("MP3 frame sync lost")
    version = (hdr >> 19) & 3
    if version == 1:
        raise UnsupportedMediaError("reserved MPEG version bits")
    layer_bits = (hdr >> 17) & 3
    if layer_bits == 0:
        raise UnsupportedMediaError("reserved MPEG layer bits")
    layer = 4 - layer_bits  # bits 3/2/1 -> Layer I/II/III
    br_idx = (hdr >> 12) & 0xF
    if br_idx == 0:
        raise UnsupportedMediaError("free-format MP3 bitrate unsupported")
    if br_idx == 15:
        raise UnsupportedMediaError("forbidden MP3 bitrate index")
    sr_idx = (hdr >> 10) & 3
    if sr_idx == 3:
        raise UnsupportedMediaError("reserved MP3 sample-rate index")
    padding = (hdr >> 9) & 1
    mode = _CHANNEL_MODE[(hdr >> 6) & 3]
    table = _BR_V1 if version == 3 else _BR_V2
    bitrate = table[layer][br_idx]
    rate = _SR[version][sr_idx]
    if layer == 1:
        samples = 384
        nbytes = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 2:
        samples = 1152
        nbytes = 144 * bitrate * 1000 // rate + padding
    else:  # Layer III: MPEG-1 = 1152 samples/frame, LSF halves it
        samples = 1152 if version == 3 else 576
        coeff = 144 if version == 3 else 72
        nbytes = coeff * bitrate * 1000 // rate + padding
    return nbytes, samples, rate, bitrate, version, mode


def mp3_metadata(payload: bytes) -> dict:
    """Walk every MPEG audio frame header in `payload` and return
    {container, version, layer, sample_rate, channel_mode, n_frames,
    duration_s, bitrate_kbps, vbr, n_bytes}. ``bitrate_kbps`` is the
    frame-length-weighted mean (equals the CBR rate when not VBR).
    Strict: the stream must start at a frame (after any ID3v2 tag),
    every frame must be complete, and only an ID3v1 ``TAG`` block may
    trail — anything else raises UnsupportedMediaError."""
    pos = _id3v2_size(payload)
    end = len(payload)
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 tail
    if end - pos < 4:
        raise UnsupportedMediaError("no MP3 frame data")
    n_frames = 0
    total_samples = 0
    total_payload = 0
    rate = version = None
    layer_out = mode_out = None
    rates_seen: set[int] = set()
    while pos < end:
        if end - pos < 4:
            raise UnsupportedMediaError("trailing bytes after last MP3 frame")
        hdr = struct.unpack(">I", payload[pos : pos + 4])[0]
        nbytes, samples, rate_f, bitrate, version_f, mode = _parse_frame_header(hdr)
        if pos + nbytes > end:
            raise UnsupportedMediaError("truncated MP3 frame")
        if rate is None:
            rate, version, layer_out, mode_out = rate_f, version_f, 4 - ((hdr >> 17) & 3), mode
        elif rate_f != rate or version_f != version:
            raise UnsupportedMediaError("MP3 sample rate / version changes mid-stream")
        rates_seen.add(bitrate)
        n_frames += 1
        total_samples += samples
        total_payload += nbytes
        pos += nbytes
    assert rate is not None
    duration = total_samples / rate
    return {
        "container": "mp3",
        "version": _VERSION_NAME[version],
        "layer": layer_out,
        "sample_rate": rate,
        "channel_mode": mode_out,
        "n_frames": n_frames,
        "duration_s": duration,
        # weighted mean over frame bytes, exact integer math, rounded
        # half-up so a padded CBR chain reports its nominal rate
        "bitrate_kbps": (total_payload * 8 * rate + total_samples * 500) // (total_samples * 1000),
        "vbr": len(rates_seen) > 1,
        "n_bytes": len(payload),
    }


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3_title: bytes | None = None,
) -> bytes:
    """Spec-valid MPEG-1/2/2.5 Layer III CBR frame chain with SILENT
    (all-zero) main data — every header field, frame length and the
    optional ID3v2 prefix are real per ISO 11172-3 / the LSF extension;
    the Huffman payload bytes are zeros, which `mp3_metadata` (and any
    header walker) never reads. Fixture writer only, not an encoder of
    audio."""
    for version, srs in _SR.items():
        if sample_rate in srs:
            sr_idx = srs.index(sample_rate)
            break
    else:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    table = (_BR_V1 if version == 3 else _BR_V2)[3]
    if bitrate_kbps not in table:
        raise ValueError(f"unsupported Layer III bitrate {bitrate_kbps} for this version")
    br_idx = table.index(bitrate_kbps)
    coeff = 144 if version == 3 else 72
    out = bytearray()
    if id3_title is not None:
        frame = b"TIT2" + struct.pack(">I", len(id3_title) + 1) + b"\x00\x00\x00" + id3_title
        body = frame + b"\x00" * 16  # padding, still inside the tag size
        size = len(body)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + syncsafe + body
    mode_bits = 3 if mono else 0
    # real CBR encoders pad a frame whenever the fractional byte debt
    # of frame_len = coeff*br*1000/rate reaches one byte; the integer
    # accumulator below reproduces that exact cadence deterministically
    num = coeff * bitrate_kbps * 1000
    base = num // sample_rate
    rem = num % sample_rate
    for i in range(n_frames):
        padding = (i + 1) * rem // sample_rate - i * rem // sample_rate
        hdr = (
            (0x7FF << 21)
            | (version << 19)
            | (1 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (int(padding) << 9)
            | (mode_bits << 6)
        )
        nbytes = base + int(padding)
        out += struct.pack(">I", hdr) + b"\x00" * (nbytes - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# H.264 Annex-B (ITU-T H.264: NAL syntax §7.3.1, SPS §7.3.2.1.1)
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb (§9.1)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise UnsupportedMediaError("SPS bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise UnsupportedMediaError("Exp-Golomb code too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def rbsp(self) -> bytes:
        """Close with the rbsp_stop_one_bit + alignment zeros (§7.4.1)."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _ep_strip(data: bytes) -> bytes:
    """Remove emulation-prevention bytes: 00 00 03 -> 00 00 (§7.4.1.1)."""
    out = bytearray()
    i = 0
    while i < len(data):
        if i + 2 < len(data) and data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _ep_insert(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def _parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved_zero_2bits
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # 4:2:0 default when the branch is absent
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise UnsupportedMediaError("SPS scaling matrices unsupported")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # conformance-window arithmetic (§7.4.2.1.1 semantics)
    if chroma_format_idc == 0:
        cw, ch = 1, 2 - frame_mbs_only
    elif chroma_format_idc == 1:
        cw, ch = 2, 2 * (2 - frame_mbs_only)
    elif chroma_format_idc == 2:
        cw, ch = 2, 2 - frame_mbs_only
    else:
        cw, ch = 1, 2 - frame_mbs_only
    width = w_mbs * 16 - cw * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * h_map_units * 16 - ch * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "width": width,
        "height": height,
        "interlaced": not frame_mbs_only,
    }


def _annexb_nals(payload: bytes):
    """Yield (nal_type, body) for each Annex-B NAL (3/4-byte start codes)."""
    n = len(payload)
    i = payload.find(b"\x00\x00\x01")
    if i == -1 or i > 1 or (i == 1 and payload[0] != 0):
        raise UnsupportedMediaError("not an Annex-B H.264 stream")
    starts = []
    while i != -1:
        starts.append(i + 3)
        i = payload.find(b"\x00\x00\x01", i + 3)
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else n
        while e > s and payload[e - 1] == 0:  # trailing zeros of the next start code
            e -= 1
        if e <= s:
            raise UnsupportedMediaError("empty NAL unit")
        hdr = payload[s]
        if hdr & 0x80:
            raise UnsupportedMediaError("forbidden_zero_bit set in NAL header")
        yield hdr & 0x1F, payload[s + 1 : e]


def h264_metadata(payload: bytes) -> dict:
    """Parse an Annex-B H.264 stream's headers: SPS-derived profile /
    level / display dimensions and NAL-type counts. Slice payloads are
    counted, never decoded. Streams without an SPS, with scaling
    matrices, or with a malformed NAL layout raise
    UnsupportedMediaError."""
    sps = None
    n_nals = n_slices = n_idr = 0
    for nal_type, body in _annexb_nals(payload):
        n_nals += 1
        if nal_type == 7 and sps is None:
            sps = _parse_sps(_ep_strip(body))
        elif nal_type == 5:
            n_idr += 1
            n_slices += 1
        elif nal_type == 1:
            n_slices += 1
    if sps is None:
        raise UnsupportedMediaError("H.264 stream has no SPS")
    return {
        "container": "h264",
        **sps,
        "n_nals": n_nals,
        "n_slices": n_slices,
        "n_idr": n_idr,
        "n_bytes": len(payload),
    }


def encode_h264(
    width: int,
    height: int,
    n_frames: int = 4,
    idr_interval: int = 4,
    profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """Annex-B fixture stream: a BIT-EXACT Baseline/Main SPS (frame
    cropping handles non-multiple-of-16 dimensions) + a minimal PPS +
    `n_frames` slice NALs whose headers are real but whose macroblock
    payloads are opaque stub bytes — `h264_metadata` (and any header
    parser) reads only the NAL type byte of slices. Fixture writer
    only, not a video encoder."""
    if profile_idc in _HIGH_PROFILES:
        raise ValueError("fixture writer emits Baseline/Main/Extended SPS only")
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // 2  # cropUnitX = 2 for 4:2:0
    crop_b = (h_mbs * 16 - height) // 2  # cropUnitY = 2 (frame_mbs_only)
    if w_mbs * 16 - width != crop_r * 2 or h_mbs * 16 - height != crop_b * 2:
        raise ValueError("width/height must be even (4:2:0 crop units)")
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type -> needs log2_max_pic_order_cnt_lsb
    w.ue(0)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    sps = b"\x67" + _ep_insert(w.rbsp())  # nal_ref_idc=3, type 7
    p = _BitWriter()
    p.ue(0)  # pic_parameter_set_id
    p.ue(0)  # seq_parameter_set_id
    p.u(0, 1)  # entropy_coding_mode_flag (CAVLC)
    p.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    p.ue(0)  # num_slice_groups_minus1
    p.ue(0)  # num_ref_idx_l0_default_active_minus1
    p.ue(0)  # num_ref_idx_l1_default_active_minus1
    p.u(0, 1)  # weighted_pred_flag
    p.u(0, 2)  # weighted_bipred_idc
    p.ue(0)  # pic_init_qp_minus26 (ue of se(0) is the same single bit)
    p.ue(0)  # pic_init_qs_minus26
    p.ue(0)  # chroma_qp_index_offset
    p.u(0, 1)  # deblocking_filter_control_present_flag
    p.u(0, 1)  # constrained_intra_pred_flag
    p.u(0, 1)  # redundant_pic_cnt_present_flag
    pps = b"\x68" + _ep_insert(p.rbsp())
    out = bytearray(b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps)
    for f in range(n_frames):
        idr = f % idr_interval == 0
        nal_hdr = 0x65 if idr else 0x41  # ref_idc 3/2, type 5/1
        stub = bytes([(f * 37 + k) % 251 or 1 for k in range(6)])  # opaque, no 00-runs
        out += b"\x00\x00\x01" + bytes([nal_hdr]) + stub
    return bytes(out)
