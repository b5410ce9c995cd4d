"""Multimodal (image/audio/video) column operators.

Payloads are opaque `binary` columns with typed metadata; decode /
feature-extract / resize / perceptual-hash are actor-pool map_batches
stages. Decode is REAL for the pure-python codec subset (PNG / BMP /
GIF / baseline+progressive JPEG / WAV / uncompressed AVI —
functions/media_codec.py, jpeg_codec.py); for lossy formats (MP3,
H.264) the `av_metadata` stage parses spec HEADERS only (duration /
bitrate / dimensions / profile — functions/av_metadata.py) while full
entropy decode stays out of scope and surfaces
`UnsupportedMediaError` in the per-row error column — the honest
capability boundary. The
deterministic fake decoder remains available as codec="fake" for
plumbing tests and as the documented stand-in for formats outside the
subset.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_extractor_ray.functions import media_codec as mc
from pdf_extractor_ray.stages.pools import clamp_pool

IMAGE_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("error", pa.string()),
    ]
)


def _decode_image_real(payload: bytes, feat_dim: int) -> tuple[int, int, np.ndarray]:
    """Real decode + real feature (PNG/BMP via media_codec; raises
    UnsupportedMediaError for formats needing PIL)."""
    img = mc.decode_image(payload)
    return img.shape[1], img.shape[0], mc.image_feature(img, feat_dim)


def _sniff_format(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for decode+feature-extract: dims and a
    unit feature vector derived from the byte stream digest."""
    digest = hashlib.sha256(payload).digest()
    w = 64 + digest[0] * 4
    h = 64 + digest[1] * 4
    raw = np.frombuffer(
        hashlib.sha512(payload).digest() * ((feat_dim * 4) // 64 + 1), dtype=np.uint8
    )[: feat_dim * 4]
    v = raw.view(np.uint32).astype(np.float32)
    n = np.linalg.norm(v)
    return w, h, v / (n if n else 1.0)


class ImageFeaturizer:
    """Actor-pool stage for image decode + feature extraction.

    Small batch_size is mandatory: rows carry multi-MB blobs, so
    batch_size x concurrency x blob must fit the worker heap.

    codec="real" (default): PNG/BMP decode + tiny-image embedding
    (media_codec.py); unsupported formats land in the error column.
    codec="fake": the deterministic byte-digest stand-in (plumbing
    tests / formats outside the pure-python subset)."""

    def __init__(self, feat_dim: int = 64, codec: str = "real") -> None:
        self.feat_dim = feat_dim
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("n_bytes", "format", "width", "height", "feature", "error")}
        for p in payloads:
            p = p or b""
            try:
                if self.codec == "real":
                    w, h, feat = _decode_image_real(p, self.feat_dim)
                else:
                    w, h, feat = _fake_decode(p, self.feat_dim)
                rows["n_bytes"].append(len(p))
                rows["format"].append(_sniff_format(p))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feature"].append(feat.tolist())
                rows["error"].append(None)
            except Exception as exc:
                rows["n_bytes"].append(len(p))
                rows["format"].append(_sniff_format(p))
                rows["width"].append(0)
                rows["height"].append(0)
                rows["feature"].append([0.0] * self.feat_dim)
                rows["error"].append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(rows["n_bytes"], pa.int64()),
                pa.array(rows["format"], pa.string()),
                pa.array(rows["width"], pa.int32()),
                pa.array(rows["height"], pa.int32()),
                pa.array(rows["feature"], pa.list_(pa.float32())),
                pa.array(rows["error"], pa.string()),
            ],
            schema=IMAGE_META_SCHEMA,
        )


def featurize_images(
    ds: ray.data.Dataset,
    feat_dim: int = 64,
    concurrency: int = 4,
    batch_size: int = 8,
    codec: str = "real",
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"feat_dim": feat_dim, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: blobs are big
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )


RESIZED_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),  # re-encoded PNG
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("error", pa.string()),
    ]
)


class ImageResizer:
    """Actor-pool resize stage: decode (PNG/BMP) -> nearest-neighbor
    resize -> re-encode PNG. Real pixels end to end."""

    def __init__(self, width: int, height: int) -> None:
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_p, out_e = [], []
        for p in payloads:
            try:
                img = mc.resize_nearest(mc.decode_image(p or b""), self.width, self.height)
                out_p.append(mc.encode_png(img))
                out_e.append(None)
            except Exception as exc:
                out_p.append(b"")
                out_e.append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(out_p, pa.binary()),
                pa.array([self.width] * len(ids), pa.int32()),
                pa.array([self.height] * len(ids), pa.int32()),
                pa.array(out_e, pa.string()),
            ],
            schema=RESIZED_SCHEMA,
        )


def resize_images(
    ds: ray.data.Dataset, width: int, height: int, concurrency: int = 4, batch_size: int = 8
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),
    )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan for video payloads."""
    return list(range(0, n_frames, max(1, every)))


VIDEO_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("n_sampled", pa.int32()),
        ("fps", pa.float32()),
        ("feature", pa.list_(pa.float32())),
        ("error", pa.string()),
    ]
)


class VideoFeaturizer:
    """Actor-pool video decode + frame-sample + featurize stage. REAL
    for uncompressed AVI (functions/media_codec.decode_avi — only the
    planned frames are decoded, the rest of the byte stream is never
    touched); compressed containers surface UnsupportedMediaError in
    the error column. The per-video feature is the mean of the sampled
    frames' tiny-image embeddings, re-normalized."""

    def __init__(self, feat_dim: int = 64, every: int = 4) -> None:
        self.feat_dim = feat_dim
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("n_bytes", "format", "width", "height", "n_frames", "n_sampled", "fps", "feature", "error")}
        for p in payloads:
            p = p or b""
            rows["n_bytes"].append(len(p))
            is_avi = p[:4] == b"RIFF" and p[8:12] == b"AVI "
            rows["format"].append("avi" if is_avi else "unknown")
            try:
                # cheap metadata pass to size the sampling plan
                _, fps, total = mc.decode_avi(p, frame_indices=[])
                plan = frame_sample_plan(total, self.every)
                frames, _, _ = mc.decode_avi(p, frame_indices=plan)
                feats = np.stack([mc.image_feature(f, self.feat_dim) for f in frames])
                v = feats.mean(axis=0)
                n = float(np.linalg.norm(v))
                rows["width"].append(frames[0].shape[1])
                rows["height"].append(frames[0].shape[0])
                rows["n_frames"].append(total)
                rows["n_sampled"].append(len(frames))
                rows["fps"].append(fps)
                rows["feature"].append((v / (n if n else 1.0)).tolist())
                rows["error"].append(None)
            except Exception as exc:
                rows["width"].append(0)
                rows["height"].append(0)
                rows["n_frames"].append(0)
                rows["n_sampled"].append(0)
                rows["fps"].append(0.0)
                rows["feature"].append([0.0] * self.feat_dim)
                rows["error"].append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(rows["n_bytes"], pa.int64()),
                pa.array(rows["format"], pa.string()),
                pa.array(rows["width"], pa.int32()),
                pa.array(rows["height"], pa.int32()),
                pa.array(rows["n_frames"], pa.int32()),
                pa.array(rows["n_sampled"], pa.int32()),
                pa.array(rows["fps"], pa.float32()),
                pa.array(rows["feature"], pa.list_(pa.float32())),
                pa.array(rows["error"], pa.string()),
            ],
            schema=VIDEO_META_SCHEMA,
        )


def featurize_videos(
    ds: ray.data.Dataset,
    feat_dim: int = 64,
    every: int = 4,
    concurrency: int = 4,
    batch_size: int = 4,
) -> ray.data.Dataset:
    return ds.map_batches(
        VideoFeaturizer,
        fn_constructor_kwargs={"feat_dim": feat_dim, "every": every},
        batch_format="pyarrow",
        batch_size=batch_size,  # video blobs are the biggest payloads
        concurrency=clamp_pool(concurrency),
    )


AUDIO_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("format", pa.string()),
        ("sample_rate", pa.int32()),
        ("duration_s", pa.float32()),
        ("n_windows", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("error", pa.string()),
    ]
)


def _decode_audio_real(payload: bytes, feat_dim: int) -> tuple[int, float, int, np.ndarray]:
    """Real decode + real windowed features (WAV PCM via media_codec;
    raises UnsupportedMediaError for formats needing ffmpeg)."""
    samples, rate = mc.decode_audio(payload)
    n_windows, feat = mc.audio_feature(samples, feat_dim)
    return rate, len(samples) / float(rate), n_windows, feat


def _sniff_audio_format(payload: bytes) -> str:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    return "unknown"


def _fake_audio_decode(payload: bytes, feat_dim: int) -> tuple[int, float, int, np.ndarray]:
    """Deterministic stand-in for decode + windowed feature extraction
    (e.g. log-mel over 25ms windows): sample rate / duration / window
    count and a unit feature vector derived from the byte digest."""
    digest = hashlib.sha256(payload).digest()
    rate = (8, 16, 22, 44)[digest[0] % 4] * 1000
    duration = 0.5 + (int.from_bytes(digest[1:3], "big") % 600) / 10.0
    n_windows = int(duration / 0.025)
    raw = np.frombuffer(
        hashlib.sha512(b"audio" + payload).digest() * ((feat_dim * 4) // 64 + 1), dtype=np.uint8
    )[: feat_dim * 4]
    v = raw.view(np.uint32).astype(np.float32)
    norm = np.linalg.norm(v)
    return rate, duration, n_windows, v / (norm if norm else 1.0)


class AudioFeaturizer:
    """Actor-pool stage for audio decode + windowed feature extraction.
    Same contract as ImageFeaturizer: small batches (multi-MB blobs),
    never raises — per-row `error` column instead."""

    def __init__(self, feat_dim: int = 64, codec: str = "real") -> None:
        self.feat_dim = feat_dim
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("n_bytes", "format", "sample_rate", "duration_s", "n_windows", "feature", "error")}
        for p in payloads:
            p = p or b""
            rows["n_bytes"].append(len(p))
            rows["format"].append(_sniff_audio_format(p))
            try:
                if self.codec == "real":
                    rate, dur, nw, feat = _decode_audio_real(p, self.feat_dim)
                else:
                    rate, dur, nw, feat = _fake_audio_decode(p, self.feat_dim)
                rows["sample_rate"].append(rate)
                rows["duration_s"].append(dur)
                rows["n_windows"].append(nw)
                rows["feature"].append(feat.tolist())
                rows["error"].append(None)
            except Exception as exc:
                rows["sample_rate"].append(0)
                rows["duration_s"].append(0.0)
                rows["n_windows"].append(0)
                rows["feature"].append([0.0] * self.feat_dim)
                rows["error"].append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(rows["n_bytes"], pa.int64()),
                pa.array(rows["format"], pa.string()),
                pa.array(rows["sample_rate"], pa.int32()),
                pa.array(rows["duration_s"], pa.float32()),
                pa.array(rows["n_windows"], pa.int32()),
                pa.array(rows["feature"], pa.list_(pa.float32())),
                pa.array(rows["error"], pa.string()),
            ],
            schema=AUDIO_META_SCHEMA,
        )


def featurize_audio(
    ds: ray.data.Dataset,
    feat_dim: int = 64,
    concurrency: int = 4,
    batch_size: int = 8,
    codec: str = "real",
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"feat_dim": feat_dim, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )

# ---------------------------------------------------------------------------
# Perceptual-hash image near-dedup (the LAION-style image dedup stage:
# decode -> 64-bit average hash -> hamming-bucketed pair search)
# ---------------------------------------------------------------------------

AHASH_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("format", pa.string()),
        ("ahash", pa.uint64()),
        ("error", pa.string()),
    ]
)


def average_hash(img: np.ndarray) -> int:
    """64-bit aHash (the classic average perceptual hash): BT.601 luma
    -> 8x8 block means (index binning, any input dims) -> threshold at
    the 64-cell mean; bit r*8+c set when cell (r, c) is brighter than
    the mean. Deterministic; images smaller than 8 px in a dimension
    leave their empty cells at the mean (bit 0)."""
    g = (
        img[..., 0].astype(np.float64) * 0.299
        + img[..., 1].astype(np.float64) * 0.587
        + img[..., 2].astype(np.float64) * 0.114
    )
    h, w = g.shape
    ri = (np.arange(h) * 8) // h
    ci = (np.arange(w) * 8) // w
    idx = (ri[:, None] * 8 + ci[None, :]).ravel()
    sums = np.bincount(idx, weights=g.ravel(), minlength=64)
    cnts = np.bincount(idx, minlength=64)
    cells = np.divide(sums, cnts, out=np.zeros(64), where=cnts > 0)
    mean = cells[cnts > 0].mean() if (cnts > 0).any() else 0.0
    cells[cnts == 0] = mean  # empty cell -> bit 0 (strict >)
    bits = (cells > mean).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


class ImageAHasher:
    """Actor-pool stage: decode -> average_hash. Error rows carry
    ahash 0 and a non-null error (exclude them before pairing — a
    shared sentinel hash would bucket all failures together)."""

    def __init__(self, codec: str = "real") -> None:
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        hashes, fmts, errs = [], [], []
        for p in payloads:
            p = p or b""
            fmts.append(_sniff_format(p))
            try:
                if self.codec == "real":
                    img = mc.decode_image(p)
                else:
                    digest = hashlib.sha256(p).digest()
                    img = np.frombuffer((digest * 12)[: 8 * 8 * 3], dtype=np.uint8).reshape(
                        8, 8, 3
                    )
                hashes.append(average_hash(img))
                errs.append(None)
            except Exception as exc:
                hashes.append(0)
                errs.append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(fmts, pa.string()),
                pa.array(hashes, pa.uint64()),
                pa.array(errs, pa.string()),
            ],
            schema=AHASH_SCHEMA,
        )


def image_ahashes(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 8, codec: str = "real"
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageAHasher,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: blobs are big
        concurrency=clamp_pool(concurrency),
    )


def image_neardup_pairs(
    media_ds: ray.data.Dataset, max_hamming: int = 3, codec: str = "real"
) -> ray.data.Dataset:
    """(a, b) media-id pairs whose aHashes are within max_hamming bits
    — the pigeonhole bucket/verify machinery shared with simhash text
    dedup (ops/dedup.hash64_pigeonhole_pairs). Decode-error rows are
    excluded before pairing."""
    from pdf_extractor_ray.ops.dedup import hash64_pigeonhole_pairs

    sigs = image_ahashes(media_ds, codec=codec).map_batches(
        lambda t: t.filter(pc.is_null(t.column("error"))), batch_format="pyarrow"
    )
    return hash64_pigeonhole_pairs(
        sigs, id_col="media_id", hash_col="ahash", max_hamming=max_hamming
    )


def image_dedup(
    media_ds: ray.data.Dataset, max_hamming: int = 3, codec: str = "real"
) -> ray.data.Dataset:
    """Drop the larger media_id of every verified near-dup pair via
    the shared distributed anti-join (never a driver-side set)."""
    from pdf_extractor_ray.ops.dedup import drop_larger_of_pairs

    pairs = image_neardup_pairs(media_ds, max_hamming=max_hamming, codec=codec)
    return drop_larger_of_pairs(media_ds, pairs, id_col="media_id")


# ---------------------------------------------------------------------------
# Compressed-AV header metadata (MP3 / H.264) — the curation-side view
# of lossy media columns: duration / bitrate / dimensions / profile
# WITHOUT entropy decode (functions/av_metadata.py walks only spec
# headers; payload bytes are never touched).
# ---------------------------------------------------------------------------

AV_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("container", pa.string()),
        # audio (MP3) fields — zero/empty for video rows
        ("mpeg_version", pa.string()),
        ("layer", pa.int32()),
        ("sample_rate", pa.int32()),
        ("channel_mode", pa.string()),
        ("n_frames", pa.int32()),
        ("duration_s", pa.float64()),
        ("bitrate_kbps", pa.int32()),
        ("vbr", pa.bool_()),
        # video (H.264) fields — zero for audio rows
        ("profile_idc", pa.int32()),
        ("level_idc", pa.int32()),
        ("chroma_format_idc", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("interlaced", pa.bool_()),
        ("n_nals", pa.int32()),
        ("n_slices", pa.int32()),
        ("n_idr", pa.int32()),
        ("error", pa.string()),
    ]
)

_AV_DEFAULTS = {
    "container": "unknown",
    "mpeg_version": "",
    "layer": 0,
    "sample_rate": 0,
    "channel_mode": "",
    "n_frames": 0,
    "duration_s": 0.0,
    "bitrate_kbps": 0,
    "vbr": False,
    "profile_idc": 0,
    "level_idc": 0,
    "chroma_format_idc": 0,
    "width": 0,
    "height": 0,
    "interlaced": False,
    "n_nals": 0,
    "n_slices": 0,
    "n_idr": 0,
    "error": None,
}


def _sniff_av(payload: bytes) -> str:
    """mp3 / h264 / unknown by leading bytes: ID3v2 or an 11-bit MPEG
    audio sync vs an Annex-B start code (00 00 01 / 00 00 00 01)."""
    if payload[:3] == b"\x00\x00\x01" or payload[:4] == b"\x00\x00\x00\x01":
        return "h264"
    if payload[:3] == b"ID3":
        return "mp3"
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        return "mp3"
    return "unknown"


def _av_meta_batch(batch: pa.Table) -> pa.Table:
    from pdf_extractor_ray.functions import av_metadata as av

    ids = batch.column("media_id").to_pylist()
    payloads = batch.column("payload").to_pylist()
    cols: dict[str, list] = {k: [] for k in _AV_DEFAULTS}
    for p in payloads:
        p = p or b""
        row = dict(_AV_DEFAULTS)
        kind = _sniff_av(p)
        try:
            if kind == "mp3":
                m = av.mp3_metadata(p)
                row.update(
                    container="mp3",
                    mpeg_version=m["version"],
                    layer=m["layer"],
                    sample_rate=m["sample_rate"],
                    channel_mode=m["channel_mode"],
                    n_frames=m["n_frames"],
                    duration_s=m["duration_s"],
                    bitrate_kbps=m["bitrate_kbps"],
                    vbr=m["vbr"],
                )
            elif kind == "h264":
                m = av.h264_metadata(p)
                row.update(
                    container="h264",
                    profile_idc=m["profile_idc"],
                    level_idc=m["level_idc"],
                    chroma_format_idc=m["chroma_format_idc"],
                    width=m["width"],
                    height=m["height"],
                    interlaced=m["interlaced"],
                    n_nals=m["n_nals"],
                    n_slices=m["n_slices"],
                    n_idr=m["n_idr"],
                )
            else:
                raise mc.UnsupportedMediaError("unknown AV container")
        except Exception as exc:
            row["container"] = kind
            row["error"] = f"{type(exc).__name__}: {exc}"[:200]
        for k, v in row.items():
            cols[k].append(v)
    arrays = [pa.array(ids, pa.int64()), pa.array([len(p or b"") for p in payloads], pa.int64())]
    for idx in range(2, len(AV_META_SCHEMA)):
        field = AV_META_SCHEMA.field(idx)
        arrays.append(pa.array(cols[field.name], field.type))
    return pa.Table.from_arrays(arrays, schema=AV_META_SCHEMA)


def av_metadata(ds: ray.data.Dataset, batch_size: int = 64) -> ray.data.Dataset:
    """Header-level metadata for compressed-AV binary columns (MP3
    frame chains, H.264 Annex-B): container, duration, bitrate,
    dimensions, profile, frame/NAL counts — per-row `error` column for
    anything outside the parsed layouts, never a raised batch.

    A TASK pool (plain function), not an actor pool: the header walk
    is stateless and orders of magnitude cheaper than entropy decode,
    so per-actor state would buy nothing; small batches keep
    blob x batch in the worker heap like the featurizer stages."""
    return ds.map_batches(_av_meta_batch, batch_format="pyarrow", batch_size=batch_size)
