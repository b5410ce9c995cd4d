"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque `binary` columns with typed metadata; decode /
resize / frame-sample are actor-pool map_batches stages. The actual
codec work needs libraries absent from this container (PIL/ffmpeg),
so the decode kernel is STUBBED (deterministic fake measured from the
byte stream) behind `_decode_image_real`, which raises
NotImplementedError — the Ray-side plumbing (schema, batch sizing for
multi-MB blobs, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

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


def _decode_image_real(payload: bytes):  # pragma: no cover
    raise NotImplementedError("image decode requires PIL/opencv (not in this container)")


def _sniff_format(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
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
    batch_size x concurrency x blob must fit the worker heap. Use
    `use_real_codec=True` once PIL is available."""

    def __init__(self, feat_dim: int = 64, use_real_codec: bool = False) -> None:
        self.feat_dim = feat_dim
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("n_bytes", "format", "width", "height", "feature", "error")}
        for p in payloads:
            p = p or b""
            try:
                if self.use_real_codec:
                    w, h, feat = _decode_image_real(p)
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
    ds: ray.data.Dataset, feat_dim: int = 64, concurrency: int = 4, batch_size: int = 8
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"feat_dim": feat_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: blobs are big
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan for video payloads (the Ray
    side of a frame-sample stage; decoding itself is stubbed)."""
    return list(range(0, n_frames, max(1, every)))


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


def _decode_audio_real(payload: bytes):  # pragma: no cover
    raise NotImplementedError("audio decode requires soundfile/ffmpeg (not in this container)")


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

    def __init__(self, feat_dim: int = 64, use_real_codec: bool = False) -> None:
        self.feat_dim = feat_dim
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("n_bytes", "format", "sample_rate", "duration_s", "n_windows", "feature", "error")}
        for p in payloads:
            p = p or b""
            rows["n_bytes"].append(len(p))
            rows["format"].append(_sniff_audio_format(p))
            try:
                if self.use_real_codec:
                    rate, dur, nw, feat = _decode_audio_real(p)
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
    ds: ray.data.Dataset, feat_dim: int = 64, concurrency: int = 4, batch_size: int = 8
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"feat_dim": feat_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )
