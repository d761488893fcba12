"""Multimodal column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The real decoders (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is a clearly-marked STUB (``decode_image`` raises
NotImplementedError unless ``fake=True``); everything Spark-side — schema,
partition sizing, UDF signature, batch shape, deterministic fake features —
is real and tested. On a cluster you swap ``_fake_decode`` for the library
call; the plan does not change.

Design for 100 TB of media: binaries stay in parquet/Iceberg blob columns;
``spark.sql.files.maxPartitionBytes`` bounds scan-task memory; the feature
kernels are stateless mapInPandas (no shuffle) so media never moves between
executors — only the small typed metadata/features do.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, np.ndarray]:
    """STUB: real image decode needs PIL/libjpeg (not in this container).
    fake=True runs a deterministic stand-in: 'width'/'height' from the first
    two payload bytes, 'pixels' from a seeded hash stream — stable across
    machines, good enough to exercise the full Spark pipeline."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg; run with fake=True in this "
            "container, swap in the real decoder on a cluster"
        )
    if len(payload) < 2:
        return 0, 0, np.zeros((0,), dtype=np.float32)
    w, h = (payload[0] % 32) + 1, (payload[1] % 32) + 1
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return w, h, rng.random(w * h, dtype=np.float32)


def image_features(df: DataFrame, id_col: str = "id", payload_col: str = "payload",
                   fake: bool = True, feat_dim: int = 8) -> DataFrame:
    """(id, payload:binary) -> typed metadata + pooled feature vector.
    Stateless mapInPandas: media bytes never shuffle."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p) if p is not None else b""
                sha = hashlib.sha256(b).hexdigest()[:16]
                try:
                    w, h, px = decode_image(b, fake=fake)
                    # mean-pool into feat_dim buckets (the "resize" stand-in)
                    if px.size:
                        pad = (-px.size) % feat_dim
                        pooled = np.pad(px, (0, pad)).reshape(feat_dim, -1).mean(axis=1)
                        feat = [float(x) for x in pooled]
                    else:
                        feat = None
                    rows.append((int(i), len(b), sha, w, h, feat))
                except NotImplementedError:
                    rows.append((int(i), len(b), sha, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.mapInPandas(kernel, IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("frame_no", T.IntegerType(), False),
    T.StructField("frame_sha", T.StringType(), False),
])


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                  id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Video frame-sampling stand-in: one 'frame' per every_n_bytes chunk
    (real impl: ffmpeg keyframe extraction; same explode shape)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p) if p is not None else b""
                for fno in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    chunk = b[fno * every_n_bytes:(fno + 1) * every_n_bytes]
                    rows.append((int(i), fno, hashlib.sha256(chunk).hexdigest()[:12]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(kernel, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("src_w", T.IntegerType(), True),
    T.StructField("src_h", T.IntegerType(), True),
    T.StructField("pixels", T.ArrayType(T.FloatType()), True),
])


def _axis_bounds(src: int, out: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-target-cell [start, end) source-pixel ranges along one axis.
    start = ceil(t*src/out) (integer arithmetic) reproduces the scatter
    partition floor(y*out/src) == t exactly; empty upscale cells are widened
    to the single covering source pixel."""
    t = np.arange(out, dtype=np.int64)
    s = -((-t * src) // out)
    e = -((-(t + 1) * src) // out)
    s = np.minimum(s, src - 1)
    e = np.clip(e, s + 1, src)
    return s, e


def resize_image(df: DataFrame, out_w: int = 4, out_h: int = 4,
                 id_col: str = "id", payload_col: str = "payload",
                 fake: bool = True) -> DataFrame:
    """Decode + area-mean resize to a fixed (out_h, out_w) pixel grid — the
    canonical training-data normalization step (real impl: PIL
    ``Image.resize``; the decode is the only stubbed piece, the resampling
    math and the Spark shape are the production ones). Output pixels is a
    row-major out_h*out_w float array; None for empty/undecodable payloads.
    Stateless mapInPandas — media bytes never shuffle."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p) if p is not None else b""
                try:
                    w, h, px = decode_image(b, fake=fake)
                except NotImplementedError:
                    rows.append((int(i), None, None, None))
                    continue
                if px.size == 0:
                    rows.append((int(i), w, h, None))
                    continue
                img = px.reshape(h, w).astype(np.float64)
                # area-mean resampling, gather form: target cell (ty, tx)
                # averages the source pixels y with floor(y*out_h/h) == ty,
                # i.e. y in [ceil(ty*h/out_h), ceil((ty+1)*h/out_h)) — the
                # exact same partition as the scatter form for downscales
                # (exact box filter at integer ratios). When UPSCALING
                # (out > src) some cells own no source pixel; they take the
                # covering source pixel (replication) instead of silently
                # becoming 0.0. Box sums via an integral image, fully
                # vectorized.
                ys, ye = _axis_bounds(h, out_h)
                xs, xe = _axis_bounds(w, out_w)
                I = np.zeros((h + 1, w + 1))
                I[1:, 1:] = img.cumsum(0).cumsum(1)
                sums = (I[ye[:, None], xe[None, :]] - I[ys[:, None], xe[None, :]]
                        - I[ye[:, None], xs[None, :]] + I[ys[:, None], xs[None, :]])
                out = sums / ((ye - ys)[:, None] * (xe - xs)[None, :])
                rows.append((int(i), w, h, [float(x) for x in out.ravel()]))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(kernel, RESIZED_SCHEMA)


def decode_audio(payload: bytes, fake: bool = False) -> tuple[int, np.ndarray]:
    """STUB: real audio decode needs ffmpeg/torchaudio (not in this
    container). fake=True: deterministic stand-in waveform — sample rate
    from the first byte, samples from a seeded hash stream in [-1, 1)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires ffmpeg/torchaudio; run with fake=True in "
            "this container, swap in the real decoder on a cluster"
        )
    if not payload:
        return 0, np.zeros((0,), dtype=np.float32)
    sr = 8000 * ((payload[0] % 3) + 1)  # 8/16/24 kHz
    n = min(4096, max(64, len(payload) * 16))
    seed = int.from_bytes(hashlib.md5(b"audio" + payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return sr, (rng.random(n, dtype=np.float32) * 2.0 - 1.0)


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_s", T.FloatType(), True),
    T.StructField("rms", T.ArrayType(T.FloatType()), True),
    T.StructField("zero_cross_rate", T.FloatType(), True),
])


def audio_features(df: DataFrame, n_windows: int = 8,
                   id_col: str = "id", payload_col: str = "payload",
                   fake: bool = True) -> DataFrame:
    """(id, payload) -> typed audio metadata + windowed RMS energy + global
    zero-crossing rate (the standard cheap audio-quality signals). Decode is
    the stub; the feature math is the production one. Stateless
    mapInPandas."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p) if p is not None else b""
                try:
                    sr, wav = decode_audio(b, fake=fake)
                except NotImplementedError:
                    rows.append((int(i), len(b), None, None, None, None))
                    continue
                if wav.size == 0 or sr == 0:
                    rows.append((int(i), len(b), None, None, None, None))
                    continue
                pad = (-wav.size) % n_windows
                w2 = np.pad(wav, (0, pad)).reshape(n_windows, -1)
                rms = np.sqrt((w2.astype(np.float64) ** 2).mean(axis=1))
                zcr = float((np.signbit(wav[1:]) != np.signbit(wav[:-1])).mean())
                rows.append((int(i), len(b), int(sr),
                             float(wav.size / sr),
                             [float(x) for x in rms], zcr))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return df.mapInPandas(kernel, AUDIO_META_SCHEMA)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: synthesize a deterministic binary payload column from
    text (the driver test tables carry no media)."""
    return docs.select(
        F.col("doc_id").alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )
