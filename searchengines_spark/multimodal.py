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


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: synthesize a deterministic binary payload column from
    text (the driver test tables carry no media)."""
    return docs.select(
        F.col("doc_id").alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )
