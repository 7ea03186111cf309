"""Multimodal column plumbing: image/audio/video as opaque binary + typed metadata.

The Spark-side machinery — schema, Arrow batch shape, partition sizing, UDF
signatures — is real and tested; the codec inner step is STUBBED behind
`DecoderUnavailable` / a deterministic fake, because no image/audio libraries
ship in this container. Swapping `_fake_decode_image` for a PIL/libav call is a
one-function change; nothing else moves.

Pattern notes for 100 TB:
  * media rows are WIDE → keep Arrow batches small (maxRecordsPerBatch is set
    in session.py) and use mapInPandas (iterator form) so a task never holds
    more than one batch of decoded frames.
  * decode → feature-extract emits FIXED-SIZE vectors/metadata, so downstream
    stages shuffle features, never raw bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-codec path: media libraries are not installed here."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha8 string, "
    "feature array<float>, decode_status string"
)


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 32 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(content: bytes, width, height) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive a tiny 'pixel' grid
    from the payload bytes. Replace with PIL.Image.open(...) in production."""
    arr = np.frombuffer(content, dtype=np.uint8)
    size = 16
    reps = int(np.ceil(size * size / arr.size))
    return np.tile(arr, reps)[: size * size].reshape(size, size).astype(np.float32)


def real_decode_image(content: bytes):
    raise DecoderUnavailable("image codecs are not installed in this environment")


def extract_media_features(df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """mapInPandas decode → fixed-size feature vector (8 floats) + metadata.

    Iterator form: one Arrow batch in flight per task. Output never carries the
    raw bytes — only n_bytes, an 8-hex sha fingerprint, and the feature vector.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            feats, shas, nbytes, status = [], [], [], []
            for content, width, height in zip(b["content"], b["width"], b["height"]):
                raw = bytes(content) if content is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest()[:8])
                nbytes.append(len(raw))
                if use_real_codecs:
                    try:
                        real_decode_image(raw)
                    except DecoderUnavailable:
                        feats.append(None)
                        status.append("decoder_unavailable")
                        continue
                grid = _fake_decode_image(raw, width, height)
                # 8-dim feature: quadrant means + global stats (deterministic)
                h, w = grid.shape
                q = [
                    grid[: h // 2, : w // 2].mean(),
                    grid[: h // 2, w // 2 :].mean(),
                    grid[h // 2 :, : w // 2].mean(),
                    grid[h // 2 :, w // 2 :].mean(),
                    grid.mean(),
                    grid.std(),
                    grid.min(),
                    grid.max(),
                ]
                feats.append([float(x) for x in q])
                status.append("ok_fake")
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": nbytes,
                    "sha8": shas,
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing: explode a frame-timestamp grid per video row.

    The actual frame grab is the stubbed decode step; the grid (which frames a
    real sampler would pull) is computed natively from duration_ms.
    """
    frames = F.sequence(
        F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("media_id", "frame_ms")
    )
