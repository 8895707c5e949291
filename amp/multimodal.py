"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The image/audio libraries are not in this container, so the *decode*
kernels are stubs (deterministic fake or NotImplementedError behind
AMP_FAKE_DECODE) — but the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, mapInPandas signatures, partition-size
control. On a real cluster only the kernel body changes (swap the fake
for PIL/libav calls); the plan shape is already the scalable one:
a single mapInPandas pass, no shuffle, binary payloads never leave
the executor that read them.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_allowed() -> bool:
    return os.environ.get("AMP_FAKE_DECODE", "1") == "1"


try:  # optional dependency: real image decode when Pillow is installed
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def _decode_image(payload: bytes, allow_fake: bool = True) -> np.ndarray:
    """Decode a payload to a normalized 8x8 float grayscale grid.

    Real path (when Pillow is importable): PIL open -> grayscale ->
    8x8 resize. Payloads that fail to parse fall back to the
    deterministic fake when allowed (a corrupt image must not kill a
    100-TB pass; the fake is a stable content-derived stand-in), else
    re-raise. Without Pillow: deterministic fake behind
    AMP_FAKE_DECODE, NotImplementedError otherwise."""
    if HAVE_PIL:
        import io as _io

        try:
            img = _PILImage.open(_io.BytesIO(payload or b"")).convert("L").resize((8, 8))
            return np.asarray(img, dtype=np.float32) / 255.0
        except Exception:
            if not allow_fake:
                raise
    if not allow_fake:
        raise NotImplementedError(
            "image decode requires PIL — not installed; "
            "set AMP_FAKE_DECODE=1 for the deterministic fake"
        )
    h = hashlib.sha256(payload or b"").digest()
    grid = np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)
    return grid.astype(np.float32) / 255.0


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Binary payload -> fixed-dim feature vector, one Arrow-batched
    mapInPandas pass. Column pruning matters here: only media_id+payload
    are read, so parquet never materializes other columns.

    The fake-decode flag is captured DRIVER-SIDE at plan-build time and
    shipped in the closure — executor python workers are reused across
    jobs, so reading os.environ inside the UDF would see stale state."""
    allow_fake = _fake_decode_allowed()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                grid = _decode_image(raw, allow_fake)
                # fake "feature extraction": row/col means, resized to feat_dim
                v = np.concatenate([grid.mean(axis=0), grid.mean(axis=1)])
                v = np.resize(v, feat_dim).astype(np.float32)
                feats.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha": shas,
                    "n_bytes": np.array(sizes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled timestamp.
    The decode is stubbed; the explode/row-multiplication shape (and its
    cost model: output rows = duration/interval) is the real thing."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 7 + 1)
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "width": 8 if kind == "image" else None,
                "height": 8 if kind == "image" else None,
                "duration_ms": 5000 + i * 100 if kind != "image" else None,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
