"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` pipelines.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the content hash) produces stable
pseudo-features. Everything Spark-side — schema, batching, partitioning,
UDF signatures — is real and tested; swapping in a real codec is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    f"features array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array. STUB: no image libraries
    in this container — with ``fake=True`` returns a deterministic 8x8x3
    array seeded from the payload digest (stable across runs/partitions)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec (e.g. PIL); "
            "not available in this environment — pass fake=True for the "
            "deterministic test decoder"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(np.frombuffer(digest[:4], dtype=np.uint32)[0])
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real plumbing: Arrow batches in/out, schema-stable output, no driver
    collect. The per-payload "model" is the stubbed decoder + a fixed
    16-dim pooled feature."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(payload, fake=fake)
                pooled = img.reshape(-1, 3).mean(axis=0)
                digest = hashlib.sha256(payload or b"").digest() * 2
                extra = np.frombuffer(digest[: (FEATURE_DIM - 3) * 4], dtype=np.uint32)
                vec = np.concatenate([pooled, extra.astype("float64") % 997])
                feats.append([float(x) for x in vec[:FEATURE_DIM]])
            out["features"] = feats
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, _FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (pure plan — ``sequence`` + explode, JVM-side), with the
    frame payload left to the (stubbed) decoder stage."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                8 if kind == "image" else None,
                8 if kind == "image" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
