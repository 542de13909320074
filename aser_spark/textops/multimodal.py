"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extract/resize/frame-sample as Arrow-batched pandas
UDF stages.

The actual image/audio codecs are NOT available in this container, so the
decode kernels are explicitly stubbed (deterministic fake features, or
NotImplementedError when strict) — but everything Spark-side is real and
tested: schemas, batch shapes, partitioning, and the mapInPandas plumbing
that a real decoder would drop into (swap `_fake_decode` for PIL/torchcodec
inside the same iterator).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), False),    # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload_sha1", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), False),
])

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for testing
    the plumbing end-to-end without codecs."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
                meta = {
                    "width": 64 + i % 512 if kind != "audio" else None,
                    "height": 64 + (i * 7) % 512 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 1 + i % 300 if kind == "video" else None,
                    "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str):
    """STUB decode: deterministic pseudo-features from the payload digest.
    A real deployment replaces this one function with PIL/librosa/ffmpeg
    calls — the surrounding Spark plumbing is unchanged."""
    d = hashlib.sha1(payload).digest()
    return [((d[i % len(d)] / 255.0) - 0.5) for i in range(FEATURE_DIM)]


def extract_media_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode + featurize.  ``strict=True`` raises
    NotImplementedError, documenting that real codecs are not present."""
    import pandas as pd

    def run(batches):
        if strict:
            raise NotImplementedError(
                "media codecs (PIL/librosa/ffmpeg) are not available in this "
                "environment; use strict=False for the deterministic stub")
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                out.append((
                    int(mid), kind,
                    hashlib.sha1(payload).hexdigest(), len(payload),
                    _fake_decode(payload, kind),
                ))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload_sha1", "n_bytes", "features"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices JVM-side
    (the decode of each sampled frame would run in extract_media_features)."""
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.col("meta.n_frames").alias("n_frames"))
        .select("media_id",
                F.explode(F.sequence(F.lit(0),
                                     F.col("n_frames") - 1,
                                     F.lit(every_n))).alias("frame_idx"))
    )
