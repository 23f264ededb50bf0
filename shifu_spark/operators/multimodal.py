"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Design (BASELINE.json north star): media payloads travel as ``binary``
columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the Spark
plumbing (schema, partitioning, batch shape) is real even where codecs
aren't available in this container.

The decode kernels are STUBS: ``decode=deterministic_fake`` produces a
seeded, content-addressed fake decode (stable across runs — testable);
``decode=strict`` raises NotImplementedError where a real libjpeg/ffmpeg
binding would be called. The surrounding plan — partition sizing by
payload bytes, per-batch Arrow transfer, output schema — is production
shape.

At 100 TB: binary payloads dominate partition size, so `repartition` by
cumulative payload bytes (``target_partition_mb``) before the UDF keeps
Arrow batches bounded; metadata-only operations (filtering by width,
codec, duration) stay pure-column and never touch the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload", media_type: str = "image") -> DataFrame:
    """Derive the typed metadata struct from the binary column.

    Real width/height/duration need the decoder; here n_bytes/codec-sniff
    are real (magic bytes), the rest comes from the decode stage.
    """
    p = F.col(payload_col)
    codec = (
        F.when(F.substring(p, 1, 3) == bytes([0xFF, 0xD8, 0xFF]), "jpeg")
        .when(F.substring(p, 1, 4) == b"\x89PNG", "png")
        .when(F.substring(p, 1, 4) == b"RIFF", "wav")
        .otherwise("unknown")
    )
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        codec.alias("codec"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(p).cast("long").alias("n_bytes"),
    )
    return df.withColumn("media_meta", meta)


def repartition_by_payload(df: DataFrame, payload_col: str = "payload", target_partition_mb: int = 128) -> DataFrame:
    """Size partitions by payload bytes, not row count — media rows are
    wildly non-uniform; 1k rows of 4k thumbnails != 1k rows of 4k video."""
    total = df.agg(F.sum(F.length(payload_col))).collect()[0][0] or 0
    n = max(1, int(total / (target_partition_mb * 1024 * 1024)) + 1)
    return df.repartition(n)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic content-addressed fake embedding (decode stub).

    Hash-seeded so tests are stable; replace with a real decode +
    model-forward in a codec-enabled image."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(dim)]


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: str = "deterministic_fake",
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    ``decode='strict'`` raises NotImplementedError (no codec libs in this
    container); ``'deterministic_fake'`` exercises the identical plan
    with a content-addressed stand-in feature.
    """
    if decode not in ("deterministic_fake", "strict"):
        raise ValueError(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real image decode requires PIL/libjpeg — not in this container"
                )
            feats = [_fake_decode_features(b, feature_dim) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sha256": [hashlib.sha256(b).hexdigest() for b in pdf[payload_col]],
                    "n_bytes": [len(b) for b in pdf[payload_col]],
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000, payload_col: str = "payload") -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (the decode of each frame is the stubbed kernel).

    Emits (doc_id, frame_ms) rows via a sequence explode over the
    metadata duration — pure column ops; the per-frame decode then runs
    through :func:`extract_image_features`-style mapInPandas.
    """
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.length(payload_col).cast("long"))
    return df.withColumn(
        "frame_ms", F.explode(F.sequence(F.lit(0).cast("long"), dur, F.lit(every_ms).cast("long")))
    ).drop(payload_col)
