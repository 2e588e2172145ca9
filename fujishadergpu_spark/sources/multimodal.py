"""Multimodal binary-column plumbing: opaque image/audio/video bytes
with typed metadata, processed via mapInPandas.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_stub=True`` produces a deterministic fake
feature vector (a hash-seeded projection of the bytes) so the Spark-
side plumbing — schema, Arrow batch shape, partitioning, UDF
signatures — is real and tested end-to-end; swapping in PIL/ffmpeg is
a one-function change behind the same signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, mime string"
)

FEATURE_DIM = 32


def synthetic_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""
    i = F.col("id")
    kind = F.element_at(F.lit(["image", "audio", "video"]), F.pmod(i, F.lit(3)).cast("int") + 1)
    payload = F.encode(F.format_string("media-%d-%d", i, F.xxhash64(i, F.lit("pl"))), "UTF-8")
    return spark.range(n).select(
        i.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.pmod(F.xxhash64(i, F.lit("w")), F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.xxhash64(i, F.lit("h")), F.lit(1080)).cast("int").alias("height"),
        F.pmod(F.xxhash64(i, F.lit("d")), F.lit(600000)).cast("int").alias("duration_ms"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _decode_stub_features(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoded features' — a seeded projection of
    the byte content. Replace with a real decoder when libs exist."""
    h = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    seed = int(h.sum()) % (2**31)
    rng = np.random.RandomState(seed)
    return rng.normal(size=FEATURE_DIM)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media -> (media_id, kind, features array<double>) via
    mapInPandas (Arrow batch iterator — the streaming-batch shape that
    keeps peak memory at one batch, not one partition)."""
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg (not in this container); "
            "run with decode_stub=True"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(fn, "media_id long, kind string, features array<double>")
