"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode/feature steps as Arrow-batched Pandas functions
over ``mapInPandas``.

The Spark-side plumbing — schema, partition sizing, UDF signatures,
batch shapes — is real and tested. The codec step itself is STUBBED:
image/audio libraries are not in this container, so ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, which substitutes
a deterministic content-hash-derived pseudo-decode (stable across runs
and engines) so downstream plumbing can be exercised end-to-end.

Scale notes:
- media rows are wide (MBs) — ``MEDIA_PARTITION_TARGET_BYTES`` is the
  repartition knob so a batch of decoded frames fits executor memory;
- feature extraction is embarrassingly parallel: no shuffle until the
  (tiny) feature aggregation;
- mapInPandas streams Arrow batches — peak memory is one batch, not
  one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_sha int, "
    "feat array<double>"
)

MEDIA_PARTITION_TARGET_BYTES = 128 * 1024 * 1024


def _pseudo_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes -> fixed-dim
    'feature' vector derived from a rolling hash. Stable, fast, and
    shaped exactly like a real embedding so downstream operators
    (similarity search, dedup) compose with it."""
    h = 2166136261
    feats = []
    for i, b in enumerate(content or b"\x00"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        if i % max(1, len(content) // dim) == 0 and len(feats) < dim:
            feats.append((h % 2000 - 1000) / 1000.0)
    while len(feats) < dim:
        h = (h * 16777619 + 17) & 0xFFFFFFFF
        feats.append((h % 2000 - 1000) / 1000.0)
    return feats[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + featurize each media blob via mapInPandas (Arrow
    batches). ``fake=False`` raises in the decode step — the real
    codecs are not in this image; the surrounding plumbing is the
    deliverable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic pseudo-decode"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda c: len(c or b"")),
                    "content_sha": pdf["content"].map(
                        lambda c: int.from_bytes(
                            hashlib.sha256(c or b"").digest()[:4], "big"
                        )
                        % 2_000_000_000
                    ),
                    "feat": pdf["content"].map(lambda c: _pseudo_decode(c, dim)),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp
    (the decode of each frame is the stubbed step). The fan-out is a
    sequence/explode — executor-side, no driver loop."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
    )
