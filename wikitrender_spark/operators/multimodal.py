"""Multimodal column plumbing (SURVEY.md §2.8): image/audio/video as
opaque binary columns + typed metadata structs, processed by Arrow-batched
mapInPandas stages.

The container has no image/audio codecs, so the decode kernels are STUBS
behind ``_decode_image_real`` (NotImplementedError) with a deterministic
fake used for tests — but the Spark-side contract is real: schemas,
batch iteration, partition sizing, and the UDF signatures are exactly
what a production decode/resize/frame-sample stage uses.

Scale notes: binary payloads dominate row width, so these stages must
(1) never shuffle the binary column (all ops are mapPartitions-shaped),
(2) bound Arrow batch bytes via spark.sql.execution.arrow.maxRecordsPerBatch
    when payloads are large,
(3) project metadata-only when downstream stages don't need pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, "
    "width int, height int, feature array<double>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: wrap the documents table as a media table (text bytes as
    the opaque payload) so the binary plumbing is exercised on real
    driver-provided data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def documents_as_video(docs: DataFrame) -> DataFrame:
    """Adapter: wrap documents as a video media table with a deterministic
    per-row frame count (8 + len % 120) in meta.n_frames, so the
    frame-sampling stage is exercised on driver-provided data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.lit(8) + F.length("text") % 120).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_image_real(payload: bytes) -> "object":
    """Real decode kernel — requires an image codec library that is not in
    this container. The fake below preserves the exact interface."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow); "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for decode+resize+feature-extract: derives a
    fake (width, height) from the payload length and an 8-dim 'feature'
    from byte statistics. Same signature/shape as the real kernel."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    feature = [
        float(sum(payload[j::8]) % 1009) / 1009.0 for j in range(8)
    ]
    return width, height, feature


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """decode -> resize -> feature-extract as one mapInPandas stage: no
    shuffle, binary column consumed and dropped inside the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                width, height, feature = fake_decode(payload)
                out.append(
                    dict(
                        media_id=row.media_id,
                        kind=row.kind,
                        n_bytes=len(payload),
                        checksum=_checksum(payload),
                        width=width,
                        height=height,
                        feature=feature,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "checksum", "width",
                    "height", "feature",
                ],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def _checksum(payload: bytes) -> int:
    """Portable 31-polynomial checksum (same pin as functions.text) so the
    Python kernel agrees with the SQL twin byte-for-byte on ASCII data."""
    h = 0
    for b in payload:
        h = (h * 31 + b) % 1_000_003
    return h


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index based on meta.n_frames — pure column ops (the
    real decoder would slice the payload per frame inside mapInPandas)."""
    return media.filter(
        F.col("meta.n_frames").isNotNull() & (F.col("meta.n_frames") > 0)
    ).select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
