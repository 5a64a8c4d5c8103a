"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libs in this
container — see ``decode_image``); everything Spark-side is real and
tested: the schema, the Arrow batch shape, partition-size control for
fat binary rows, and the mapInPandas feature-extraction pipeline.

Schema convention:
    media(media_id long, modality string, data binary,
          meta map<string,string>)

Scale notes: binary payloads dominate partition size — size
partitions by bytes not rows (``repartition_by_bytes``); feature
extraction is mapInPandas so payloads never round-trip through the
driver; outputs are narrow (features only), so the fat column is
dropped as early as Catalyst allows (select before shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


class DecoderUnavailable(NotImplementedError):
    """Raised by real decoders in this container (no PIL/ffmpeg).
    Use fake=True for the deterministic stand-in."""


def decode_image(data: bytes) -> "np.ndarray":
    """STUB — real implementation would be PIL/turbojpeg decode to
    HxWx3 uint8. The container has no image codecs; the Spark-side
    plumbing is exercised through :func:`fake_features`."""
    raise DecoderUnavailable(
        "image decode requires PIL/libjpeg — not available in this environment"
    )


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """STUB — real implementation would be PIL ``Image.resize`` /
    libvips. See :func:`resize_media` for the Spark-side plumbing,
    which is real and exercised with the deterministic fake."""
    raise DecoderUnavailable(
        "image resize requires PIL — not available in this environment"
    )


def fake_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for resize: an output payload whose size
    scales with the target area and whose bytes derive from the input
    hash — byte-stable so tests can assert roundtrips."""
    n = max(1, width * height // 64)
    h = hashlib.sha1((data or b"") + f"{width}x{height}".encode()).digest()
    return (h * (n // len(h) + 1))[:n]


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """media → same schema with ``data`` replaced by the resized
    payload and meta carrying the new dimensions. Arrow-batched; the
    fat column stays inside the batch (never a driver round-trip)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for data in pdf["data"].to_numpy():
                b = bytes(data) if data is not None else b""
                out.append(
                    fake_resize(b, width, height)
                    if fake
                    else resize_image(b, width, height)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "data": out,
                }
            )

    resized = media.select("media_id", "modality", "data").mapInPandas(
        run, schema="media_id long, modality string, data binary"
    )
    return resized.withColumn(
        "meta",
        F.create_map(
            F.lit("width"), F.lit(str(width)), F.lit("height"), F.lit(str(height))
        ),
    )


def media_embeddings(media: DataFrame, dim: int = FEATURE_DIM, fake: bool = True) -> DataFrame:
    """Bridge multimodal → similarity search: feature vectors as an
    embeddings table (vec_id, embedding) directly usable by
    similarity.cosine_topk / ann_topk_* / dedup.embedding_near_dups."""
    return extract_features(media, fake=fake, dim=dim).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )


def fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha1-seeded floats.
    Byte-stable across runs/machines, so tests can assert values."""
    h = hashlib.sha1(data or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float64) / 10_000.0


def extract_features(
    media: DataFrame,
    fake: bool = True,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """media → (media_id, modality, n_bytes, features array<double>).

    Arrow-batched; binary column is consumed inside the batch and not
    emitted (narrow output — drop the fat column before any shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats, nbytes = [], []
            for data in pdf["data"].to_numpy():
                b = bytes(data) if data is not None else b""
                nbytes.append(len(b))
                if fake:
                    feats.append(fake_features(b, dim).tolist())
                else:
                    feats.append(decode_image(b).ravel()[:dim].tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": np.array(nbytes, dtype=np.int64),
                    "features": feats,
                }
            )

    return media.select("media_id", "modality", "data").mapInPandas(
        run,
        schema="media_id long, modality string, n_bytes long, features array<double>",
    )


def repartition_by_bytes(
    media: DataFrame, target_bytes: int = 128 * 1024 * 1024, size_col: str = "data"
) -> DataFrame:
    """Partition fat-binary tables by payload size, not row count:
    estimates total bytes from a cheap agg and repartitions to
    ceil(total/target). At 100 TB this is what keeps a partition of
    4K-video rows from OOMing an executor."""
    total = media.select(F.sum(F.length(size_col))).first()[0] or 0
    n = max(1, int((total + target_bytes - 1) // target_bytes))
    return media.repartition(n)


def frame_sample_plan(n_frames_col: str = "meta['n_frames']", every: int = 30):
    """Video frame-sampling as a column expression: indices 0, every,
    2*every, ... < n_frames (the decode of each index is the stubbed
    part; the plan/shape is real)."""
    return F.sequence(
        F.lit(0),
        F.greatest(F.expr(n_frames_col).cast("int") - 1, F.lit(0)),
        F.lit(every),
    )
