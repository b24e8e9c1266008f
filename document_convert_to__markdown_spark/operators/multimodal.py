"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
*decode kernels* are stubbed behind clearly-marked deterministic fakes —
but everything Spark-side is real and tested: schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning.  Swapping the stub for
a real decoder (PIL/ffmpeg) changes one function body, not the plan.

Header-only metadata (width/height/format) is NOT stubbed — the pure
image header parsers from extractors/image_extractor.py are real.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..extractors.image_extractor import image_meta
from ..extractors.sniffer import IMAGE_FORMATS, sniff_format

MEDIA_META_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("media_format", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("mode", StringType(), True),
    StructField("n_bytes", LongType(), True),
])

MEDIA_FEATURE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])


def media_metadata(df: DataFrame, url_col: str = "url",
                   blob_col: str = "data") -> DataFrame:
    """Binary column → typed metadata rows (real header parse, no decode)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                fmt = sniff_format(payload)
                if fmt in IMAGE_FORMATS:
                    meta = image_meta(payload, fmt)
                    rows.append((url, fmt, meta.width, meta.height,
                                 meta.mode, len(payload)))
                else:
                    rows.append((url, fmt, None, None, None, len(payload)))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA])

    return df.select(url_col, blob_col).mapInPandas(parse, MEDIA_META_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake decode (no image libs in this container).

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``;
    this returns a seeded pseudo-pixel array derived from the bytes so
    downstream feature shapes and determinism are exercised end-to-end.
    """
    h = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    return np.tile(h, 4).reshape(32, 32).astype(np.float32)


RESIZED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("data", BinaryType(), True),
])

FRAME_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_data", BinaryType(), True),
])


def media_resize(df: DataFrame, width: int = 16, height: int = 16,
                 url_col: str = "url", blob_col: str = "data") -> DataFrame:
    """Binary column → resized-image bytes (decode/encode STUBBED).

    Real body: PIL decode → ``Image.resize((w,h))`` → re-encode.  The
    stub resamples the fake pixel grid deterministically so the Spark
    contract — one row in, one (url, w, h, bytes) row out, Arrow-batched
    — is exercised with real data volumes.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                pixels = _decode_image_stub(payload)
                ys = np.linspace(0, pixels.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, pixels.shape[1] - 1, width).astype(int)
                resized = pixels[np.ix_(ys, xs)].astype(np.uint8)
                rows.append((url, width, height, resized.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return df.select(url_col, blob_col).mapInPandas(resize, RESIZED_SCHEMA)


def video_frame_sample(df: DataFrame, every_n: int = 4, frame_bytes: int = 256,
                       url_col: str = "url", blob_col: str = "data"
                       ) -> DataFrame:
    """Binary "video" column → sampled frame rows (demux STUBBED).

    Real body: ffmpeg/pyav demux + keyframe sampling.  The stub treats
    the payload as fixed-size frame chunks and keeps every ``every_n``-th
    — the Spark contract is the interesting part: a one-to-many
    ``mapInPandas`` (row → variable frame rows), the same shape the
    extraction pipeline uses for document assets.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                n_frames = max(1, len(payload) // frame_bytes)
                for idx in range(0, n_frames, every_n):
                    rows.append((url, idx,
                                 payload[idx * frame_bytes:(idx + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select(url_col, blob_col).mapInPandas(sample, FRAME_SCHEMA)


def media_features(df: DataFrame, url_col: str = "url",
                   blob_col: str = "data", dim: int = 16) -> DataFrame:
    """Binary column → fixed-dim feature vector via (stubbed) decode.

    The Spark plumbing — Arrow batches in, ``array<float>`` out, one row
    per input row — is exactly what a real embedding extractor needs.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, feats = [], []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                pixels = _decode_image_stub(payload)
                # Pooled "feature": column means of the fake pixel grid.
                vec = pixels.mean(axis=0)[:dim].astype(np.float32)
                urls.append(url)
                feats.append(vec.tolist())
            yield pd.DataFrame({"url": urls, "feature": feats})

    return df.select(url_col, blob_col).mapInPandas(featurize, MEDIA_FEATURE_SCHEMA)
