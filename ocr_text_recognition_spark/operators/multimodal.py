"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched mapInPandas (the Spark-side plumbing
— schema, partitioning, UDF signature, batch shape — is real; codec-heavy
steps the container lacks libraries for are stubbed deterministically and
clearly marked).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_text_recognition_spark.kernel.imgcodec import decode_image, encode_image

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("ink_density", T.DoubleType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def image_metadata(media: DataFrame) -> DataFrame:
    """(media_ref, content) -> typed metadata per image. Decode happens
    inside Arrow batches; corrupt payloads yield valid=false rows instead
    of failing the task (poison-pill isolation at 10^12 scale)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                n = len(content) if content is not None else 0
                try:
                    img = decode_image(bytes(content))
                    rows.append(
                        {
                            "media_ref": ref,
                            "height": img.shape[0],
                            "width": img.shape[1],
                            "n_bytes": n,
                            "ink_density": float((img < 128).mean()),
                            "valid": True,
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "media_ref": ref,
                            "height": None,
                            "width": None,
                            "n_bytes": n,
                            "ink_density": None,
                            "valid": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return media.mapInPandas(gen, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Downsample images to max_side via block-mean (numpy; stands in for a
    cv2.resize deploy path). Corrupt payloads pass through as NULL."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    img = decode_image(bytes(content))
                    f = max(1, int(np.ceil(max(img.shape) / max_side)))
                    h, w = (img.shape[0] // f) * f, (img.shape[1] // f) * f
                    small = img[:h, :w].reshape(h // f, f, w // f, f).mean(axis=(1, 3))
                    out.append({"media_ref": ref, "content": encode_image(small.astype(np.uint8))})
                except Exception:
                    out.append({"media_ref": ref, "content": None})
            yield pd.DataFrame(out, columns=["media_ref", "content"])

    return media.mapInPandas(gen, RESIZED_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB: video frame sampling. The container has no video codec; a real
    deployment swaps in PyAV/ffmpeg inside this same mapInPandas shape.
    Raises NotImplementedError when invoked on data."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decode requires an external codec (PyAV/ffmpeg); "
            "plumbing (schema/batching) is in place — swap gen() body."
        )
        yield  # pragma: no cover

    return media.mapInPandas(gen, RESIZED_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """STUB: audio feature extraction (duration, loudness). Same contract
    as sample_video_frames — deterministic schema, unimplemented decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires an external codec (soundfile/ffmpeg); "
            "plumbing (schema/batching) is in place — swap gen() body."
        )
        yield  # pragma: no cover

    return media.mapInPandas(
        gen,
        T.StructType(
            [
                T.StructField("media_ref", T.StringType(), False),
                T.StructField("duration_s", T.DoubleType(), True),
                T.StructField("rms", T.DoubleType(), True),
            ]
        ),
    )
