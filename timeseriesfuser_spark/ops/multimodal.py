"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

The *Spark-side* machinery here is real and tested — schema contracts,
batch shapes, partitioning, UDF signatures. The *codec* layer (actual
JPEG/PNG/audio decode) is stubbed: the decode libraries are not in this
environment, so each codec function either raises ``NotImplementedError``
(strict mode) or produces a deterministic fake derived from the bytes
(test mode) — swapping in Pillow/librosa later changes one function, not
the pipeline.

Scale notes (100 TB of media):
- binary payloads ride in the DataFrame as ``BinaryType`` — never
  collected, never in Python row objects; Arrow moves them zero-copy into
  the pandas batches;
- ``mapInPandas`` streams batches (spark.sql.execution.arrow
  .maxRecordsPerBatch bounds peak memory per task) — a task never holds a
  whole partition of images;
- feature extraction emits small fixed-size vectors; the heavy binary
  column is dropped inside the UDF as early as possible so downstream
  shuffles move features, not media.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema: content + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(data: bytes, *, fake: bool = False) -> "np.ndarray":
    """STUB — real decode needs an image codec (Pillow/cv2), absent here.

    ``fake=True`` returns a deterministic 8x8 grayscale array derived from
    the bytes' sha256 — stable plumbing-test pixels, clearly not an image.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library (install Pillow and "
            "replace this stub); pipeline plumbing is codec-agnostic"
        )
    digest = hashlib.sha256(data).digest()
    rng = np.frombuffer((digest * 2)[:64], dtype=np.uint8)
    return rng.reshape(8, 8).astype(np.float32)


def _fake_features(data: Optional[bytes]) -> Optional[list]:
    if data is None:
        return None
    img = decode_image(data, fake=True)
    flat = img.reshape(-1)
    # 16 deterministic moments over pixel blocks.
    return [float(x) for x in flat.reshape(FEATURE_DIM, -1).mean(axis=1)]


def extract_features(df: DataFrame, *, batch_hint: Optional[int] = None) -> DataFrame:
    """media table → (media_id, media_type, n_bytes, content_sha256,
    features[16]) via one Arrow-batched ``mapInPandas`` pass.

    The binary column dies inside the UDF — only hashes + small vectors
    come out, so everything downstream shuffles cheaply.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": content.map(_fake_features),
                }
            )

    return df.mapInPandas(batches, schema=_FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — decode→resize→re-encode needs a codec. The signature and
    schema contract are final: same schema in and out, content replaced."""
    raise NotImplementedError(
        "resize requires an image codec; plumbing contract: "
        "mapInPandas(batch -> batch) preserving MEDIA_SCHEMA"
    )


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """STUB — video frame sampling needs a container/codec library."""
    raise NotImplementedError(
        "frame sampling requires a video codec; plumbing contract: one "
        "input row -> n_frames/every_n output rows under MEDIA_SCHEMA"
    )


def text_to_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test fixture builder: wrap a text column's UTF-8 bytes as a media
    table (deterministic binary payloads without binary testdata)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(8).cast("int").alias("width"),
            F.lit(8).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
