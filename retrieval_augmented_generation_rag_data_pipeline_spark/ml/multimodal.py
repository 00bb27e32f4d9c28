"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decode/feature-extraction libraries (PIL/ffmpeg/torchaudio) are not in
this container, so the decode step is a deterministic fake behind
`decode_available()`; everything Spark-side — schemas, batch iteration,
partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, feature array<double>"
)


def decode_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def extract_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract media content via mapInPandas.

    With real codecs present this is where PIL/torchaudio decode runs;
    without them a deterministic byte-histogram feature is computed so
    the distributed plumbing (Arrow batching, schema, partition
    parallelism) is fully exercised and testable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            feats, digests, sizes = [], [], []
            for blob in pdf["content"]:
                b = bytes(blob or b"")
                digests.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(
                    arr % feature_dim, minlength=feature_dim
                ).astype("float64")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "digest": digests,
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize (STUB — PIL not installed; plumbing is real).

    Raises NotImplementedError at execution time when codecs are
    missing, per the multimodal contract.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_available():
            raise NotImplementedError("PIL not installed — image resize is stubbed")
        from io import BytesIO

        from PIL import Image

        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                img = Image.open(BytesIO(bytes(blob))).resize((width, height))
                buf = BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
            pdf = pdf.assign(content=out, width=width, height=height)
            yield pdf

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


def sample_video_frames(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame sampling (STUB without ffmpeg): emits (media_id, frame_idx,
    t_offset_s) rows derived from duration metadata — the explode shape
    a real decoder would produce, deterministic for tests."""
    n_frames = F.greatest(
        F.floor(F.coalesce(F.col("duration_s"), F.lit(0.0)) / every_s).cast("int"),
        F.lit(0),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_s).alias("t_offset_s"),
        )
    )
