"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over mapInPandas.

The Spark-side machinery (schema, partitioning, UDF signature, batch
shape) is real and tested; the codec step is a deterministic fake
gated behind ``DecodeUnavailable`` because the image/audio libraries
are not in this container — swap ``_fake_decode`` for PIL/librosa
decode on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised where a real codec (PIL/librosa/ffmpeg) would be used."""


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    raise DecodeUnavailable(f"no codec for {kind} in this container; install PIL/librosa")


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: bytes → sha1 → dim floats."""
    h = hashlib.sha1(payload).digest()
    return (np.frombuffer(h[: dim * 2], dtype=np.uint16).astype(np.float32) / 65535.0)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.
    Vectorized per batch; payload bytes never leave the executor."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p if isinstance(p, bytes) else bytes(p), dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "sha1": [
                        hashlib.sha1(p if isinstance(p, bytes) else bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)
