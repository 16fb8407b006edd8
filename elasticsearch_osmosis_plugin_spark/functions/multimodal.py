"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape,
mapInPandas UDF signatures — is real and tested. The actual
image/audio decode step is STUBBED (the decode libraries are not in
this container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless PIL/soundfile import, and the tested
pipeline uses ``byte_histogram_features`` — a deterministic,
library-free featurizer with the same plumbing shape a real decoder
would have.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta map<string,string>"
)

_FEATURE_DIM = 16


def synth_media_df(spark: SparkSession, n: int = 64,
                   seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    sha256(seed:i), metadata typed as map<string,string>."""
    rows = []
    modalities = ["image", "audio", "video"]
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = (h * ((64 + i) // len(h) + 1))[: 64 + (i % 192)]
        m = modalities[i % 3]
        meta = {"width": str(32 + i % 64), "height": str(32 + (i * 7) % 64),
                "fps": "30", "duration_s": str(1 + i % 10)}
        rows.append((i, m, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes):
    """REAL decode is environment-gated: PIL is not in this container."""
    try:
        from PIL import Image  # noqa: F401
        import io
        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; use byte_histogram_features for "
            "the library-free pipeline") from e


def byte_histogram_features(df: DataFrame,
                            payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in featurizer: 16-bin normalized byte
    histogram per payload, vectorized per Arrow batch. The plumbing
    (binary in -> array<float> out via mapInPandas) is exactly what a
    real CLIP/whisper featurizer would use."""
    cols = df.columns

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=_FEATURE_DIM).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pdf.assign(features=pd.Series(feats, index=pdf.index))

    schema = ", ".join(f"{c} {t}" for c, t in
                       [(f.name, f.dataType.simpleString()) for f in df.schema]) \
        + ", features array<double>"
    return df.mapInPandas(fe, schema)


def frame_sample_offsets(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: pure column arithmetic over typed
    metadata — returns one row per sampled frame offset. The decode of
    the frame itself is the stubbed step."""
    fps = F.col("meta")["fps"].cast("double")
    dur = F.col("meta")["duration_s"].cast("double")
    n_samples = F.floor(dur / F.lit(float(every_s))).cast("int")
    return (df.filter(F.col("modality") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), F.greatest(n_samples - 1, F.lit(0))))
                     .alias("sample_no"), fps.alias("fps"))
            .withColumn("frame_no", (F.col("sample_no") * F.lit(float(every_s))
                                     * F.col("fps")).cast("long"))
            .select("media_id", "sample_no", "frame_no"))
