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


# ---------------------------------------------------------------- raw-RGB
# A deterministic, library-free image format so the decode/resize
# pipeline RUNS end-to-end in this container (the prompt's
# "deterministic fake"): payload = width:uint16be + height:uint16be +
# interleaved RGB bytes. The numpy decode/resize math is real — a
# PIL/JPEG payload would swap only the byte-parsing step.

def _encode_raw_rgb(arr: np.ndarray) -> bytes:
    h, w = arr.shape[0], arr.shape[1]
    return (int(w).to_bytes(2, "big") + int(h).to_bytes(2, "big")
            + arr.astype(np.uint8).tobytes())


def _decode_raw_rgb(payload: bytes) -> np.ndarray:
    w = int.from_bytes(payload[0:2], "big")
    h = int.from_bytes(payload[2:4], "big")
    return np.frombuffer(payload, dtype=np.uint8,
                         offset=4).reshape(h, w, 3)


def synth_raw_images(spark: SparkSession, n: int = 32,
                     seed: int = 42) -> DataFrame:
    """Deterministic raw-RGB image table (media_id, payload, meta)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        w, h = 8 + i % 9, 8 + (i * 3) % 9
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(_encode_raw_rgb(arr)),
                     {"width": str(w), "height": str(h)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  payload_col: str = "payload") -> DataFrame:
    """Nearest-neighbor resize of raw-RGB payloads, vectorized per
    Arrow batch (one fancy-index gather per image, no per-pixel
    Python). binary -> binary with updated meta — the canonical
    normalize-resolution step of a multimodal training pipeline."""
    cols_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema)

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            out_payloads = []
            out_meta = []
            for payload, meta in zip(pdf[payload_col], pdf["meta"]):
                arr = _decode_raw_rgb(bytes(payload))
                h, w = arr.shape[0], arr.shape[1]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = arr[yi[:, None], xi[None, :], :]
                out_payloads.append(_encode_raw_rgb(out))
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = str(out_w), str(out_h)
                out_meta.append(m)
            yield pdf.assign(**{payload_col: pd.Series(out_payloads,
                                                       index=pdf.index),
                                "meta": pd.Series(out_meta, index=pdf.index)})

    return df.mapInPandas(rs, cols_schema)


def mean_rgb_features(df: DataFrame,
                      payload_col: str = "payload") -> DataFrame:
    """Per-channel mean over decoded pixels -> array<double> feature
    column (the decode-then-featurize shape of a CLIP-style stage,
    with the raw-RGB decoder standing in for the codec)."""
    cols_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema) \
        + ", features array<double>"

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_raw_rgb(bytes(p)).reshape(-1, 3).mean(axis=0).tolist()
                for p in pdf[payload_col]]
            yield pdf.assign(features=pd.Series(feats, index=pdf.index))

    return df.mapInPandas(fe, cols_schema)


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
