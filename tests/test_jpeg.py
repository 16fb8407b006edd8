"""Baseline JPEG codec (functions.jpeg): decoder pixel-exactness.

The oracle is ``expected_roundtrip`` — FDCT -> quant -> dequant ->
IDCT -> color computed WITHOUT the entropy layer, so a Huffman/bit
bug in the decoder cannot be cancelled by the same bug in the
encoder. The committed golden (fixed bytes + pixel sha256) pins the
on-disk format against future regressions and runs with NO PIL in
the container.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from elasticsearch_osmosis_plugin_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    expected_roundtrip,
)

# encode_jpeg_baseline(gradient, 80, "4:2:0", restart_interval=2)
GOLDEN_B64 = (
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAYEBQYFBAYGBQYHBwYIChAKCgkJChQO"
    "DwwQFxQYGBcUFhYaHSUfGhsjHBYWICwgIyYnKSopGR8tMC0oMCUoKSj/2wBDAQcH"
    "BwoIChMKChMoGhYaKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgo"
    "KCgoKCgoKCgoKCgoKCj/wAARCAAYAB8DASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEA"
    "AAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIh"
    "MUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6"
    "Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZ"
    "mqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx"
    "8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREA"
    "AgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAV"
    "YnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hp"
    "anN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPE"
    "xcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/90ABAAC/9oADAMBAAIR"
    "AxEAPwD54sbbpxXRWNt04qvY23TiuisbbpxXPOJrjMu8ixY23TiuhsrbjpUFjbdO"
    "K6GytuOlck4ny2Ly7XY//9DyyxtunFdFY23Tismx7V0Nj2qJo+3xlCHY17G26cV0"
    "NlbcdKybHtXQ2XSuOaPl8XQhfY//2Q=="
)
GOLDEN_SHA = "088eb21313ebe5aa056792a87e27020300eb0301c1aad5e913c4cff5f2ac728c"


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 7 + 3) % 256, (xx * 5 + 11) % 256,
                     (yy * 3 + xx * 2) % 256], -1).astype(np.uint8)


def test_golden_decodes_pixel_exact_without_pil():
    px = decode_jpeg(base64.b64decode(GOLDEN_B64))
    assert px.shape == (24, 31, 3) and px.dtype == np.uint8
    assert hashlib.sha256(px.tobytes()).hexdigest() == GOLDEN_SHA
    assert np.array_equal(px, expected_roundtrip(_gradient(24, 31),
                                                 80, "4:2:0"))


@pytest.mark.parametrize("shape,quality,sub,rst", [
    ((24, 33), 90, "4:4:4", 0),          # gray, non-multiple-of-8 dims
    ((17, 26, 3), 75, "4:4:4", 0),       # color 4:4:4
    ((31, 21, 3), 60, "4:2:0", 0),       # color 4:2:0, odd dims
    ((35, 29, 3), 70, "4:2:0", 2),       # restart intervals
    ((19, 24), 85, "4:4:4", 3),          # gray + restarts
    ((8, 8, 3), 95, "4:4:4", 0),         # exactly one block
])
def test_roundtrip_pixel_exact(shape, quality, sub, rst):
    rng = np.random.RandomState(sum(shape) + quality)
    arr = rng.randint(0, 256, shape, dtype=np.uint8)
    payload = encode_jpeg_baseline(arr, quality, sub,
                                   restart_interval=rst)
    got = decode_jpeg(payload)
    want = expected_roundtrip(arr, quality, sub)
    assert got.shape == want.shape == arr.shape
    assert np.array_equal(got, want)


def test_decode_image_dispatches_jpeg():
    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        decode_image,
    )

    arr = _gradient(16, 16)
    got = decode_image(encode_jpeg_baseline(arr, 80))
    assert np.array_equal(got, expected_roundtrip(arr, 80))


def test_rejects_non_baseline_precisely():
    with pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg(b"\x00\x01rubbish")
    # synthesize a progressive (SOF2) header: SOI + minimal SOF2
    sof2 = (b"\xff\xd8"
            + b"\xff\xc2" + (11).to_bytes(2, "big")
            + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(sof2)
    with pytest.raises(ValueError):
        encode_jpeg_baseline(_gradient(8, 8).astype(np.int32))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_baseline(_gradient(8, 8), subsampling="4:1:1")


def test_jpeg_features_through_spark_plumbing(spark):
    """The decode step inside the real mapInPandas feature extractor:
    mean-RGB features over a JPEG-payload table match the per-image
    numpy expectation (driver-computed from the same reference
    reconstruction)."""
    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        decode_image,
        mean_rgb_features,
    )

    rows, want = [], {}
    for i in range(6):
        arr = _gradient(16 + i, 24 - i)
        payload = encode_jpeg_baseline(arr, 80, "4:2:0")
        rows.append((i, bytearray(payload)))
        exp = expected_roundtrip(arr, 80, "4:2:0")
        want[i] = exp.reshape(-1, 3).mean(axis=0)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["features"] for r in
           mean_rgb_features(df, decoder=decode_image).collect()}
    for i, m in want.items():
        assert np.allclose(got[i], m, atol=1e-9)
