"""Multimodal plumbing (real Spark machinery, stubbed decode) and
structured-streaming ingest semantics."""

import shutil

import pytest


def _stage_stream_dir(tmp_path) -> str:
    """File-stream sources need a DIRECTORY; stage the single parquet
    file into one (testdata itself is read-only)."""
    d = tmp_path / "events_stream"
    d.mkdir(exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-0.parquet")
    return str(d)


def test_media_schema_and_features(spark):
    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        byte_histogram_features,
        synth_media_df,
    )

    media = synth_media_df(spark, n=24)
    feats = byte_histogram_features(media)
    rows = feats.collect()
    assert len(rows) == 24
    for r in rows:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9
    # determinism across partitionings
    rows2 = byte_histogram_features(media.repartition(5)).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in rows} == \
           {r["media_id"]: tuple(r["features"]) for r in rows2}


def test_png_roundtrip_all_filters_and_color_types(spark):
    """Stdlib PNG codec: encode with every row filter (None/Sub/Up/
    Average/Paeth) and every supported color type, decode back
    byte-exact. The encoder applies the spec's FORWARD filter math,
    the decoder inverts it — a mirrored bug would have to cancel in
    five different equations to pass."""
    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(11, 9, ch), dtype=np.uint8)
        for f in range(5):
            got = decode_png(encode_png(arr, filter_type=f))
            assert got.shape == arr.shape and (got == arr).all(), (ch, f)
    # gradient images exercise non-trivial Sub/Average/Paeth deltas
    grad = (np.arange(13 * 17 * 3, dtype=np.int64) % 256) \
        .astype(np.uint8).reshape(13, 17, 3)
    for f in range(5):
        assert (decode_png(encode_png(grad, filter_type=f)) == grad).all()
    # decode_image dispatches on the PNG signature
    assert (decode_image(encode_png(grad)) == grad).all()
    # malformed inputs fail loudly with ValueError (codec contract)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG fake")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")  # no PIL here


def test_png_palette_decode(spark):
    """Color type 3: palette indices expand through PLTE to RGB."""
    import struct
    import zlib

    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
    )

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    png = (PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", palette.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = decode_png(png)
    assert got.shape == (2, 3, 3)
    assert (got == palette[idx]).all()


def test_png_spark_decode_featurize_pipeline(spark):
    """Real PNG decode inside the mapInPandas featurize stage: the
    binary -> array<double> plumbing runs on spec-valid PNG payloads
    with no image library in the container."""
    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        decode_image,
        decode_png,
        mean_rgb_features,
        synth_png_images,
    )

    media = synth_png_images(spark, n=16)
    rows = mean_rgb_features(media, decoder=decode_image).collect()
    assert len(rows) == 16
    by_id = {r["media_id"]: r["features"] for r in rows}
    # spot-check against a driver-side decode of the same payloads
    for r in media.collect():
        want = decode_png(bytes(r["payload"])) \
            .reshape(-1, 3).mean(axis=0)
        assert np.allclose(by_id[r["media_id"]], want), r["media_id"]


def test_frame_sample_offsets(spark):
    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        frame_sample_offsets,
        synth_media_df,
    )

    media = synth_media_df(spark, n=24)
    got = frame_sample_offsets(media, every_s=1.0).collect()
    assert got, "expected video rows"
    by_media = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append((r["sample_no"], r["frame_no"]))
    for media_id, samples in by_media.items():
        nos = sorted(s for s, _ in samples)
        assert nos == list(range(len(nos)))
        for s, f in samples:
            assert f == s * 30  # fps=30, 1s sampling


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """Stream over the events parquet; windowed counts must equal the
    batch groupBy (bounded-stream drain == reference's complete()
    semantics)."""
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    src = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{src}/events.parquet")
    stream_dir = _stage_stream_dir(tmp_path)
    got = run_stream_to_memory(spark, stream_dir, ev.schema,
                               query_name="t_stream", window="1 hour")
    want = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n"))
    g = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    w = {(r["window_start"], r["event_type"]): r["n"] for r in want.collect()}
    assert g == w


def test_stateful_streaming_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionizer: in-stream closes (gap
    exceeded within a batch) and timeout closes (watermark passes
    last_ts + gap) both emit; in-flight sessions don't."""
    from datetime import datetime

    from elasticsearch_osmosis_plugin_spark.streaming.ingest import (
        sessionize_stream,
        stream_events,
    )

    def ts(minute):
        return datetime(2026, 1, 1, minute // 60, minute % 60)

    import glob
    import os

    d = tmp_path / "sess_stream"
    d.mkdir()
    schema = "user_id long, ts timestamp"
    # file a: user 1 has two sessions split by a 50-min gap (> 30 min);
    # user 2 a single event. Files b and c: watermark advancers (user
    # 999, far future) — b moves the watermark past every session's
    # timeout, c triggers the batch in which those timeouts fire.
    batches = {
        "a": [(1, ts(0)), (1, ts(10)), (1, ts(60)), (1, ts(65)), (2, ts(5))],
        "b": [(999, ts(600))],
        "c": [(999, ts(1200))],
    }
    for i, (name, rows) in enumerate(batches.items()):
        staging = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))  # mtime order == batch order

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(str(d)))
    q = (sessionize_stream(src, gap_s=1800)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_sessions").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour,
            r["n_events"])
           for r in spark.sql("SELECT * FROM t_sessions").collect()}
    assert (1, 0, 2) in got        # closed in-stream by the gap
    assert (1, 60, 2) in got       # closed by event-time timeout
    assert (2, 5, 1) in got        # closed by event-time timeout
    assert (999, 1200, 1) not in got  # in-flight session stays open


def test_dedup_stream_keeps_first_arrival(spark, tmp_path):
    """Streaming exact dedup: later same-fingerprint arrivals within
    the watermark are dropped; distinct docs pass through."""
    import glob
    import os
    from datetime import datetime

    from elasticsearch_osmosis_plugin_spark.streaming.ingest import dedup_stream

    d = tmp_path / "dedup_stream"
    d.mkdir()
    schema = "doc_id long, ts timestamp, text string"
    t0 = datetime(2026, 1, 1, 0, 0)
    t1 = datetime(2026, 1, 1, 0, 10)
    batches = {
        "a": [(1, t0, "alpha beta gamma"), (2, t0, "delta epsilon")],
        # 11 dups doc 1 (whitespace-normalized same fp); 12 is new
        "b": [(11, t1, "  ALPHA beta   GAMMA "), (12, t1, "zeta eta")],
    }
    for i, (name, rows) in enumerate(batches.items()):
        staging = str(tmp_path / f"ddstage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(str(d)))
    q = (dedup_stream(src)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_dedup").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM t_dedup").collect()}
    assert got == {1, 2, 12}  # 11 dropped as a duplicate of 1


def test_stream_append_to_docstore(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.operators import dao
    from elasticsearch_osmosis_plugin_spark.streaming.ingest import (
        append_stream_to_docstore,
    )

    src = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{src}/events.parquet")
    root = str(tmp_path / "stream_store")
    append_stream_to_docstore(spark, _stage_stream_dir(tmp_path), ev.schema, root)
    got = {r["kind"]: r["n"] for r in dao.count_by_kind(spark, root).collect()}
    want = {r["event_type"]: r["count"] for r in
            ev.filter(ev.event_type.isin("click", "view", "purchase"))
              .groupBy("event_type").count().collect()}
    assert got == want


def test_stateful_sessionization_out_of_order_events(spark, tmp_path):
    """An admitted-but-late event (above watermark, older than the
    stored last_ts) must extend session bounds, never regress them
    (ADVICE r1): expect ONE session start=min end=max n=3."""
    import glob
    import os
    from datetime import datetime

    from elasticsearch_osmosis_plugin_spark.streaming.ingest import (
        sessionize_stream,
    )

    def ts(minute):
        return datetime(2026, 1, 1, minute // 60, minute % 60)

    d = tmp_path / "ooo_stream"
    d.mkdir()
    schema = "user_id long, ts timestamp"
    batches = {
        "a": [(1, ts(0)), (1, ts(10))],
        "b": [(1, ts(5))],            # out of order vs stored last=10
        "c": [(999, ts(600))],        # watermark advancers
        "d": [(999, ts(1200))],
    }
    for i, (name, rows) in enumerate(batches.items()):
        staging = str(tmp_path / f"ooo_stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(str(d)))
    q = (sessionize_stream(src, gap_s=1800)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_ooo_sessions").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [(r["user_id"], r["session_start"].minute,
            r["session_end"].minute, r["n_events"])
           for r in spark.sql(
               "SELECT * FROM t_ooo_sessions WHERE user_id = 1").collect()]
    assert got == [(1, 0, 10, 3)]


def test_raw_image_decode_resize_featurize(spark):
    """The decode/resize/featurize pipeline runs END-TO-END on the
    deterministic raw-RGB format (no PIL needed): resize gather math is
    checked against a hand-computed pattern, features against numpy."""
    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        _decode_raw_rgb,
        _encode_raw_rgb,
        mean_rgb_features,
        resize_images,
        synth_raw_images,
    )

    media = synth_raw_images(spark, n=12)
    resized = resize_images(media, out_w=4, out_h=4)
    rows = resized.collect()
    assert len(rows) == 12
    for r in rows:
        arr = _decode_raw_rgb(bytes(r["payload"]))
        assert arr.shape == (4, 4, 3)
        assert r["meta"]["width"] == "4" and r["meta"]["height"] == "4"

    # hand-checked nearest-neighbor: 2x2 pattern upscaled to 4x4
    pat = np.array([[[0, 0, 0], [255, 0, 0]],
                    [[0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, "image", bytearray(_encode_raw_rgb(pat)), {})],
        "media_id long, modality string, payload binary, meta map<string,string>")
    up = _decode_raw_rgb(bytes(
        resize_images(df, 4, 4).collect()[0]["payload"]))
    assert (up[0, 0] == [0, 0, 0]).all() and (up[0, 3] == [255, 0, 0]).all()
    assert (up[3, 0] == [0, 255, 0]).all() and (up[3, 3] == [0, 0, 255]).all()
    assert (up[1, 1] == up[0, 0]).all()  # nearest, not interpolated

    feats = {r["media_id"]: r["features"]
             for r in mean_rgb_features(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, f in feats.items():
        want = _decode_raw_rgb(src[mid]).reshape(-1, 3).mean(axis=0)
        assert np.allclose(f, want)


def test_streaming_percolate(spark, tmp_path):
    """Percolation over a file stream: the registered-query matcher is
    a stateless map-side transform, so it applies directly to a
    readStream source — each micro-batch emits its (doc, query) hits."""
    import glob
    import os

    from elasticsearch_osmosis_plugin_spark.operators.percolate import percolate

    d = tmp_path / "perc_stream"
    d.mkdir()
    schema = "doc_id long, text string"
    batches = {"a": [(1, "spark shuffle join"), (2, "nothing here")],
               "b": [(3, "broadcast join hint"), (4, "spark only")]}
    for i, (name, rows) in enumerate(batches.items()):
        staging = str(tmp_path / f"pstage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    qs = {"qj": "join", "qsj": "spark join"}
    # drop the deterministic orderBy for the streaming plan (global
    # sort is not stream-compatible; per-batch output needs none)
    hits = percolate(src, qs, analyzer="simple", ordered=False)
    q = (hits.writeStream.outputMode("append")
         .format("memory").queryName("t_perc").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["doc_id"], r["query_id"]) for r in
           spark.sql("SELECT * FROM t_perc").collect()}
    assert got == {(1, "qj"), (1, "qsj"), (3, "qj")}


def test_trending_terms_stream_matches_batch(spark, tmp_path):
    """Windowed trending terms: the streaming result (append mode,
    watermark-closed windows) equals the same operator run as a plain
    batch aggregation."""
    import glob
    import os
    from datetime import datetime

    from elasticsearch_osmosis_plugin_spark.streaming.ingest import (
        trending_terms,
    )

    d = tmp_path / "trend_stream"
    d.mkdir()
    schema = "doc_id long, ts timestamp, text string"
    t0 = datetime(2026, 1, 1, 0, 5)
    t1 = datetime(2026, 1, 1, 1, 5)
    t2 = datetime(2026, 1, 1, 9, 0)  # advances watermark past t0/t1 windows
    batches = {
        "a": [(1, t0, "spark spark join"), (2, t0, "spark window")],
        "b": [(3, t1, "join join window"), (4, t1, "spark join")],
        "c": [(5, t2, "closer closer")],
    }
    for i, (name, rows) in enumerate(batches.items()):
        staging = str(tmp_path / f"trstage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(str(d)))
    q = (trending_terms(src, window="1 hour", watermark="1 hour",
                        min_count=2)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_trend").start())
    try:
        q.processAllAvailable()
        got = {(r["window_start"], r["term"]): r["n"]
               for r in spark.sql("SELECT * FROM t_trend").collect()}
    finally:
        q.stop()
    batch_rows = [r for rows in batches.values() for r in rows]
    batch = spark.createDataFrame(batch_rows, schema)
    want_all = {(r["window_start"], r["term"]): r["n"]
                for r in trending_terms(batch, window="1 hour",
                                        min_count=2).collect()}
    # append mode emits only watermark-closed windows (t0/t1 hours)
    want = {k: v for k, v in want_all.items()
            if k[0].hour in (0, 1)}
    assert got == want and want  # non-trivial: spark/join windows present


def test_wav_roundtrip_and_audio_features(spark):
    """Pure-stdlib WAV codec: encode->decode round-trip at several
    channel counts, 8/16/32-bit decode, and the Spark audio featurize
    pipeline (binary -> scalar + contour features) matching a
    driver-side numpy recompute."""
    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.multimodal import (
        audio_features,
        decode_audio,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2):
        x = np.clip(rng.normal(0, 0.3, size=(480, ch)), -1, 1)
        got, rate = decode_wav(encode_wav(x, 16000))
        assert rate == 16000 and got.shape == (480, ch)
        # 16-bit quantum + the 32767-encode / 32768-decode scale skew
        assert np.allclose(got, x, atol=2.0 / 32768)

    # 8-bit and 32-bit PCM paths
    import io
    import wave

    for width, dtype, scale in ((1, np.uint8, 128.0), (4, np.int32, 2**31)):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            if width == 1:
                w.writeframes(np.array([0, 128, 255], dtype=dtype).tobytes())
            else:
                w.writeframes(np.array([0, 2**30, -(2**30)],
                                       dtype="<i4").tobytes())
        got, rate = decode_wav(buf.getvalue())
        assert rate == 8000 and got.shape[0] == 3

    with pytest.raises(ValueError):
        decode_audio(b"ID3\x04 not audio we can parse")

    # Spark pipeline: 12 synthetic tones through mapInPandas
    clips = []
    for i in range(12):
        t = np.arange(0, 1600) / 16000.0
        tone = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        clips.append((i, bytearray(encode_wav(tone, 16000))))
    df = spark.createDataFrame(clips, "media_id long, payload binary")
    rows = {r["media_id"]: r for r in audio_features(df).collect()}
    assert len(rows) == 12
    for i, payload in clips:
        x, rate = decode_audio(bytes(payload))
        mono = x.mean(axis=1)
        r = rows[i]
        assert r["duration_s"] == pytest.approx(len(mono) / rate)
        assert r["rms"] == pytest.approx(float(np.sqrt((mono**2).mean())),
                                         rel=1e-6)
        assert len(r["log_energy"]) == 16
    # higher-frequency tones cross zero more often
    assert rows[11]["zcr"] > rows[0]["zcr"]
