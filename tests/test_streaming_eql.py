"""Streaming EQL sequence matcher: stream == batch greedy twin, plus
watermark-finality behavior (alive chains stay unemitted)."""
from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

import pytest

from elasticsearch_osmosis_plugin_spark.operators.eql import sequence
from elasticsearch_osmosis_plugin_spark.streaming.eql import sequence_stream

STEPS = ["view", "click", "error"]
T0 = datetime(2026, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


# user 1: two overlapping chains (greedy keeps one) + a later full
# chain; user 2: chain broken by maxspan; user 3: complete chain.
EVENTS = [
    (1, _ts(0), 1, "view"), (2, _ts(5), 1, "view"), (3, _ts(10), 1, "click"),
    (4, _ts(20), 1, "error"), (5, _ts(30), 1, "view"),
    (6, _ts(40), 1, "click"), (7, _ts(50), 1, "error"),
    (10, _ts(0), 2, "view"), (11, _ts(200), 2, "click"),
    (12, _ts(210), 2, "error"),
    (20, _ts(0), 3, "view"), (21, _ts(30), 3, "click"),
    (22, _ts(59), 3, "error"),
]
MAXSPAN = 3600  # 60 min


def _run_stream(spark, tmp_path, batches, name):
    d = tmp_path / f"eql_stream_{name}"
    d.mkdir()
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string")
    for i, rows in enumerate(batches):
        staging = str(tmp_path / f"eqlstage_{name}_{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"b{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(str(d)))
    q = (sequence_stream(src, STEPS, maxspan_s=MAXSPAN,
                         watermark="1 minute")
         .writeStream.outputMode("append")
         .format("memory").queryName(f"t_eql_{name}").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM t_eql_{name}").collect()


def test_stream_matches_batch_greedy(spark, tmp_path):
    """Emissions across micro-batches == the batch greedy matcher over
    the same events (all of which end below the final watermark)."""
    flush = [(999, _ts(10000), 999, "view")]  # watermark advancer
    batches = [EVENTS[:5], EVENTS[5:], flush,
               [(998, _ts(20000), 999, "view")]]
    got = sorted((r["user_id"], r["id1"], r["id2"], r["id3"])
                 for r in _run_stream(spark, tmp_path, batches, "twin"))

    bdf = spark.createDataFrame(
        EVENTS + [(999, _ts(10000), 999, "view"),
                  (998, _ts(20000), 999, "view")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string")
    want = sorted((r["user_id"], r["id1"], r["id2"], r["id3"])
                  for r in sequence(bdf, STEPS, maxspan_s=MAXSPAN,
                                    overlap="skip").collect())
    assert got == want
    # fixture sanity: greedy picked user 1's first chain from view id=1
    # (not id=2) and the later disjoint chain; user 2 out (maxspan)
    assert got == [(1, 1, 3, 4), (1, 5, 6, 7), (3, 20, 21, 22)]


def test_stream_holds_alive_chains(spark, tmp_path):
    """Without a watermark advance past first.ts + maxspan, a pending
    chain stays in state — nothing is emitted prematurely (late events
    could still preempt the links)."""
    rows = _run_stream(spark, tmp_path, [EVENTS[:5]], "alive")
    assert rows == []


def test_stream_out_of_order_within_watermark(spark, tmp_path):
    """An out-of-order (but watermark-admitted) event lands in its
    (ts, tie) slot before finality: the match uses the TRUE earliest
    chain, same as batch."""
    # click at minute 10 arrives in a LATER file than error at 20
    b1 = [(1, _ts(0), 7, "view"), (4, _ts(20), 7, "error")]
    b2 = [(3, _ts(10), 7, "click"), (9, _ts(40), 7, "error")]
    flush = [(999, _ts(10000), 999, "view")]
    got = [(r["user_id"], r["id1"], r["id2"], r["id3"])
           for r in _run_stream(spark, tmp_path,
                                [b1, b2, flush, flush], "ooo")]
    # chain must pick error id=4 at minute 20 (the earliest after the
    # click), NOT the later id=9 — proving the late click slotted in
    assert got == [(7, 1, 3, 4)]


def test_stream_validates(spark):
    src = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        sequence_stream(src, ["view"])
