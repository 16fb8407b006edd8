"""ES Transforms API: pivot/latest compile correctness, atomic batch
publish, and the continuous (changed-bucket) checkpoint loop
converging to the batch answer."""
from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.plans import catalog
from elasticsearch_osmosis_plugin_spark.plans.transform import (
    compile_latest,
    compile_pivot,
    compile_transform,
    continuous_transform,
    preview,
    run_batch,
    transform_stats,
)

T0 = datetime(2026, 1, 1)


def _ts(h):
    return T0 + timedelta(hours=h)


ROWS = [
    # (event_id, ts, user_id, event_type, value)
    (1, _ts(0), 10, "view", 1.0), (2, _ts(1), 10, "view", 3.0),
    (3, _ts(2), 10, "click", 2.0), (4, _ts(25), 11, "view", 5.0),
    (5, _ts(26), 11, "click", 7.0), (6, _ts(27), 12, "click", 9.0),
    (7, _ts(49), 12, "view", 4.0), (8, _ts(49), 12, "view", 6.0),
]
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

PIVOT = {"pivot": {
    "group_by": {
        "etype": {"terms": {"field": "event_type"}},
        "day": {"date_histogram": {"field": "ts",
                                   "calendar_interval": "day"}},
    },
    "aggregations": {
        "avg_value": {"avg": {"field": "value"}},
        "total": {"sum": {"field": "value"}},
        "n": {"value_count": {"field": "value"}},
        "users": {"cardinality": {"field": "user_id"}},
    },
}}

LATEST = {"latest": {"unique_key": ["user_id"], "sort": "ts"},
          "tie_breaker": "event_id"}


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_pivot_matches_manual_groupby(events):
    got = {(r["etype"], r["day"].day): r
           for r in compile_pivot(events, PIVOT["pivot"]).collect()}
    exp = {(r["event_type"], r["d"].day): r for r in (
        events.groupBy("event_type",
                       F.date_trunc("day", "ts").alias("d"))
              .agg(F.avg("value").alias("avg_value"),
                   F.sum("value").alias("total"),
                   F.count("value").alias("n"),
                   F.countDistinct("user_id").alias("users"))).collect()}
    assert set(got) == set(exp)
    for k, r in got.items():
        for c in ("avg_value", "total", "n", "users"):
            assert r[c] == exp[k][c], (k, c)


def test_pivot_fixed_interval_and_histogram(events):
    cfg = {"group_by": {
               "h6": {"date_histogram": {"field": "ts",
                                         "fixed_interval": "6h"}},
               "vb": {"histogram": {"field": "value", "interval": 4}}},
           "aggregations": {"n": {"value_count": {"field": "event_id"}}}}
    out = compile_pivot(events, cfg).collect()
    # 6h floor of T0+1h is T0; value 5.0 lands in bucket 4.0
    assert all(r["h6"].hour % 6 == 0 for r in out)
    assert {r["vb"] for r in out} <= {0.0, 4.0, 8.0}
    assert sum(r["n"] for r in out) == len(ROWS)


def test_latest_matches_window_rank(events):
    got = compile_latest(events, LATEST["latest"],
                         tie_col="event_id").collect()
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    exp = (events.withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1").drop("rn").collect())
    gk = {r["user_id"]: r["event_id"] for r in got}
    ek = {r["user_id"]: r["event_id"] for r in exp}
    assert gk == ek
    # the (49h, 49h) timestamp tie on user 12 resolves by event_id=8
    assert gk[12] == 8


def test_compile_transform_validates():
    with pytest.raises(ValueError):
        compile_transform(None, {})
    with pytest.raises(ValueError):
        compile_transform(None, {**PIVOT, **LATEST})


def test_preview_and_run_batch(events, tmp_path):
    root = str(tmp_path / "tx")
    docs = preview(events, PIVOT, size=3)
    assert 1 <= len(docs) <= 3 and "avg_value" in docs[0]
    res = run_batch(events, PIVOT, root, "daily_types")
    assert res["documents_indexed"] == \
        compile_pivot(events, PIVOT["pivot"]).count()
    back = catalog.read_table(events.sparkSession, root, "daily_types")
    assert back.count() == res["documents_indexed"]
    st = transform_stats(root, "daily_types")
    assert st["transform"]["pivot"]["group_by"].keys() == \
        PIVOT["pivot"]["group_by"].keys()


def _feed(spark, tmp_path, name, batches):
    """Write each batch as one parquet file into a stream source dir."""
    d = tmp_path / f"txsrc_{name}"
    d.mkdir()
    for i, rows in enumerate(batches):
        staging = str(tmp_path / f"txstage_{name}_{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        dst = str(d / f"b{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))
    return str(d)


@pytest.mark.parametrize("config", [PIVOT, LATEST],
                         ids=["pivot", "latest"])
def test_continuous_matches_batch(spark, tmp_path, config):
    """Feed the source in two checkpoints; the continuously-maintained
    destination must equal run_batch over the full source, and the
    second checkpoint must leave buckets untouched by batch 2 alone."""
    src_dir = _feed(spark, tmp_path, f"c_{list(config)[0]}",
                    [ROWS[:5], ROWS[5:]])
    root = str(tmp_path / "txdest")
    ckpt = str(tmp_path / f"txckpt_{list(config)[0]}")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    source = spark.read.schema(SCHEMA).parquet(src_dir)
    q = continuous_transform(stream, lambda: source, config, root,
                             "dest", ckpt).start()
    q.awaitTermination(120)
    want = sorted(map(tuple, compile_transform(source, config).collect()))
    got = sorted(map(tuple,
                     catalog.read_table(spark, root, "dest").collect()))
    assert got == want
    assert transform_stats(root, "dest")["checkpointing"]["last"] >= 1
