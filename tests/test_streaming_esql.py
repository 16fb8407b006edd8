"""Streaming ES|QL: the batch compiler's output over readStream must
equal the same pipeline run in batch (bounded-stream drain)."""
from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _stage(tmp_path, name="events") -> str:
    d = tmp_path / f"{name}_esql_stream"
    d.mkdir(exist_ok=True)
    shutil.copy(f"{SF}/{name}.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_stats_bucket_matches_batch(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql
    from elasticsearch_osmosis_plugin_spark.streaming.esql import (
        run_esql_stream_to_memory,
        stream_table,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = """
FROM ev
| WHERE event_type != "signup"
| STATS n = COUNT(*), s = SUM(value) BY day = BUCKET(ts, 1 day), event_type
"""
    got = run_esql_stream_to_memory(
        spark, q, {"ev": stream_table(spark, _stage(tmp_path), ev.schema)},
        query_name="t_esql_s1")
    want = esql(spark, q, {"ev": ev})
    k = lambda r: (r["day"], r["event_type"])  # noqa: E731
    g = {k(r): (r["n"], r["s"]) for r in got.collect()}
    w = {k(r): (r["n"], r["s"]) for r in want.collect()}
    assert g == w and len(g) > 50


def test_streaming_stateless_pipe_with_enrich(spark, tmp_path):
    """WHERE/EVAL/GROK + ENRICH against a static table on a stream."""
    from elasticsearch_osmosis_plugin_spark.streaming.esql import (
        esql_stream,
        stream_table,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = (ev.select("user_id").distinct()
             .withColumn("tier", F.when(F.col("user_id") % 2 == 0,
                                        "even").otherwise("odd")))
    q = """
FROM ev
| GROK props "\\"k\\": %{INT:kv:int}"
| ENRICH users ON user_id WITH tier
| WHERE kv > 50
| KEEP event_id, kv, tier
"""
    out = esql_stream(spark, q, {"ev": stream_table(
        spark, _stage(tmp_path, "events"), ev.schema)}, {"users": users})
    assert out.isStreaming
    sq = (out.writeStream.outputMode("append").format("memory")
          .queryName("t_esql_s2").start())
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    got = spark.sql("SELECT * FROM t_esql_s2")
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql
    want = esql(spark, q, {"ev": ev, "users": users})
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_streaming_bucket_rejects_calendar_units(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.operators.esql import EsqlError
    from elasticsearch_osmosis_plugin_spark.streaming.esql import (
        esql_stream,
        stream_table,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(EsqlError, match="calendar"):
        esql_stream(spark, "FROM ev | STATS n = COUNT(*) "
                           "BY m = BUCKET(ts, 1 month)",
                    {"ev": stream_table(spark, _stage(tmp_path, "events"),
                                        ev.schema)})
