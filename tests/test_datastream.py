"""ES data streams: append-only @timestamp-gated ingest over
generation-numbered backing indices, cross-generation dfs-exact
search, atomic rollover."""

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.plans import datastream as ds
from elasticsearch_osmosis_plugin_spark.operators.query import topk_multi


@pytest.fixture()
def stamped(corpus_df):
    return corpus_df.withColumn(
        "@timestamp",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")) +
        F.make_interval(secs=F.col("doc_id").cast("double")))


def test_datastream_lifecycle(spark, stamped, tmp_path):
    root = str(tmp_path)
    man = ds.create_data_stream(root, "logs")
    assert man["generation"] == 1 and ds.data_stream_exists(root, "logs")
    with pytest.raises(ValueError, match="already exists"):
        ds.create_data_stream(root, "logs")

    first = stamped.filter(F.col("doc_id") < 40)
    second = stamped.filter(F.col("doc_id") >= 40)

    # ingest gate: missing / NULL @timestamp rejected atomically
    with pytest.raises(ValueError, match="@timestamp"):
        ds.append_stream(spark, root, "logs",
                         first.drop("@timestamp"), id_col="doc_id")
    with pytest.raises(ValueError, match="NULL"):
        ds.append_stream(
            spark, root, "logs",
            first.withColumn("@timestamp", F.when(
                F.col("doc_id") == 0, None).otherwise(F.col("@timestamp"))),
            id_col="doc_id")

    ds.append_stream(spark, root, "logs", first, id_col="doc_id")
    st = ds.data_stream_stats(root, "logs")
    assert st["total_docs"] == 40 and st["backing_indices"] == 1

    # unconditional rollover -> gen 2; next append goes to gen 2 only
    out = ds.rollover_stream(root, "logs")
    assert out["rolled_over"]
    assert ds.data_stream_stats(root, "logs")["generation"] == 2
    ds.append_stream(spark, root, "logs", second, id_col="doc_id")
    st = ds.data_stream_stats(root, "logs")
    assert [b["docs"] for b in st["indices"]] == [40, 40]
    assert st["indices"][0]["index"] == ".ds-logs-000001"
    assert st["indices"][1]["index"] == ".ds-logs-000002"

    # cross-generation search == topk_multi over the backing paths
    got = ds.search_stream(spark, root, "logs", "public static", k=10)
    want = topk_multi(spark, ds.backing_indices(root, "logs"),
                      "public static", k=10)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]

    # generation pruning: gen-1-only search sees only doc_id < 40
    g1 = ds.search_stream(spark, root, "logs", "public static", k=50,
                          generations=[1])
    assert g1.count() > 0
    assert all(r["doc_id"] < 40 for r in g1.collect())
    with pytest.raises(ValueError, match="unknown generations"):
        ds.search_stream(spark, root, "logs", "x", generations=[9])

    # @timestamp rides into the doc store of the write index
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    ds2 = catalog.read_table(
        spark, ds.backing_indices(root, "logs")[1], "docstats")
    assert "@timestamp" in ds2.columns

    assert ds.delete_data_stream(root, "logs")
    assert not ds.data_stream_exists(root, "logs")
    assert not ds.delete_data_stream(root, "logs")


def test_datastream_empty_generation_skipped(spark, stamped, tmp_path):
    """A just-rolled empty write index must not break search (ES: an
    empty backing index contributes nothing)."""
    root = str(tmp_path)
    ds.create_data_stream(root, "ev")
    ds.append_stream(spark, root, "ev",
                     stamped.filter(F.col("doc_id") < 20), id_col="doc_id")
    ds.rollover_stream(root, "ev")  # gen 2 stays empty
    hits = ds.search_stream(spark, root, "ev", "public", k=5)
    assert hits.count() > 0
    assert ds.backing_indices(root, "ev", live_only=True) == \
        ds.backing_indices(root, "ev")[:1]
