"""Streaming ES|QL: the piped language over Structured Streaming.

ES runs ES|QL against data streams as they ingest; here the SAME
compiler (:mod:`..operators.esql`) runs over ``readStream`` frames —
one language front end for batch and stream, mirroring how the
engine's other operators ship batch/stream twins
(:mod:`.ingest`). Supported streaming subset:

- ``FROM stream | WHERE | EVAL | STATS .. BY BUCKET(ts, span), ..``
  — BUCKET on the watermarked event-time column compiles to
  ``window()`` (the compiler switches representation when the frame
  is streaming, because Spark's state cleanup tracks the time-window
  grouping expression); late data beyond the watermark is dropped
  exactly like the engine's other windowed streams.
- stateless commands (WHERE/EVAL/KEEP/DROP/RENAME/DISSECT/GROK/
  MV_EXPAND) pass through unchanged.
- ``LOOKUP JOIN`` / ``ENRICH`` against STATIC tables — stream-static
  broadcast joins, Spark-supported and the ES enrich-on-ingest
  analog.
- rejected by Spark itself (clear AnalysisException): SORT on an
  unaggregated stream, stream-stream INLINESTATS, CHANGE_POINT.

Scale notes: identical plans to the batch compiler plus watermark
state; the only state is the windowed aggregation's, bounded by the
watermark horizon per (window, keys) combination.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from ..operators.esql import esql


def esql_stream(spark: SparkSession, query: str,
                streams: dict[str, DataFrame],
                static_tables: dict[str, DataFrame] | None = None, *,
                watermark: str = "10 minutes",
                ts_col: str = "ts",
                analyzer: str = "simple") -> DataFrame:
    """Compile an ES|QL pipeline over streaming sources.

    Every frame in ``streams`` gets ``withWatermark(ts_col,
    watermark)`` (its event-time column cast to TIMESTAMP first —
    parquet event time is often NTZ); ``static_tables`` are available
    to FROM/LOOKUP JOIN/ENRICH unchanged.
    """
    tables: dict[str, DataFrame] = dict(static_tables or {})
    for name, df in streams.items():
        if ts_col in df.columns:
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp")) \
                   .withWatermark(ts_col, watermark)
        tables[name] = df
    return esql(spark, query, tables, analyzer=analyzer)


def stream_table(spark: SparkSession, path: str, schema: StructType,
                 max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream with bounded per-trigger intake (same
    backpressure analog as :func:`.ingest.stream_events`)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def run_esql_stream_to_memory(spark: SparkSession, query: str,
                              streams: dict[str, DataFrame],
                              static_tables: dict[str, DataFrame]
                              | None = None, *,
                              watermark: str = "10 minutes",
                              ts_col: str = "ts",
                              output_mode: str = "complete",
                              query_name: str = "eosp_esql_stream",
                              ) -> DataFrame:
    """Drive the bounded stream to completion synchronously (test/
    bench harness) and return the materialized result."""
    out = esql_stream(spark, query, streams, static_tables,
                      watermark=watermark, ts_col=ts_col)
    q = (out.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
