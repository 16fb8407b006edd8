"""End-to-end entity ingest — the reference's whole program in one
call (osmosis ``--write-elasticsearch`` task: entity stream -> type
dispatch -> node/way docs -> bulk index,
``ElasticSearchWriterTask.java:40-82`` + ``PluginIntegrationITest``).

Spark-first restatement: one declarative plan per entity kind, a
doc-store save, and a fulltext index build over the docs' analyzed
text (the reference's ``tags.name*`` analyzed dynamic template,
``plugin.properties:10-11``) — all over the SAME DataFrames, so
Catalyst shares scans and the quarantines stay explicit.

Entity schema (the reference's PBF/XML entity surface):
    id long, kind string ('node' | 'way' | anything else -> quarantine),
    lat double, lon double           (nodes),
    node_ids array<long>             (ways),
    tags map<string, string>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.functions.json_codec import (
    node_doc_json,
    way_doc_json,
)
from elasticsearch_osmosis_plugin_spark.operators import dao, geo


def _searchable_text(tags):
    """The analyzed surface: name-ish tag values (reference template
    makes ``tags.name*`` fulltext, other tags exact-only)."""
    names = F.filter(F.map_keys(tags), lambda k: k.startswith("name"))
    return F.concat_ws(" ", F.transform(names, lambda k: tags[k]))


def ingest_entities(spark: SparkSession, entities: DataFrame,
                    store_root: str, index_path: str,
                    cfg: EngineConfig = EngineConfig(analyzer="simple"),
                    n_groups: int = 1) -> dict:
    """Run the full reference pipeline; returns the EntityCounter
    analog: per-kind doc counts + explicit quarantine counts (the
    reference logs-and-drops; we count-and-return, SURVEY §7 (c))."""
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    good, quarantined = dao.split_supported(entities, ("node", "way"))
    nodes = good.filter(F.col("kind") == "node")
    ways = good.filter(F.col("kind") == "way")

    node_docs = nodes.select(
        F.lit("node").alias("kind"), F.col("id"),
        node_doc_json(F.col("lat"), F.col("lon"), F.col("tags")).alias("doc"),
        _searchable_text(F.col("tags")).alias("text"))

    way_geo = geo.shape_aggregates(
        geo.build_way_geometry(ways, nodes.select("id", "lat", "lon")))
    way_ok, way_bad = geo.validate_way_arity(way_geo)
    way_docs = way_ok.select(
        F.lit("way").alias("kind"), F.col("id"),
        way_doc_json(F.col("coords"), F.col("tags"), F.col("centroid"),
                     F.col("length_km"), F.col("area_km2"),
                     F.col("shape_type")).alias("doc"),
        _searchable_text(F.col("tags")).alias("text"))

    docs = node_docs.unionByName(way_docs)
    dao.save_all(spark, store_root, docs, supported_kinds=("node", "way"))
    build_index(spark, docs.filter(F.length("text") > 0), index_path, cfg,
                key_cols=("kind", "id"), text_col="text",
                carry_cols=["kind", "id"], n_groups=n_groups)

    counts = {r["kind"]: r["n"] for r in
              dao.count_by_kind(spark, store_root).collect()}
    return {
        "indexed": counts,
        "quarantined_kinds": quarantined.count(),
        "quarantined_arity": way_bad.count(),
    }
