"""End-to-end entity ingest (PluginIntegrationITest analog): entity
stream -> dispatch/quarantine -> node+way docs -> doc-store + fulltext
index, then search + geo checks over the result."""

from pyspark.sql import functions as F


ENTITIES = (
    # nodes: two named, one bare
    [(1, "node", 48.8584, 2.2945, None, {"name": "eiffel tower"}),
     (2, "node", 48.8606, 2.3376, None, {"name": "louvre museum"}),
     (3, "node", 48.85, 2.35, None, {"highway": "traffic_signals"}),
     # way nodes
     (10, "node", 1.0, 2.0, None, {}),
     (11, "node", 2.0, 3.0, None, {}),
     (12, "node", 3.0, 2.0, None, {})]
    # ways: closed polygon (named), open line, arity-broken (missing node)
    + [(100, "way", None, None, [10, 11, 12, 10], {"name": "city park"}),
       (101, "way", None, None, [10, 11, 12], {"name": "main street"}),
       (102, "way", None, None, [10, 999], {"name": "ghost road"})]
    # unsupported kind -> quarantine
    + [(200, "relation", None, None, None, {"name": "bus route"})]
)

SCHEMA = ("id long, kind string, lat double, lon double, "
          "node_ids array<long>, tags map<string,string>")


def test_ingest_entities_end_to_end(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.functions.json_codec import (
        decode_way_doc,
    )
    from elasticsearch_osmosis_plugin_spark.operators import dao
    from elasticsearch_osmosis_plugin_spark.operators.query import topk
    from elasticsearch_osmosis_plugin_spark.plans.pipeline import ingest_entities

    entities = spark.createDataFrame(ENTITIES, SCHEMA)
    store = str(tmp_path / "store")
    idx = str(tmp_path / "idx")
    out = ingest_entities(spark, entities, store, idx)

    # EntityCounter analog: 6 nodes + 2 resolvable ways; relation and
    # the arity-broken way are explicit quarantines, never silent
    assert out["indexed"] == {"node": 6, "way": 2}
    assert out["quarantined_kinds"] == 1
    assert out["quarantined_arity"] == 1

    # fulltext search over the analyzed name surface finds both kinds
    hits = {r["doc_id"] for r in topk(spark, idx, "eiffel", k=5).collect()}
    assert len(hits) == 1
    park = topk(spark, idx, "city park", k=5)
    assert park.count() >= 1

    # the stored way doc round-trips through the typed decoder with
    # polygon nesting + reference-golden rollups
    way_row = dao.find(spark, store, "way", 100)
    dec = decode_way_doc(
        spark.createDataFrame([(way_row["doc"],)], "doc string"), "doc"
    ).collect()[0]
    assert dec["shape_type"] == "polygon"
    assert [(c["lat"], c["lon"]) for c in dec["coords"]] == \
        [(1.0, 2.0), (2.0, 3.0), (3.0, 2.0), (1.0, 2.0)]
    assert abs(dec["length_km"] - 536.897339) < 1e-4
    assert abs(dec["area_km2"] - 12364.345757) < 1e-4

    # geo: distance filter over the stored node docs (B8 over decoded)
    from elasticsearch_osmosis_plugin_spark.functions.json_codec import (
        decode_node_doc,
    )
    from elasticsearch_osmosis_plugin_spark.operators.geo import within_distance

    node_docs = (dao.find_all(spark, store, "node", [1, 2, 3, 10, 11, 12]))
    decoded = decode_node_doc(node_docs, "doc")
    near = within_distance(decoded, 48.8584, 2.2945, km=5.0)
    assert near.count() == 3  # the three paris nodes
