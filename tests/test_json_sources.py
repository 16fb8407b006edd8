"""JSON codec round trips (golden shape mirrors ESNodeUTest/ESWayUTest)
and quarantining source reads."""

import json

from pyspark.sql import functions as F


def test_node_doc_json_golden(spark):
    from elasticsearch_osmosis_plugin_spark.functions.json_codec import (
        decode_node_doc,
        node_doc_json,
    )

    # reference canonical node: id=1 @ (lat=1.0, lon=2.0),
    # tags {highway: traffic_signals} (OsmDataBuilder.java:19-27)
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, {"highway": "traffic_signals"})],
        "id long, lat double, lon double, tags map<string,string>")
    out = df.select(node_doc_json(F.col("lat"), F.col("lon"),
                                  F.col("tags")).alias("doc"))
    doc = json.loads(out.collect()[0]["doc"])
    assert doc["centroid"] == [2.0, 1.0]                       # [lon, lat]
    assert doc["shape"] == {"type": "point", "coordinates": [2.0, 1.0]}
    assert doc["tags"] == {"highway": "traffic_signals"}
    back = decode_node_doc(out, "doc").collect()[0]
    assert (back["lat"], back["lon"]) == (1.0, 2.0)
    assert back["tags"]["highway"] == "traffic_signals"


def test_way_doc_json_nesting(spark):
    from elasticsearch_osmosis_plugin_spark.functions.json_codec import way_doc_json
    from elasticsearch_osmosis_plugin_spark.operators import geo

    rows = [
        (1, [{"lat": 1.0, "lon": 2.0}, {"lat": 2.0, "lon": 3.0},
             {"lat": 3.0, "lon": 2.0}, {"lat": 1.0, "lon": 2.0}],
         {"highway": "residential"}),
        (2, [{"lat": 1.0, "lon": 2.0}, {"lat": 2.0, "lon": 3.0},
             {"lat": 3.0, "lon": 2.0}, {"lat": 4.0, "lon": 1.0}],
         {"highway": "residential"}),
    ]
    df = spark.createDataFrame(
        rows, "id long, coords array<struct<lat double, lon double>>, "
              "tags map<string,string>")
    agg = geo.shape_aggregates(df)
    out = agg.select("id", way_doc_json(
        F.col("coords"), F.col("tags"), F.col("centroid"),
        F.col("length_km"), F.col("area_km2"), F.col("shape_type")).alias("doc"))
    docs = {r["id"]: json.loads(r["doc"]) for r in out.collect()}
    # polygon: one ring deeper (ESWay.java:71-80)
    assert docs[1]["shape"]["type"] == "polygon"
    assert docs[1]["shape"]["coordinates"][0][0] == [2.0, 1.0]
    assert docs[2]["shape"]["type"] == "linestring"
    assert docs[2]["shape"]["coordinates"][0] == [2.0, 1.0]
    assert abs(docs[1]["lengthKm"] - 536.897339) < 1e-5
    assert abs(docs[1]["areaKm2"] - 12364.345757) < 1e-5


def test_csv_quarantine(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.sources.readers import (
        read_csv_quarantined,
    )
    from pyspark.sql import types as T

    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("qty", T.LongType())])
    good, bad = read_csv_quarantined(spark, str(p), schema)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    assert bad.count() == 1       # never silent (SURVEY §7 watch-list c)


def test_way_doc_roundtrip(spark):
    """encode -> decode rebuilds the typed way with the polygon/
    linestring nesting dispatch (ESWay.java:142-171 analog)."""
    from elasticsearch_osmosis_plugin_spark.functions.json_codec import (
        decode_way_doc,
        way_doc_json,
    )
    from elasticsearch_osmosis_plugin_spark.operators import geo

    rows = {
        "polygon": [{"lat": 1.0, "lon": 2.0}, {"lat": 2.0, "lon": 3.0},
                    {"lat": 3.0, "lon": 2.0}, {"lat": 1.0, "lon": 2.0}],
        "linestring": [{"lat": 1.0, "lon": 2.0}, {"lat": 2.0, "lon": 3.0},
                       {"lat": 3.0, "lon": 2.0}, {"lat": 4.0, "lon": 1.0}],
    }
    df = spark.createDataFrame(
        [(v, {"k": s}) for s, v in rows.items()],
        "coords array<struct<lat double, lon double>>, tags map<string,string>")
    agg = geo.shape_aggregates(df)
    enc = agg.select(way_doc_json(
        F.col("coords"), F.col("tags"), F.col("centroid"),
        F.col("length_km"), F.col("area_km2"), F.col("shape_type")).alias("doc"))
    got = {r["shape_type"]: r for r in decode_way_doc(enc, "doc").collect()}
    assert set(got) == {"polygon", "linestring"}
    for shape, src_coords in rows.items():
        g = got[shape]
        assert [(c["lat"], c["lon"]) for c in g["coords"]] == \
            [(c["lat"], c["lon"]) for c in src_coords], shape
        assert dict(g["tags"]) == {"k": shape}
    assert abs(got["polygon"]["length_km"] - 536.897339) < 1e-5
    assert abs(got["polygon"]["area_km2"] - 12364.345757) < 1e-5
    assert got["polygon"]["centroid"]["lat"] is not None
