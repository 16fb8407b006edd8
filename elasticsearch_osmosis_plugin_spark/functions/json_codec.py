"""Document JSON encode/decode (SURVEY A4/A5).

The reference serializes each doc as
``{"centroid":[lon,lat],"shape":{"type":...,"coordinates":...},"tags":{...}}``
(``ESNode.toJson``, ``ESNode.java:67-85``; ``ESWay.toJson``,
``ESWay.java:65-92``; GeoJSON [lon, lat] order per
``ESLocation.java:27-29``) and rebuilds typed entities from stored
``_source`` with a linestring-vs-polygon coordinate-nesting dispatch
(``ESWay.java:142-171``).

Spark-native: columns stay native inside the engine; these functions
exist for export/import parity, as `to_json(struct(...))` /
`from_json` column expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def node_doc_json(lat: Column, lon: Column, tags: Column) -> Column:
    """A4 for point docs: nested GeoJSON-ish doc, [lon, lat] order."""
    return F.to_json(F.struct(
        F.array(lon, lat).alias("centroid"),
        F.struct(F.lit("point").alias("type"),
                 F.array(lon, lat).alias("coordinates")).alias("shape"),
        tags.alias("tags")))


def way_doc_json(coords: Column, tags: Column, centroid: Column,
                 length_km: Column, area_km2: Column,
                 shape_type_col: Column) -> Column:
    """A4 for way docs: shape type + coordinates + rollups.
    Polygon coordinates nest one ring deeper than linestring
    (``ESWay.java:71-80``) — a type union JSON can't express as one
    struct column, so the shape fragment is assembled conditionally."""
    ring = F.transform(coords, lambda c: F.array(c["lon"], c["lat"]))
    coords_json = F.when(shape_type_col == "polygon",
                         F.to_json(F.array(ring))).otherwise(F.to_json(ring))
    shape_json = F.concat(F.lit('{"type":"'), shape_type_col,
                          F.lit('","coordinates":'), coords_json, F.lit("}"))
    head = F.to_json(F.struct(
        F.array(centroid["lon"], centroid["lat"]).alias("centroid"),
        F.round(length_km, 6).alias("lengthKm"),
        F.round(area_km2, 6).alias("areaKm2"),
        tags.alias("tags")))
    head_open = head.substr(F.lit(1), F.length(head) - 1)  # strip closing }
    return F.concat(head_open, F.lit(',"shape":'), shape_json, F.lit("}"))


NODE_DOC_SCHEMA = T.StructType([
    T.StructField("centroid", T.ArrayType(T.DoubleType())),
    T.StructField("shape", T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ])),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])


def decode_node_doc(df: DataFrame, json_col: str = "doc") -> DataFrame:
    """A5: rebuild typed columns from the stored JSON doc — the
    [lon, lat] -> (lat, lon) swap mirrors the reference's builder
    (``ESNode.java:139-149``)."""
    parsed = F.from_json(F.col(json_col), NODE_DOC_SCHEMA)
    return df.select(
        F.element_at(parsed["centroid"], 2).alias("lat"),
        F.element_at(parsed["centroid"], 1).alias("lon"),
        parsed["tags"].alias("tags"))


WAY_DOC_HEAD_SCHEMA = T.StructType([
    T.StructField("centroid", T.ArrayType(T.DoubleType())),
    T.StructField("lengthKm", T.DoubleType()),
    T.StructField("areaKm2", T.DoubleType()),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    T.StructField("shape", T.StructType([
        T.StructField("type", T.StringType()),
    ])),
])


def decode_way_doc(df: DataFrame, json_col: str = "doc") -> DataFrame:
    """A5 for way docs: rebuild the typed way from stored ``_source``
    with the linestring-vs-polygon coordinate-NESTING dispatch the
    reference builder does (``ESWay.java:142-171``): polygon
    coordinates sit one ring deeper ([[[lon,lat],...]]), linestring at
    [[lon,lat],...] — a type union one ``from_json`` schema can't
    express, so coordinates are re-parsed per shape type and each
    [lon, lat] pair swaps back to struct<lat, lon>."""
    head = F.from_json(F.col(json_col), WAY_DOC_HEAD_SCHEMA)
    coords_str = F.get_json_object(F.col(json_col), "$.shape.coordinates")
    line = F.from_json(coords_str, "array<array<double>>")
    ring = F.element_at(
        F.from_json(coords_str, "array<array<array<double>>>"), 1)
    raw = F.when(head["shape"]["type"] == "polygon", ring).otherwise(line)
    coords = F.transform(raw, lambda p: F.struct(
        F.element_at(p, 2).alias("lat"), F.element_at(p, 1).alias("lon")))
    return df.select(
        head["shape"]["type"].alias("shape_type"),
        coords.alias("coords"),
        F.struct(F.element_at(head["centroid"], 2).alias("lat"),
                 F.element_at(head["centroid"], 1).alias("lon")).alias("centroid"),
        head["lengthKm"].alias("length_km"),
        head["areaKm2"].alias("area_km2"),
        head["tags"].alias("tags"))
