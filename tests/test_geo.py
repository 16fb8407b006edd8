"""Geometry operators vs the reference's golden values
(EntityDaoITest.java:79-81,104-106; ESShapeUTest.java tolerances:
1e-3 km, 1e-6 km2)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.operators import geo

POLY = [(1.0, 2.0), (2.0, 3.0), (3.0, 2.0), (1.0, 2.0)]      # (lat, lon)
LINE = [(1.0, 2.0), (2.0, 3.0), (3.0, 2.0), (4.0, 1.0)]
POINT = [(1.0, 2.0)]


@pytest.fixture(scope="module")
def shapes(spark):
    rows = [(1, [{"lat": a, "lon": b} for a, b in POLY]),
            (2, [{"lat": a, "lon": b} for a, b in LINE]),
            (3, [{"lat": a, "lon": b} for a, b in POINT])]
    return geo.shape_aggregates(spark.createDataFrame(
        rows, "id long, coords array<struct<lat double, lon double>>"))


def test_shape_classifier(shapes):
    got = {r["id"]: r["shape_type"] for r in shapes.collect()}
    assert got == {1: "polygon", 2: "linestring", 3: "point"}


def test_polygon_golden(shapes):
    r = shapes.filter("id = 1").collect()[0]
    assert abs(r["centroid"]["lat"] - 2.0) < 1e-9
    assert abs(r["centroid"]["lon"] - 2.3333333333333335) < 1e-9
    assert abs(r["length_km"] - 536.8973391277414) < 1e-3
    assert abs(r["area_km2"] - 12364.345757132623) < 1e-6


def test_linestring_golden(shapes):
    r = shapes.filter("id = 2").collect()[0]
    assert abs(r["centroid"]["lat"] - 2.5) < 1e-9
    assert abs(r["centroid"]["lon"] - 2.1666666666666665) < 1e-9
    assert abs(r["length_km"] - 471.76076948850596) < 1e-3
    assert r["area_km2"] == 0.0


def test_point(shapes):
    r = shapes.filter("id = 3").collect()[0]
    assert r["centroid"]["lat"] == 1.0 and r["centroid"]["lon"] == 2.0
    assert r["length_km"] == 0.0 and r["area_km2"] == 0.0


def test_way_node_join_order_preserving_and_missing_dropped(spark):
    # reference: node order preserved, missing node skipped
    # (EntityDao.java:124-149, EntityDaoUTest.java:241-265)
    nodes = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, 2.0, 3.0), (3, 3.0, 2.0)],
        "id long, lat double, lon double")
    ways = spark.createDataFrame(
        [(10, [3, 1, 2]),          # out-of-id-order on purpose
         (11, [1, 99, 2])],        # node 99 missing
        "id long, node_ids array<long>")
    got = geo.build_way_geometry(ways, nodes)
    rows = {r["id"]: r for r in got.collect()}
    assert [(c["lat"], c["lon"]) for c in rows[10]["coords"]] == \
        [(3.0, 2.0), (1.0, 2.0), (2.0, 3.0)]
    assert [(c["lat"], c["lon"]) for c in rows[11]["coords"]] == \
        [(1.0, 2.0), (2.0, 3.0)]
    good, quarantine = geo.validate_way_arity(got)
    assert [r["id"] for r in good.collect()] == [10]
    assert [r["id"] for r in quarantine.collect()] == [11]


def test_geo_filters_and_sort(spark):
    nodes = spark.createDataFrame(
        [(1, 48.8566, 2.3522),    # paris
         (2, 48.8570, 2.3530),    # ~75 m away
         (3, 51.5074, -0.1278)],  # london
        "id long, lat double, lon double")
    near = geo.within_distance(nodes, 48.8566, 2.3522, km=0.2)
    assert sorted(r["id"] for r in near.collect()) == [1, 2]
    box = geo.within_bbox(nodes, 48.0, 49.0, 2.0, 3.0)
    assert sorted(r["id"] for r in box.collect()) == [1, 2]
    ordered = geo.sort_by_distance(nodes, 48.8566, 2.3522)
    assert [r["id"] for r in ordered.collect()] == [1, 2, 3]
    # haversine sanity: paris-london ~343.5 km
    d = ordered.filter("id = 3").collect()[0]["distance_km"]
    assert abs(d - 343.5) < 1.0


def test_shape_intersects_bbox_crossing_segment(spark):
    """B7 real semantics (ESWayITest.java:97-154): a way CROSSING the
    envelope with every vertex outside must match; a way whose segment
    bbox overlaps the envelope but whose line misses it must not."""
    from pyspark.sql import functions as F

    rows = [
        # 1: diagonal straight through the box, both endpoints outside
        (1, [{"lat": -1.0, "lon": -1.0}, {"lat": 3.0, "lon": 3.0}]),
        # 2: segment bbox OVERLAPS the box corner region but the line
        # lon+lat=2.4 passes clear of corner (1,1) — every box corner
        # on one side, so only the separating-axis test rejects it
        (2, [{"lat": 0.9, "lon": 1.5}, {"lat": 1.5, "lon": 0.9}]),
        # 3: fully inside
        (3, [{"lat": 0.4, "lon": 0.4}, {"lat": 0.6, "lon": 0.6}]),
        # 4: far away
        (4, [{"lat": 9.0, "lon": 9.0}, {"lat": 10.0, "lon": 10.0}]),
        # 5: single vertex inside (point shape)
        (5, [{"lat": 0.5, "lon": 0.5}]),
        # 6: touches the boundary exactly (JTS intersects counts it)
        (6, [{"lat": 1.0, "lon": -2.0}, {"lat": 1.0, "lon": 0.0}]),
    ]
    df = spark.createDataFrame(
        rows, "id long, coords array<struct<lat double, lon double>>")
    got = sorted(r["id"] for r in geo.ways_intersecting_bbox(
        df, 0.0, 1.0, 0.0, 1.0).collect())
    assert got == [1, 3, 5, 6]
    # vertex-containment alone would MISS way 1 — pin the gap is closed
    misses = df.filter(F.exists(
        F.col("coords"),
        lambda p: p["lat"].between(0.0, 1.0) & p["lon"].between(0.0, 1.0)))
    assert 1 not in {r["id"] for r in misses.collect()}


def test_geotile_grid(spark):
    """Web-mercator tiling matches the reference OSM slippy-map
    formula computed independently in python; seam and pole points
    clamp exactly like ES."""
    import math as m

    import pytest as _pytest

    from elasticsearch_osmosis_plugin_spark.operators.geo import (
        geotile_cell,
        geotile_grid,
    )

    pts = [(0, 48.8566, 2.3522), (1, 40.7128, -74.0060),
           (2, -33.8688, 151.2093), (3, 89.9, 10.0),   # pole clamp
           (4, 0.0, 180.0), (5, 0.0, -180.0),          # seam
           (6, 48.86, 2.35),                           # same tile as 0
           (7, -90.0, 0.0)]                            # south-pole y clamp
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")

    def py_tile(lat, lon, z):
        lat = max(-85.05112878, min(85.05112878, lat))
        n = 1 << z
        x = int(m.floor((lon + 180.0) / 360.0 * n))
        x = min(max(x, 0), n - 1)
        phi = m.radians(lat)
        y = int(m.floor((1.0 - m.log(m.tan(phi) + 1.0 / m.cos(phi)) / m.pi)
                        / 2.0 * n))
        y = min(max(y, 0), n - 1)
        return f"{z}/{x}/{y}"

    for z in (0, 3, 7, 12):
        got = {r["doc_id"]: r["t"] for r in df.select(
            "doc_id", geotile_cell(F.col("lat"), F.col("lon"), z)
            .alias("t")).collect()}
        for d, la, lo in pts:
            assert got[d] == py_tile(la, lo, z), (d, z)

    grid = {r["tile"]: r["n_docs"] for r in geotile_grid(df, 7).collect()}
    assert grid[py_tile(48.8566, 2.3522, 7)] == 2
    assert sum(grid.values()) == len(pts)
    with _pytest.raises(ValueError):
        geotile_cell(F.col("lat"), F.col("lon"), 99)


def test_geohash_cell_golden(spark):
    """Canonical geohash test vectors (textbook encoding) + agreement
    with an independent per-bit reference implementation."""
    from elasticsearch_osmosis_plugin_spark.operators.geo import (
        GEOHASH_BASE32,
        geohash_cell,
    )

    def ref_geohash(lat, lon, precision):
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        out, bit, ch, even = [], 0, 0, True
        while len(out) < precision:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lon_lo = mid
                else:
                    ch = ch * 2
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    lat_lo = mid
                else:
                    ch = ch * 2
                    lat_hi = mid
            even = not even
            bit += 1
            if bit == 5:
                out.append(GEOHASH_BASE32[ch])
                bit, ch = 0, 0
        return "".join(out)

    pts = [(57.64911, 10.40744), (48.8566, 2.3522), (-33.8688, 151.2093),
           (0.0001, 0.0001), (-89.9, -179.9), (89.9, 179.9)]
    for p in (1, 3, 5, 9):
        df = spark.createDataFrame(pts, "lat double, lon double")
        got = [r["gh"] for r in df.select(
            geohash_cell(F.col("lat"), F.col("lon"), p).alias("gh")).collect()]
        want = [ref_geohash(lat, lon, p) for lat, lon in pts]
        assert got == want, (p, got, want)
    # the canonical example from the geohash spec
    assert ref_geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"


def test_geohash_grid_counts(spark):
    from elasticsearch_osmosis_plugin_spark.operators.geo import geohash_grid

    pts = [(10.0 + i * 0.001, 20.0) for i in range(5)] + [(-40.0, 100.0)] * 3
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = geohash_grid(df, 4).collect()
    assert [r["n_docs"] for r in rows] == [5, 3]


def test_geo_distance_agg(spark):
    """Ring buckets: open ends, overlap, [from, to) boundary."""
    from elasticsearch_osmosis_plugin_spark.operators.geo import (
        geo_distance_agg,
        haversine_km,
    )
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(1, 48.8566, 2.3522),      # 0 km (origin itself)
         (2, 50.0, 8.0),            # ~Frankfurt ~ 450 km
         (3, 40.7, -74.0),          # ~NYC ~ 5840 km
         (4, -33.9, 151.2)],        # ~Sydney ~ 16960 km
        "doc_id long, lat double, lon double")
    got = {r["bucket"]: r["n_docs"]
           for r in geo_distance_agg(
               pts, 48.8566, 2.3522,
               [(None, 1000.0), (1000.0, 10000.0), (5000.0, None)]).collect()}
    assert got == {"*-1000": 2, "1000-10000": 1, "5000-*": 2}
    # boundary is [from, to): a point exactly at 'to' falls out
    d2 = pts.filter(F.col("doc_id") == 2).select(
        haversine_km(F.col("lat"), F.col("lon"),
                     F.lit(48.8566), F.lit(2.3522)).alias("km")).first()["km"]
    edge = {r["bucket"]: r["n_docs"]
            for r in geo_distance_agg(pts, 48.8566, 2.3522,
                                      [(None, d2), (d2, None)]).collect()}
    assert edge[f"{d2:g}-*"] >= 1 and edge[f"*-{d2:g}"] == 1


def test_geo_bounds_and_centroid(spark):
    """geo_bounds = exact bbox; geo_centroid = planar coordinate mean
    (ES averages coordinates) — golden values on 0.25-representable
    points (exact in binary, no float slop)."""
    from elasticsearch_osmosis_plugin_spark.operators.geo import (
        geo_bounds,
        geo_centroid,
    )

    pts = spark.createDataFrame(
        [(1, 10.25, -3.5), (2, -2.75, 7.0), (3, 4.5, 1.25)],
        "doc_id long, lat double, lon double")
    b = geo_bounds(pts).collect()[0]
    assert (b["top"], b["bottom"], b["left"], b["right"]) == \
        (10.25, -2.75, -3.5, 7.0)
    c = geo_centroid(pts).collect()[0]
    assert (c["lat"], c["count"]) == (4.0, 3)
    assert abs(c["lon"] - (-3.5 + 7.0 + 1.25) / 3) < 1e-12


def test_shape_bbox_relations(spark):
    """All four ES geo_shape relations vs the [1,2]x[1,2] envelope:
    enclosing ring = contains (+intersects), inner polyline = within
    (+intersects), crossing segment = intersects only, far shape =
    disjoint; linestrings never contain."""
    from elasticsearch_osmosis_plugin_spark.operators.geo import (
        shape_bbox_relation,
    )

    def ring(pts):
        return [{"lat": float(a), "lon": float(b)} for a, b in pts]

    rows = [
        # closed ring around the whole envelope
        (1, ring([(0, 0), (0, 3), (3, 3), (3, 0), (0, 0)])),
        # polyline fully inside
        (2, ring([(1.2, 1.2), (1.8, 1.8)])),
        # segment crossing the box, both endpoints outside
        (3, ring([(0.0, 1.5), (3.0, 1.5)])),
        # far away
        (4, ring([(10, 10), (11, 11)])),
        # same ring, OPEN encoding: implicitly closed for the area
        # relations, so it behaves exactly like shape 1
        (5, ring([(0, 0), (0, 3), (3, 3), (3, 0)])),
    ]
    df = spark.createDataFrame(
        rows, "id long, coords array<struct<lat:double,lon:double>>")
    got = {}
    for rel in ("intersects", "disjoint", "within", "contains"):
        col = shape_bbox_relation(F.col("coords"), 1.0, 2.0, 1.0, 2.0, rel)
        got[rel] = {r["id"] for r in df.filter(col).collect()}
    assert got["contains"] == {1, 5}
    assert got["within"] == {2}
    assert 2 in got["intersects"] and 3 in got["intersects"] \
        and 1 in got["intersects"]
    assert 4 in got["disjoint"] and 4 not in got["intersects"]
    assert 5 in got["intersects"]
    assert got["intersects"] | got["disjoint"] == {1, 2, 3, 4, 5}
    assert got["intersects"] & got["disjoint"] == set()
    with pytest.raises(ValueError):
        shape_bbox_relation(F.col("coords"), 1, 2, 1, 2, "overlaps")
