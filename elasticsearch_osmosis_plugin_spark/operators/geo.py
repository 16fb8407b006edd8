"""Geometry operators — the reference's geo surface, Catalyst-native.

Reproduces (re-derived, not ported):
- shape classifier: 1 point -> POINT, open chain -> LINESTRING,
  closed -> POLYGON (``ESShape.getShapeType/isClosed``,
  ``ESShape.java:171-187``)
- per-shape aggregates: planar centroid / length / area computed in
  degree space then converted deg -> km with mean Earth radius
  6371.0087714 (``ESShape.java:160-169,219-228``; JTS planar geometry
  + spatial4j degrees2Dist = deg * pi/180 * R)
- way ⨝ node coordinate lookup join, ORDER-PRESERVING, missing nodes
  dropped (``EntityDao.getNodeItems/getShape``,
  ``EntityDao.java:124-149``)
- geo-distance filter (haversine, ``ESNodeITest.java:148``), bounding
  box filter (envelope analog, ``ESWayITest.java:224-228``), distance
  sort (``ESNodeITest.java:184-193``)

Everything is column expressions (whole-stage codegen): the shoelace
and length folds run over coordinate arrays via F.aggregate — no UDF,
no shuffle beyond the one equi-join.

Coordinates: array<struct<lat:double, lon:double>>.

Golden values from the reference's tests (asserted in
tests/test_geo.py): polygon [(1,2),(2,3),(3,2),(1,2)] -> centroid
(2.0, 2.3333333333333335), length 536.8973391277414 km, area
12364.345757132623 km2 (``EntityDaoITest.java:79-81``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_MEAN_RADIUS_KM = 6371.0087714
DEG_TO_KM = math.pi / 180.0 * EARTH_MEAN_RADIUS_KM


def shape_type(coords: Column) -> Column:
    """A8 classifier. Empty arrays are invalid input (the reference
    throws, ``ESShape.java:177-178``) — mapped to NULL here, callers
    quarantine."""
    first, last = F.element_at(coords, 1), F.element_at(coords, -1)
    return (F.when(F.size(coords) == 0, F.lit(None).cast("string"))
            .when(F.size(coords) == 1, F.lit("point"))
            .when((first["lat"] == last["lat"]) & (first["lon"] == last["lon"]),
                  F.lit("polygon"))
            .otherwise(F.lit("linestring")))


def _segments(coords: Column) -> Column:
    """Consecutive coordinate pairs as array<struct<a, b>>."""
    n = F.size(coords)
    return F.arrays_zip(
        F.slice(coords, 1, n - 1).alias("a"),
        F.slice(coords, 2, n - 1).alias("b"))


def _fold(arr: Column, expr) -> Column:
    return F.aggregate(arr, F.lit(0.0), expr)


def length_km(coords: Column) -> Column:
    """Planar length in degree space * deg->km (reference length
    semantics; for polygons this is the perimeter)."""
    seg_len = lambda s: F.sqrt(  # noqa: E731
        F.pow(s["b"]["lon"] - s["a"]["lon"], 2)
        + F.pow(s["b"]["lat"] - s["a"]["lat"], 2))
    deg = F.when(F.size(coords) <= 1, F.lit(0.0)).otherwise(
        _fold(_segments(coords), lambda acc, s: acc + seg_len(s)))
    return deg * F.lit(DEG_TO_KM)


def _shoelace2(coords: Column) -> Column:
    """Twice the signed planar area in degree^2."""
    return _fold(_segments(coords), lambda acc, s: acc
                 + (s["a"]["lon"] * s["b"]["lat"] - s["b"]["lon"] * s["a"]["lat"]))


def area_km2(coords: Column) -> Column:
    """Reference conversion (``ESShape.java:219-225``):
    km2 = (sqrt(areaDeg2) * DEG_TO_KM)^2 — i.e. areaDeg2 * DEG_TO_KM^2.
    Non-polygons have zero area."""
    deg2 = F.abs(_shoelace2(coords)) / 2.0
    km2 = deg2 * F.lit(DEG_TO_KM * DEG_TO_KM)
    return F.when(shape_type(coords) == "polygon", km2).otherwise(F.lit(0.0))


def centroid(coords: Column) -> Column:
    """JTS planar centroid semantics: point -> itself; linestring ->
    length-weighted mean of segment midpoints; polygon -> area
    centroid (shoelace moments). Returns struct<lat, lon>."""
    segs = _segments(coords)
    seg_len = lambda s: F.sqrt(  # noqa: E731
        F.pow(s["b"]["lon"] - s["a"]["lon"], 2)
        + F.pow(s["b"]["lat"] - s["a"]["lat"], 2))
    total_len = _fold(segs, lambda acc, s: acc + seg_len(s))
    line_lon = _fold(segs, lambda acc, s: acc
                     + (s["a"]["lon"] + s["b"]["lon"]) / 2.0 * seg_len(s)) / total_len
    line_lat = _fold(segs, lambda acc, s: acc
                     + (s["a"]["lat"] + s["b"]["lat"]) / 2.0 * seg_len(s)) / total_len
    cross = lambda s: (s["a"]["lon"] * s["b"]["lat"]  # noqa: E731
                       - s["b"]["lon"] * s["a"]["lat"])
    a2 = _shoelace2(coords)
    poly_lon = _fold(segs, lambda acc, s: acc
                     + (s["a"]["lon"] + s["b"]["lon"]) * cross(s)) / (3.0 * a2)
    poly_lat = _fold(segs, lambda acc, s: acc
                     + (s["a"]["lat"] + s["b"]["lat"]) * cross(s)) / (3.0 * a2)
    st = shape_type(coords)
    pt = F.element_at(coords, 1)
    return (F.when(st == "point",
                   F.struct(pt["lat"].alias("lat"), pt["lon"].alias("lon")))
            .when(st == "polygon",
                  F.struct(poly_lat.alias("lat"), poly_lon.alias("lon")))
            .otherwise(F.struct(line_lat.alias("lat"), line_lon.alias("lon"))))


def shape_aggregates(df: DataFrame, coords_col: str = "coords") -> DataFrame:
    """A7: per-row shape rollups as new columns."""
    c = F.col(coords_col)
    return (df.withColumn("shape_type", shape_type(c))
            .withColumn("centroid", centroid(c))
            .withColumn("length_km", length_km(c))
            .withColumn("area_km2", area_km2(c)))


def build_way_geometry(ways: DataFrame, nodes: DataFrame,
                       way_id: str = "id", node_ids: str = "node_ids",
                       node_id: str = "id") -> DataFrame:
    """A6: the reference's ONE join — way ⨝ node by node id,
    rebuilding each way's coordinate list IN WAY-NODE ORDER; missing
    nodes silently dropped (``EntityDao.java:141``).

    Plan: posexplode(node_ids) -> equi join on node id (AQE picks
    broadcast when nodes are small) -> per-way sort_array over
    (pos, coord) structs. One shuffle (the groupBy), no window."""
    exploded = ways.select(F.col(way_id).alias("way_id"),
                           F.posexplode(F.col(node_ids)).alias("pos", "nid"))
    coords = (exploded
              .join(nodes.select(F.col(node_id).alias("nid"), "lat", "lon"),
                    "nid", "inner")
              .groupBy("way_id")
              .agg(F.transform(
                  F.sort_array(F.collect_list(F.struct("pos", "lat", "lon"))),
                  lambda s: F.struct(s["lat"].alias("lat"), s["lon"].alias("lon")))
                  .alias("coords"),
                  F.count(F.lit(1)).alias("n_resolved")))
    return (ways.join(coords, ways[way_id] == coords.way_id, "inner")
            .select(ways["*"], "coords", "n_resolved"))


def validate_way_arity(df: DataFrame, node_ids: str = "node_ids"):
    """A3 invariant (``ESWay.java:24-26``): resolved coordinate count
    must equal way-node count. Returns (good, quarantine) — explicit,
    never silent (SURVEY §7 watch-list (c))."""
    ok = F.size(F.col(node_ids)) == F.col("n_resolved")
    return df.filter(ok), df.filter(~ok)


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance (B8) as a pure column expression."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.pow(F.sin(dlat / 2), 2)
         + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2))
    return F.lit(2.0 * EARTH_MEAN_RADIUS_KM) * F.asin(F.sqrt(a))


def within_distance(df: DataFrame, lat: float, lon: float, km: float,
                    lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """B8 geo-distance filter."""
    return df.filter(haversine_km(F.col(lat_col), F.col(lon_col),
                                  F.lit(lat), F.lit(lon)) <= km)


def within_bbox(df: DataFrame, lat_min: float, lat_max: float,
                lon_min: float, lon_max: float,
                lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """B7 envelope filter for POINTS — plain range predicates, fully
    pushed down. For way shapes use ``shape_intersects_bbox``."""
    return df.filter(F.col(lat_col).between(lat_min, lat_max)
                     & F.col(lon_col).between(lon_min, lon_max))


def shape_intersects_bbox(coords: Column, lat_min: float, lat_max: float,
                          lon_min: float, lon_max: float) -> Column:
    """B7 with the reference's real semantics: TRUE when the doc shape
    INTERSECTS the query envelope (``ESWayITest.java:97-154``, envelope
    at ``:224-228``) — including a segment crossing the box with both
    endpoints outside, which vertex-containment misses.

    Exact separating-axis test per segment, pure column expressions:
    the box's axes (x, y) are covered by a bbox-overlap check of the
    segment's own bbox, and the segment's normal axis by requiring the
    four box corners NOT to lie strictly on one side of the segment's
    line. Touching counts as intersecting (JTS `intersects`)."""
    la_min, la_max = F.lit(float(lat_min)), F.lit(float(lat_max))
    lo_min, lo_max = F.lit(float(lon_min)), F.lit(float(lon_max))

    def vertex_in(p):
        return p["lat"].between(la_min, la_max) & p["lon"].between(lo_min, lo_max)

    def seg_hits(s):
        a, b = s["a"], s["b"]
        boxes_overlap = (
            (F.greatest(a["lon"], b["lon"]) >= lo_min)
            & (F.least(a["lon"], b["lon"]) <= lo_max)
            & (F.greatest(a["lat"], b["lat"]) >= la_min)
            & (F.least(a["lat"], b["lat"]) <= la_max))
        dx = b["lon"] - a["lon"]
        dy = b["lat"] - a["lat"]

        def side(cx, cy):  # cross(d, corner - a)
            return dx * (cy - a["lat"]) - dy * (cx - a["lon"])

        corners = [side(lo_min, la_min), side(lo_min, la_max),
                   side(lo_max, la_min), side(lo_max, la_max)]
        straddles = (F.least(*corners) <= 0) & (F.greatest(*corners) >= 0)
        return boxes_overlap & straddles

    seg_any = F.when(F.size(coords) >= 2,
                     F.exists(_segments(coords), seg_hits)) \
        .otherwise(F.lit(False))
    return F.exists(coords, vertex_in) | seg_any


def ways_intersecting_bbox(df: DataFrame, lat_min: float, lat_max: float,
                           lon_min: float, lon_max: float,
                           coords_col: str = "coords") -> DataFrame:
    return df.filter(shape_intersects_bbox(
        F.col(coords_col), lat_min, lat_max, lon_min, lon_max))


def sort_by_distance(df: DataFrame, lat: float, lon: float,
                     lat_col: str = "lat", lon_col: str = "lon",
                     id_col: str = "id") -> DataFrame:
    """B9 sort-by-computed-metric with deterministic tie-break."""
    d = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon))
    return (df.withColumn("distance_km", d)
            .orderBy(F.asc("distance_km"), F.asc(id_col)))


def geotile_cell(lat, lon, zoom: int) -> Column:
    """ES geotile_grid bucket key "z/x/y" (web-mercator tile at
    ``zoom``) as a pure column expression — the exact formula ES uses
    (OSM slippy-map tiles). Latitudes are clamped to the web-mercator
    domain (±85.0511...) like ES does."""
    x, y = geotile_xy(lat, lon, zoom)
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"),
                       y.cast("string"))


def geotile_xy(lat, lon, zoom: int) -> tuple[Column, Column]:
    """Web-mercator tile indices (x, y) at ``zoom`` as long columns —
    the shared kernel behind :func:`geotile_cell` (string "z/x/y" key)
    and ES|QL's ``ST_GEOTILE`` (packed long key)."""
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")
    n = float(1 << zoom)
    lat_c = F.greatest(F.lit(-85.05112878),
                       F.least(F.lit(85.05112878), lat))
    phi = F.radians(lat_c)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    y = F.floor((1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi)
                / 2.0 * n).cast("long")
    # the +180/-180 seam maps to the first column, like ES; y needs the
    # same clamp — at lat <= -85.0511... float error pushes the inner
    # value to 1.0+eps and floor(n*that) = n, one past the last row
    x = F.when(x >= n, F.lit(int(n) - 1)).otherwise(
        F.when(x < 0, F.lit(0)).otherwise(x))
    y = F.when(y >= n, F.lit(int(n) - 1)).otherwise(
        F.when(y < 0, F.lit(0)).otherwise(y))
    return x, y


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell(lat, lon, precision: int) -> Column:
    """Geohash of a point at ``precision`` chars (ES geohash_grid /
    geohash_cell bucket key) as a pure column expression.

    The standard encoding: longitude and latitude are binary
    subdivisions of their ranges (lon gets the even interleave bits
    starting at the MSB), 5 bits per base32 character. Rather than the
    textbook per-bit loop, the cell indices are computed in closed
    form — x = floor((lon+180)/360 * 2^lon_bits) — and the interleave
    is unrolled into a fixed sum of shift/mask terms, so the whole
    hash is one whole-stage-codegen arithmetic expression (no UDF)."""
    h = geohash_interleave(lat, lon, precision)
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_BASE32])
    return F.concat(*[
        F.element_at(alphabet,
                     (F.shiftright(h, 5 * (precision - 1 - i))
                      .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for i in range(precision)])


def geohash_interleave(lat, lon, precision: int) -> Column:
    """The geohash's interleaved cell integer (5*precision bits, lon
    bits even-from-MSB) as a long column — the shared kernel behind
    :func:`geohash_cell` (base32 string) and ES|QL's ``ST_GEOHASH``
    (Lucene ``longEncode`` packed long)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = F.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)).cast("long")
    y = F.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)).cast("long")
    x = F.least(F.greatest(x, F.lit(0)), F.lit((1 << lon_bits) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit((1 << lat_bits) - 1))
    # interleaved hash int: bit j from the MSB is lon for even j
    h = F.lit(0).cast("long")
    for j in range(bits):
        src, src_bits, k = (x, lon_bits, j // 2) if j % 2 == 0 \
            else (y, lat_bits, (j - 1) // 2)
        h = h + F.shiftleft(
            F.shiftright(src, src_bits - 1 - k).bitwiseAND(F.lit(1)),
            bits - 1 - j)
    return h


def geohash_grid(df: DataFrame, precision: int, lat_col: str = "lat",
                 lon_col: str = "lon") -> DataFrame:
    """ES geohash_grid aggregation: bucket points by geohash cell ->
    (geohash, n_docs), count-desc then key. One map-side-combined
    groupBy, same shape as :func:`geotile_grid`."""
    cell = geohash_cell(F.col(lat_col), F.col(lon_col), precision)
    return (df.groupBy(cell.alias("geohash"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("geohash")))


def geotile_grid(df: DataFrame, zoom: int, lat_col: str = "lat",
                 lon_col: str = "lon") -> DataFrame:
    """ES geotile_grid aggregation: bucket points by web-mercator tile
    -> (tile, n_docs), count-desc then tile. One map-side-combined
    groupBy over at most 4^zoom keys."""
    cell = geotile_cell(F.col(lat_col), F.col(lon_col), zoom)
    return (df.groupBy(cell.alias("tile"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("tile")))


def geo_distance_agg(df: DataFrame, lat: float, lon: float,
                     ranges, lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """ES geo_distance aggregation: ring buckets of haversine distance
    from an origin -> (bucket, n_docs). Ranges are [from, to) km pairs
    with open ends allowed (None), overlapping allowed — exactly the
    ES range-agg family semantics (each doc counts in EVERY bucket it
    falls in).

    ONE conditional-count pass (like filters_agg): the distance is
    computed once per row inside whole-stage codegen, each bucket is a
    sum(when(...)), and only N_buckets counters cross the exchange —
    no per-bucket scans, no explode.
    """
    d = haversine_km(F.col(lat_col), F.col(lon_col),
                     F.lit(float(lat)), F.lit(float(lon)))
    aggs, keys = [], []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (d >= float(lo))
        if hi is not None:
            cond = cond & (d < float(hi))
        key = (f"{'*' if lo is None else format(float(lo), 'g')}"
               f"-{'*' if hi is None else format(float(hi), 'g')}")
        keys.append(key)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(f"_b{i}"))
    row = df.agg(*aggs)
    pairs = F.array(*[F.struct(F.lit(k).alias("bucket"),
                               F.col(f"_b{i}").alias("n_docs"))
                      for i, k in enumerate(keys)])
    return (row.select(F.explode(pairs).alias("p"))
            .select("p.bucket", "p.n_docs"))


def geo_bounds(df: DataFrame, lat_col: str = "lat",
               lon_col: str = "lon") -> DataFrame:
    """ES geo_bounds aggregation: the bounding box of the point set ->
    one row (top, bottom, left, right). Plain min/max — map-side
    combined, no shuffle beyond 4 scalars."""
    return df.agg(F.max(lat_col).alias("top"),
                  F.min(lat_col).alias("bottom"),
                  F.min(lon_col).alias("left"),
                  F.max(lon_col).alias("right"))


def geo_centroid(df: DataFrame, lat_col: str = "lat",
                 lon_col: str = "lon") -> DataFrame:
    """ES geo_centroid aggregation: arithmetic mean of the points ->
    one row (lat, lon, count) — exactly ES's planar centroid (it
    averages coordinates, not great-circle midpoints)."""
    return df.agg(F.avg(lat_col).alias("lat"),
                  F.avg(lon_col).alias("lon"),
                  F.count(F.lit(1)).alias("count"))


def geo_line(df: DataFrame, bucket_col: str, sort_col: str,
             lat_col: str = "lat", lon_col: str = "lon",
             size: int = 10000) -> DataFrame:
    """ES geo_line aggregation: per bucket, the points joined into a
    LineString in ``sort_col`` order (ES's sort field), truncated at
    ``size`` -> (bucket, line array<[lon, lat]>, doc_count, complete).
    ``complete`` mirrors ES: false when the bucket held more points
    than ``size``.

    One groupBy: the (sort, lon, lat) structs aggregate map-side into
    per-bucket lists, array_sort orders by the struct's leading sort
    field (no window/shuffle beyond the bucket key), and the GeoJSON-
    style [lon, lat] projection is a codegen transform."""
    pts = df.select(
        F.col(bucket_col).alias("bucket"),
        F.struct(F.col(sort_col).cast("double").alias("s"),
                 F.col(lon_col).cast("double").alias("lon"),
                 F.col(lat_col).cast("double").alias("lat")).alias("_p"))
    g = pts.groupBy("bucket").agg(
        F.array_sort(F.collect_list("_p")).alias("_pts"),
        F.count(F.lit(1)).alias("doc_count"))
    line = F.transform(F.slice("_pts", 1, size),
                       lambda p: F.array(p["lon"], p["lat"]))
    return (g.select("bucket", line.alias("line"), "doc_count",
                     (F.col("doc_count") <= F.lit(size)).alias("complete"))
            .orderBy("bucket"))


def point_in_polygon(polygon: list[tuple[float, float]],
                     lat_col: str = "lat", lon_col: str = "lon") -> Column:
    """ES geo_polygon filter predicate: even-odd ray casting of each
    point against a query-literal polygon of (lat, lon) vertices. The
    polygon is query-time constant, so the crossing test UNROLLS into
    one whole-stage-codegen expression (a sum of per-edge conditional
    counts) — no UDF, no join, fully distributable; horizontal edges
    never cross the eastward ray and are skipped at compile time.
    Boundary points follow the strict even-odd rule (edges traced
    half-open in latitude), same as Lucene's crossing count.

    ``lat_col``/``lon_col`` accept a column name or a Column
    expression (the ES|QL ST_* front end passes struct fields)."""
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    y = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    x = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    crossings = F.lit(0)
    n = len(polygon)
    for i in range(n):
        lat1, lon1 = polygon[i]
        lat2, lon2 = polygon[(i + 1) % n]
        if lat1 == lat2:
            continue  # horizontal edge: the eastward ray never crosses
        straddles = (F.lit(lat1) > y) != (F.lit(lat2) > y)
        x_at = (F.lit(lon2 - lon1) * (y - F.lit(lat1))
                / F.lit(lat2 - lat1) + F.lit(lon1))
        crossings = crossings + F.when(straddles & (x < x_at), 1) \
            .otherwise(0)
    return F.pmod(crossings, F.lit(2)) == F.lit(1)


def within_polygon(df: DataFrame, polygon: list[tuple[float, float]],
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ES geo_polygon filter: rows whose point lies inside the polygon
    (see :func:`point_in_polygon`)."""
    return df.filter(point_in_polygon(polygon, lat_col, lon_col))


def _lit_point_in_ring(coords: Column, lat: float, lon: float) -> Column:
    """Even-odd ray cast of a LITERAL point against a column-side ring
    — the dual of :func:`point_in_polygon`, for when the polygon is
    the data. The ring is IMPLICITLY closed (a last->first wrap edge,
    the same ``% n`` convention point_in_polygon uses), so closed and
    open encodings of the same ring agree. Same half-open-in-latitude
    crossing rule; horizontal edges never straddle, and their x_at
    division-by-zero nulls are absorbed by the false straddle
    conjunct."""
    la, lo = F.lit(float(lat)), F.lit(float(lon))

    def crosses(s):
        a, b = s["a"], s["b"]
        straddle = (a["lat"] > la) != (b["lat"] > la)
        x_at = ((b["lon"] - a["lon"]) * (la - a["lat"])
                / (b["lat"] - a["lat"]) + a["lon"])
        return straddle & (lo < x_at)

    wrap = F.array(F.struct(F.element_at(coords, -1).alias("a"),
                            F.element_at(coords, 1).alias("b")))
    edges = F.concat(_segments(coords), wrap)
    return F.pmod(F.size(F.filter(edges, crosses)), F.lit(2)) == F.lit(1)


def shape_bbox_relation(coords: Column, lat_min: float, lat_max: float,
                        lon_min: float, lon_max: float,
                        relation: str = "intersects") -> Column:
    """ES geo_shape query spatial relations against a query envelope
    (``intersects`` / ``disjoint`` / ``within`` / ``contains``), over
    shapes stored as coordinate arrays (linestrings, or rings for
    polygon semantics — the reference's way model; rings may be open
    or closed, the area relations implicitly close them).

    - ``within``: every vertex inside the envelope (the envelope is
      convex, so vertex containment contains the whole polyline);
    - ``contains``: the ring encloses the WHOLE envelope — all four
      envelope corners ray-cast inside AND the boundary never touches
      the box (a boundary crossing would put part of the envelope
      outside); linestrings can never contain an area;
    - ``intersects``: boundary intersection (the B7 separating-axis
      test) OR full enclosure — a ring drawn around the envelope
      intersects it in area semantics even though no segment touches;
    - ``disjoint``: the complement of intersects.

    Everything stays pure column expressions over the literal
    envelope — one codegen pass, no UDF, no join."""
    # rings are implicitly closed for the area relations (the same
    # convention as point_in_polygon's % n wrap): append the closing
    # edge when the encoding is open so the enclosure ray cast and the
    # boundary test see the SAME geometry
    closed = F.when(
        F.element_at(coords, 1) == F.element_at(coords, -1), coords) \
        .otherwise(F.concat(coords, F.array(F.element_at(coords, 1))))
    # open polylines keep pure linestring semantics for the boundary
    # test (no phantom closing edge); the CONTAINS check instead sees
    # the closed geometry, consistent with the enclosure ray cast
    boundary = shape_intersects_bbox(coords, lat_min, lat_max,
                                     lon_min, lon_max)
    boundary_closed = shape_intersects_bbox(closed, lat_min, lat_max,
                                            lon_min, lon_max)
    corners = [(lat_min, lon_min), (lat_min, lon_max),
               (lat_max, lon_min), (lat_max, lon_max)]
    enclosed = F.size(coords) >= F.lit(4)
    for la, lo in corners:
        enclosed = enclosed & _lit_point_in_ring(coords, la, lo)
    contains = enclosed & ~boundary_closed
    if relation == "contains":
        return contains
    if relation == "intersects":
        return boundary | contains
    if relation == "disjoint":
        return ~(boundary | contains)
    if relation == "within":
        la_min, la_max = F.lit(float(lat_min)), F.lit(float(lat_max))
        lo_min, lo_max = F.lit(float(lon_min)), F.lit(float(lon_max))
        return (F.size(coords) >= 1) & F.forall(
            coords, lambda p: p["lat"].between(la_min, la_max)
            & p["lon"].between(lo_min, lo_max))
    raise ValueError(f"unknown geo_shape relation: {relation}")
