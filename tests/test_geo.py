"""Geospatial radius join: brute-force haversine parity on random points,
antimeridian wrap, high-latitude reach, and plan shape."""

import math
import random

import pytest


def _hav(lat1, lng1, lat2, lng2):
    R = 6371.0088
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lng1, lat2, lng2))
    a = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * R * math.asin(min(1.0, math.sqrt(a)))


def test_radius_join_matches_brute_force(spark):
    """Random world points incl. clusters: the bucketed join finds EXACTLY
    the brute-force pair set at the exact distances."""
    from enterprise_warp_spark.operators.geo import radius_join

    rng = random.Random(17)
    pts = []
    # clusters around three cities + global scatter
    for cx, cy in ((48.85, 2.35), (-33.87, 151.21), (64.1, -21.9)):
        for i in range(25):
            pts.append((cx + rng.uniform(-0.5, 0.5), cy + rng.uniform(-0.5, 0.5)))
    for _ in range(60):
        pts.append((rng.uniform(-85, 85), rng.uniform(-180, 180)))
    left = spark.createDataFrame(
        [(i, la, ln) for i, (la, ln) in enumerate(pts)], "id long, lat double, lng double"
    )
    radius = 30.0
    got = {
        (r["id_l"], r["id_r"]): r["distance_km"]
        for r in radius_join(left, left, radius).collect()
        if r["id_l"] < r["id_r"]
    }
    want = {}
    for i, (la1, ln1) in enumerate(pts):
        for j in range(i + 1, len(pts)):
            la2, ln2 = pts[j]
            d = _hav(la1, ln1, la2, ln2)
            if d <= radius:
                want[(i, j)] = d
    assert set(got) == set(want)
    assert len(want) > 30  # clusters guarantee a real pair population
    for k, d in want.items():
        assert got[k] == pytest.approx(d, rel=1e-12)


def test_radius_join_antimeridian_and_high_latitude(spark):
    """Pairs straddling +-180 longitude are found (pmod ring wrap), and
    high-latitude points find longitudinally-distant neighbors (per-row
    reach widening)."""
    from enterprise_warp_spark.operators.geo import haversine_km, radius_join
    from pyspark.sql import functions as F

    pts = [
        (1, 0.0, 179.95), (2, 0.0, -179.95),   # ~11 km apart across the seam
        (3, 85.0, 10.0), (4, 85.0, 12.0),      # ~19 km apart at lat 85
        (5, 0.0, 0.0),                          # far from everything
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lng double")
    pairs = {
        frozenset((r["id_l"], r["id_r"]))
        for r in radius_join(df, df, 25.0).collect()
        if r["id_l"] != r["id_r"]
    }
    assert frozenset((1, 2)) in pairs
    assert frozenset((3, 4)) in pairs
    assert not any(5 in p for p in pairs)

    # haversine sanity: Paris-London ~343 km
    d = (
        spark.range(1)
        .select(
            haversine_km(F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278))
        )
        .first()[0]
    )
    assert d == pytest.approx(343.5, abs=2.0)


def test_radius_join_plan_no_cartesian(spark):
    from enterprise_warp_spark.operators.geo import radius_join

    df = spark.range(100).selectExpr(
        "id", "cast(id % 90 as double) as lat", "cast(id % 180 as double) as lng"
    )
    plan = (
        radius_join(df, df, 50.0)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    with pytest.raises(ValueError, match="positive"):
        radius_join(df, df, 0)


def test_point_in_polygon_matches_shapely_free_reference(spark):
    """Catalyst ray-cast == a direct Python ray-cast over random points and
    polygons (convex box, concave L-shape, triangle)."""
    from pyspark.sql import functions as F

    from enterprise_warp_spark.operators.geo import (
        point_in_polygon,
        points_in_polygons_join,
    )

    def ref_pip(lat, lng, poly):
        inside = False
        n = len(poly)
        for i in range(n):
            la1, lo1 = poly[i]
            la2, lo2 = poly[(i + 1) % n]
            if (la1 > lat) != (la2 > lat) and lng < (lo2 - lo1) * (
                lat - la1
            ) / (la2 - la1) + lo1:
                inside = not inside
        return inside

    polys = {
        "box": [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)],
        "lshape": [
            (0.0, 20.0), (6.0, 20.0), (6.0, 23.0), (2.0, 23.0),
            (2.0, 26.0), (0.0, 26.0),
        ],
        "triangle": [(-10.0, -10.0), (-10.0, -2.0), (-3.0, -6.0)],
    }
    rng = __import__("random").Random(7)
    pts = [
        (i, rng.uniform(-12, 12), rng.uniform(-12, 28)) for i in range(300)
    ]
    points = spark.createDataFrame(pts, "id long, lat double, lng double")
    polygons = spark.createDataFrame(
        [
            (name, [{"lat": a, "lng": b} for a, b in verts])
            for name, verts in polys.items()
        ],
        "name string, polygon array<struct<lat:double,lng:double>>",
    )
    got = {
        (r["id"], r["name"])
        for r in points_in_polygons_join(points, polygons).collect()
    }
    want = {
        (i, name)
        for i, la, lo in pts
        for name, verts in polys.items()
        if ref_pip(la, lo, verts)
    }
    assert got == want
    assert len(want) > 20  # the point cloud really covers the polygons

    # column form composes in a select
    one = (
        points.limit(1)
        .crossJoin(polygons.filter("name = 'box'"))
        .select(point_in_polygon("lat", "lng", "polygon").alias("inside"))
        .first()
    )
    assert one["inside"] in (True, False)


def test_cell_blocked_polygon_join_matches_broadcast(spark):
    """The cell_deg bbox-blocked strategy (for polygon tables too big to
    broadcast) returns EXACTLY the broadcast path's pairs, compiles to an
    equi-join (no cartesian / nested-loop), skips degenerate polygons, and
    enforces the loud bbox-cell guard."""
    import pytest
    from pyspark.sql import functions as F

    from enterprise_warp_spark.operators.geo import points_in_polygons_join

    polys = {
        "box": [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)],
        "lshape": [
            (0.0, 20.0), (6.0, 20.0), (6.0, 23.0), (2.0, 23.0),
            (2.0, 26.0), (0.0, 26.0),
        ],
        "triangle": [(-10.0, -10.0), (-10.0, -2.0), (-3.0, -6.0)],
        "degenerate": [(1.0, 1.0), (2.0, 2.0)],
    }
    rng = __import__("random").Random(11)
    pts = [(i, rng.uniform(-12, 12), rng.uniform(-12, 28)) for i in range(400)]
    points = spark.createDataFrame(pts, "id long, lat double, lng double")
    polygons = spark.createDataFrame(
        [
            (name, [{"lat": a, "lng": b} for a, b in verts])
            for name, verts in polys.items()
        ],
        "name string, polygon array<struct<lat:double,lng:double>>",
    )
    want = {
        (r["id"], r["name"])
        for r in points_in_polygons_join(points, polygons).collect()
    }
    assert len(want) > 20
    for cell in (3.0, 7.5, 40.0):  # finer and coarser than the polygons
        blocked = points_in_polygons_join(points, polygons, cell_deg=cell)
        got = {(r["id"], r["name"]) for r in blocked.collect()}
        assert got == want, cell
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    with pytest.raises(ValueError, match="cells"):
        points_in_polygons_join(
            points, polygons, cell_deg=0.05, max_cells_per_polygon=10
        ).collect()
    with pytest.raises(ValueError, match="cell_deg"):
        points_in_polygons_join(points, polygons, cell_deg=-1.0)


def test_geo_review_regressions(spark):
    """Review fixes: high-latitude pairs inside the radius are found (the
    old reach cap and own-cos reach both missed them); duplicate input
    rows keep their multiplicity; degenerate polygons contain nothing;
    shared column names between points and polygons disambiguate."""
    from enterprise_warp_spark.operators.geo import (
        point_in_polygon,
        points_in_polygons_join,
        radius_join,
    )

    # the reviewer's verified-miss cases
    high = spark.createDataFrame(
        [
            (1, 89.5, 0.0), (2, 89.5, 40.0),          # 38 km apart near pole
            (3, 88.636, 89.92), (4, 88.740, 109.11),  # 49.97 km, cos-edge case
        ],
        "id long, lat double, lng double",
    )
    pairs = {
        frozenset((r["id_l"], r["id_r"]))
        for r in radius_join(high, high, 50.0).collect()
        if r["id_l"] != r["id_r"]
    }
    assert frozenset((1, 2)) in pairs
    assert frozenset((3, 4)) in pairs

    # duplicate input rows preserve multiplicity (no global distinct)
    dup = spark.createDataFrame(
        [(1, 10.0, 10.0), (1, 10.0, 10.0), (2, 10.1, 10.1)],
        "id long, lat double, lng double",
    )
    n = radius_join(dup, dup.filter("id = 2"), 30.0).count()
    assert n == 3  # both copies of id 1 match id 2, plus id 2 itself

    # degenerate polygons: empty and 2-vertex arrays contain nothing
    pts = spark.createDataFrame([(1, 5.0, 5.0)], "id long, lat double, lng double")
    degen = spark.createDataFrame(
        [
            ("empty", []),
            ("line", [{"lat": 0.0, "lng": 0.0}, {"lat": 10.0, "lng": 10.0}]),
        ],
        "name string, polygon array<struct<lat:double,lng:double>>",
    )
    assert points_in_polygons_join(pts, degen).count() == 0

    # shared lat/lng columns on the polygon side (centroids) disambiguate
    geof = spark.createDataFrame(
        [
            (
                "box", 5.0, 5.0,
                [{"lat": 0.0, "lng": 0.0}, {"lat": 0.0, "lng": 10.0},
                 {"lat": 10.0, "lng": 10.0}, {"lat": 10.0, "lng": 0.0}],
            )
        ],
        "name string, lat double, lng double, polygon array<struct<lat:double,lng:double>>",
    )
    out = points_in_polygons_join(pts, geof).collect()
    assert len(out) == 1 and out[0]["name"] == "box"
