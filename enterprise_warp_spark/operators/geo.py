"""Geospatial primitives: haversine distance and scale-safe radius joins.

The distance-join shape every location workload needs ("pairs of points
within R km"), built on the same bucket-equi-join discipline as the LSH /
ANN candidate generators: quantize points to equirectangular grid cells,
explode ONE side's neighborhood cells, equi-join on cell id, verify with
exact haversine. Never an all-pairs cross join.

Correctness at any latitude: a longitude degree shrinks by cos(lat), so a
fixed-degree cell covers fewer km east-west near the poles. The probe
side's neighborhood therefore widens per row — each point computes its
OWN longitude cell reach from its latitude — rather than assuming the
equator's 111 km/degree. Latitudes beyond ±89.9° fall back to a
full-longitude-ring neighborhood cap (documented; the cells there are
tiny slivers and the verify step keeps exactness).

All Catalyst: cell math is integer arithmetic, the neighborhood explode
is a sequence() product, haversine is trig columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
KM_PER_DEG_LAT = 111.19492664455873  # pi * R / 180

# longitude-neighbor cap: beyond this many cells per side, use the whole
# longitude ring (only reachable within ~0.1 deg of a pole)
_MAX_LNG_REACH = 64


def haversine_km(
    lat1: Column | str, lng1: Column | str, lat2: Column | str, lng2: Column | str
) -> Column:
    """Great-circle distance in km (haversine formula, mean Earth radius)."""
    la1, lo1, la2, lo2 = (
        F.radians(F.col(c) if isinstance(c, str) else c)
        for c in (lat1, lng1, lat2, lng2)
    )
    a = (
        F.pow(F.sin((la2 - la1) / 2), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2)
    )
    # clamp for 1-ulp overshoot at antipodes before asin
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def _cell(lat: Column, lng: Column, cell_deg: float) -> tuple[Column, Column]:
    """Integer (lat_cell, lng_cell) on the equirectangular grid."""
    return (
        F.floor(lat / cell_deg).cast("long"),
        F.floor(lng / cell_deg).cast("long"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs within `radius_km` great-circle distance,
    with a `distance_km` column appended. Columns from each side get the
    respective suffix.

    Plan shape: the RIGHT side maps to its single cell; the LEFT side
    explodes its neighborhood (lat reach fixed by the radius; lng reach
    computed per row from the point's latitude) and the join is a plain
    equi-join on (lat_cell, lng_cell) followed by exact haversine
    verification — candidates are bounded by local density, never
    |left| x |right|."""
    if radius_km <= 0:
        raise ValueError(f"radius_km must be positive, got {radius_km}")
    cell_deg = radius_km / KM_PER_DEG_LAT  # one lat-cell >= radius tall
    lat_reach = 1  # radius <= one cell of latitude by construction
    # longitude cells tile the ring EXACTLY (n_ring cells of 360/n_ring
    # degrees each, every cell >= cell_deg wide) so pmod-wrapped neighbor
    # cells handle pairs straddling the +-180 antimeridian correctly
    n_ring = max(1, int(360.0 // cell_deg))
    lng_cell_deg = 360.0 / n_ring
    max_reach = min(_MAX_LNG_REACH, n_ring // 2 + 1)

    def prefixed(df, suffix):
        return df.select([F.col(c).alias(f"{c}{suffix}") for c in df.columns])

    l_pref, r_pref = (
        prefixed(left, suffixes[0]),
        prefixed(right, suffixes[1]),
    )
    llat, llng = F.col(f"{lat_col}{suffixes[0]}"), F.col(f"{lng_col}{suffixes[0]}")
    rlat, rlng = F.col(f"{lat_col}{suffixes[1]}"), F.col(f"{lng_col}{suffixes[1]}")

    def lng_cell(lng):
        return F.pmod(F.floor(lng / lng_cell_deg).cast("long"), F.lit(n_ring))

    r_cells = r_pref.withColumn(
        "__latc", F.floor(rlat / cell_deg).cast("long")
    ).withColumn("__lngc", lng_cell(rlng))

    # per-row longitude reach: how many cells east/west `radius_km` spans
    # at THIS latitude (cos shrinks the km width of a lng cell); capped at
    # half the ring (covers every cell) and guarded against the cos->0 pole
    km_per_lng_deg = KM_PER_DEG_LAT * F.cos(F.radians(llat))
    reach = F.least(
        F.when(
            km_per_lng_deg * lng_cell_deg > radius_km / _MAX_LNG_REACH,
            F.ceil(radius_km / (km_per_lng_deg * lng_cell_deg)),
        ).otherwise(F.lit(max_reach)),
        F.lit(max_reach),
    ).cast("int")
    l_cells = (
        l_pref.withColumn("__latc0", F.floor(llat / cell_deg).cast("long"))
        .withColumn("__lngc0", F.floor(llng / lng_cell_deg).cast("long"))
        .withColumn("__reach", reach)
        .withColumn(
            "__dlat", F.explode(F.sequence(F.lit(-lat_reach), F.lit(lat_reach)))
        )
        .withColumn(
            "__dlng", F.explode(F.sequence(-F.col("__reach"), F.col("__reach")))
        )
        .withColumn("__latc", F.col("__latc0") + F.col("__dlat"))
        .withColumn(
            "__lngc",
            F.pmod(F.col("__lngc0") + F.col("__dlng"), F.lit(n_ring)),
        )
        .drop("__latc0", "__lngc0", "__reach", "__dlat", "__dlng")
    )

    joined = l_cells.join(r_cells, ["__latc", "__lngc"]).drop(
        "__latc", "__lngc"
    )
    dist = haversine_km(llat, llng, rlat, rlng)
    return (
        joined.withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= radius_km)
        .distinct()  # neighborhood overlap can produce duplicate candidates
    )


def point_in_polygon(
    lat: Column | str, lng: Column | str, polygon_col: Column | str
) -> Column:
    """Ray-casting containment test, fully in Catalyst: `polygon_col` is an
    array<struct<lat:double, lng:double>> of vertices (closed implicitly);
    returns true when the point is inside (edge-touching points follow the
    half-open ray-cast convention). The whole test is one aggregate() fold
    over the vertex array — no Python, no explode.

    Planar semantics on lat/lng coordinates — correct for polygons that do
    not cross the antimeridian or enclose a pole (split such polygons
    upstream, the standard GIS contract for equirectangular ray casts)."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lng) if isinstance(lng, str) else lng
    poly = F.col(polygon_col) if isinstance(polygon_col, str) else polygon_col
    # fold over edges (v[i], v[i+1 mod n]): count ray crossings rightward
    return F.expr(
        f"""
        aggregate(
          sequence(0, size({poly._jc.toString()}) - 1),
          named_struct('inside', false),
          (acc, i) -> named_struct('inside',
            CASE WHEN (
              (element_at({poly._jc.toString()}, i + 1).lat > {la._jc.toString()})
                != (element_at({poly._jc.toString()},
                      (i + 1) % size({poly._jc.toString()}) + 1).lat > {la._jc.toString()})
              AND {lo._jc.toString()} <
                (element_at({poly._jc.toString()},
                   (i + 1) % size({poly._jc.toString()}) + 1).lng
                 - element_at({poly._jc.toString()}, i + 1).lng)
                * ({la._jc.toString()} - element_at({poly._jc.toString()}, i + 1).lat)
                / (element_at({poly._jc.toString()},
                     (i + 1) % size({poly._jc.toString()}) + 1).lat
                   - element_at({poly._jc.toString()}, i + 1).lat)
                + element_at({poly._jc.toString()}, i + 1).lng
            ) THEN NOT acc.inside ELSE acc.inside END),
          acc -> acc.inside
        )
        """
    )


def points_in_polygons_join(
    points: DataFrame,
    polygons: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    polygon_col: str = "polygon",
) -> DataFrame:
    """Spatial containment join: each point paired with every polygon that
    contains it. The polygon table (with its vertex arrays) is broadcast —
    region/geofence tables are small by nature — and the exact ray-cast
    runs as the join predicate's filter; no shuffle of the point side."""
    return points.crossJoin(F.broadcast(polygons)).filter(
        point_in_polygon(lat_col, lng_col, polygon_col)
    )
