"""Geospatial functions: geodist / geofilt / bbox / heatmap grid cells.

Reference analogs (all re-expressed as JVM Column expressions — whole-stage
codegen, no UDFs):
  * `geodist()` / `hsin()` function queries — Haversine great-circle distance
    (solr/core/src/java/org/apache/solr/search/ValueSourceParser.java "geodist",
    "hsin"; math in Lucene spatial's DistanceUtils, a dependency).
  * `{!geofilt pt=.. d=..}` / `{!bbox}` spatial filters
    (solr/core/src/java/org/apache/solr/search/SpatialFilterQParserPlugin.java,
    schema/LatLonPointSpatialField.java:61).
  * Spatial heatmap facets — counts per geo grid cell
    (solr/core/src/java/org/apache/solr/handler/component/SpatialHeatmapFacets.java);
    our analog buckets by a fixed-degree grid, the natural groupBy shape.

Distances are kilometers over the mean-earth-radius sphere (6371.0087714 km,
the constant Lucene's DistanceUtils uses), matching Solr's geodist output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_MEAN_RADIUS_KM = 6371.0087714


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def haversine_km(lat1: Column | str, lon1: Column | str,
                 lat2: Column | str, lon2: Column | str) -> Column:
    """Great-circle distance in km between two (lat, lon) degree pairs."""
    la1, lo1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    la2, lo2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    dlat, dlon = la2 - la1, lo2 - lo1
    a = (F.sin(dlat / 2) ** 2
         + F.cos(la1) * F.cos(la2) * F.sin(dlon / 2) ** 2)
    return F.lit(2.0 * EARTH_MEAN_RADIUS_KM) * F.asin(F.sqrt(a))


def geodist(lat_col: Column | str, lon_col: Column | str,
            pt_lat: float, pt_lon: float) -> Column:
    """`geodist(sfield, pt)`: km from each row's point to a fixed point."""
    return haversine_km(lat_col, lon_col, F.lit(float(pt_lat)),
                        F.lit(float(pt_lon)))


def geofilt(lat_col: Column | str, lon_col: Column | str,
            pt_lat: float, pt_lon: float, d_km: float) -> Column:
    """`{!geofilt}`: boolean predicate, true within d_km of the point."""
    return geodist(lat_col, lon_col, pt_lat, pt_lon) <= F.lit(float(d_km))


def bbox_filter(lat_col: Column | str, lon_col: Column | str,
                pt_lat: float, pt_lon: float, d_km: float) -> Column:
    """`{!bbox}`: cheap bounding-box predicate circumscribing the d_km circle.

    Matches MORE rows than geofilt (the box's corners), exactly like the
    reference's bbox parser; use as a pushdown-friendly pre-filter.
    """
    import math

    dlat = math.degrees(d_km / EARTH_MEAN_RADIUS_KM)
    cos_lat = math.cos(math.radians(pt_lat))
    dlon = dlat / max(cos_lat, 1e-9)
    lat, lon = _c(lat_col), _c(lon_col)
    return (lat.between(pt_lat - dlat, pt_lat + dlat)
            & lon.between(pt_lon - dlon, pt_lon + dlon))


def geo_grid_cell(lat_col: Column | str, lon_col: Column | str,
                  cell_deg: float = 1.0) -> Column:
    """Heatmap grid cell id "row:col" at cell_deg resolution.

    groupBy(geo_grid_cell(...)).count() is the heatmap facet.
    """
    row = F.floor((_c(lat_col) + F.lit(90.0)) / F.lit(float(cell_deg)))
    colc = F.floor((_c(lon_col) + F.lit(180.0)) / F.lit(float(cell_deg)))
    return F.concat_ws(":", row.cast("long"), colc.cast("long"))


def polygon_contains(lat_col: Column | str, lon_col: Column | str,
                     polygon: list[tuple[float, float]]) -> Column:
    """Point-in-polygon predicate for a LITERAL polygon — the RPT/geometry
    family's `Intersects(POLYGON(...))` filter over point fields (reference:
    schema/AbstractSpatialPrefixTreeFieldType.java:40 + the spatial-extras
    RptWithGeometrySpatialField; we support point-column vs literal-polygon,
    the common filtering shape — polygon COLUMNS remain out of scope).

    Even-odd ray casting in planar (lat, lon) coordinates: the edge list is
    a literal, so the crossing test unrolls into pure JVM Column algebra
    (whole-stage codegen, pushdown-friendly conjunction with a bbox
    pre-filter). Vertices: [(lat, lon), ...], closed implicitly. Points ON an
    edge follow the half-open crossing rule (deterministic, engine-portable).
    """
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    lat, lon = _c(lat_col), _c(lon_col)
    crossings: Column | None = None
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray test
        cond = (
            ((F.lit(float(y1)) > lat) != (F.lit(float(y2)) > lat))
            & (lon < (F.lit(float(x2 - x1)) * (lat - F.lit(float(y1)))
                      / F.lit(float(y2 - y1)) + F.lit(float(x1))))
        )
        c = cond.cast("int")
        crossings = c if crossings is None else crossings + c
    if crossings is None:
        return F.lit(False)
    # bbox pre-filter keeps the unrolled edge tests off non-candidate rows
    lats = [p[0] for p in polygon]
    lons = [p[1] for p in polygon]
    in_box = (lat.between(min(lats), max(lats))
              & lon.between(min(lons), max(lons)))
    return in_box & (crossings % 2 == 1)
