"""Geo functions, Solr date-math parser, and Jaro-Winkler strdist."""

from __future__ import annotations

import math

import pytest

from solr_spark.functions.datemath import date_math, date_math_sql, parse_ops
from solr_spark.functions.textanalysis import jaro_winkler_kernel


# ------------------------------------------------------------------- date math


def test_parse_ops_now_round_sub():
    assert parse_ops("NOW/DAY-7DAYS") == (None, [("round", "DAY"),
                                                 ("add", -7, "DAY")])


def test_parse_ops_anchored():
    anchor, ops = parse_ops("2024-03-15T10:30:00Z/HOUR+30MINUTES")
    assert anchor == "2024-03-15T10:30:00Z"
    assert ops == [("round", "HOUR"), ("add", 30, "MINUTE")]


def test_parse_ops_unit_aliases():
    assert parse_ops("NOW/DATE")[1] == [("round", "DAY")]
    assert parse_ops("NOW+2MILLIS")[1] == [("add", 2, "MILLISECOND")]


@pytest.mark.parametrize("bad", ["TODAY", "NOW//", "NOW+XDAYS", "NOW/FORTNIGHT",
                                 "2024-03-15/DAY"])
def test_parse_ops_rejects(bad):
    with pytest.raises(ValueError):
        parse_ops(bad)


def test_date_math_matches_duckdb_twin():
    duckdb = pytest.importorskip("duckdb")
    exprs = ["2024-03-15T10:30:45Z/DAY-7DAYS",
             "2024-03-15T10:30:45Z/HOUR+30MINUTES",
             "2024-01-31T23:59:59Z/MONTH+1MONTH-1SECOND",
             "2024-03-15T10:30:45Z-2YEARS/YEAR"]
    con = duckdb.connect()
    for e in exprs:
        got = con.execute(f"select {date_math_sql(e)}").fetchone()[0]
        assert got is not None


def test_date_math_column(spark):
    row = spark.range(1).select(
        date_math("2024-03-15T10:30:45Z/DAY-7DAYS").alias("a"),
        date_math("NOW/DAY", now="2024-03-15T10:30:45Z").alias("b"),
    ).head()
    assert str(row["a"]) == "2024-03-08 00:00:00"
    assert str(row["b"]) == "2024-03-15 00:00:00"


# ------------------------------------------------------------------------- geo


def test_haversine_known_distance(spark):
    from solr_spark.functions.geo import geodist, geofilt

    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343.5 km
    df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
    d = df.select(geodist("lat", "lon", 51.5074, -0.1278).alias("km")).head()["km"]
    assert abs(d - 343.5) < 1.0
    assert df.where(geofilt("lat", "lon", 51.5074, -0.1278, 350)).count() == 1
    assert df.where(geofilt("lat", "lon", 51.5074, -0.1278, 300)).count() == 0


def test_bbox_circumscribes_geofilt(spark):
    from solr_spark.functions.geo import bbox_filter, geofilt

    pts = [(float(la), float(lo)) for la in range(-60, 61, 15)
           for lo in range(-170, 171, 20)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    inside = df.where(geofilt("lat", "lon", 30.0, 40.0, 2000.0))
    boxed = df.where(bbox_filter("lat", "lon", 30.0, 40.0, 2000.0))
    assert inside.exceptAll(boxed).count() == 0  # box is a superset
    assert boxed.count() >= inside.count()


def test_geo_grid_cell(spark):
    from solr_spark.functions.geo import geo_grid_cell

    df = spark.createDataFrame([(0.5, 0.5), (0.7, 0.1), (5.5, 0.5)],
                               "lat double, lon double")
    cells = [r[0] for r in df.select(geo_grid_cell("lat", "lon", 1.0)).collect()]
    assert cells[0] == cells[1] != cells[2]


def test_haversine_matches_pure_python(spark):
    from solr_spark.functions.geo import EARTH_MEAN_RADIUS_KM, geodist

    def hav(la1, lo1, la2, lo2):
        la1, lo1, la2, lo2 = map(math.radians, (la1, lo1, la2, lo2))
        a = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
        return 2 * EARTH_MEAN_RADIUS_KM * math.asin(math.sqrt(a))

    pts = [(12.3, 45.6), (-33.9, 151.2), (89.0, 0.0), (0.0, -179.9)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [r[0] for r in
           df.select(geodist("lat", "lon", 10.0, 20.0)).collect()]
    for (la, lo), g in zip(pts, got):
        assert abs(g - hav(la, lo, 10.0, 20.0)) < 1e-9


# ---------------------------------------------------------------- jaro-winkler


def test_jw_kernel_matches_duckdb():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    pairs = [("martha", "marhta"), ("dixon", "dicksonx"), ("", ""), ("a", ""),
             ("Customer#000000001", "Customer#000000042"),
             ("prefix match long", "prefix match lonh")]
    for a, b in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(jaro_winkler_kernel(a, b) - want) < 1e-12, (a, b)


def test_jw_udf(spark):
    from solr_spark.functions.textanalysis import jaro_winkler

    df = spark.createDataFrame([("martha", "marhta"), ("abc", "xyz")],
                               "a string, b string")
    got = [r[0] for r in df.select(jaro_winkler("a", "b")).collect()]
    assert abs(got[0] - 0.9611111111111111) < 1e-12
    assert got[1] == 0.0


def test_polygon_contains(spark):
    """Even-odd ray casting: inside/outside/bbox-cut points of a triangle,
    and a concave quad where the bbox alone would be wrong."""
    from pyspark.sql import functions as F

    from solr_spark.functions.geo import polygon_contains

    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    pts = [(1.0, 1.0, True),    # inside
           (9.0, 9.0, False),   # inside the bbox, outside the hypotenuse
           (-1.0, 5.0, False),  # outside bbox
           (5.0, 4.0, True)]
    df = spark.createDataFrame([(la, lo) for la, lo, _ in pts],
                               "lat double, lon double")
    got = [r[0] for r in
           df.select(polygon_contains("lat", "lon", tri)).collect()]
    assert got == [w for _, _, w in pts]

    # concave "arrow": (0,0) (4,2) (0,4) (8,2) — centroid-side points differ
    arrow = [(0.0, 0.0), (2.0, 4.0), (4.0, 0.0), (2.0, 8.0)]
    df2 = spark.createDataFrame([(2.0, 1.0), (2.0, 5.0), (2.0, 3.0)],
                                "lat double, lon double")
    got2 = [r[0] for r in
            df2.select(polygon_contains("lat", "lon", arrow)).collect()]
    # ray casting handles concavity: in, in, and the notch depends on shape —
    # pin against a pure-Python twin
    def twin(lat, lon):
        c = 0
        n = len(arrow)
        for i in range(n):
            y1, x1 = arrow[i]
            y2, x2 = arrow[(i + 1) % n]
            if y1 == y2:
                continue
            if ((y1 > lat) != (y2 > lat)) and \
                    lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                c += 1
        return c % 2 == 1
    assert got2 == [twin(2.0, 1.0), twin(2.0, 5.0), twin(2.0, 3.0)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        polygon_contains("lat", "lon", [(0.0, 0.0), (1.0, 1.0)])
