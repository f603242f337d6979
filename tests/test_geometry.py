"""Geometry convention unit tests (functions/geometry.py): WKT roundtrip
exactness, malformed-input nulls, bbox border inclusivity, grid cells on
negative coordinates, distance identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from agol_pandas_spark.functions.geometry import (
    grid_cell,
    in_bbox,
    parse_point_wkt,
    planar_distance,
    point_wkt,
)


def test_wkt_roundtrip_exact(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(-200, 200, 7)], "cdeg long"
    ).select(
        (F.col("cdeg").cast("double") / 100).alias("x"),
        (F.col("cdeg").cast("double") / 4).alias("y"),
    )
    back = df.select(
        "x", "y", parse_point_wkt(point_wkt(F.col("x"), F.col("y"))).alias("p")
    )
    bad = back.filter(
        (F.col("p.x") != F.col("x")) | (F.col("p.y") != F.col("y"))
    ).count()
    assert bad == 0  # bit-exact roundtrip for 2-decimal data


def test_parse_malformed_yields_null(spark):
    df = spark.createDataFrame(
        [("POINT (1.5 -2.5)",), ("LINESTRING (0 0, 1 1)",), ("garbage",), (None,)],
        "wkt string",
    )
    rows = df.select(parse_point_wkt(F.col("wkt")).alias("p")).collect()
    assert (rows[0]["p"]["x"], rows[0]["p"]["y"]) == (1.5, -2.5)
    for r in rows[1:]:
        assert r["p"]["x"] is None and r["p"]["y"] is None


def test_bbox_borders_inclusive(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (1.0001, 0.5), (-1.0, -1.0), (0.5, -1.0001)],
        "x double, y double",
    )
    got = df.filter(in_bbox(F.col("x"), F.col("y"), -1.0, -1.0, 1.0, 1.0)).count()
    assert got == 3  # corners on the border count, outside-by-epsilon don't


def test_grid_cell_negative_coords(spark):
    df = spark.createDataFrame(
        [(-0.1, -0.1), (0.1, 0.1), (-30.0, 29.9)], "x double, y double"
    )
    cells = [
        (r["c"]["cx"], r["c"]["cy"])
        for r in df.select(grid_cell(F.col("x"), F.col("y"), 30.0).alias("c")).collect()
    ]
    # floor semantics: negatives round toward -inf (no cell straddles 0)
    assert cells == [(-1, -1), (0, 0), (-1, 0)]


def test_planar_distance_pythagorean(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    d = df.select(
        planar_distance(F.col("x"), F.col("y"), F.lit(0.0), F.lit(0.0)).alias("d")
    ).first()["d"]
    assert d == 5.0


def test_raycast_polygon_matches_python_reference(spark):
    """in_polygon_raycast vs a classic Python ray-caster on a concave
    arrow-head, including points inside the notch — where the convex
    edge-sign test misclassifies (proving the new predicate is not
    redundant with in_convex_polygon)."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.functions.geometry import (
        in_convex_polygon,
        in_polygon_raycast,
    )

    poly = [(-60.5, -40.5), (60.5, -40.5), (60.5, 40.5), (0.0, 0.0),
            (-60.5, 40.5)]

    def ref_inside(px, py):
        n, inside = len(poly), False
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 <= py) != (y2 <= py):
                xcross = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
                if px < xcross:
                    inside = not inside
        return inside

    pts = [
        (0.0, 20.0),     # inside the notch: OUTSIDE the polygon
        (0.0, -20.0),    # deep inside
        (-40.0, 30.0),   # left wing: inside
        (40.0, 30.0),    # right wing: inside
        (-70.0, 0.0),    # left of everything
        (0.0, 50.0),     # above
        (59.0, -39.0),   # near corner, inside
    ]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {
        (r["x"], r["y"]): r["in_poly"]
        for r in df.select(
            "x", "y",
            in_polygon_raycast(F.col("x"), F.col("y"), poly).alias("in_poly"),
        ).collect()
    }
    for px, py in pts:
        assert got[(px, py)] == ref_inside(px, py), (px, py)
    # the notch point is the convex test's failure mode: ray-cast says
    # outside (correct), a naive all-edges-left test cannot represent it
    assert got[(0.0, 20.0)] is False
    assert got[(0.0, -20.0)] is True
