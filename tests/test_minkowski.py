"""ST_MinkowskiSum (functions/minkowski.py)."""

from __future__ import annotations

import math
import random

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    minkowski as MK,
)


def _area(w: str) -> float:
    return G.area(G.parse_wkt(w))


def test_box_plus_box_is_summed_box():
    r = MK.minkowski_wkt(
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))",
    )
    g = G.parse_wkt(r)
    assert g.kind == "Polygon"
    assert _area(r) == 25.0
    assert G.bbox(g) == (0.0, 0.0, 5.0, 5.0)


def test_point_is_rigid_translation_with_holes():
    r = MK.minkowski_wkt(
        "POINT (10 20)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    )
    assert r == (
        "POLYGON ((10 20, 14 20, 14 24, 10 24, 10 20), "
        "(11 21, 12 21, 12 22, 11 22, 11 21))"
    )


def test_segment_sweep():
    r = MK.minkowski_wkt(
        "LINESTRING (0 0, 5 0)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    )
    assert _area(r) == 14.0  # (5 + 2) · 2


def test_concave_dilation_exact():
    # rectilinear L ⊕ unit square: 4×2 ∪ 2×4 = 8 + 8 − 4 = 12 exactly
    r = MK.minkowski_wkt(
        "POLYGON ((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    )
    assert _area(r) == 12.0


def test_multipoint_stamps():
    r = MK.minkowski_wkt(
        "MULTIPOINT (0 0, 10 0)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    )
    g = G.parse_wkt(r)
    assert g.kind == "MultiPolygon" and _area(r) == 8.0


def test_gates():
    sq = "POLYGON ((0 0, 1 0, 0 1, 0 0))"
    assert MK.minkowski_wkt("POLYGON EMPTY", sq) == "POLYGON EMPTY"
    assert MK.minkowski_wkt(sq, "POINT EMPTY") == "POLYGON EMPTY"
    assert MK.minkowski_wkt("POINT (1 2)", "LINESTRING (0 0, 1 1)") is None
    assert MK.minkowski_wkt("GEOMETRYCOLLECTION (POINT (1 2))", sq) is None
    assert MK.minkowski_wkt("junk", sq) is None
    assert MK.minkowski_wkt(sq, "junk") is None
    assert MK.minkowski_wkt(None, sq) is None
    # holed FIRST argument: outside the ear clipper — loud
    holed = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    assert MK.minkowski_wkt(holed, sq) is None


def test_fuzz_convex_area_identity():
    # for convex P and an axis-aligned box Q of side s:
    # area(P ⊕ Q) = A(P) + s² + s·(bbox_width(P) + bbox_height(P))
    # (the mixed-area term: s/2 · (Σ|dx| + Σ|dy|) = s·(w + h) on a
    # convex ring)
    rng = random.Random(21)
    for _ in range(60):
        n = rng.randint(3, 7)
        angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
        pts = [(math.cos(a) * 5, math.sin(a) * 5) for a in angles]
        hull = G.convex_hull(G.Geometry("MultiPoint", pts))
        if hull.kind != "Polygon":
            continue
        s = rng.choice([1, 2, 3])
        q = f"POLYGON ((0 0, {s} 0, {s} {s}, 0 {s}, 0 0))"
        r = MK.minkowski_wkt(G.to_wkt(hull), q)
        assert r is not None
        x0, y0, x1, y1 = G.bbox(hull)
        want = G.area(hull) + s * s + s * ((x1 - x0) + (y1 - y0))
        assert abs(_area(r) - want) < 1e-6 * max(1.0, want)


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT st_area(st_minkowskisum('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',"
        " 'POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))')) AS a,"
        " st_minkowskisum('POINT (5 5)',"
        " 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))') AS t"
    ).collect()[0]
    assert row["a"] == 25.0
    assert row["t"] == "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"
