"""Bounding family kernels (functions/bounding.py): Welzl minimum
enclosing circle (fuzzed against an O(n³) brute force) and
rotating-calipers oriented envelopes. Driver row q159 pins the SQL
level."""

from __future__ import annotations

import math
import random
from itertools import combinations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.bounding import (
    _circle_three,
    _circle_two,
    _in_circle,
    minimum_enclosing_circle,
    oriented_envelope,
)

P = G.parse_wkt


def _brute_mec(pts):
    best = None
    for a, b in combinations(pts, 2):
        c = _circle_two(a, b)
        if all(_in_circle(p, c, 1e-9) for p in pts):
            if best is None or c[2] < best[2]:
                best = c
    for a, b, d in combinations(pts, 3):
        c = _circle_three(a, b, d)
        if c and all(_in_circle(p, c, 1e-9) for p in pts):
            if best is None or c[2] < best[2]:
                best = c
    return best


class TestMinimumEnclosingCircle:
    def test_rectangle_diagonal(self):
        c = minimum_enclosing_circle([(0, 0), (30, 0), (30, 20), (0, 20)])
        assert c[:2] == (15.0, 10.0)
        assert abs(c[2] - math.hypot(30, 20) / 2) < 1e-12

    def test_two_points_diameter(self):
        assert minimum_enclosing_circle([(0, 0), (10, 0)]) == (5.0, 0.0, 5.0)

    def test_obtuse_triangle_uses_longest_side(self):
        c = minimum_enclosing_circle([(0, 0), (10, 0), (1, 1)])
        assert c == (5.0, 0.0, 5.0)

    def test_degenerate(self):
        assert minimum_enclosing_circle([(3, 4)]) == (3.0, 4.0, 0.0)
        assert minimum_enclosing_circle([(3, 4), (3, 4)]) == (3.0, 4.0, 0.0)
        assert minimum_enclosing_circle([]) is None

    def test_fuzz_vs_bruteforce(self):
        rng = random.Random(20260814)
        for _ in range(200):
            pts = [
                (rng.randint(-50, 50), rng.randint(-50, 50))
                for _ in range(rng.randint(2, 12))
            ]
            w = minimum_enclosing_circle(pts)
            b = _brute_mec(list(dict.fromkeys(pts)))
            if b is None:  # all points identical
                assert w[2] == 0.0
                continue
            assert abs(w[2] - b[2]) < 1e-7, (pts, w, b)
            assert all(_in_circle(p, w, 1e-7) for p in pts)


class TestOrientedEnvelope:
    def test_diamond_is_its_own_envelope(self):
        oe = oriented_envelope(P("POLYGON ((10 0, 20 10, 10 20, 0 10, 10 0))"))
        assert oe.kind == "Polygon"
        assert abs(G.area(oe) - 200.0) < 1e-9

    def test_axis_box_unchanged_area(self):
        oe = oriented_envelope(P("POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))"))
        assert abs(G.area(oe) - 600.0) < 1e-9

    def test_degenerates_echo_hull(self):
        assert G.to_wkt(oriented_envelope(P("POINT (3 4)"))) == "POINT (3 4)"
        assert (
            G.to_wkt(oriented_envelope(P("LINESTRING (0 0, 2 2, 4 4)")))
            == "LINESTRING (0 0, 4 4)"
        )

    def test_fuzz_contains_and_beats_nothing(self):
        rng = random.Random(7)
        for _ in range(100):
            pts = [
                (rng.randint(-20, 20), rng.randint(-20, 20))
                for _ in range(rng.randint(3, 10))
            ]
            g = G.Geometry("MultiPoint", pts)
            oe = oriented_envelope(g)
            if oe.kind != "Polygon":
                continue
            hull = G.convex_hull(g)
            # envelope covers the hull and is never larger than the
            # axis-aligned bbox (the calipers optimum includes it)
            assert G.area(oe) >= G.area(hull) - 1e-9
            minx, miny, maxx, maxy = G.bbox(g)
            assert G.area(oe) <= (maxx - minx) * (maxy - miny) + 1e-9
            for p in pts:
                assert G.distance(G.Geometry("Point", p), oe) < 1e-7


def test_bounding_through_spark(spark):
    rows = spark.sql(
        "SELECT st_minimumboundingradius('POLYGON ((0 0, 6 0, 6 8, 0 8, 0 0))') AS r,"
        " st_minimumboundingcircle('POINT (1 2)') AS c,"
        " st_orientedenvelope('MULTIPOINT (0 0, 4 4, 0 4, 4 0)') AS e,"
        " st_minimumboundingradius(CAST(NULL AS STRING)) AS n"
    ).collect()[0]
    assert rows["r"] == 5.0
    assert rows["c"] == "POINT (1 2)"
    assert abs(G.area(P(rows["e"])) - 16.0) < 1e-9
    assert rows["n"] is None


class TestEmptyAndDeterminism:
    """code-review r10: EMPTY inputs follow PostGIS instead of NULL,
    and the fixed-seed shuffle keeps results order-independent."""

    def test_empty_inputs(self, spark):
        rows = spark.sql(
            "SELECT st_minimumboundingcircle('POLYGON EMPTY') AS c,"
            " st_minimumboundingradius('GEOMETRYCOLLECTION EMPTY') AS r,"
            " st_orientedenvelope('LINESTRING EMPTY') AS e"
        ).collect()[0]
        assert rows["c"] == "POLYGON EMPTY"
        assert rows["r"] == 0.0
        assert rows["e"] == "POLYGON EMPTY"

    def test_order_independent_radius(self):
        import math

        n = 500
        pts = [
            (math.cos(2 * math.pi * i / n) * 7, math.sin(2 * math.pi * i / n) * 7)
            for i in range(n)
        ]
        a = minimum_enclosing_circle(pts)
        b = minimum_enclosing_circle(list(reversed(pts)))
        assert abs(a[2] - b[2]) < 1e-9 and abs(a[2] - 7.0) < 1e-9
