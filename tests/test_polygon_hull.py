"""ST_SimplifyPolygonHull — functions/polygon_hull.py: the GEOS 3.11
corner-triangle ring hull with containment guarantees."""

from __future__ import annotations

import random

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.polygon_hull import (
    simplify_polygon_hull as sph,
)

L = "POLYGON ((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))"


class TestBasics:
    def test_outer_removes_reflex_to_convex_hull(self):
        assert sph(L, 0.0, True) == "POLYGON ((0 0, 3 0, 3 1, 1 3, 0 3, 0 0))"

    def test_inner_shrinks_to_covered_triangle(self):
        assert sph(L, 0.0, False) == "POLYGON ((0 0, 1 1, 0 3, 0 0))"

    def test_echo_and_convex_fixpoints(self):
        assert sph(L, 1.0, True) == L
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        assert sph(sq, 0.0, True) == sq  # convex: no reflex to delete
        assert sph(sq, 0.0, False) == "POLYGON ((4 0, 4 4, 0 4, 4 0))"

    def test_hole_takes_opposite_direction(self):
        holed = (
            "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), "
            "(2 2, 6 2, 6 3, 3 3, 3 6, 2 6, 2 2))"
        )
        out = sph(holed, 0.0, True)
        g = G.parse_wkt(out)
        assert len(g.coords) == 2  # hole kept, shrunk
        assert len(g.coords[1]) < 7  # fewer hole vertices

    def test_rejections(self):
        assert sph("LINESTRING (0 0, 1 1)", 0.5, True) is None
        assert sph(L, 1.5, True) is None
        assert sph(L, -0.1, True) is None
        assert sph(L, None, True) is None
        assert sph(None, 0.5, True) is None
        assert sph("junk", 0.5, True) is None
        assert sph("POLYGON EMPTY", 0.5, True) == "POLYGON EMPTY"


def _area(rings) -> float:
    total = 0.0
    for i, r in enumerate(rings):
        a = 0.0
        for (x1, y1), (x2, y2) in zip(r, r[1:]):
            a += x1 * y2 - x2 * y1
        total += abs(a) / 2 * (1 if i == 0 else -1)
    return total


def _rand_star(rng, n):
    """A simple star-shaped polygon: n vertices at random radii around
    the origin, sorted by angle — always simple."""
    import math

    pts = []
    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
    for t in angles:
        r = rng.uniform(2, 10)
        pts.append((round(r * math.cos(t), 3), round(r * math.sin(t), 3)))
    pts = list(dict.fromkeys(pts))
    if len(pts) < 4:
        return None
    return pts


class TestContainmentFuzz:
    def test_outer_grows_inner_shrinks(self):
        """For random simple star polygons at every fraction: the outer
        hull's area never falls below the input's and every ORIGINAL
        vertex stays inside the outer hull; the inner hull's area never
        exceeds the input's and every HULL vertex lies inside the
        input (vertex-level proxy for the GEOS containment guarantee)."""
        rng = random.Random(13)
        checked = 0
        for _ in range(25):
            pts = _rand_star(rng, rng.randint(6, 14))
            if pts is None:
                continue
            ring = pts + [pts[0]]
            wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"
            a0 = _area([ring])
            for frac in (0.0, 0.3, 0.7):
                for outer in (True, False):
                    out = sph(wkt, frac, outer)
                    assert out is not None, (wkt, frac, outer)
                    g = G.parse_wkt(out)
                    a1 = _area(g.coords)
                    if outer:
                        assert a1 >= a0 - 1e-9, (wkt, frac)
                        for p in pts:  # originals stay covered
                            assert G._point_in_polygon(
                                p[0], p[1], [g.coords[0]]
                            ) or _on_ring(p, g.coords[0])
                    else:
                        assert a1 <= a0 + 1e-9, (wkt, frac)
                        for p in g.coords[0][:-1]:  # hull vertices covered
                            assert G._point_in_polygon(p[0], p[1], [ring]) or _on_ring(
                                p, ring
                            )
                    checked += 1
        assert checked >= 100


def _on_ring(p, ring) -> bool:
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
        _orient,
    )

    for a, b in zip(ring, ring[1:]):
        if _orient(a, b, p) == 0:
            lo_x, hi_x = min(a[0], b[0]), max(a[0], b[0])
            lo_y, hi_y = min(a[1], b[1]), max(a[1], b[1])
            if lo_x <= p[0] <= hi_x and lo_y <= p[1] <= hi_y:
                return True
    return False
