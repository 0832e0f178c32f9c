"""Tessellation family tests: exact-predicate Bowyer-Watson Delaunay and
all-pairs half-plane Voronoi (functions/tessellate.py), kernel-level
invariant fuzz plus the Spark SQL surface."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
    _gc_wkt,
    _in_circumcircle,
    _orient,
    delaunay_geom,
    delaunay_triangles,
    voronoi_cells,
    voronoi_geom,
)


def _wkt(s):
    return G.parse_wkt(s)


class TestDelaunayKernel:
    def test_three_points_single_triangle(self):
        got = _gc_wkt(delaunay_geom(_wkt("MULTIPOINT (0 0, 4 0, 0 3)")))
        assert got == "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 0 3, 0 0)))"

    def test_collinear_empty(self):
        got = _gc_wkt(delaunay_geom(_wkt("MULTIPOINT (0 0, 1 1, 2 2)")))
        assert got == "GEOMETRYCOLLECTION EMPTY"

    def test_under_three_points_empty(self):
        assert _gc_wkt(delaunay_geom(_wkt("POINT (5 7)"))) == "GEOMETRYCOLLECTION EMPTY"
        assert (
            _gc_wkt(delaunay_geom(_wkt("MULTIPOINT (0 0, 3 4)")))
            == "GEOMETRYCOLLECTION EMPTY"
        )

    def test_quad_plus_interior_count_and_area(self):
        # Euler: any triangulation of a convex quad + 1 interior site
        # has exactly 4 triangles covering the quad
        d = delaunay_geom(_wkt("MULTIPOINT (0 0, 30 0, 30 20, 0 20, 1 1)"))
        assert len(d.coords) == 4
        assert G.area(d) == pytest.approx(600.0)

    def test_cocircular_square_deterministic(self):
        # 4 cocircular corners: strict-incircle tie-break keeps one
        # diagonal deterministically; both triangulations cover area 100
        d = delaunay_geom(_wkt("MULTIPOINT (0 0, 10 0, 10 10, 0 10)"))
        assert len(d.coords) == 2
        assert G.area(d) == pytest.approx(100.0)
        # pure function of the WKT: repeated runs identical
        assert _gc_wkt(d) == _gc_wkt(
            delaunay_geom(_wkt("MULTIPOINT (0 0, 10 0, 10 10, 0 10)"))
        )

    def test_thin_triangles_survive(self):
        # r11 review: a sliver's circumcircle can swallow any FINITE
        # super-triangle, silently dropping the face — the exact
        # hull-coverage check + margin retry must recover it
        d = delaunay_geom(_wkt("MULTIPOINT (0 0, 10 0.1, 20 0)"))
        assert len(d.coords) == 1
        assert G.area(d) == pytest.approx(1.0)  # base 20 x height 0.1 / 2
        d = delaunay_geom(_wkt("MULTIPOINT (0 0, 10 0.0000001, 20 0, 10 10)"))
        hull = G.area(G.convex_hull(_wkt("MULTIPOINT (0 0, 10 0.0000001, 20 0, 10 10)")))
        assert G.area(d) == pytest.approx(hull, abs=1e-12)
        d = delaunay_geom(_wkt("MULTIPOINT (0 0, 500 1, 1000 0)"))
        assert len(d.coords) == 1 and G.area(d) == pytest.approx(500.0)

    def test_duplicate_vertices_collapse(self):
        a = _gc_wkt(delaunay_geom(_wkt("MULTIPOINT (0 0, 4 0, 0 3, 4 0, 0 0)")))
        b = _gc_wkt(delaunay_geom(_wkt("MULTIPOINT (0 0, 4 0, 0 3)")))
        assert a == b

    def test_fuzz_delaunay_property_and_hull_cover(self):
        """THE Delaunay condition, checked exactly: no site strictly
        inside any triangle's circumcircle; triangles exactly cover the
        convex hull."""
        rng = random.Random(7)
        for trial in range(24):
            if trial % 3 == 2:
                # thin configurations: huge circumcircles (r11 review class)
                pts = list({(rng.randint(0, 2000), rng.randint(0, 2)) for _ in range(rng.randint(3, 10))})
            else:
                pts = list({(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(rng.randint(3, 14))})
            if len(pts) < 3:
                continue
            fr = [(Fraction(x), Fraction(y)) for x, y in pts]
            tris = delaunay_triangles(pts)
            if all(_orient(fr[0], fr[1], p) == 0 for p in fr[2:]):
                assert tris == []
                continue
            for t in tris:
                a, b, c = t if _orient(*t) > 0 else (t[0], t[2], t[1])
                for p in fr:
                    if p in t:
                        continue
                    assert not _in_circumcircle(a, b, c, p), (
                        f"trial {trial}: {p} strictly inside circumcircle of {t}"
                    )
            mp = G.Geometry("MultiPoint", [(float(x), float(y)) for x, y in pts])
            hull_area = G.area(G.convex_hull(mp))
            tri_area = sum(
                G.area(
                    G.Geometry(
                        "Polygon",
                        [[(float(px), float(py)) for px, py in t] + [(float(t[0][0]), float(t[0][1]))]],
                    )
                )
                for t in tris
            )
            assert tri_area == pytest.approx(hull_area, abs=1e-9), f"trial {trial}"


class TestVoronoiKernel:
    def test_two_sites(self):
        got = _gc_wkt(voronoi_geom(_wkt("MULTIPOINT (0 0, 2 0)")))
        assert got == (
            "GEOMETRYCOLLECTION (POLYGON ((-2 -2, 1 -2, 1 2, -2 2, -2 -2)), "
            "POLYGON ((1 -2, 4 -2, 4 2, 1 2, 1 -2)))"
        )

    def test_single_site_unit_pad(self):
        got = _gc_wkt(voronoi_geom(_wkt("POINT (5 7)")))
        assert got == "GEOMETRYCOLLECTION (POLYGON ((4 6, 6 6, 6 8, 4 8, 4 6)))"

    def test_collinear_sites_have_cells(self):
        # no Delaunay triangulation exists, but Voronoi cells do —
        # the all-pairs construction is independent of the dual
        cells = voronoi_cells([(0, 0), (2, 2), (4, 4)])
        assert len(cells) == 3

    def test_fuzz_partition_invariants(self):
        """Cells partition the clip envelope: count = #sites, total area
        = envelope area (exact over Fractions), and the cell containing
        a probe point belongs to the probe's nearest site."""
        rng = random.Random(11)
        for trial in range(15):
            pts = list({(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(rng.randint(2, 9))})
            fr = [(Fraction(x), Fraction(y)) for x, y in pts]
            cells = voronoi_cells(pts)
            assert len(cells) == len(pts), f"trial {trial}"
            xs = [p[0] for p in fr]
            ys = [p[1] for p in fr]
            pad = max(max(xs) - min(xs), max(ys) - min(ys)) or Fraction(1)
            clip_area = (max(xs) - min(xs) + 2 * pad) * (max(ys) - min(ys) + 2 * pad)
            total = Fraction(0)
            for _s, cell in cells:
                acc = Fraction(0)
                for i in range(len(cell)):
                    x1, y1 = cell[i]
                    x2, y2 = cell[(i + 1) % len(cell)]
                    acc += x1 * y2 - x2 * y1
                total += abs(acc) / 2
            assert total == clip_area, f"trial {trial}: {total} != {clip_area}"
            for _ in range(15):
                px, py = Fraction(rng.randint(0, 12)), Fraction(rng.randint(0, 12))
                best_d2 = min((s[0] - px) ** 2 + (s[1] - py) ** 2 for s, _c in cells)
                for s, cell in cells:
                    strictly_inside = all(
                        (cell[(i + 1) % len(cell)][0] - cell[i][0]) * (py - cell[i][1])
                        - (cell[(i + 1) % len(cell)][1] - cell[i][1]) * (px - cell[i][0])
                        > 0
                        for i in range(len(cell))
                    )
                    if strictly_inside:
                        assert (s[0] - px) ** 2 + (s[1] - py) ** 2 == best_d2


class TestSparkSurface:
    def test_sql_roundtrip(self, spark):
        row = spark.sql(
            "SELECT st_delaunaytriangles('MULTIPOINT (0 0, 4 0, 0 3)') AS d, "
            "st_voronoipolygons('MULTIPOINT (0 0, 2 0)') AS v, "
            "st_delaunaytriangles('MULTIPOINT (0 0, 1 1, 2 2)') AS dc, "
            "st_area(st_voronoipolygons('MULTIPOINT (0 0, 2 0)')) AS va"
        ).collect()[0]
        assert row["d"] == "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 0 3, 0 0)))"
        assert row["v"].startswith("GEOMETRYCOLLECTION (POLYGON ((-2 -2, 1 -2")
        assert row["dc"] == "GEOMETRYCOLLECTION EMPTY"
        assert row["va"] == pytest.approx(24.0)  # 6 x 4 clip box

    def test_malformed_and_empty(self, spark):
        row = spark.sql(
            "SELECT st_delaunaytriangles('nonsense') AS bad, "
            "st_delaunaytriangles('POINT EMPTY') AS de, "
            "st_voronoipolygons('POINT EMPTY') AS ve"
        ).collect()[0]
        assert row["bad"] is None
        assert row["de"] == "GEOMETRYCOLLECTION EMPTY"
        assert row["ve"] == "GEOMETRYCOLLECTION EMPTY"

    def test_q165_matches_duckdb_oracle(self, spark, oracle):
        # test_parity sweeps this too; the standalone copy keeps the
        # family debuggable in isolation
        from conftest import SF_DIR, assert_parity

        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.tessellate_ops import (
            _Q165_ORACLE,
            q165_st_tessellate,
        )

        assert_parity(
            q165_st_tessellate(spark, SF_DIR), oracle, _Q165_ORACLE, "q165"
        )


class TestConcaveHull:
    """Chi-shape concave hull (erosion of the Delaunay triangulation)."""

    def test_bay_erosion_is_deterministic(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        # trapezoid bay fixture: the bottom edge is the UNIQUE longest
        # erosion candidate (no tie-order dependence); its removal puts
        # the bay point on the boundary, making the top removal
        # irregular: area 352 - 24*6/2 = 280
        g = _wkt("MULTIPOINT (0 0, 24 0, 24 16, 4 16, 12 6)")
        h = concave_hull_geom(g, 0.5)
        assert G.area(h) == pytest.approx(280.0)
        assert G.to_wkt(h) == "POLYGON ((0 0, 12 6, 24 0, 24 16, 4 16, 0 0))"

    def test_ratio_one_is_convex_hull(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        g = _wkt("MULTIPOINT (0 0, 24 0, 24 16, 4 16, 12 6)")
        assert G.area(concave_hull_geom(g, 1.0)) == pytest.approx(352.0)

    def test_huge_coordinates_no_overflow(self):
        # r11 review: float(l2) overflowed past ~1.4e154-scale coords;
        # max-normalized Fraction comparisons stay in range
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        g = _wkt("MULTIPOINT (0 0, 1e200 0, 1e200 1e200, 0 1e200, 5e199 2e199)")
        h = concave_hull_geom(g, 1.0)
        assert h is not None and h.kind == "Polygon"

    def test_degenerate_echoes_convex_hull(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        assert (
            G.to_wkt(concave_hull_geom(_wkt("MULTIPOINT (0 0, 1 1, 2 2)"), 0.5))
            == "LINESTRING (0 0, 2 2)"
        )
        assert (
            G.to_wkt(concave_hull_geom(_wkt("POINT (3 4)"), 0.5)) == "POINT (3 4)"
        )

    def test_fuzz_coverage_and_monotonicity(self):
        """Every input point stays on or inside the hull at every ratio;
        the area is monotone in the ratio; ratio=1 equals the convex
        hull exactly."""
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            _on_any_segment,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        rng = random.Random(5)
        for trial in range(15):
            pp = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(rng.randint(4, 16))})
            mp = G.Geometry("MultiPoint", [(float(x), float(y)) for x, y in pp])
            hull_area = G.area(G.convex_hull(mp))
            prev = None
            for r in (0.0, 0.25, 0.5, 0.75, 1.0):
                h = concave_hull_geom(mp, r)
                a = G.area(h)
                if prev is not None:
                    assert a >= prev - 1e-9, f"trial {trial}: not monotone at {r}"
                prev = a
                segs = list(zip(h.coords[0], h.coords[0][1:]))
                for x, y in mp.coords:
                    assert G._point_in_polygon(x, y, h.coords) or _on_any_segment(
                        (x, y), segs
                    ), f"trial {trial} r={r}: ({x},{y}) uncovered"
            assert a == pytest.approx(hull_area, abs=1e-9)

    def test_null_ratio_with_valid_geom_is_null(self, spark):
        # Arrow ships a NULL DOUBLE as NaN — the NaN-aware guard must
        # yield NULL, not crash (the valid-WKT side can't short-circuit)
        rows = spark.sql(
            "SELECT st_concavehull(g, r) AS h FROM VALUES "
            "('MULTIPOINT (0 0, 24 0, 24 16, 0 16, 12 6)', 0.5), "
            "('MULTIPOINT (0 0, 24 0, 24 16, 0 16, 12 6)', CAST(NULL AS DOUBLE)), "
            "('MULTIPOINT (0 0, 24 0, 24 16, 0 16, 12 6)', CAST('NaN' AS DOUBLE)), "
            "('MULTIPOINT (0 0, 24 0, 24 16, 0 16, 12 6)', 2.0), "
            "('MULTIPOINT (0 0, 24 0, 24 16, 0 16, 12 6)', -0.5), "
            "('POLYGON EMPTY', 2.0), "
            "('POLYGON EMPTY', 0.5) "
            "AS t(g, r)"
        ).collect()
        assert rows[0]["h"].startswith("POLYGON (")
        # invalid ratio is NULL for EVERY geometry, empty included
        assert [r["h"] for r in rows[1:6]] == [None] * 5
        assert rows[6]["h"] == "POLYGON EMPTY"


class TestConcaveHullHoles:
    """allow_holes (r12, PostGIS param_allow_holes — VERDICT r11
    missing item 5): digging removes interior triangles with all
    vertices off every boundary; assembly through the dissolve kernel."""

    @staticmethod
    def _rings() -> str:
        outer = [(0, 0), (10, 0), (20, 0), (20, 10), (20, 20), (10, 20), (0, 20), (0, 10)]
        inner = [(6, 6), (10, 6), (14, 6), (14, 10), (14, 14), (10, 14), (6, 14), (6, 10)]
        return "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in outer + inner) + ")"

    def test_digs_inner_diamond(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        g = G.parse_wkt(self._rings())
        h = concave_hull_geom(g, 0.3, allow_holes=True)
        assert len(h.coords) == 2  # shell + one hole
        assert G.to_wkt(h) == (
            "POLYGON ((0 0, 10 0, 14 6, 20 0, 20 10, 20 20, 14 14, "
            "10 20, 0 20, 6 14, 0 10, 6 6, 0 0), "
            "(6 10, 10 14, 14 10, 10 6, 6 10))"
        )
        assert G.area(h) == 248.0

    def test_no_dig_matches_walk_assembly(self):
        # two independent assembly kernels (ring walk vs dissolve) must
        # agree byte for byte when nothing digs
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        bay = G.parse_wkt("MULTIPOINT (0 0, 24 0, 24 16, 4 16, 12 6)")
        for ratio in (0.2, 0.5, 1.0):
            a = G.to_wkt(concave_hull_geom(bay, ratio))
            b = G.to_wkt(concave_hull_geom(bay, ratio, allow_holes=True))
            assert a == b, ratio

    def test_every_point_on_or_inside_shell_and_off_hole_interior(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
            concave_hull_geom,
        )

        g = G.parse_wkt(self._rings())
        h = concave_hull_geom(g, 0.3, allow_holes=True)
        shell = G.Geometry("Polygon", [h.coords[0]])
        hole = G.Geometry("Polygon", [h.coords[1]])
        for x, y in G._points(g):
            pt = G.Geometry("Point", (x, y))
            # every input point is on or inside the shell...
            assert G.distance(pt, shell) == 0.0
        # ...and the hole + holed polygon partition the shell exactly
        assert G.area(h) + G.area(hole) == G.area(shell)

    def test_sql_surface_and_null_gates(self, spark):
        rows = spark.sql(
            f"SELECT st_concavehull_holes('{self._rings()}', 0.3) AS h,"
            " st_concavehull_holes('MULTIPOINT (0 0, 1 0, 2 0)', 0.5) AS coll,"
            " st_concavehull_holes('MULTIPOINT (0 0, 1 1)', 2.0) AS bad,"
            " st_concavehull_holes(NULL, 0.5) AS n"
        ).collect()[0]
        assert rows["h"].startswith("POLYGON ((0 0, 10 0, 14 6")
        assert ", (6 10, 10 14, 14 10, 10 6, 6 10))" in rows["h"]
        # degenerate input echoes its convex hull (here a line), the
        # same PostGIS-parity class st_concavehull uses
        assert rows["coll"] == "LINESTRING (0 0, 2 0)"
        assert rows["bad"] is None and rows["n"] is None


def test_site_budget_is_loud(spark):
    # r14 work bound (VERDICT r13 item 7): O(n²)-in-Fractions kernels
    # refuse past _MAX_TESS_SITES instead of stalling the executor
    import pytest

    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
        _MAX_TESS_SITES, delaunay_triangles, voronoi_cells,
    )

    pts = [(float(i % 60), float(i // 60)) for i in range(_MAX_TESS_SITES + 1)]
    with pytest.raises(ValueError, match="site budget"):
        delaunay_triangles(pts)
    with pytest.raises(ValueError, match="site budget"):
        voronoi_cells(pts)
    big_mp = "MULTIPOINT (" + ", ".join(
        f"{i % 60} {i // 60}" for i in range(_MAX_TESS_SITES + 1)
    ) + ")"
    row = spark.sql(
        f"SELECT st_delaunaytriangles('{big_mp}') AS d,"
        f" st_voronoipolygons('{big_mp}') AS v,"
        f" st_concavehull('{big_mp}', 0.3) AS c"
    ).collect()[0]
    assert row["d"] is None and row["v"] is None and row["c"] is None
