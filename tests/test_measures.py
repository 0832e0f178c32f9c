"""Measures family kernels (functions/measures.py): OGC simplicity,
GEOS interior points, discrete Hausdorff/Fréchet, clockwise angle, and
ear-clip triangulation. Driver row q158 pins the SQL level."""

from __future__ import annotations

import math

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.measures import (
    frechet_distance,
    hausdorff_distance,
    is_simple,
    point_on_surface,
    triangulate_polygon,
)

P = G.parse_wkt


class TestIsSimple:
    CASES = [
        ("LINESTRING (1 1, 2 2, 2 3.5, 1 3, 1 2, 2 1)", False),  # PostGIS doc case
        ("LINESTRING (1 2, 3 4, 5 6)", True),
        ("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)", True),  # closed ring
        ("LINESTRING (0 0, 2 0, 2 2, 1 0, 0 2)", False),  # passes own interior
        ("LINESTRING (0 0, 4 0, 2 0)", False),  # fold-back overlap
        ("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", True),  # endpoint contact
        ("MULTILINESTRING ((0 0, 2 2), (1 1, 3 0))", False),  # interior contact
        ("MULTILINESTRING ((0 0, 4 0), (2 0, 6 0))", False),  # collinear overlap
        ("MULTIPOINT (1 1, 2 2)", True),
        ("MULTIPOINT (1 1, 1 1)", False),
        ("POINT (3 4)", True),
        # polygonal inputs are simple by definition (JTS), even a bowtie
        ("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))", True),
    ]

    @pytest.mark.parametrize("wkt,exp", CASES)
    def test_cases(self, wkt, exp):
        assert is_simple(P(wkt)) is exp


class TestPointOnSurface:
    def test_rect_center(self):
        assert point_on_surface(P("POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))")) == (5.0, 3.0)

    def test_holed_picks_widest_interval(self):
        w = "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0), (8 8, 14 8, 14 14, 8 14, 8 8))"
        assert point_on_surface(P(w)) == (22.0, 10.0)

    def test_vertex_collision_renudges(self):
        # concave apex exactly at mid-height: the scanline re-bisects
        # and the returned point is strictly interior
        g = P("POLYGON ((0 0, 10 0, 5 5, 10 10, 0 10, 0 0))")
        p = point_on_surface(g)
        assert p == (3.75, 7.5)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            _strictly_inside,
        )

        assert _strictly_inside(p, g)

    def test_line_prefers_interior_vertex(self):
        assert point_on_surface(P("LINESTRING (0 0, 5 1, 10 0)")) == (5.0, 1.0)
        # two-point line: an endpoint
        assert point_on_surface(P("LINESTRING (0 0, 10 0)")) in ((0.0, 0.0), (10.0, 0.0))

    def test_multipoint_nearest_centroid(self):
        assert point_on_surface(P("MULTIPOINT (0 0, 10 0, 5 1)")) == (5.0, 1.0)


class TestDistances:
    def test_hausdorff_shifted_segment(self):
        a, b = P("LINESTRING (0 0, 30 0)"), P("LINESTRING (5 7, 35 7)")
        assert abs(hausdorff_distance(a, b) - math.sqrt(74)) < 1e-12

    def test_hausdorff_symmetric_and_orderless(self):
        a, b = P("LINESTRING (0 0, 30 0)"), P("LINESTRING (30 0, 0 0)")
        assert hausdorff_distance(a, b) == 0.0

    def test_frechet_order_sensitive(self):
        a, b = P("LINESTRING (0 0, 30 0)"), P("LINESTRING (30 0, 0 0)")
        assert frechet_distance(a, b) == 30.0
        assert frechet_distance(a, P("LINESTRING (0 0, 30 0)")) == 0.0

    def test_frechet_multiline_is_null(self):
        assert frechet_distance(P("MULTILINESTRING ((0 0, 1 0))"), P("LINESTRING (0 0, 1 0)")) is None


class TestTriangulate:
    def test_lshape_four_triangles(self):
        t = triangulate_polygon(P("POLYGON ((0 0, 20 0, 20 10, 10 10, 10 20, 0 20, 0 0))"))
        assert t.kind == "GeometryCollection" and len(t.coords) == 4
        assert abs(G.area(t) - 300.0) < 1e-9
        # triangle interiors are disjoint: areas sum exactly to the input

    def test_holed_and_bowtie_raise(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.overlay import (
            _Unsupported,
        )

        with pytest.raises(_Unsupported):
            triangulate_polygon(
                P("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
            )
        with pytest.raises(_Unsupported):
            triangulate_polygon(P("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"))


def test_measures_through_spark(spark):
    rows = spark.sql(
        "SELECT st_issimple('LINESTRING (0 0, 2 2, 0 2, 2 0)') AS s,"
        " st_pointonsurface('POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))') AS p,"
        " st_hausdorffdistance('POINT (0 0)', 'POINT (3 4)') AS h,"
        " st_angle('POINT (0 0)', 'POINT (1 0)', 'POINT (0 0)', 'POINT (0 1)') AS a,"
        " st_triangulatepolygon('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS t"
    ).collect()[0]
    assert rows["s"] is False
    assert rows["p"] == "POINT (2 1)"
    assert rows["h"] == 5.0
    assert abs(rows["a"] - 3 * math.pi / 2) < 1e-12
    assert rows["t"].startswith("GEOMETRYCOLLECTION (POLYGON")


class TestIsSimpleMod2Fixes:
    """code-review r10: repeated vertices, Mod-2 closed-element
    boundaries, and the per-part bisector."""

    def test_repeated_consecutive_vertices_are_collapsed(self):
        assert is_simple(P("LINESTRING (0 0, 1 0, 1 0, 2 0)")) is True
        assert is_simple(P("LINESTRING (0 0, 1 0, 1 0, 1 1)")) is True

    def test_closed_component_has_empty_boundary(self):
        # figure-eight through its own closing point: NOT simple
        fig8 = "LINESTRING (0 0, 1 1, 0 2, -1 1, 0 0, 1 -1, 0 -2, -1 -1, 0 0)"
        assert is_simple(P(fig8)) is False
        # ring + tail touching the ring's closing point: NOT simple
        assert (
            is_simple(P("MULTILINESTRING ((0 0, 1 0, 1 1, 0 1, 0 0), (0 0, -1 -1))"))
            is False
        )
        # open line passing through its own START point mid-curve:
        # simple — the endpoint IS a boundary point for an open
        # component, and boundary contacts are allowed (JTS Mod-2)
        assert is_simple(P("LINESTRING (0 0, 2 0, 2 2, 0 0, -2 0)")) is True
        assert is_simple(P("MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))")) is True

    def test_multipolygon_parts_bisect_separately(self):
        p = point_on_surface(
            P("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 9, 1 9, 1 10, 0 10, 0 9)))")
        )
        assert p is not None
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            _strictly_inside,
        )

        assert _strictly_inside(
            p, P("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 9, 1 9, 1 10, 0 10, 0 9)))")
        )

    def test_degenerate_area_falls_back_to_vertex(self):
        assert point_on_surface(P("POLYGON ((0 0, 1 0, 0 0))")) is not None


class TestMinimumClearance:
    """ST_MinimumClearance(Line) (r13): smallest positive vertex-vertex
    or vertex-to-non-endpoint-segment distance; infinite when no
    positive candidate exists (measures.py module docstring)."""

    def _mc(self, wkt):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.measures import (
            minimum_clearance_witness,
        )

        return minimum_clearance_witness(G.parse_wkt(wkt))

    def test_right_triangle_altitude_is_exact(self):
        # 3-4-5: altitude 12/5; projection (36/25, 48/25) exact decimals
        d, a, b = self._mc("POLYGON ((0 0, 4 0, 0 3, 0 0))")
        assert d == 2.4 and a == (0.0, 0.0) and b == (1.44, 1.92)

    def test_box_clearance_is_short_side(self):
        assert self._mc("POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))")[0] == 6.0

    def test_segment_clearance_is_length(self):
        assert self._mc("LINESTRING (0 0, 3 4)")[0] == 5.0

    def test_point_is_infinite(self):
        assert self._mc("POINT (1 1)") is None

    def test_repeated_vertex_does_not_zero(self):
        # zero-distance candidates skip (dedup_vertices stance)
        assert self._mc("LINESTRING (0 0, 0 0, 5 0)")[0] == 5.0

    def test_multipoint_nearest_pair(self):
        d, a, b = self._mc("MULTIPOINT (0 0, 10 0, 2 1)")
        assert d == math.hypot(2, 1) and (a, b) == ((0.0, 0.0), (2.0, 1.0))

    def test_narrow_notch_beats_vertex_pairs(self):
        # a deep 0.5-wide notch: clearance is the notch mouth vertex to
        # the far notch wall, not any vertex pair
        d, _, _ = self._mc(
            "POLYGON ((0 0, 10 0, 10 10, 5.5 10, 5.5 2, 5 2, 5 10, 0 10, 0 0))"
        )
        assert d == 0.5

    def test_brute_force_parity_on_random_rings(self):
        # independent brute force over the same candidate definition
        import random

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as GG,
        )

        rng = random.Random(5151)
        for _ in range(25):
            pts = [(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(6)]
            wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
            g = GG.parse_wkt(wkt)
            got = self._mc(wkt)
            vs = GG._points(g)
            best = math.inf
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    dd = math.hypot(vs[i][0] - vs[j][0], vs[i][1] - vs[j][1])
                    if dd > 0:
                        best = min(best, dd)
            for p in vs:
                for a, b in GG._segments(g):
                    if p == a or p == b:
                        continue
                    dd = GG._seg_distance(p, a, b)
                    if dd > 0:
                        best = min(best, dd)
            if best is math.inf:
                assert got is None
            else:
                # geometry._seg_distance uses sqrt(x²+y²), the kernel
                # uses hypot — agree to last-ulp class only
                assert got is not None
                assert math.isclose(got[0], best, rel_tol=1e-12)

    def test_non_finite_is_null_not_infinite(self, spark):
        # review r13: garbage coordinates must not read as genuine
        # infinite clearance
        row = spark.sql(
            "SELECT st_minimumclearance('LINESTRING (0 0, 1e999 0)') AS a,"
            " st_minimumclearanceline('POINT (nan nan)') AS b"
        ).collect()[0]
        assert row["a"] is None and row["b"] is None

    def test_sql_surface(self, spark):
        row = spark.sql(
            "SELECT st_minimumclearance('POLYGON ((0 0, 4 0, 0 3, 0 0))') AS c,"
            " st_minimumclearanceline('POLYGON ((0 0, 4 0, 0 3, 0 0))') AS l,"
            " CAST(st_minimumclearance('POINT (1 1)') AS STRING) AS inf,"
            " st_minimumclearanceline('POINT (1 1)') AS le,"
            " st_minimumclearance('JUNK') AS junk"
        ).collect()[0]
        assert row["c"] == 2.4
        assert row["l"] == "LINESTRING (0 0, 1.44 1.92)"
        assert row["inf"] == "Infinity"
        assert row["le"] == "LINESTRING EMPTY"
        assert row["junk"] is None


def test_minimum_clearance_typed_empty_is_infinite(spark):
    # review r13: EMPTY has no candidates — infinite clearance per the
    # module contract, not NULL
    row = spark.sql(
        "SELECT CAST(st_minimumclearance('LINESTRING EMPTY') AS STRING) AS c,"
        " st_minimumclearanceline('POLYGON EMPTY') AS l"
    ).collect()[0]
    assert row["c"] == "Infinity"
    assert row["l"] == "LINESTRING EMPTY"


def test_clearance_vertex_budget_is_loud(spark):
    # r14 work bound: the all-pairs clearance scan refuses past
    # _MAX_CLEARANCE_VERTICES (NULL at the SQL surface), never stalls
    import pytest

    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
        Geometry,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.measures import (
        _MAX_CLEARANCE_VERTICES, minimum_clearance_witness,
    )

    big = Geometry(
        "MultiPoint",
        [(float(i), float(i % 7)) for i in range(_MAX_CLEARANCE_VERTICES + 1)],
    )
    with pytest.raises(ValueError, match="vertex budget"):
        minimum_clearance_witness(big)
    mp = "MULTIPOINT (" + ", ".join(
        f"{i} {i % 7}" for i in range(_MAX_CLEARANCE_VERTICES + 1)
    ) + ")"
    row = spark.sql(
        f"SELECT st_minimumclearance('{mp}') AS c,"
        f" st_minimumclearanceline('{mp}') AS l"
    ).collect()[0]
    assert row["c"] is None and row["l"] is None
