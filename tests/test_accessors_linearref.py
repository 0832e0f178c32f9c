"""Kernel tests for functions/accessors.py and functions/linearref.py —
PostGIS edge semantics pinned at the Python level (the driver rows
q150-q152 pin the SQL/oracle level)."""

from __future__ import annotations

import math
import random

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    accessors as A,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    linearref as L,
)

D = "LINESTRING (0 0, 30 0, 30 20)"
RING = "LINESTRING (0 0, 30 0, 30 20, 0 20, 0 0)"
BOW = "LINESTRING (0 0, 30 20, 30 0, 0 20, 0 0)"
HOLED = "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
BOX = "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))"


class TestAccessors:
    def test_numgeometries_counts_parts_and_empty(self):
        assert A.num_geometries("MULTIPOINT (1 1, 2 2, 3 3)") == 3
        assert A.num_geometries("GEOMETRYCOLLECTION (POINT (1 1), " + BOX + ")") == 2
        assert A.num_geometries(BOX) == 1
        assert A.num_geometries("MULTIPOLYGON EMPTY") == 0
        assert A.num_geometries("junk") is None

    def test_geometryn_single_geometry_is_its_own_part_one(self):
        # PostGIS 2.0: ST_GeometryN(non-collection, 1) = the geometry
        assert A.geometry_n(BOX, 1) == BOX
        assert A.geometry_n(BOX, 2) is None
        assert A.geometry_n("MULTIPOINT (5 6, 7 8)", 2) == "POINT (7 8)"
        assert A.geometry_n("MULTIPOINT (5 6, 7 8)", 0) is None

    def test_numpoints_linestring_only(self):
        assert A.num_points(D) == 3
        assert A.num_points(BOX) is None  # PostGIS: NULL for non-linestring
        assert A.num_points("POINT (1 1)") is None

    def test_pointn_negative_counts_from_end(self):
        assert A.point_n(D, 1) == "POINT (0 0)"
        assert A.point_n(D, -3) == "POINT (0 0)"
        assert A.point_n(D, -1) == "POINT (30 20)"
        assert A.point_n(D, 4) is None and A.point_n(D, -4) is None
        assert A.point_n(D, 0) is None

    def test_rings(self):
        assert A.exterior_ring(HOLED) == "LINESTRING (0 0, 30 0, 30 20, 0 20, 0 0)"
        assert A.num_interior_rings(HOLED) == 1 and A.num_interior_rings(BOX) == 0
        assert A.interior_ring_n(HOLED, 1) == "LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"
        assert A.interior_ring_n(HOLED, 2) is None
        assert A.exterior_ring(D) is None  # polygon-only
        assert A.num_interior_rings("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))") is None

    def test_closure_predicates(self):
        assert A.is_closed(RING) is True and A.is_closed(D) is False
        assert A.is_closed("POINT (1 1)") is True  # PostGIS: points are closed
        assert A.is_closed(BOX) is True
        assert A.is_closed("MULTILINESTRING ((0 0, 1 0, 0 0), (2 2, 3 3, 2 2))") is True
        assert A.is_closed("MULTILINESTRING ((0 0, 1 0, 0 0), (2 2, 3 3))") is False
        assert A.is_closed("LINESTRING EMPTY") is False  # JTS convention

    def test_isring_requires_closed_and_simple(self):
        assert A.is_ring(RING) is True
        assert A.is_ring(BOW) is False  # closed but self-crossing
        assert A.is_ring(D) is False  # simple but open
        assert A.is_ring(BOX) is None  # LINESTRING-only

    def test_isempty(self):
        assert A.is_empty("GEOMETRYCOLLECTION EMPTY") is True
        assert A.is_empty(BOX) is False
        assert A.is_empty(None) is None and A.is_empty("wat") is None

    def test_boundary_shapes(self):
        assert A.boundary_wkt("POINT (3 4)") == "GEOMETRYCOLLECTION EMPTY"
        assert A.boundary_wkt(D) == "MULTIPOINT (0 0, 30 20)"
        assert A.boundary_wkt(RING) == "MULTIPOINT EMPTY"
        assert A.boundary_wkt(BOX) == "LINESTRING (0 0, 30 0, 30 20, 0 20, 0 0)"
        assert A.boundary_wkt(HOLED) == (
            "MULTILINESTRING ((0 0, 30 0, 30 20, 0 20, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1))"
        )

    def test_boundary_mod2_rule(self):
        # shared chain endpoint occurs twice -> cancels (SQL/MM mod-2)
        m2 = "MULTILINESTRING ((0 0, 30 0), (30 0, 30 20))"
        assert A.boundary_wkt(m2) == "MULTIPOINT (0 0, 30 20)"
        # three lines from a hub: hub has odd degree -> stays
        tee = "MULTILINESTRING ((0 0, 1 0), (0 0, 0 1), (0 0, -1 0))"
        assert A.boundary_wkt(tee) == "MULTIPOINT (0 0, 1 0, 0 1, -1 0)"
        # closed parts contribute nothing
        mixed = "MULTILINESTRING ((0 0, 1 0, 1 1, 0 0), (5 5, 6 6))"
        assert A.boundary_wkt(mixed) == "MULTIPOINT (5 5, 6 6)"

    def test_boundary_empty_inputs_and_collections(self):
        assert A.boundary_wkt("LINESTRING EMPTY") == "MULTIPOINT EMPTY"
        assert A.boundary_wkt("POLYGON EMPTY") == "MULTILINESTRING EMPTY"
        assert A.boundary_wkt("POINT EMPTY") == "GEOMETRYCOLLECTION EMPTY"
        # GEOS throws for collections; we go loud-NULL
        assert A.boundary_wkt("GEOMETRYCOLLECTION (POINT (1 1))") is None

    def test_multipolygon_boundary_always_multi(self):
        mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"
        assert A.boundary_wkt(mp) == "MULTILINESTRING ((0 0, 1 0, 1 1, 0 0))"


class TestLinearRef:
    def test_interpolate_branches_and_corner(self):
        assert L.line_interpolate_point(D, 0.0) == "POINT (0 0)"
        assert L.line_interpolate_point(D, 1.0) == "POINT (30 20)"
        assert L.line_interpolate_point(D, 0.5) == "POINT (25 0)"  # on bottom edge
        assert L.line_interpolate_point(D, 0.6) == "POINT (30 0)"  # exact corner
        assert L.line_interpolate_point(D, 0.8) == "POINT (30 10)"  # up right edge
        assert L.line_interpolate_point(D, 1.5) is None  # PostGIS raises; we NULL
        assert L.line_interpolate_point(BOX, 0.5) is None  # linestring-only

    def test_locate_clamps_and_breaks_ties_low(self):
        assert L.line_locate_point(D, "POINT (30 0)") == 0.6
        assert L.line_locate_point(D, "POINT (-5 -5)") == 0.0  # before start
        assert L.line_locate_point(D, "POINT (30 100)") == 1.0  # past end
        # (7,3) is exactly 3 from the bottom edge (proj -> frac 0.35) AND
        # 3 from the right edge (proj -> frac 0.65): tie goes to the
        # SMALLEST fraction, PostGIS behavior
        assert L.line_locate_point("LINESTRING (0 0, 10 0, 10 10)", "POINT (7 3)") == 0.35

    def test_substring_shapes(self):
        assert L.line_substring(D, 0.25, 0.75) == "LINESTRING (12.5 0, 30 0, 30 7.5)"
        assert L.line_substring(D, 0.0, 1.0) == D
        assert L.line_substring(D, 0.5, 0.5) == "POINT (25 0)"  # PostGIS point case
        assert L.line_substring(D, 0.75, 0.25) is None  # a > b
        # slice boundary exactly on the corner vertex: no duplicate vertex
        assert L.line_substring(D, 0.0, 0.6) == "LINESTRING (0 0, 30 0)"
        assert L.line_substring(D, 0.6, 1.0) == "LINESTRING (30 0, 30 20)"

    def test_roundtrip_locate_interpolate(self):
        rng = random.Random(42)
        line = "LINESTRING (0 0, 13 7, 20 -5, 31 4)"
        for _ in range(50):
            f = rng.random()
            p = L.line_interpolate_point(line, f)
            back = L.line_locate_point(line, p)
            assert abs(back - f) < 1e-9, (f, p, back)

    def test_substring_lengths_additive(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )

        def seg_len(wkt):
            g = G.parse_wkt(wkt)
            return sum(math.dist(a, b) for a, b in zip(g.coords, g.coords[1:]))

        total = seg_len(D)
        for cut in (0.1, 0.3, 0.6, 0.9):
            a = L.line_substring(D, 0.0, cut)
            b = L.line_substring(D, cut, 1.0)
            assert abs(seg_len(a) + seg_len(b) - total) < 1e-9

    def test_closest_and_shortest(self):
        assert L.closest_point(D, "POINT (10 5)") == "POINT (10 0)"
        assert L.shortest_line(D, "POINT (10 5)") == "LINESTRING (10 0, 10 5)"
        # point on the line: zero-length 2-vertex line, PostGIS shape
        assert L.shortest_line(D, "POINT (30 0)") == "LINESTRING (30 0, 30 0)"
        assert L.closest_point("MULTIPOINT (0 0, 9 9)", "POINT (8 8)") == "POINT (9 9)"
        assert L.closest_point("POINT (2 3)", "POINT (8 8)") == "POINT (2 3)"
        # r13: areal left sides are supported — an inside point is its
        # own closest point (formerly a loud NULL)
        assert L.closest_point(BOX, "POINT (8 8)") == "POINT (8 8)"
        assert L.closest_point(
            "MULTILINESTRING ((0 0, 4 0), (10 0, 14 0))", "POINT (11 3)"
        ) == "POINT (11 0)"


class TestReviewScenarios:
    """Round-8 code-review findings pinned (NaN int args, degenerate
    rings, EMPTY counts)."""

    def test_nan_int_arg_is_null_not_crash(self):
        # Arrow delivers SQL NULL ints to pandas UDFs as float NaN
        nan = float("nan")
        assert A.point_n(D, nan) is None
        assert A.geometry_n("MULTIPOINT (1 1, 2 2)", nan) is None
        assert A.interior_ring_n(HOLED, nan) is None

    def test_isring_degenerate_closed_walks(self):
        assert A.is_ring("LINESTRING (0 0, 1 0, 0 0)") is False  # out-and-back
        assert A.is_ring("LINESTRING (0 0, 1 0, 2 0, 0 0)") is False  # collinear
        assert A.is_ring("LINESTRING (0 0, 1 0, 0 1, 0 0)") is True  # triangle

    def test_empty_counts_are_zero_for_matching_kind(self):
        assert A.num_points("LINESTRING EMPTY") == 0
        assert A.num_points("POLYGON EMPTY") is None  # kind mismatch stays NULL
        assert A.num_interior_rings("POLYGON EMPTY") == 0
        assert A.num_interior_rings("LINESTRING EMPTY") is None


def test_null_int_arg_through_spark(spark):
    """The crash the r8 review reproduced: valid geometry + NULL int in a
    real session must yield NULL rows, not a PythonException."""
    rows = spark.sql(
        "SELECT st_pointn(g, n) AS p, st_geometryn(g, n) AS g2, "
        "st_interiorringn(g, n) AS r FROM VALUES "
        "('LINESTRING (0 0, 1 1)', 1), "
        "('LINESTRING (0 0, 1 1)', CAST(NULL AS INT)) AS t(g, n)"
    ).collect()
    assert rows[0]["p"] == "POINT (0 0)"
    assert rows[1]["p"] is None and rows[1]["g2"] is None and rows[1]["r"] is None


class TestEditors:
    """functions/editors.py kernels (driver row q153 pins the SQL level)."""

    def setup_method(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            editors,
        )

        self.E = editors

    def test_addpoint_append_insert_range(self):
        E = self.E
        assert E.add_point("LINESTRING (0 0, 30 0)", "POINT (30 20)", -1) == D
        assert E.add_point("LINESTRING (0 0, 30 20)", "POINT (30 0)", 1) == D
        assert E.add_point("LINESTRING (0 0, 30 0)", "POINT (1 1)", 0) == \
            "LINESTRING (1 1, 0 0, 30 0)"
        assert E.add_point("LINESTRING (0 0, 30 0)", "POINT (1 1)", 3) is None
        assert E.add_point(BOX, "POINT (1 1)", 0) is None  # linestring-only
        assert E.add_point("LINESTRING (0 0, 1 0)", D, 0) is None  # point-only

    def test_setpoint_negative_from_end(self):
        E = self.E
        assert E.set_point(D, 0, "POINT (9 9)") == "LINESTRING (9 9, 30 0, 30 20)"
        assert E.set_point(D, -1, "POINT (9 9)") == "LINESTRING (0 0, 30 0, 9 9)"
        assert E.set_point(D, -3, "POINT (9 9)") == "LINESTRING (9 9, 30 0, 30 20)"
        assert E.set_point(D, 3, "POINT (9 9)") is None
        assert E.set_point(D, -4, "POINT (9 9)") is None

    def test_removepoint_minimum_two_vertices(self):
        E = self.E
        assert E.remove_point(D, 1) == "LINESTRING (0 0, 30 20)"
        assert E.remove_point(D, 3) is None
        assert E.remove_point("LINESTRING (0 0, 1 0)", 0) is None  # would leave 1

    def test_flip_all_kinds(self):
        E = self.E
        assert E.flip_coordinates("POINT (1 2)") == "POINT (2 1)"
        assert E.flip_coordinates(HOLED) == (
            "POLYGON ((0 0, 0 30, 20 30, 20 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"
        )
        # involution
        assert E.flip_coordinates(E.flip_coordinates(D)) == D

    def test_segmentize_equal_parts_and_passthrough(self):
        E = self.E
        assert E.segmentize("LINESTRING (0 0, 45 0)", 15) == \
            "LINESTRING (0 0, 15 0, 30 0, 45 0)"
        # max_len not dividing evenly: ceil(30/12)=3 equal parts of 10
        assert E.segmentize("LINESTRING (0 0, 30 0)", 12) == \
            "LINESTRING (0 0, 10 0, 20 0, 30 0)"
        assert E.segmentize("LINESTRING (0 0, 30 0)", 100) == "LINESTRING (0 0, 30 0)"
        assert E.segmentize("POINT (1 1)", 5) == "POINT (1 1)"
        assert E.segmentize(BOX, 30) == \
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))"
        assert E.segmentize("LINESTRING (0 0, 30 0)", 0) is None
        assert E.segmentize("LINESTRING (0 0, 30 0)", -1) is None

    def test_segmentize_max_length_invariant(self):
        import math as m

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )

        E = self.E
        line = "LINESTRING (0 0, 13 7, 20 -5, 31 4)"
        for mx in (1.5, 3.0, 7.0):
            g = G.parse_wkt(E.segmentize(line, mx))
            assert all(
                m.dist(a, b) <= mx + 1e-9 for a, b in zip(g.coords, g.coords[1:])
            )
            # original vertices preserved
            orig = G.parse_wkt(line).coords
            assert [p for p in g.coords if p in orig] == orig

    def test_expand_envelope(self):
        E = self.E
        assert E.expand("POINT (0 0)", 5) == \
            "POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))"
        assert E.expand(D, 1) == "POLYGON ((-1 -1, 31 -1, 31 21, -1 21, -1 -1))"
        assert E.expand("MULTIPOINT (1 1, 9 4)", 0) == \
            "POLYGON ((1 1, 9 1, 9 4, 1 4, 1 1))"

    def test_empty_passthrough_and_indexed_null(self):
        # flip/segmentize/expand: EMPTY in -> same EMPTY out (the affine
        # family's composition argument); indexed editors stay loud-NULL
        E = self.E
        assert E.flip_coordinates("POLYGON EMPTY") == "POLYGON EMPTY"
        assert E.segmentize("LINESTRING EMPTY", 5) == "LINESTRING EMPTY"
        assert E.segmentize("LINESTRING EMPTY", 0) is None  # bad arg wins
        assert E.expand("MULTIPOINT EMPTY", 2) == "MULTIPOINT EMPTY"
        assert E.add_point("LINESTRING EMPTY", "POINT (1 1)", -1) is None
        assert E.set_point("LINESTRING EMPTY", 0, "POINT (1 1)") is None
        assert E.remove_point("LINESTRING EMPTY", 0) is None

    def test_nan_args_are_null(self):
        E = self.E
        nan = float("nan")
        assert E.add_point("LINESTRING (0 0, 1 0)", "POINT (2 2)", nan) is None
        assert E.set_point(D, nan, "POINT (2 2)") is None
        assert E.remove_point(D, nan) is None
        assert E.segmentize(D, nan) is None
        assert E.expand(D, nan) is None


class TestConstructorsAffine:
    """functions/constructors.py + the general st_affine (q154 pins the
    SQL level)."""

    def setup_method(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            affine,
            constructors,
        )

        self.C = constructors
        self.AF = affine

    def test_makeline_forms(self):
        C = self.C
        assert C.make_line("POINT (0 0)", "POINT (3 4)") == "LINESTRING (0 0, 3 4)"
        assert C.make_line("LINESTRING (0 0, 30 0)", "POINT (30 20)") == D
        assert C.make_line("POINT (0 0)", "LINESTRING (30 0, 30 20)") == D
        assert C.make_line("MULTIPOINT (1 1, 2 2)", "POINT (3 3)") == \
            "LINESTRING (1 1, 2 2, 3 3)"
        assert C.make_line(BOX, "POINT (1 1)") is None  # areal args rejected
        # seam duplicates are kept, as PostGIS keeps them
        assert C.make_line("POINT (5 5)", "POINT (5 5)") == "LINESTRING (5 5, 5 5)"

    def test_makepolygon_shell_and_holes(self):
        C = self.C
        assert C.make_polygon(RING) == BOX
        assert C.make_polygon(D) is None  # open shell
        assert C.make_polygon("LINESTRING (0 0, 1 0, 0 0)") is None  # too short
        assert C.make_polygon_holes(
            RING, ["LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"]
        ) == HOLED
        assert C.make_polygon_holes(RING, ["LINESTRING (1 1, 2 1)"]) is None

    def test_makeline_empty_inputs_postgis_ignored(self):
        C = self.C
        assert C.make_line("LINESTRING EMPTY", "LINESTRING (0 0, 1 1)") == \
            "LINESTRING (0 0, 1 1)"
        assert C.make_line("LINESTRING EMPTY", "MULTIPOINT EMPTY") == \
            "LINESTRING EMPTY"
        # one surviving vertex -> one-point LINESTRING (PostGIS
        # liblwgeom shape; ADVICE r8 #4)
        assert C.make_line("POINT EMPTY", "POINT (1 1)") == "LINESTRING (1 1)"
        assert C.make_line("POINT (2 3)", "MULTIPOINT EMPTY") == "LINESTRING (2 3)"
        assert C.make_line("POLYGON EMPTY", "POINT (1 1)") is None  # areal
        assert C.make_polygon("LINESTRING EMPTY") is None  # no shell boundary
        assert C.make_polygon_holes(RING, ["LINESTRING EMPTY"]) == BOX

    def test_affine_matrix_specializations_agree(self):
        AF = self.AF
        # identity
        assert AF.affine_wkt(D, 1, 0, 0, 1, 0, 0) == D
        # translate / scale / rotate as matrices == the named functions
        assert AF.affine_wkt(D, 1, 0, 0, 1, 7, -3) == AF.translate_wkt(D, 7, -3)
        assert AF.affine_wkt(D, 2, 0, 0, 3, 0, 0) == AF.scale_wkt(D, 2, 3)
        import math as m

        assert AF.affine_wkt("POINT (3 5)", 0, -1, 1, 0, 0, 0) == "POINT (-5 3)"
        # transcendental rotate lands within ulps of (0, 1); the
        # integer-matrix form is EXACT — that contrast is the point
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )

        rx, ry = G.parse_wkt(AF.rotate_wkt("POINT (1 0)", m.pi / 2)).coords
        assert abs(rx) < 1e-12 and abs(ry - 1) < 1e-12
        assert AF.affine_wkt("POINT (1 0)", 0, -1, 1, 0, 0, 0) == "POINT (0 1)"

    def test_affine_empty_and_nan(self):
        AF = self.AF
        assert AF.affine_wkt("POLYGON EMPTY", 2, 0, 0, 2, 0, 0) == "POLYGON EMPTY"
        assert AF.affine_wkt(D, float("nan"), 0, 0, 1, 0, 0) is None
        assert AF.affine_wkt(None, 1, 0, 0, 1, 0, 0) is None


class TestGeneralNearestFarthest:
    """r13: st_closestpoint/st_shortestline over ANY kind pair, plus
    st_longestline/st_maxdistance (linearref.py class contract)."""

    def test_areal_boundary_clamp(self, spark):
        row = spark.sql(
            "SELECT st_closestpoint('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POINT (20 3)') AS cp,"
            " st_shortestline('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POINT (20 3)') AS sl"
        ).collect()[0]
        assert row["cp"] == "POINT (10 3)"
        assert row["sl"] == "LINESTRING (10 3, 20 3)"

    def test_point_inside_polygon_is_zero_length(self, spark):
        row = spark.sql(
            "SELECT st_shortestline('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POINT (5 3)') AS sl"
        ).collect()[0]
        assert row["sl"] == "LINESTRING (5 3, 5 3)"

    def test_disjoint_polygon_pair_corner_witness(self, spark):
        row = spark.sql(
            "SELECT st_shortestline('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((13 10, 23 10, 23 16, 13 16, 13 10))') AS sl,"
            " st_longestline('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((13 10, 23 10, 23 16, 13 16, 13 10))') AS ll,"
            " st_maxdistance('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((13 10, 23 10, 23 16, 13 16, 13 10))') AS md"
        ).collect()[0]
        assert row["sl"] == "LINESTRING (10 6, 13 10)"  # gap hypot(3,4)=5
        assert row["ll"] == "LINESTRING (0 0, 23 16)"
        import math

        assert row["md"] == math.hypot(23, 16)

    def test_overlapping_pair_returns_vertex_witness(self, spark):
        # r14 (ADVICE r13): an intersecting pair with a vertex of one
        # operand on/in the other returns that vertex as the
        # zero-distance witness (PostGIS returns a shared point) — the
        # overlapping twin's first serialized vertex (5, 3) is inside
        row = spark.sql(
            "SELECT st_shortestline('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((5 3, 15 3, 15 9, 5 9, 5 3))') AS sl,"
            " st_closestpoint('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((5 3, 15 3, 15 9, 5 9, 5 3))') AS cp,"
            " st_maxdistance('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((5 3, 15 3, 15 9, 5 9, 5 3))') AS md"
        ).collect()[0]
        assert row["sl"] == "LINESTRING (5 3, 5 3)"
        assert row["cp"] == "POINT (5 3)"
        assert row["md"] is not None  # max distance has no overlap gate

    def test_vertex_free_crossing_stays_loud_null(self, spark):
        # a plus-sign crossing: every vertex of each bar is strictly
        # outside the other, so no vertex witness exists — the
        # documented loud NULL survives exactly for this class
        row = spark.sql(
            "SELECT st_shortestline('POLYGON ((0 0, 10 0, 10 1, 0 1, 0 0))',"
            " 'POLYGON ((4 -5, 5 -5, 5 5, 4 5, 4 -5))') AS sl,"
            " st_closestpoint('POLYGON ((0 0, 10 0, 10 1, 0 1, 0 0))',"
            " 'POLYGON ((4 -5, 5 -5, 5 5, 4 5, 4 -5))') AS cp"
        ).collect()[0]
        assert row["sl"] is None and row["cp"] is None

    def test_shared_corner_and_mixed_member_witnesses(self, spark):
        row = spark.sql(
            "SELECT st_closestpoint('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',"
            " 'POLYGON ((10 6, 20 6, 20 12, 10 12, 10 6))') AS corner,"
            " st_closestpoint('GEOMETRYCOLLECTION (POINT (7 2),"
            " LINESTRING (30 30, 35 30))',"
            " 'POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))') AS member"
        ).collect()[0]
        assert row["corner"] == "POINT (10 6)"
        assert row["member"] == "POINT (7 2)"

    def test_pair_work_bound_is_loud_null(self, spark):
        # the all-pairs scans refuse past _MAX_PAIR_WORK (grids-family
        # budget idiom) instead of stalling the executor
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.linearref import (
            farthest_pair, nearest_pair,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        big = Geometry("MultiPoint", [(float(i), 0.0) for i in range(2100)])
        far = Geometry("MultiPoint", [(float(i), 9.0) for i in range(2100)])
        assert nearest_pair(big, far) is None  # 2100*2100 > 4e6
        assert farthest_pair(big, far) is None
        small = Geometry("MultiPoint", [(0.0, 9.0)])
        assert nearest_pair(big, small) is not None

    def test_line_line_and_multipoint(self, spark):
        row = spark.sql(
            "SELECT st_shortestline('LINESTRING (0 0, 4 0)',"
            " 'LINESTRING (1 3, 3 3)') AS ll,"
            " st_shortestline('MULTIPOINT (0 0, 9 9)',"
            " 'MULTIPOINT (1 1, 50 0)') AS mp"
        ).collect()[0]
        assert row["ll"] == "LINESTRING (1 0, 1 3)"
        assert row["mp"] == "LINESTRING (0 0, 1 1)"

    def test_lineal_point_backward_compat(self, spark):
        # the pre-r13 lineal+point class answers are unchanged
        row = spark.sql(
            "SELECT st_closestpoint('LINESTRING (0 0, 4 0)', 'POINT (2 5)') AS cp,"
            " st_shortestline('LINESTRING (0 0, 4 0)', 'POINT (2 0)') AS zl"
        ).collect()[0]
        assert row["cp"] == "POINT (2 0)"
        assert row["zl"] == "LINESTRING (2 0, 2 0)"

    def test_isolated_vertices_are_candidates(self):
        # review r13: a collection's POINT member lies on no segment —
        # the vertex-vertex scan must see it
        got = L.closest_point(
            "GEOMETRYCOLLECTION (POINT (0 0),"
            " POLYGON ((100 0, 101 0, 101 1, 100 1, 100 0)))",
            "POINT (1 0)",
        )
        assert got == "POINT (0 0)"
        # ...and isolated vertices on BOTH sides pair directly
        got = L.shortest_line(
            "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (100 0, 101 0))",
            "GEOMETRYCOLLECTION (POINT (1 0), LINESTRING (200 0, 201 0))",
        )
        assert got == "LINESTRING (0 0, 1 0)"

    def test_multipoint_member_on_areal_is_zero_witness(self):
        # review r13: a 0-D operand is not 'extended' — its first member
        # on the other geometry is the zero-distance witness, not NULL
        got = L.shortest_line(
            "POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))",
            "MULTIPOINT (50 50, 5 3)",
        )
        assert got == "LINESTRING (5 3, 5 3)"
        got = L.closest_point(
            "MULTIPOINT (5 3, 50 50)",
            "POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))",
        )
        assert got == "POINT (5 3)"

    def test_brute_force_distance_parity(self):
        # nearest_pair's distance equals geometry.distance on random
        # disjoint fixtures (independent kernels cross-check)
        import math
        import random

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.linearref import (
            nearest_pair,
        )

        rng = random.Random(2713)
        n_checked = 0
        while n_checked < 30:
            x0, y0 = rng.randrange(0, 20), rng.randrange(0, 20)
            x1, y1 = rng.randrange(40, 60), rng.randrange(40, 60)
            a = G.parse_wkt(
                f"POLYGON (({x0} {y0}, {x0+9} {y0}, {x0+9} {y0+5}, {x0} {y0+5}, {x0} {y0}))"
            )
            b = G.parse_wkt(
                f"LINESTRING ({x1} {y1}, {x1+7} {y1+3}, {x1} {y1+11})"
            )
            if G.intersects(a, b):
                continue
            pa, pb = nearest_pair(a, b)
            d = math.hypot(pa[0] - pb[0], pa[1] - pb[1])
            assert math.isclose(d, G.distance(a, b), rel_tol=1e-12)
            n_checked += 1
