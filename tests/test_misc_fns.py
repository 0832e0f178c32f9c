"""Small-surface batch — functions/misc_fns.py: ST_Summary, ST_NRings,
ST_PointInsideCircle, ST_HasArc, the 2-D aliases, ST_ForceRHR, and the
ST_3DExtent aggregate form."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    misc_fns as M,
)


class TestSummary:
    def test_shapes(self):
        assert M.summary_text("POINT (1 2)") == "Point[]"
        assert M.summary_text("LINESTRING (0 0, 1 1, 2 2)") == (
            "LineString[] with 3 points"
        )
        assert M.summary_text(
            "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 2 1, 2 2, 1 1))"
        ) == (
            "Polygon[] with 2 rings\n"
            "  ring 0 has 5 points\n"
            "  ring 1 has 4 points"
        )
        assert M.summary_text(
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        ) == (
            "GeometryCollection[] with 2 elements\n"
            "  Point[]\n"
            "  LineString[] with 2 points"
        )
        assert M.summary_text("MULTIPOINT ((1 2), (3 4))").startswith(
            "MultiPoint[] with 2 elements"
        )
        assert M.summary_text("POINT EMPTY") == "Point[] (empty)"
        assert M.summary_text("junk") is None
        assert M.summary_text(None) is None


class TestNRings:
    def test_counts(self):
        assert M.nrings_of("POINT (1 2)") == 0
        assert M.nrings_of("POLYGON ((0 0, 1 0, 1 1, 0 0))") == 1
        assert (
            M.nrings_of(
                "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
                "((5 5, 9 5, 9 9, 5 9, 5 5), (6 6, 7 6, 6 7, 6 6)))"
            )
            == 3
        )
        assert M.nrings_of("POLYGON EMPTY") == 0
        assert M.nrings_of("junk") is None


class TestPointInsideCircle:
    def test_strictness(self):
        assert M.point_inside_circle("POINT (1 1)", 0, 0, 2) is True
        # ON the circle is NOT inside (PostGIS strict <)
        assert M.point_inside_circle("POINT (2 0)", 0, 0, 2) is False
        assert M.point_inside_circle("POINT (3 0)", 0, 0, 2) is False
        assert M.point_inside_circle("LINESTRING (0 0, 1 1)", 0, 0, 2) is None
        assert M.point_inside_circle("POINT (0 0)", 0, 0, None) is None
        assert M.point_inside_circle("POINT (0 0)", 0, 0, float("nan")) is None


class TestHasArc:
    def test_detection(self):
        assert M.has_arc("CIRCULARSTRING (0 0, 1 1, 2 0)") is True
        assert M.has_arc("COMPOUNDCURVE ((0 0, 1 0))") is True
        assert M.has_arc("MULTISURFACE EMPTY") is True
        assert M.has_arc("POINT (1 2)") is False
        assert M.has_arc("POINT Z (1 2 3)") is False
        assert M.has_arc("POINT M (1 2 3)") is False
        assert M.has_arc("POLYGON EMPTY") is False
        assert M.has_arc("junk") is None
        assert M.has_arc(None) is None


class TestExtent3D:
    def test_mixed_dims(self):
        assert M.extent3d_all(
            ["POINT Z (1 2 3)", "POINT (5 -1)", "LINESTRING Z (0 0 -2, 4 4 4)"]
        ) == "BOX3D(0 -1 -2, 5 4 4)"
        assert M.extent3d_all(["POINT (1 2)"]) == "BOX3D(1 2 0, 1 2 0)"

    def test_member_semantics(self):
        # junk is loud; NULL and typed-EMPTY members (any dims) are
        # SKIPPED like PostGIS aggregate rows (code-review r15: the
        # 2-D and Z empties now behave identically)
        assert M.extent3d_all(["POINT (1 2)", "junk"]) is None
        assert M.extent3d_all(["POINT (1 2)", None]) == "BOX3D(1 2 0, 1 2 0)"
        assert M.extent3d_all(["POINT (1 2)", "LINESTRING EMPTY"]) == "BOX3D(1 2 0, 1 2 0)"
        assert (
            M.extent3d_all(["POINT Z (1 2 3)", "LINESTRING Z EMPTY"])
            == "BOX3D(1 2 3, 1 2 3)"
        )
        assert M.extent3d_all([None]) is None  # nothing bounds — NULL group
        assert M.extent3d_all([]) is None
        assert M.extent3d_all(None) is None


def test_aliases_are_same_objects():
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
        st_forcepolygoncw,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spatial import (
        st_area,
        st_length,
        st_perimeter,
    )

    assert M.ALL_MISC_FUNCTIONS["st_length2d"] is st_length
    assert M.ALL_MISC_FUNCTIONS["st_perimeter2d"] is st_perimeter
    assert M.ALL_MISC_FUNCTIONS["st_area2d"] is st_area
    assert M.ALL_MISC_FUNCTIONS["st_forcerhr"] is st_forcepolygoncw


def test_hasarc_junk_body_is_loud():
    # code-review r15: a curve keyword with an unreadable body is NULL
    assert M.has_arc("CIRCULARSTRING junk (((") is None
    assert M.has_arc("COMPOUNDCURVE ((0 0, 1 0), (2 0, 3 0))") is None  # gap
    assert M.has_arc("MULTICURVE (POINT (1 1))") is None
