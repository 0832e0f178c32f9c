"""Aggregate forms — functions/agg_forms.py: st_collect_all /
st_makeline_all / st_polygonize_all over collected arrays (the
st_union_all idiom)."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    agg_forms as A,
)


class TestCollectAll:
    def test_promotion(self):
        assert A.collect_all_wkt(["POINT (1 2)", "POINT (3 4)"]) == "MULTIPOINT (1 2, 3 4)"
        assert (
            A.collect_all_wkt(["LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)"])
            == "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"
        )
        # a 1-member group still promotes (the kind rule, not count)
        assert A.collect_all_wkt(["POINT (1 2)"]) == "MULTIPOINT (1 2)"

    def test_mixed_and_multi_members_fall_to_gc(self):
        assert (
            A.collect_all_wkt(["POINT (1 2)", "LINESTRING (0 0, 1 1)"])
            == "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        )
        assert A.collect_all_wkt(["MULTIPOINT ((1 2))", "MULTIPOINT ((3 4))"]).startswith(
            "GEOMETRYCOLLECTION"
        )

    def test_loud_members_and_empty_group(self):
        assert A.collect_all_wkt(["POINT (1 2)", "junk"]) is None
        assert A.collect_all_wkt(["POINT (1 2)", "POINT EMPTY"]) is None
        assert A.collect_all_wkt(["POINT (1 2)", None]) is None
        assert A.collect_all_wkt([]) is None
        assert A.collect_all_wkt(None) is None


class TestMakeLineAll:
    def test_concatenates_in_order(self):
        assert (
            A.make_line_all_wkt(["POINT (0 0)", "LINESTRING (1 1, 2 2)", "MULTIPOINT ((3 3))"])
            == "LINESTRING (0 0, 1 1, 2 2, 3 3)"
        )

    def test_loud_areal_and_empties(self):
        assert A.make_line_all_wkt(["POLYGON ((0 0, 1 0, 1 1, 0 0))"]) is None
        assert A.make_line_all_wkt(["POINT EMPTY", "LINESTRING EMPTY"]) == "LINESTRING EMPTY"
        assert A.make_line_all_wkt([]) is None


class TestPolygonizeAll:
    def test_faces_close_across_members(self):
        out = A.polygonize_all_wkt(
            ["LINESTRING (0 0, 4 0, 4 4)", "LINESTRING (4 4, 0 4, 0 0)"]
        )
        assert out == "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))"

    def test_no_face_and_empty_members(self):
        assert A.polygonize_all_wkt(["LINESTRING (0 0, 1 1)"]) == "GEOMETRYCOLLECTION EMPTY"
        assert (
            A.polygonize_all_wkt(["LINESTRING EMPTY", "LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)"])
            == "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))"
        )

    def test_loud_nonlineal(self):
        assert A.polygonize_all_wkt(["POINT (1 1)"]) is None
        assert A.polygonize_all_wkt(["POLYGON ((0 0, 1 0, 1 1, 0 0))"]) is None
        assert A.polygonize_all_wkt([None]) is None
        assert A.polygonize_all_wkt(None) is None


def test_member_order_permutation_invariance():
    """collect_list order is nondeterministic — st_collect_all's KIND
    promotion and st_polygonize_all's sorted face walk must give the
    same geometry SET for any member order (makeline is documented
    order-sensitive, like PostGIS's aggregate)."""
    import itertools

    lines = [
        "LINESTRING (0 0, 4 0, 4 4)",
        "LINESTRING (4 4, 0 4, 0 0)",
        "LINESTRING (10 0, 11 0, 11 1, 10 0)",
    ]
    faces = {A.polygonize_all_wkt(list(p)) for p in itertools.permutations(lines)}
    assert len(faces) == 1  # the sorted walk is member-order canonical
    pts = ["POINT (1 2)", "POINT (3 4)", "POINT (5 6)"]
    kinds = {
        A.collect_all_wkt(list(p)).split(" ")[0]
        for p in itertools.permutations(pts)
    }
    assert kinds == {"MULTIPOINT"}


def test_spark_sql_surface(spark):
    row = spark.sql(
        "SELECT st_makeline_all(collect_list(g)) AS l FROM ("
        "  SELECT g FROM VALUES ('POINT (0 0)'), ('POINT (1 1)') AS t(g)"
        ")"
    ).collect()[0]
    assert row["l"] in ("LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 0 0)")
    row = spark.sql(
        "SELECT st_collect_all(array('POINT (1 2)', 'POINT (3 4)')) AS c"
    ).collect()[0]
    assert row["c"] == "MULTIPOINT (1 2, 3 4)"
