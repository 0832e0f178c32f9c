"""ST_Union: rectilinear dissolve core, SQL surface, q124 parity + plan.

The dissolve's exactness boundary (union_ops.py docstring): axis-aligned
rectangles are exact — including holes and checkerboard corners — while
non-rectangular overlaps degrade to stacked parts with the point set
preserved. Cases here pin each behavior.
"""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import union_ops as U
from sql_interface_to_xml_database_for_spatial_operations_spark.operators import load_all
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import QUERIES

from conftest import SF_DIR, assert_parity


def _u(*wkts):
    g = U.union_geoms([G.parse_wkt(w) for w in wkts])
    return None if g is None else G.to_wkt(g)


BOX_A = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"


class TestDissolveCore:
    def test_disjoint_boxes_stay_multi(self):
        got = G.parse_wkt(_u(BOX_A, "POLYGON ((5 0, 6 0, 6 1, 5 1, 5 0))"))
        assert got.kind == "MultiPolygon"
        assert G.area(got) == 5.0

    def test_overlap_dissolves_area(self):
        got = G.parse_wkt(_u(BOX_A, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
        assert got.kind == "Polygon"
        assert G.area(got) == 7.0  # 4 + 4 - 1 overlap
        assert G.length(got) == 12.0

    def test_duplicate_and_contained_collapse(self):
        assert G.area(G.parse_wkt(_u(BOX_A, BOX_A))) == 4.0
        inner = "POLYGON ((0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))"
        assert G.area(G.parse_wkt(_u(BOX_A, inner))) == 4.0

    def test_touching_edges_merge(self):
        got = G.parse_wkt(
            _u("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))")
        )
        assert got.kind == "Polygon"
        assert G.area(got) == 2.0
        assert G.length(got) == 6.0  # shared edge dissolved away

    def test_frame_produces_hole(self):
        got = G.parse_wkt(
            _u(
                "POLYGON ((0 0, 3 0, 3 1, 0 1, 0 0))",
                "POLYGON ((0 2, 3 2, 3 3, 0 3, 0 2))",
                "POLYGON ((0 0, 1 0, 1 3, 0 3, 0 0))",
                "POLYGON ((2 0, 3 0, 3 3, 2 3, 2 0))",
            )
        )
        assert got.kind == "Polygon"
        assert len(got.coords) == 2  # exterior + hole
        assert G.area(got) == 8.0  # 9 outer − 1 hole
        assert G.length(got) == 16.0  # 12 outer + 4 hole

    def test_checkerboard_corner_stays_two_parts(self):
        got = G.parse_wkt(
            _u("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        )
        assert got.kind == "MultiPolygon"
        assert len(got.coords) == 2
        assert G.area(got) == 2.0

    def test_nested_hole_island(self):
        # Frame with hole + island inside the hole: island must NOT be
        # assigned as covered (it is inside the hole, not the solid).
        got = G.parse_wkt(
            _u(
                "POLYGON ((0 0, 5 0, 5 1, 0 1, 0 0))",
                "POLYGON ((0 4, 5 4, 5 5, 0 5, 0 4))",
                "POLYGON ((0 0, 1 0, 1 5, 0 5, 0 0))",
                "POLYGON ((4 0, 5 0, 5 5, 4 5, 4 0))",
                "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))",  # island
            )
        )
        assert got.kind == "MultiPolygon"
        assert G.area(got) == (25.0 - 9.0) + 1.0
        assert G.length(got) == 20.0 + 12.0 + 4.0

    def test_mixed_dimensions_collection(self):
        got = G.parse_wkt(_u(BOX_A, "POINT (1 1)", "POINT (9 9)", "LINESTRING (8 0, 9 0)"))
        assert got.kind == "GeometryCollection"
        kinds = sorted(sub.kind for sub in got.coords)
        assert kinds == ["LineString", "Point", "Polygon"]  # covered point dropped

    def test_non_rect_containment_pruned(self):
        tri = "POLYGON ((0.2 0.2, 1 0.2, 0.2 1, 0.2 0.2))"
        got = G.parse_wkt(_u(BOX_A, tri))
        assert got.kind == "Polygon"  # triangle within box → pruned
        assert G.area(got) == 4.0

    def test_empty_and_null(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            relations as R,
        )

        assert _u() is None
        assert U.union_wkts([None, None]) is None
        # Nulls skipped; the survivor may be re-traced from a different
        # start vertex, so compare as point sets, not strings.
        got = G.parse_wkt(U.union_wkts([None, BOX_A]))
        assert R.equals(got, G.parse_wkt(BOX_A))


class TestSqlSurface:
    def test_binary_st_union(self, spark):
        row = spark.sql(
            "SELECT st_area(st_union('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',"
            " 'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')) AS a"
        ).collect()[0]
        assert row["a"] == 7.0

    def test_st_union_with_null_returns_other(self, spark):
        row = spark.sql(
            "SELECT st_union('POINT (1 2)', CAST(NULL AS STRING)) AS w"
        ).collect()[0]
        assert row["w"] == "POINT (1 2)"

    def test_st_union_all_over_collect_list(self, spark):
        row = spark.sql(
            """
            SELECT st_area(st_union_all(collect_list(w))) AS a FROM VALUES
              ('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
              ('POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))'),
              ('POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))') AS t(w)
            """
        ).collect()[0]
        assert row["a"] == 2.0

    def test_malformed_array_elements_skipped(self, spark):
        row = spark.sql(
            "SELECT st_union_all(array('POLYGON garbage ((', 'POINT (3 4)')) AS w"
        ).collect()[0]
        assert row["w"] == "POINT (3 4)"


class TestDriverRow:
    @pytest.fixture(autouse=True)
    def _load(self):
        load_all()

    def test_q124_oracle_parity(self, spark, oracle):
        q = QUERIES["q124_st_union_agg"]
        assert_parity(q.fn(spark, SF_DIR), oracle, q.oracle, q.name)

    def test_q124_plan_is_cascaded(self, spark):
        """The shuffle input must be the mapInPandas PARTIALS, not the raw
        boxes: MapInPandas runs before the exchange, so shuffle volume is
        (#partitions × #groups), not one row per geometry."""
        df = QUERIES["q124_st_union_agg"].fn(spark, SF_DIR)
        simple = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in simple and "Exchange" in simple
        # In the physical tree string, children print BELOW parents, so
        # the exchange (parent) must appear before mapInPandas (child).
        assert simple.index("Exchange") < simple.index("MapInPandas")
