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

    def test_non_rect_inside_hole_survives(self):
        # Pruning uses within() against the dissolved rect union, whose
        # holes subtract: a part inside the HOLE is not covered and must
        # be kept as its own piece.
        tri = "POLYGON ((2 2, 3 2, 2.5 3, 2 2))"
        got = G.parse_wkt(
            _u(
                "POLYGON ((0 0, 5 0, 5 1, 0 1, 0 0))",
                "POLYGON ((0 4, 5 4, 5 5, 0 5, 0 4))",
                "POLYGON ((0 0, 1 0, 1 5, 0 5, 0 0))",
                "POLYGON ((4 0, 5 0, 5 5, 4 5, 4 0))",
                tri,
            )
        )
        assert got.kind == "MultiPolygon"
        assert G.area(got) == 16.0 + 0.5  # frame (25−9) + triangle

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


# ---------------------------------------------------------------------------
# property-based: random rectangle sets vs brute-force grid truth
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _int_rects(draw):
    """2-8 rectangles on a small integer grid: maximizes shared edges,
    corner touches, duplicates, containment — every degenerate dissolve
    configuration — while keeping the brute-force truth exact."""
    n = draw(st.integers(min_value=2, max_value=8))
    rects = []
    for _ in range(n):
        x0 = draw(st.integers(min_value=-5, max_value=4))
        y0 = draw(st.integers(min_value=-5, max_value=4))
        rects.append(
            (
                float(x0),
                float(y0),
                float(x0 + draw(st.integers(min_value=1, max_value=5))),
                float(y0 + draw(st.integers(min_value=1, max_value=5))),
            )
        )
    return rects


def _truth(rects):
    """Unit-cell brute force on the integer grid: area, perimeter, and
    part count (4-connected components of covered cells)."""
    cells = {
        (i, j)
        for x0, y0, x1, y1 in rects
        for i in range(int(x0), int(x1))
        for j in range(int(y0), int(y1))
    }
    area = float(len(cells))
    perim = float(
        sum(
            (i + 1, j) not in cells
            for i, j in cells
        )
        + sum((i - 1, j) not in cells for i, j in cells)
        + sum((i, j + 1) not in cells for i, j in cells)
        + sum((i, j - 1) not in cells for i, j in cells)
    )
    comps = 0
    seen = set()
    for c in cells:
        if c in seen:
            continue
        comps += 1
        stack = [c]
        seen.add(c)
        while stack:
            i, j = stack.pop()
            for nb in ((i + 1, j), (i - 1, j), (i, j + 1), (i, j - 1)):
                if nb in cells and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
    return area, perim, comps


@settings(max_examples=300, deadline=None)
@given(_int_rects())
def test_dissolve_matches_bruteforce(rects):
    g = U.union_geoms([G.Geometry.box(*r) for r in rects])
    area, perim, comps = _truth(rects)
    assert G.area(g) == area
    assert G.length(g) == perim
    n_parts = len(g.coords) if g.kind == "MultiPolygon" else 1
    assert n_parts == comps
    # Round-trip: the emitted WKT must re-parse to the same measures
    # (exercises hole ordering in to_wkt/parse_wkt).
    rt = G.parse_wkt(G.to_wkt(g))
    assert G.area(rt) == area and G.length(rt) == perim


@settings(max_examples=150, deadline=None)
@given(_int_rects(), _int_rects())
def test_union_is_idempotent_and_commutative(rects_a, rects_b):
    ga = [G.Geometry.box(*r) for r in rects_a]
    gb = [G.Geometry.box(*r) for r in rects_b]
    ab = U.union_geoms(ga + gb)
    ba = U.union_geoms(gb + ga)
    again = U.union_geoms([ab, ba])
    assert G.area(ab) == G.area(ba) == G.area(again)
    assert G.length(ab) == G.length(ba) == G.length(again)
