"""Unit tests for the DE-9IM relation predicates (functions/relations.py):
touches / disjoint / equals / overlaps / crosses over every dimension
pairing, against PostGIS-documented semantics.

These are pure-Python (no Spark) so the topology code gets dense coverage
cheaply; the Spark SQL surface is exercised by q122_st_relations and the
null-safety sweep.
"""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
    parse_wkt,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
    crosses,
    disjoint,
    equals,
    overlaps,
    touches,
)


def g(wkt: str):
    out = parse_wkt(wkt)
    assert out is not None, wkt
    return out


SQ = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"
SQ_SHIFT = "POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))"  # overlaps SQ
SQ_EDGE = "POLYGON((10 0, 20 0, 20 10, 10 10, 10 0))"  # touches SQ along x=10
SQ_CORNER = "POLYGON((10 10, 20 10, 20 20, 10 20, 10 10))"  # touches at (10,10)
SQ_FAR = "POLYGON((30 30, 40 30, 40 40, 30 40, 30 30))"
SQ_INNER = "POLYGON((2 2, 8 2, 8 8, 2 8, 2 2))"  # within SQ
SQ_REV = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"  # SQ, reversed ring order


class TestTouches:
    def test_edge_touch(self):
        assert touches(g(SQ), g(SQ_EDGE))

    def test_corner_touch(self):
        assert touches(g(SQ), g(SQ_CORNER))

    def test_overlap_not_touch(self):
        assert not touches(g(SQ), g(SQ_SHIFT))

    def test_disjoint_not_touch(self):
        assert not touches(g(SQ), g(SQ_FAR))

    def test_containment_not_touch(self):
        assert not touches(g(SQ), g(SQ_INNER))

    def test_point_on_boundary_touches_polygon(self):
        assert touches(g("POINT(10 5)"), g(SQ))
        assert touches(g("POINT(0 0)"), g(SQ))

    def test_point_inside_not_touches(self):
        assert not touches(g("POINT(5 5)"), g(SQ))

    def test_line_endpoint_on_line_interior(self):
        # PostGIS doc example: LINESTRING(1 1, 1 2) touches
        # LINESTRING(0 2, 1 1, 2 2) at the shared endpoint (1 1)
        assert touches(g("LINESTRING(1 1, 1 2)"), g("LINESTRING(0 2, 1 1, 2 2)"))

    def test_lines_crossing_not_touching(self):
        assert not touches(g("LINESTRING(0 0, 2 2)"), g("LINESTRING(0 2, 2 0)"))

    def test_line_touches_polygon_edge(self):
        # line running along the boundary: intersection is 1-D but all
        # boundary — still "touches" (interiors don't meet)
        assert touches(g("LINESTRING(0 0, 10 0)"), g(SQ))

    def test_line_entering_polygon_not_touch(self):
        assert not touches(g("LINESTRING(5 5, 15 5)"), g(SQ))

    def test_point_point_never_touches(self):
        # a point's interior IS the point: identical → interiors meet;
        # distinct → no intersection. Either way not touches.
        assert not touches(g("POINT(1 1)"), g("POINT(1 1)"))
        assert not touches(g("POINT(1 1)"), g("POINT(2 2)"))


class TestDisjoint:
    def test_far_apart(self):
        assert disjoint(g(SQ), g(SQ_FAR))

    def test_touching_not_disjoint(self):
        assert not disjoint(g(SQ), g(SQ_EDGE))

    def test_point_outside(self):
        assert disjoint(g("POINT(11 5)"), g(SQ))

    def test_point_on_boundary_not_disjoint(self):
        assert not disjoint(g("POINT(10 5)"), g(SQ))


class TestEquals:
    def test_ring_orientation_irrelevant(self):
        assert equals(g(SQ), g(SQ_REV))

    def test_vertex_order_rotation(self):
        assert equals(g(SQ), g("POLYGON((10 0, 10 10, 0 10, 0 0, 10 0))"))

    def test_extra_collinear_vertex(self):
        assert equals(g(SQ), g("POLYGON((0 0, 5 0, 10 0, 10 10, 0 10, 0 0))"))

    def test_different_not_equal(self):
        assert not equals(g(SQ), g(SQ_INNER))

    def test_line_direction_irrelevant(self):
        assert equals(g("LINESTRING(0 0, 10 0)"), g("LINESTRING(10 0, 0 0)"))

    def test_line_split_into_two_segments(self):
        assert equals(
            g("LINESTRING(0 0, 10 0)"),
            g("MULTILINESTRING((0 0, 4 0),(4 0, 10 0))"),
        )

    def test_line_vs_longer_line(self):
        assert not equals(g("LINESTRING(0 0, 10 0)"), g("LINESTRING(0 0, 11 0)"))

    def test_multipoint_set_semantics(self):
        assert equals(g("MULTIPOINT(1 1, 2 2)"), g("MULTIPOINT(2 2, 1 1)"))
        assert not equals(g("MULTIPOINT(1 1, 2 2)"), g("MULTIPOINT(1 1)"))

    def test_dimension_mismatch(self):
        assert not equals(g("POINT(0 0)"), g("LINESTRING(0 0, 0 0)") or g(SQ))


class TestOverlaps:
    def test_partial_polygon_overlap(self):
        assert overlaps(g(SQ), g(SQ_SHIFT))

    def test_containment_not_overlap(self):
        assert not overlaps(g(SQ), g(SQ_INNER))
        assert not overlaps(g(SQ_INNER), g(SQ))

    def test_touch_not_overlap(self):
        assert not overlaps(g(SQ), g(SQ_EDGE))

    def test_equal_not_overlap(self):
        assert not overlaps(g(SQ), g(SQ_REV))

    def test_line_collinear_partial_overlap(self):
        assert overlaps(g("LINESTRING(0 0, 6 0)"), g("LINESTRING(4 0, 10 0)"))

    def test_lines_crossing_not_overlap(self):
        # crossing at a point: interiors meet in dim 0 < 1 → crosses, not
        # overlaps
        assert not overlaps(g("LINESTRING(0 0, 2 2)"), g("LINESTRING(0 2, 2 0)"))

    def test_multipoint_overlap(self):
        assert overlaps(g("MULTIPOINT(1 1, 2 2)"), g("MULTIPOINT(2 2, 3 3)"))
        assert not overlaps(g("MULTIPOINT(1 1, 2 2)"), g("MULTIPOINT(1 1, 2 2)"))

    def test_dimension_mismatch_never_overlaps(self):
        assert not overlaps(g("LINESTRING(0 0, 10 0)"), g(SQ))


class TestCrosses:
    def test_lines_crossing(self):
        assert crosses(g("LINESTRING(0 0, 2 2)"), g("LINESTRING(0 2, 2 0)"))

    def test_collinear_lines_not_crossing(self):
        assert not crosses(g("LINESTRING(0 0, 6 0)"), g("LINESTRING(4 0, 10 0)"))

    def test_line_through_polygon(self):
        assert crosses(g("LINESTRING(-5 5, 15 5)"), g(SQ))
        assert crosses(g(SQ), g("LINESTRING(-5 5, 15 5)"))  # symmetric

    def test_line_inside_polygon_not_crossing(self):
        assert not crosses(g("LINESTRING(2 2, 8 8)"), g(SQ))

    def test_line_touching_boundary_not_crossing(self):
        assert not crosses(g("LINESTRING(0 0, 10 0)"), g(SQ))

    def test_multipoint_crosses_polygon(self):
        assert crosses(g("MULTIPOINT(5 5, 20 20)"), g(SQ))
        assert not crosses(g("MULTIPOINT(5 5, 6 6)"), g(SQ))

    def test_multipoint_crosses_line(self):
        assert crosses(g("MULTIPOINT(5 0, 20 20)"), g("LINESTRING(0 0, 10 0)"))

    def test_polygons_never_cross(self):
        assert not crosses(g(SQ), g(SQ_SHIFT))

    def test_t_junction_is_touch_not_cross(self):
        # endpoint of one line in the other's interior → boundary contact
        assert not crosses(g("LINESTRING(5 0, 5 5)"), g("LINESTRING(0 5, 10 5)"))
        assert touches(g("LINESTRING(5 0, 5 5)"), g("LINESTRING(0 5, 10 5)"))

    def test_mid_vertex_contact_crosses(self):
        # interior vertex of A lies in B's interior, A continues past:
        # interiors meet at an isolated point → crosses
        assert crosses(
            g("LINESTRING(0 0, 5 5, 10 0)"), g("LINESTRING(0 5, 10 5)")
        )


class TestExclusivity:
    """On any pair, touches/overlaps/crosses/equals are mutually exclusive
    and each implies NOT disjoint."""

    PAIRS = [
        (SQ, SQ_EDGE),
        (SQ, SQ_SHIFT),
        (SQ, SQ_REV),
        (SQ, SQ_FAR),
        (SQ, SQ_INNER),
        ("LINESTRING(0 0, 2 2)", "LINESTRING(0 2, 2 0)"),
        ("LINESTRING(0 0, 6 0)", "LINESTRING(4 0, 10 0)"),
        ("LINESTRING(-5 5, 15 5)", SQ),
        ("MULTIPOINT(5 5, 20 20)", SQ),
        ("POINT(10 5)", SQ),
    ]

    @pytest.mark.parametrize("wa,wb", PAIRS)
    def test_exclusive(self, wa, wb):
        a, b = g(wa), g(wb)
        flags = [touches(a, b), overlaps(a, b), crosses(a, b), equals(a, b)]
        assert sum(flags) <= 1, (wa, wb, flags)
        if any(flags):
            assert not disjoint(a, b)


class TestFloatCoordinateExactProbes:
    """r12 (found by the hex-grid tiling test): engine-SYNTHESIZED
    probe points (edge sub-midpoints, covered-line split points) were
    evaluated in float arithmetic and rounded up to 1 ulp off their own
    segment — equals(x, x) and within(x, x) returned FALSE for
    float-coordinate geometries, and edge-adjacent float polygons got a
    false interiors_intersect. Synthesized probes are now exact
    Fraction points (geometry._exact_split_points) evaluated by exact
    lifted predicates."""

    H = 8.660254037844386  # sqrt(3)*5: the irrational-derived class
    H2 = 12.990381056766578

    def test_float_self_identity(self):
        line = g(f"LINESTRING (0 0, {self.H} {self.H2}, 17.32 3.3)")
        poly = g(f"POLYGON ((0.1 0.1, {self.H} 0.2, 4.3 {self.H2}, 0.1 0.1))")
        assert equals(line, line)
        assert equals(poly, poly)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )

        assert G.within(poly, poly)

    def test_edge_adjacent_float_hexes_touch(self):
        a = g(
            f"POLYGON ((-2.5 {self.H2}, -5 17.32050807568877, "
            f"-10 17.32050807568877, -12.5 {self.H2}, -10 {self.H}, "
            f"-5 {self.H}, -2.5 {self.H2}))"
        )
        b = g(
            f"POLYGON ((5 {self.H}, 2.5 {self.H2}, -2.5 {self.H2}, "
            f"-5 {self.H}, -2.5 4.330127018922193, "
            f"2.5 4.330127018922193, 5 {self.H}))"
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            interiors_intersect,
        )

        assert not interiors_intersect(a, b)
        assert touches(a, b)

    def test_split_line_equality_still_exact(self):
        # the fix must keep vertex-parameter contacts exact: a float
        # parameter roundtrip would land 1 ulp past the shared vertex
        assert equals(
            g("LINESTRING (0 0, 10 0)"),
            g("MULTILINESTRING ((0 0, 4 0), (4 0, 10 0))"),
        )
        assert equals(
            g(f"LINESTRING (0 0, {self.H} 0)"),
            g(f"MULTILINESTRING ((0 0, 2.1 0), (2.1 0, {self.H} 0))"),
        )


class TestMultilineJunctionInteriors:
    """r14 (found by the MULTIPOLYGON-widened consistency fuzz): the
    OGC mod-2 rule makes a junction endpoint shared by an EVEN number
    of components interior to the whole MultiLineString; per-part
    decomposition called it boundary and flipped touches/within_ogc."""

    def test_even_junction_is_interior(self, spark):
        row = spark.sql(
            "SELECT st_touches('POINT (5 5)',"
            " 'MULTILINESTRING ((0 0, 5 5), (5 5, 9 0))') AS t,"
            " st_within('POINT (5 5)',"
            " 'MULTILINESTRING ((0 0, 5 5), (5 5, 9 0))') AS w"
        ).collect()[0]
        assert row["t"] is False  # interior contact, not a touch
        assert row["w"] is True  # OGC within: interiors intersect

    def test_odd_junction_stays_boundary(self, spark):
        row = spark.sql(
            "SELECT st_touches('POINT (5 5)',"
            " 'MULTILINESTRING ((0 0, 5 5), (5 5, 9 0), (5 5, 5 9))') AS t"
        ).collect()[0]
        assert row["t"] is True  # odd count -> boundary -> touches


def test_gc_container_coverage(spark):
    """r14: PostGIS errors on collection operands in relate-class
    predicates; this engine answers the point-set question where it is
    exactly answerable — 0-D operands member-wise, higher-D operands
    via single-member coverage (an operand covered only by the UNION
    of several members reports False, documented)."""
    gc = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)),"
        " LINESTRING (20 0, 30 0))"
    )
    row = spark.sql(
        f"SELECT st_within('POINT (5 5)', '{gc}') AS a,"
        f" st_coveredby('MULTIPOINT (5 5, 25 0)', '{gc}') AS b,"
        f" st_within('LINESTRING (2 2, 8 8)', '{gc}') AS c,"
        f" st_within('POINT (50 50)', '{gc}') AS d"
    ).collect()[0]
    assert row["a"] is True and row["b"] is True and row["c"] is True
    assert row["d"] is False
