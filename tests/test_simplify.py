"""ST_Simplify (Douglas-Peucker): unit cases + invariants + SQL surface."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import simplify as S


def _s(wkt: str, tol: float) -> str | None:
    g = S.simplify(G.parse_wkt(wkt), tol)
    return None if g is None else G.to_wkt(g)


def test_tolerance_zero_removes_exactly_collinear():
    assert _s("LINESTRING (0 0, 1 0, 2 0, 2 1)", 0.0) == "LINESTRING (0 0, 2 0, 2 1)"
    # non-collinear vertices all survive tol 0
    assert _s("LINESTRING (0 0, 1 0.1, 2 0)", 0.0) == "LINESTRING (0 0, 1 0.1, 2 0)"


def test_spike_removed_at_tolerance():
    assert _s("LINESTRING (0 0, 5 0.4, 10 0)", 0.5) == "LINESTRING (0 0, 10 0)"
    assert _s("LINESTRING (0 0, 5 0.6, 10 0)", 0.5) == "LINESTRING (0 0, 5 0.6, 10 0)"


def test_ring_simplifies_with_seam_fixed():
    # Square with a redundant midpoint on each edge: tol 0 strips them.
    wkt = "POLYGON ((0 0, 1 0, 2 0, 2 1, 2 2, 1 2, 0 2, 0 1, 0 0))"
    got = G.parse_wkt(_s(wkt, 0.0))
    assert len(got.coords[0]) == 5
    assert G.area(got) == 4.0


def test_ring_collapse_drops_hole_nulls_polygon():
    # Sliver hole collapses at tol 1; the exterior survives.
    wkt = (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (4 4, 6 4, 6 4.1, 4 4.1, 4 4))"
    )
    got = G.parse_wkt(_s(wkt, 1.0))
    assert got.kind == "Polygon" and len(got.coords) == 1
    # A sliver polygon collapses entirely → NULL.
    assert _s("POLYGON ((0 0, 10 0, 10 0.01, 0 0.01, 0 0))", 1.0) is None


def test_points_pass_through():
    assert _s("POINT (3 4)", 100.0) == "POINT (3 4)"
    assert _s("MULTIPOINT ((1 1), (2 2))", 100.0) == "MULTIPOINT (1 1, 2 2)"


def test_multipolygon_partial_collapse():
    wkt = (
        "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)),"
        " ((20 0, 30 0, 30 0.01, 20 0.01, 20 0)))"
    )
    got = G.parse_wkt(_s(wkt, 1.0))
    # PostGIS preserves the Multi* type even with one surviving part
    assert got.kind == "MultiPolygon" and len(got.coords) == 1
    assert G.area(got) == 25.0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=2,
        max_size=12,
    ),
    st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
)
def test_dp_invariants(pts, tol):
    """Output is a subsequence with endpoints fixed, and every dropped
    vertex is within tol of the simplified line (DP's guarantee)."""
    line = [(float(x), float(y)) for x, y in pts]
    out = S._dp(line, tol)
    assert out[0] == line[0] and out[-1] == line[-1]
    it = iter(line)
    assert all(p in it for p in out)  # subsequence
    # every original vertex is within tol of SOME simplified segment
    tol2 = tol * tol + 1e-9
    for p in line:
        assert any(
            S._perp_dist_sq(p, a, b) <= tol2 for a, b in zip(out, out[1:])
        ) or p in out


def test_sql_surface_and_nulls(spark):
    row = spark.sql(
        "SELECT st_simplify('LINESTRING (0 0, 1 0, 2 0)', 0.0D) AS a,"
        " st_simplify(CAST(NULL AS STRING), 1.0D) AS b,"
        " st_simplify('POLYGON junk', 1.0D) AS c"
    ).collect()[0]
    assert row["a"] == "LINESTRING (0 0, 2 0)"
    assert row["b"] is None and row["c"] is None


# -- ST_SnapToGrid ----------------------------------------------------------


def test_snap_basic_and_duplicate_collapse():
    got = S.snap_to_grid(G.parse_wkt("LINESTRING (0.04 0.04, 0.96 0.04, 1.04 0.04, 2.2 1.9)"), 0.5)
    # 0.96 and 1.04 both snap to 1.0 → one vertex survives
    assert G.to_wkt(got) == "LINESTRING (0 0, 1 0, 2 2)"


def test_snap_ring_closure_and_collapse():
    got = S.snap_to_grid(
        G.parse_wkt("POLYGON ((0.1 0.1, 4.9 0.1, 4.9 4.9, 0.1 4.9, 0.1 0.1))"), 1.0
    )
    assert G.to_wkt(got) == "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"
    # sliver collapses entirely
    assert S.snap_to_grid(G.parse_wkt("POLYGON ((0 0, 1 0, 1 0.1, 0 0.1, 0 0))"), 1.0) is None


def test_snap_multipoint_dedup_and_type_preserved():
    got = S.snap_to_grid(G.parse_wkt("MULTIPOINT ((0.1 0.1), (0.2 0.2), (5 5))"), 1.0)
    assert got.kind == "MultiPoint"
    assert G.to_wkt(got) == "MULTIPOINT (0 0, 5 5)"


def test_snap_sql_surface(spark):
    row = spark.sql(
        "SELECT st_snaptogrid('POINT (1.26 -3.74)', 0.5D) AS a,"
        " st_snaptogrid('POINT (1 1)', CAST(NULL AS DOUBLE)) AS b"
    ).collect()[0]
    assert row["a"] == "POINT (1.5 -3.5)"
    assert row["b"] is None


class TestSimplifyVW:
    """ST_SimplifyVW (r13): min-effective-area deletion under an area
    tolerance; same collapse/type-preservation contract as DP."""

    def _vw(self, wkt, tol):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
            simplify_vw,
        )

        g = simplify_vw(G.parse_wkt(wkt), tol)
        return None if g is None else G.to_wkt(g)

    def test_removes_smallest_area_bump_only(self):
        line = "LINESTRING (0 0, 10 1, 20 0, 30 5, 40 0)"
        # bump areas: 10, then recomputed 50s
        assert self._vw(line, 15.0) == "LINESTRING (0 0, 20 0, 30 5, 40 0)"
        assert self._vw(line, 0.5) == line  # below every area: untouched
        assert self._vw(line, 1e9) == "LINESTRING (0 0, 40 0)"

    def test_ring_collapse_matches_triangle_area(self):
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        # corner triangle area is 8: just below keeps the square whole
        assert self._vw(sq, 7.9) == sq
        # just above: corner removal cascades (remaining triangle also
        # area 8) to collapse, PostGIS's empty-output class -> NULL
        assert self._vw(sq, 8.1) is None

    def test_hole_collapses_shell_survives(self):
        got = self._vw(
            "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0),"
            " (1 1, 2 1, 2 2, 1 2, 1 1))",
            2.0,
        )
        assert got == "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))"

    def test_vertex_count_monotone_in_tolerance(self):
        import random

        rng = random.Random(99)
        pts = [(i * 3, rng.randrange(0, 9)) for i in range(12)]
        wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
        prev = None
        for tol in (0.0, 1.0, 4.0, 16.0, 64.0, 1e6):
            out = self._vw(wkt, tol)
            n = out.count(",") + 1 if out else 0
            if prev is not None:
                assert n <= prev
            prev = n


class TestSimplifyPreserveTopology:
    def _spt(self, wkt, tol):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
            simplify_preserve_topology,
        )

        g = simplify_preserve_topology(G.parse_wkt(wkt), tol)
        return None if g is None else G.to_wkt(g)

    def test_never_collapses(self):
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        assert self._spt(sq, 1e9) == sq  # DP would null this polygon
        line = "LINESTRING (0 0, 1 1)"
        assert self._spt(line, 1e9) == line
        ml = "MULTILINESTRING ((0 0, 5 0.1, 10 0), (0 5, 1 5))"
        assert self._spt(ml, 1e9) == "MULTILINESTRING ((0 0, 10 0), (0 5, 1 5))"

    def test_simplifies_when_valid(self):
        got = self._spt("POLYGON ((0 0, 10 0, 20 0, 20 20, 0 20, 0 0))", 0.0)
        assert got == "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"

    def test_holes_survive(self):
        holed = (
            "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0),"
            " (1 1, 2 1, 2 2, 1 2, 1 1))"
        )
        got = self._spt(holed, 1e9)
        assert got == holed  # hole kept (DP drops it silently)

    def test_invalid_result_falls_back_to_input(self):
        # a U-shape whose DP simplification would cut across the notch
        # can go invalid only via ring self-intersection; build a ring
        # where removing the notch vertices makes the shell cross the
        # kept hole — fallback must return the INPUT unchanged
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
            simplify_preserve_topology,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            invalid_reason,
        )

        # shell with a deep notch hugging a hole: at tol 3 DP straightens
        # the notch across the hole -> invalid -> echo
        wkt = (
            "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
            " (9 1, 11 1, 11 19, 9 19, 9 1))"
        )
        g = G.parse_wkt(wkt)
        out = simplify_preserve_topology(g, 50.0)
        assert invalid_reason(out) is None  # whatever returns is valid


class TestReducePrecision:
    def _rp(self, wkt, size):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
            reduce_precision,
        )

        g = reduce_precision(G.parse_wkt(wkt), size)
        return None if g is None else G.to_wkt(g)

    def test_snap_valid_echo(self):
        got = self._rp(
            "POLYGON ((0.25 -0.25, 9.75 0.25, 10.25 5.75, -0.25 6.25, 0.25 -0.25))",
            1.0,
        )
        assert got == "POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))"

    def test_snap_induced_bowtie_repairs_to_valid(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
            reduce_precision,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            invalid_reason,
        )

        # snapping makes the last edge cross the middle vertical: the
        # result must rebuild through makevalid (valid or NULL, never
        # silently invalid)
        g = G.parse_wkt("POLYGON ((0 0, 3.6 4, 4.4 0, 8 4, 0 0))")
        out = reduce_precision(g, 1.0)
        assert out is None or invalid_reason(out) is None

    def test_line_and_point_paths(self):
        assert self._rp("LINESTRING (0.4 0.4, 5.6 0.4)", 1.0) == "LINESTRING (0 0, 6 0)"
        assert self._rp("POINT (2.6 3.4)", 1.0) == "POINT (3 3)"
        assert self._rp("POINT (1 1)", 0.0) is None


class TestGeometricMedian:
    def _gm(self, wkt):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.measures import (
            geometric_median,
        )

        return geometric_median(G.parse_wkt(wkt))

    def test_symmetric_corners_exact_center(self):
        assert self._gm("MULTIPOINT (0 0, 10 0, 10 6, 0 6)") == (5.0, 3.0)

    def test_ostresh_input_point_branch(self):
        # center is an input point; the 4 corner unit vectors cancel
        assert self._gm("MULTIPOINT (0 0, 10 0, 10 6, 0 6, 5 3)") == (5.0, 3.0)

    def test_convex_quadrilateral_diagonal_intersection(self):
        # theorem: the geometric median of a convex quadrilateral's 4
        # vertices is the diagonal intersection — exact rational truth
        from fractions import Fraction as Fr

        pts = [(0, 0), (10, 1), (11, 8), (2, 7)]
        (x1, y1), (x3, y3) = pts[0], pts[2]
        (x2, y2), (x4, y4) = pts[1], pts[3]
        den = Fr((x1 - x3) * (y2 - y4) - (y1 - y3) * (x2 - x4))
        px = ((Fr(x1 * y3 - y1 * x3) * (x2 - x4)) - (x1 - x3) * Fr(x2 * y4 - y2 * x4)) / den
        py = ((Fr(x1 * y3 - y1 * x3) * (y2 - y4)) - (y1 - y3) * Fr(x2 * y4 - y2 * x4)) / den
        got = self._gm("MULTIPOINT (0 0, 10 1, 11 8, 2 7)")
        assert abs(got[0] - float(px)) < 1e-9 and abs(got[1] - float(py)) < 1e-9

    def test_dominant_point(self):
        # one point repeated: with 3 of 5 members at (2 2), the pull of
        # the others (resultant norm <= 1 per unit weight... actually 2
        # singletons vs weight-3 coincident: optimal AT the heavy point)
        got = self._gm("MULTIPOINT (2 2, 2 2, 2 2, 10 2, 2 9)")
        assert got == (2.0, 2.0)

    def test_gates(self, spark):
        row = spark.sql(
            "SELECT st_geometricmedian('POINT (3 4)') AS p,"
            " st_geometricmedian('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))') AS a,"
            " st_geometricmedian('MULTIPOINT (0 0, nan 1)') AS nf"
        ).collect()[0]
        assert row["p"] == "POINT (3 4)"
        assert row["a"] is None and row["nf"] is None


def test_vw_heap_matches_bruteforce_rescan():
    """The heap/linked-list VW (review r13 efficiency fix) must match
    the O(n^2) global-rescan definition exactly, ties included."""
    import math
    import random

    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
        _tri_area2,
        _vw,
    )

    def brute(points, tol, closed):
        pts = list(points)
        if len(pts) < 3:
            return pts
        while len(pts) > (2 if not closed else 3):
            best_i, best_a = -1, math.inf
            for i in range(1, len(pts) - 1):
                a2 = _tri_area2(pts[i - 1], pts[i], pts[i + 1]) / 2.0
                if a2 < best_a:
                    best_i, best_a = i, a2
            if best_i < 0 or best_a >= tol:
                break
            del pts[best_i]
        return pts

    rng = random.Random(7)
    for _ in range(120):
        n = rng.randrange(3, 25)
        pts = [(rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(n)]
        closed = rng.random() < 0.4
        if closed:
            pts = pts + [pts[0]]
        tol = rng.choice([0.0, 0.5, 2.0, 10.0, 100.0, 1e9])
        assert _vw(pts, tol, closed) == brute(pts, tol, closed)


def test_spt_keeps_line_simplicity():
    """Review r13: a simple line must not simplify into a self-crossing
    one — the original linework comes back instead."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
        simplify_preserve_topology,
    )

    wkt = "LINESTRING (0 10, 0 0, 5 1, 10 0, 10 -5, 6 -2, 5 0.3)"
    out = simplify_preserve_topology(G.parse_wkt(wkt), 1.0)
    assert G.to_wkt(out) == wkt


def test_spt_multipolygon_whole_validity():
    """Review r13: individually-valid simplified parts may overlap or
    nest — the assembled MultiPolygon must pass the whole-geometry
    validity test or the input echoes."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
        simplify_preserve_topology,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
        invalid_reason,
    )

    wkt = (
        "MULTIPOLYGON (((0 0, 10 0, 10 4, 6 4, 6 2, 4 2, 4 4, 0 4, 0 0)),"
        " ((4.5 2.5, 5.5 2.5, 5.5 3.5, 4.5 3.5, 4.5 2.5)))"
    )
    for tol in (3.0, 7.0):
        out = simplify_preserve_topology(G.parse_wkt(wkt), tol)
        assert invalid_reason(out) is None
        assert G.to_wkt(out) == wkt  # fallback: echo


def test_reduce_precision_collection_members_revalidate():
    """Review r13: GC members get the same validity guarantee as bare
    polygons."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.simplify import (
        reduce_precision,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
        invalid_reason,
    )

    gc = G.parse_wkt("GEOMETRYCOLLECTION (POLYGON ((0 0, 3.6 4, 4.4 0, 8 4, 0 0)))")
    out = reduce_precision(gc, 1.0)
    assert out is not None and out.kind == "GeometryCollection"
    for sub in out.coords:
        assert invalid_reason(sub) is None


def test_geometric_median_point_nan_is_null():
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.measures import (
        geometric_median,
    )

    assert geometric_median(G.parse_wkt("POINT (nan 1)")) is None
