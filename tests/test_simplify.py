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
