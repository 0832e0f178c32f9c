"""ST_OffsetCurve (functions/offsetcurve.py): exact trims/joins on
integer fixtures, side/direction conventions, style gates, the
self-intersection loud NULL, and brute parity with the ideal offset on
straight segments."""

from __future__ import annotations

import math

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import offsetcurve as OC

L = "LINESTRING (0 0, 10 0, 10 10)"  # bl → br → tr right-angle L


def test_single_segment_left_and_right():
    assert OC.offsetcurve_wkt("LINESTRING (0 0, 10 0)", 2, "") == (
        "LINESTRING (0 2, 10 2)"
    )
    assert OC.offsetcurve_wkt("LINESTRING (0 0, 10 0)", -2, "") == (
        "LINESTRING (0 -2, 10 -2)"
    )


def test_left_offset_trims_the_concave_corner():
    # heading +x then +y turns LEFT; the left offset is inside the turn
    assert OC.offsetcurve_wkt(L, 2, "") == "LINESTRING (0 2, 8 2, 8 10)"


def test_right_offset_mitre_join_is_exact():
    assert OC.offsetcurve_wkt(L, -2, "join=mitre") == (
        "LINESTRING (0 -2, 12 -2, 12 10)"
    )


def test_right_offset_bevel_join_is_exact():
    assert OC.offsetcurve_wkt(L, -2, "join=bevel") == (
        "LINESTRING (0 -2, 10 -2, 12 0, 12 10)"
    )


def test_mitre_limit_falls_back_to_bevel():
    # miter length 2·√2 ≈ 2.83 > 1·2 → bevel (the GEOS limited mitre)
    assert OC.offsetcurve_wkt(L, -2, "join=mitre mitre_limit=1") == (
        OC.offsetcurve_wkt(L, -2, "join=bevel")
    )
    # a generous limit keeps the miter point
    assert OC.offsetcurve_wkt(L, -2, "join=mitre mitre_limit=2") == (
        "LINESTRING (0 -2, 12 -2, 12 10)"
    )


def test_round_join_point_count_and_radius():
    w = OC.offsetcurve_wkt(L, -2, "quad_segs=8")
    pts = [
        tuple(map(float, p.split()))
        for p in w[len("LINESTRING ("):-1].split(", ")
    ]
    # 2 chain points + 7 arc interior points + 2 chain points
    assert len(pts) == 11
    # every arc point sits at distance 2 from the corner (10, 0)
    for x, y in pts[1:-1]:
        assert math.isclose(math.hypot(x - 10, y - 0), 2.0, rel_tol=1e-12)
    # the middle arc point is the exact 45° one
    assert math.isclose(pts[5][0], 10 + 2 * math.cos(math.pi / 4), rel_tol=1e-12)
    assert math.isclose(pts[5][1], 0 - 2 * math.sin(math.pi / 4), rel_tol=1e-12)


def test_direction_matches_input_on_both_sides():
    for d in (2, -2):
        w = OC.offsetcurve_wkt("LINESTRING (0 0, 10 0)", d, "")
        xs = [float(p.split()[0]) for p in w[len("LINESTRING ("):-1].split(", ")]
        assert xs == sorted(xs)  # west → east like the input


def test_zero_distance_echoes():
    assert OC.offsetcurve_wkt(L, 0, "") == L


def test_collinear_interior_vertex_is_dropped_cleanly():
    w = OC.offsetcurve_wkt("LINESTRING (0 0, 5 0, 10 0)", 2, "")
    assert w == "LINESTRING (0 2, 5 2, 10 2)"


def test_reversal_round_wraps_half_circle():
    w = OC.offsetcurve_wkt("LINESTRING (0 0, 10 0, 0 0)", 1, "quad_segs=2")
    pts = [
        tuple(map(float, p.split()))
        for p in w[len("LINESTRING ("):-1].split(", ")
    ]
    # all arc points at radius 1 around (10, 0); chain passes through
    # the forward point (11, 0)
    assert any(math.isclose(x, 11, abs_tol=1e-9) and abs(y) < 1e-9 for x, y in pts)
    assert pts[0] == (0.0, 1.0) and pts[-1] == (0.0, -1.0)


def test_self_intersecting_offset_is_loud_null():
    # a 2-wide U offset left by 3 folds onto itself
    u = "LINESTRING (0 0, 10 0, 10 2, 0 2)"
    assert OC.offsetcurve_wkt(u, 3, "") is None


def test_kind_and_junk_gates():
    assert OC.offsetcurve_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))", 2, "") is None
    assert OC.offsetcurve_wkt("POINT (0 0)", 2, "") is None
    assert OC.offsetcurve_wkt("not wkt", 2, "") is None
    assert OC.offsetcurve_wkt(None, 2, "") is None
    assert OC.offsetcurve_wkt("LINESTRING EMPTY", 2, "") == "LINESTRING EMPTY"
    assert OC.offsetcurve_wkt("POLYGON EMPTY", 2, "") is None
    assert OC.offsetcurve_wkt("LINESTRING (0 0, 0 0)", 2, "") is None
    assert OC.offsetcurve_wkt("LINESTRING (0 0, nan 1)", 2, "") is None
    assert OC.offsetcurve_wkt(L, float("nan"), "") is None
    assert OC.offsetcurve_wkt(L, float("inf"), "") is None


def test_style_gates():
    # buffer-only keys are rejected for the offset curve
    assert OC.offsetcurve_wkt(L, 2, "endcap=flat") is None
    assert OC.offsetcurve_wkt(L, 2, "side=left") is None
    assert OC.offsetcurve_wkt(L, 2, "join=hexagon") is None
    assert OC.offsetcurve_wkt(L, 2, "quad_segs=0") is None
    assert OC.offsetcurve_wkt(L, 2, "quad_segs=999999") is None
    assert OC.offsetcurve_wkt(L, 2, "mitre_limit=-1") is None
    # r15 (ADVICE r14): NULL style = defaults, like the empty string
    assert OC.offsetcurve_wkt(L, 2, None) == OC.offsetcurve_wkt(L, 2, "")
    assert OC.offsetcurve_wkt(L, 2, None) is not None
    assert OC.offsetcurve_wkt(L, 2, "") == OC.offsetcurve_wkt(L, 2, "join=round")


def test_vertex_budget_is_loud():
    big = "LINESTRING (" + ", ".join(
        f"{i} {i % 2}" for i in range(OC._MAX_VERTICES + 2)
    ) + ")"
    assert OC.offsetcurve_wkt(big, 0.1, "join=bevel") is None


def test_offset_distance_invariant_fuzz():
    # for gentle staircases the chain's segment-parallel pieces sit at
    # exactly |d| from their source segments; probe midpoints of the
    # first and last output segments
    line = "LINESTRING (0 0, 4 0, 8 3, 12 3)"
    for d in (0.5, 1.0, -0.5, -1.0):
        w = OC.offsetcurve_wkt(line, d, "join=bevel")
        assert w is not None
        pts = [
            tuple(map(float, p.split()))
            for p in w[len("LINESTRING ("):-1].split(", ")
        ]
        first_mid = ((pts[0][0] + pts[1][0]) / 2, (pts[0][1] + pts[1][1]) / 2)
        assert math.isclose(abs(first_mid[1]), abs(d), rel_tol=1e-12)
        assert math.isclose(pts[-1][1] - 3.0, d, rel_tol=1e-12)


def test_admitted_inputs_never_late_null():
    # budgets are consistent (code-review r14 second pass): an input
    # under the vertex budget with a bounded-fan-out join must return
    # a curve, not a late NULL from the honesty-check budget
    n = OC._MAX_VERTICES - 24
    pts = []
    for i in range(n):
        pts.append(f"{i} {(i % 2) * 0.25}")
    line = "LINESTRING (" + ", ".join(pts) + ")"
    w = OC.offsetcurve_wkt(line, 0.05, "join=bevel")
    assert w is not None and w.startswith("LINESTRING (")


def test_large_chain_capacity_restored():
    # code-review r14 third pass: the sweep-pruned honesty checks make
    # the full 4096-vertex budget usable — a 2000-vertex staircase
    # returns a curve quickly instead of a budget NULL
    import time

    pts = [f"{i} {(i % 2) * 0.25}" for i in range(2000)]
    line = "LINESTRING (" + ", ".join(pts) + ")"
    t0 = time.time()
    w = OC.offsetcurve_wkt(line, 0.05, "join=bevel")
    assert w is not None and w.startswith("LINESTRING (")
    assert time.time() - t0 < 10.0
