"""ST_MaximumInscribedCircle (functions/inscribed.py): incenter
closed-form parity on triangles, the exact square center, holed
polygons, the plateau/kind/junk loud NULLs, and a brute-force parity
fuzz against grid sampling on random convex-ish polygons."""

from __future__ import annotations

import math
import random

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import inscribed as I


def _incenter(w, h):
    r = (w + h - math.hypot(w, h)) / 2
    return r


def test_triangle_incenter_closed_form():
    for w, h in ((30, 20), (45, 20), (60, 30), (7, 3)):
        tri = f"POLYGON ((0 0, {w} 0, 0 {h}, 0 0))"
        cx, cy, r = I.maximum_inscribed_circle(tri)
        exp = _incenter(w, h)
        assert abs(r - exp) < 1e-7
        assert abs(cx - exp) < 1e-7 and abs(cy - exp) < 1e-7


def test_translated_triangle():
    cx, cy, r = I.maximum_inscribed_circle(
        "POLYGON ((100 200, 130 200, 100 220, 100 200))"
    )
    exp = _incenter(30, 20)
    assert abs(cx - (100 + exp)) < 1e-7
    assert abs(cy - (200 + exp)) < 1e-7


def test_square_center_is_exact():
    assert I.maximuminscribedcircle_wkt(
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"
    ) == "POINT (10 10)"
    assert I.maximuminscribedradius_of(
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"
    ) == 10.0


def test_holed_square_optimum_dips_past_the_hole():
    # square with an off-center hole: the circle slides into a corner
    # pocket, limited by the bottom wall (y = 0), the right wall
    # (x = 20), and the hole CORNER (4, 9) — not the hole's edge.
    # Solving r = cy = 20 − cx, r² = (cx−4)² + (cy−9)² gives the exact
    # r = 25 − 12√2 (its mirror above the hole ties; the deterministic
    # expansion order picks one).
    w = (
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
        " (2 9, 4 9, 4 11, 2 11, 2 9))"
    )
    cx, cy, r = I.maximum_inscribed_circle(w)
    r_exp = 25 - 12 * math.sqrt(2)
    assert abs(r - r_exp) < 1e-7
    assert abs(cx - (20 - r_exp)) < 1e-6
    assert min(abs(cy - r_exp), abs(cy - (20 - r_exp))) < 1e-6


def test_plateau_returns_exact_closed_form():
    # r15 (ADVICE r14): a rectangle's medial-axis plateau no longer
    # NULLs — the deterministic best-so-far is the exact closed form
    # (center = bbox center, r = min(w, h)/2), proven optimal to
    # PostGIS's default extent/1000 tolerance before returning.
    assert I.maximum_inscribed_circle(
        "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))"
    ) == (15.0, 10.0, 10.0)
    assert I.maximum_inscribed_circle(
        "POLYGON ((5 5, 105 5, 105 25, 5 25, 5 5))"
    ) == (55.0, 15.0, 10.0)


def test_kind_and_junk_gates():
    assert I.maximum_inscribed_circle("LINESTRING (0 0, 1 1)") is None
    assert I.maximum_inscribed_circle("POINT (1 1)") is None
    assert I.maximum_inscribed_circle("POLYGON EMPTY") is None
    assert I.maximum_inscribed_circle("junk") is None
    assert I.maximum_inscribed_circle(None) is None
    assert I.maximum_inscribed_circle("POLYGON ((0 0, 1 0, nan 1, 0 0))") is None
    # zero-area shell
    assert I.maximum_inscribed_circle("POLYGON ((0 0, 5 0, 0 0, 5 0, 0 0))") is None


def test_vertex_budget():
    n = I._MAX_VERTICES + 2
    ring = ", ".join(
        f"{math.cos(2 * math.pi * k / n) * 10:.6f} "
        f"{math.sin(2 * math.pi * k / n) * 10:.6f}"
        for k in range(n)
    )
    first = ring.split(",")[0]
    assert I.maximum_inscribed_circle(f"POLYGON (({ring}, {first}))") is None


def test_fuzz_parity_with_grid_sampling():
    rng = random.Random(14)
    for _ in range(15):
        # random triangle with distinct side lengths → unique incircle
        while True:
            pts = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(3)]
            (x1, y1), (x2, y2), (x3, y3) = pts
            area2 = abs((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1))
            if area2 > 100:
                break
        wkt = f"POLYGON (({x1} {y1}, {x2} {y2}, {x3} {y3}, {x1} {y1}))"
        got = I.maximum_inscribed_circle(wkt)
        assert got is not None
        # incircle closed form: r = 2·area / perimeter, center at the
        # side-length-weighted vertex average
        a = math.dist(pts[1], pts[2])
        b = math.dist(pts[0], pts[2])
        c = math.dist(pts[0], pts[1])
        r_exp = area2 / (a + b + c)
        ix = (a * x1 + b * x2 + c * x3) / (a + b + c)
        iy = (a * y1 + b * y2 + c * y3) / (a + b + c)
        assert abs(got[2] - r_exp) < 1e-6
        assert math.hypot(got[0] - ix, got[1] - iy) < 1e-5


# ---- largest empty circle -----------------------------------------------


def test_lec_right_triangle_circumcenter():
    # corners of a right triangle: the hull is the triangle and the
    # unique optimum is the circumcenter (the hypotenuse midpoint, on
    # the hull boundary), r = circumradius = hyp/2
    got = I.largest_empty_circle("MULTIPOINT (0 0, 30 0, 0 20)")
    assert got is not None
    cx, cy, r = got
    assert abs(cx - 15) < 1e-7 and abs(cy - 10) < 1e-7
    assert abs(r - math.hypot(30, 20) / 2) < 1e-7


def test_lec_square_corners():
    cx, cy, r = I.largest_empty_circle("MULTIPOINT (0 0, 20 0, 20 20, 0 20)")
    assert (cx, cy) == (10.0, 10.0)
    assert abs(r - 10 * math.sqrt(2)) < 1e-9


def test_lec_obtuse_triangle_center_on_long_edge():
    # obtuse triangle: circumcenter lies OUTSIDE the hull, so the
    # optimum sits on the hull's long edge where the two far corners
    # tie: obstacles (0 0), (10 0), (5 1). On the bottom edge the
    # optimum is x = 5 (tie of the two ends) with r = min dist.
    got = I.largest_empty_circle("MULTIPOINT (0 0, 10 0, 5 1)")
    assert got is not None
    cx, cy, r = got
    # the best empty circle center within the sliver hull
    d = min(math.hypot(cx - 0, cy), math.hypot(cx - 10, cy),
            math.hypot(cx - 5, cy - 1))
    assert abs(d - r) < 1e-9
    # brute-force grid check: no hull point beats it by more than tol
    best = 0.0
    for i in range(201):
        for j in range(41):
            x, y = i * 0.05, j * 0.025
            if I._in_hull(x, y, [(0, 0), (10, 0), (5, 1), (0, 0)]):
                best = max(best, min(
                    math.hypot(x, y), math.hypot(x - 10, y),
                    math.hypot(x - 5, y - 1)))
    assert r >= best - 1e-3


def test_lec_gates():
    assert I.largest_empty_circle("MULTIPOINT (0 0, 5 0, 10 0)") is None
    assert I.largest_empty_circle("MULTIPOINT (1 1, 2 2)") is None
    assert I.largest_empty_circle("POINT (1 1)") is None
    assert I.largest_empty_circle("LINESTRING (0 0, 1 1)") is None
    assert I.largest_empty_circle("POLYGON ((0 0, 1 0, 1 1, 0 0))") is None
    assert I.largest_empty_circle("MULTIPOINT EMPTY") is None
    assert I.largest_empty_circle("junk") is None
    assert I.largest_empty_circle(None) is None
