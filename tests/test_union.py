"""ST_Union: rectilinear dissolve core, SQL surface, q124 parity + plan.

The dissolve's exactness boundary (union_ops.py docstring): ALL
rectilinear geometry is exact — rectangles, L-shapes, frames with holes,
checkerboard corners, and re-unions of any of those (closure is what
makes the cascaded aggregate partition-invariant) — while
non-rectilinear overlaps degrade to stacked parts with the point set
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
        assert G.perimeter(got) == 12.0

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
        assert G.perimeter(got) == 6.0  # shared edge dissolved away

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
        assert G.perimeter(got) == 16.0  # 12 outer + 4 hole

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
        assert G.perimeter(got) == 20.0 + 12.0 + 4.0

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

    def test_q124_partition_invariant(self, spark):
        """The cascade must give identical results however the boxes are
        split across partitions: force an 8-way split so every region's
        boxes straddle partials, and compare against the 1-partition
        run."""
        from pyspark.sql import functions as F

        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.union_agg import (
            _partial_union,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import (
            load_table,
        )

        n = load_table(spark, SF_DIR, "nation")
        minx = (F.col("n_nationkey") % 12) * 30.0 - 180.0
        miny = (F.col("n_nationkey") * 7 % 8) * 20.0 - 80.0
        boxes = n.select(
            F.col("n_regionkey").alias("g"),
            F.call_function(
                "st_makeenvelope",
                minx.cast("double"),
                miny.cast("double"),
                (minx + 30.0 + (F.col("n_nationkey") % 3) * 15.0).cast("double"),
                (miny + 20.0 + (F.col("n_nationkey") % 2) * 10.0).cast("double"),
            ).alias("wkt"),
        )

        def run(src):
            partials = src.mapInPandas(_partial_union, schema="g long, wkt string, n long")
            return {
                r["g"]: (r["n"], r["area"], r["perim"])
                for r in partials.groupBy("g")
                .agg(
                    F.sum("n").alias("n"),
                    F.expr("st_area(st_union_all(collect_list(wkt)))").alias("area"),
                    F.expr("st_perimeter(st_union_all(collect_list(wkt)))").alias("perim"),
                )
                .collect()
            }

        assert run(boxes.repartition(8)) == run(boxes.coalesce(1))

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
    assert G.perimeter(g) == perim
    n_parts = len(g.coords) if g.kind == "MultiPolygon" else 1
    assert n_parts == comps
    # Round-trip: the emitted WKT must re-parse to the same measures
    # (exercises hole ordering in to_wkt/parse_wkt).
    rt = G.parse_wkt(G.to_wkt(g))
    assert G.area(rt) == area and G.perimeter(rt) == perim


@settings(max_examples=150, deadline=None)
@given(_int_rects(), _int_rects())
def test_union_is_idempotent_and_commutative(rects_a, rects_b):
    ga = [G.Geometry.box(*r) for r in rects_a]
    gb = [G.Geometry.box(*r) for r in rects_b]
    ab = U.union_geoms(ga + gb)
    ba = U.union_geoms(gb + ga)
    again = U.union_geoms([ab, ba])
    assert G.area(ab) == G.area(ba) == G.area(again)
    assert G.perimeter(ab) == G.perimeter(ba) == G.perimeter(again)


class TestSimplicityGate:
    def test_self_intersecting_rectilinear_ring_not_rewritten(self):
        # ADVICE r7 #4: this axis-parallel ring self-crosses, so the
        # cell decomposition would silently reinterpret it even-odd;
        # the gate must route it past the rectilinear dissolve instead
        # (a single part unions to itself, unrewritten).
        twisted = "POLYGON ((0 0, 3 0, 3 2, 1 2, 1 1, 2 1, 2 3, 0 3, 0 0))"
        assert _u(twisted) == twisted

    def test_signed_area_exact_on_fraction_rings(self):
        # ADVICE r7 #3: int accumulator keeps Fraction rings exact at
        # coordinates where float shoelace terms round
        from fractions import Fraction

        big = [
            (Fraction(x) * 10**9, Fraction(y) * 10**9)
            for x, y in [(0, 0), (36, 0), (36, 36), (0, 36), (0, 0)]
        ]
        a = U._signed_area_ring(big)
        assert isinstance(a, Fraction)
        assert a == Fraction(1296) * 10**18
        # float callers still get floats
        fl = U._signed_area_ring(
            [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
        )
        assert isinstance(fl, float) and fl == 4.0


class TestCascadeExactness:
    """Stage-2 of the q124 cascade re-unions stage-1 PARTIALS, which are
    L-shaped/holed rectilinear polygons, not rectangles. Closure under
    union (rectilinear decomposition) is what makes the cascade
    partition-count-invariant; these pin it."""

    def test_degenerate_backtracking_ring_rejected(self):
        # 5 closed points, 2 distinct xs/ys, axis-parallel edges, but
        # zero shoelace area: must NOT be treated as a unit square.
        assert U._as_rect(G.parse_wkt("POLYGON ((0 0, 1 0, 1 1, 1 0, 0 0))")) is None

    def test_lshape_plus_overlapping_rect_dissolves(self):
        l_shape = _u(  # L covering [0,2]x[0,1] + [0,1]x[1,2]
            "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))",
            "POLYGON ((0 1, 1 1, 1 2, 0 2, 0 1))",
        )
        assert G.parse_wkt(l_shape).kind == "Polygon"  # a real L, not a rect
        merged = G.parse_wkt(_u(l_shape, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
        assert merged.kind == "Polygon"
        assert G.area(merged) == 4.0  # full square, no double-count

    def test_holed_partial_re_dissolves(self):
        frame = _u(
            "POLYGON ((0 0, 3 0, 3 1, 0 1, 0 0))",
            "POLYGON ((0 2, 3 2, 3 3, 0 3, 0 2))",
            "POLYGON ((0 0, 1 0, 1 3, 0 3, 0 0))",
            "POLYGON ((2 0, 3 0, 3 3, 2 3, 2 0))",
        )
        assert len(G.parse_wkt(frame).coords) == 2  # frame with hole
        # Union the holed partial with a plug for its hole: solid square.
        solid = G.parse_wkt(_u(frame, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"))
        assert solid.kind == "Polygon" and len(solid.coords) == 1
        assert G.area(solid) == 9.0

    @settings(max_examples=200, deadline=None)
    @given(_int_rects(), st.integers(min_value=1, max_value=7))
    def test_split_union_equals_whole_union(self, rects, split):
        """The cascade invariant itself: union(union(A), union(B)) must
        equal union(A ∪ B) for every way of splitting the input — the
        partition-layout independence q124 relies on."""
        boxes = [G.Geometry.box(*r) for r in rects]
        a, b = boxes[:split], boxes[split:]
        whole = U.union_geoms(boxes)
        partials = [U.union_geoms(grp) for grp in (a, b) if grp]
        cascaded = U.union_geoms(partials)
        assert G.area(cascaded) == G.area(whole)
        assert G.perimeter(cascaded) == G.perimeter(whole)


class TestConvexPairUnion:
    """r7 (VERDICT r6 item 6): overlapping convex pairs dissolve exactly;
    remaining overlaps warn instead of silently double-counting."""

    def test_overlapping_triangles_known_area(self):
        # Right triangles: P = (0,0)(4,0)(4,4), Q = (2,0)(6,0)(2,4)... use
        # a hand-checked pair: P covers x in [0,4] under y=x; Q is the
        # square's other half shifted right. Expect exact union area via
        # inclusion-exclusion with a hand-computed intersection.
        p = "POLYGON ((0 0, 4 0, 4 4, 0 0))"          # area 8
        q = "POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0))"     # area 16
        # intersection: region of square x>=2 under the line y=x-? P's
        # hypotenuse is y=x (from (0,0) to (4,4)); inside P: y<=x, x<=4.
        # Within the square [2,6]x[0,4]: x in [2,4], y<=x -> trapezoid
        # with vertices (2,0),(4,0),(4,4),(2,2): area = ((2+4)/2)*2 = 6.
        got = G.parse_wkt(_u(p, q))
        assert got.kind == "Polygon"
        assert abs(G.area(got) - (8 + 16 - 6)) < 1e-9
        # invariants: union covers both inputs
        assert G.within(G.parse_wkt(p), got)
        assert G.within(G.parse_wkt(q), got)

    def test_union_with_self_is_identity(self):
        p = "POLYGON ((0 0, 4 0, 4 4, 0 0))"
        got = G.parse_wkt(_u(p, p))
        assert abs(G.area(got) - 8.0) < 1e-12

    def test_commutative(self):
        p = "POLYGON ((0 0, 4 0, 4 4, 0 0))"
        q = "POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0))"
        a1 = G.area(G.parse_wkt(_u(p, q)))
        a2 = G.area(G.parse_wkt(_u(q, p)))
        assert a1 == a2

    def test_touching_convex_pair_stays_multi_no_warning(self):
        import warnings as w

        p = "POLYGON ((0 0, 2 0, 1 2, 0 0))"
        q = "POLYGON ((2 0, 4 0, 3 2, 2 0))"  # shares only vertex (2, 0)
        with w.catch_warnings():
            w.simplefilter("error")
            got = G.parse_wkt(_u(p, q))
        assert got.kind == "MultiPolygon"
        assert G.area(got) == 4.0  # 2 + 2, nothing double-counted

    def test_nonconvex_overlap_resolves_exact_no_warning(self):
        # L-shaped (non-convex, NON-rectilinear so the grid path skips
        # it): since r7 the overlay decomposition resolves it exactly.
        import warnings as w

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.overlay import (
            intersection_wkt,
        )

        l_poly = "POLYGON ((0 0, 4 0, 4 1, 1.5 1.25, 1 4, 0 4, 0 0))"
        q = "POLYGON ((3 0.5, 6 0.5, 6 3, 3 3, 3 0.5))"
        with w.catch_warnings():
            w.simplefilter("error")
            got = G.parse_wkt(_u(l_poly, q))
        ia = G.area(G.parse_wkt(intersection_wkt(l_poly, q)))
        expect = G.area(G.parse_wkt(l_poly)) + G.area(G.parse_wkt(q)) - ia
        assert abs(G.area(got) - expect) < 1e-9

    def test_holed_nonrectilinear_overlap_resolves_exact(self):
        # Holed polygons decompose as outer − holes (overlay, r7), so
        # this overlap resolves exactly too: union area by hand = holed
        # area (45 − 1 = 44) + rect area (32) − their intersection.
        import warnings as w

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.overlay import (
            intersection_wkt,
        )

        holed = "POLYGON ((0 0, 10 0, 5 9, 0 0), (4 1, 6 1, 5 2, 4 1))"
        q = "POLYGON ((4 0, 12 0, 12 4, 4 4, 4 0))"
        with w.catch_warnings():
            w.simplefilter("error")
            got = G.parse_wkt(_u(holed, q))
        ia = G.area(G.parse_wkt(intersection_wkt(holed, q)))
        assert abs(G.area(got) - (44.0 + 32.0 - ia)) < 1e-9

    def test_bowtie_overlap_repairs_through_makevalid(self):
        # r12: a self-intersecting member rebuilds through the exact
        # linework makevalid before the dissolve (PostGIS re-nodes):
        # bowtie(even-odd area 2) ∪ rect(4) − inter(1.21, hand-derived
        # by integration) = 4.79 exactly, ONE polygon, no warning
        import warnings as w

        bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
        q = "POLYGON ((0.5 0.2, 3 0.2, 3 1.8, 0.5 1.8, 0.5 0.2))"
        with w.catch_warnings():
            w.simplefilter("error")
            got = G.parse_wkt(_u(bowtie, q))
        assert got.kind == "Polygon"
        assert abs(G.area(got) - 4.79) < 1e-12

    def test_unrepairable_overlap_warns(self):
        import pytest as _pt

        # a multiply-wound pentagram is outside even makevalid's exact
        # classes ("partially overlapping loops"): overlapping it still
        # degrades to stacked parts, loudly
        star = "POLYGON ((0 0, 4 3, 8 0, 1 5, 7 5, 0 0))"
        q = "POLYGON ((1 1, 6 1, 6 4, 1 4, 1 1))"
        with _pt.warns(RuntimeWarning, match="double-count"):
            G.parse_wkt(_u(star, q))

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(-5, 5), st.integers(-5, 5), st.integers(1, 6), st.integers(1, 6),
        st.integers(-5, 5), st.integers(-5, 5), st.integers(1, 6), st.integers(1, 6),
    )
    def test_convex_union_inclusion_exclusion(self, x1, y1, w1, h1, x2, y2, w2, h2):
        """Triangle x rect pairs: union area must equal
        area(P) + area(Q) - area(P ∩ Q) with the intersection from the
        independent Sutherland-Hodgman clip."""
        p = G.Geometry("Polygon", [[(x1, y1), (x1 + w1, y1), (x1, y1 + h1), (x1, y1)]])
        q = G.Geometry("Polygon", [[(x2, y2), (x2 + w2, y2), (x2 + w2, y2 + h2), (x2, y2 + h2), (x2, y2)]])
        inter = U._clip_convex(p.coords[0], q.coords[0])
        ia = abs(U._signed_area_ring(inter + [inter[0]])) if len(inter) >= 3 else 0.0
        got = U.union_geoms([p, q])
        expect = G.area(p) + G.area(q) - ia
        assert abs(G.area(got) - expect) < 1e-9


@st.composite
def _star_ring(draw):
    import math as m

    n = draw(st.integers(min_value=4, max_value=7))
    cx = draw(st.integers(min_value=-3, max_value=3))
    cy = draw(st.integers(min_value=-3, max_value=3))
    radii = [draw(st.integers(min_value=1, max_value=6)) for _ in range(n)]
    ring = [
        (cx + r * m.cos(2 * m.pi * k / n), cy + r * m.sin(2 * m.pi * k / n))
        for k, r in enumerate(radii)
    ]
    return G.to_wkt(G.Geometry("Polygon", [ring + [ring[0]]]))


@settings(max_examples=100, deadline=None)
@given(_star_ring(), _star_ring())
def test_union_star_pair_inclusion_exclusion(wa_, wb_):
    """Non-convex (star) overlap pairs resolve through the overlay
    decomposition: union area = a + b − a∩b exactly (the overlay
    intersection is the independent exact witness), permutation
    invariant, no warning."""
    ga, gb = G.parse_wkt(wa_), G.parse_wkt(wb_)
    import warnings as w

    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.overlay import (
        intersection_wkt,
    )

    wa, wb = G.to_wkt(ga), G.to_wkt(gb)
    inter = intersection_wkt(wa, wb)
    ia = 0.0 if inter.endswith("EMPTY") else G.area(G.parse_wkt(inter))
    with w.catch_warnings():
        w.simplefilter("error")
        u1 = U.union_geoms([ga, gb])
        u2 = U.union_geoms([gb, ga])
    expect = G.area(ga) + G.area(gb) - ia
    tol = 1e-9 * max(1.0, expect)
    assert abs(G.area(u1) - expect) < tol
    assert abs(G.area(u2) - expect) < tol


class TestConvexMergeDeterminism:
    """r7 self-review fix: the convex merge must be a function of the
    part SET (component-restricted), never of input order or of how the
    cascade splits rows across partitions."""

    PARTS = [
        "POLYGON ((0 0, 6 0, 6 4, 0 4, 0 0))",       # rect
        "POLYGON ((1 1, 5 1, 3 6, 1 1))",             # triangle overlapping rect
        "POLYGON ((2 -1, 7 -1, 7 3, 2 -1))",          # second triangle, overlaps both
    ]

    def test_three_way_overlap_is_permutation_invariant(self):
        import itertools
        import warnings as w

        areas = set()
        for perm in itertools.permutations(self.PARTS):
            with w.catch_warnings():
                w.simplefilter("ignore")
                areas.add(G.area(G.parse_wkt(_u(*perm))))
        assert len(areas) == 1, areas  # greedy first-pair merge broke this

    def test_isolated_pair_merges_regardless_of_extras(self):
        # A disjoint convex pair elsewhere must still merge exactly.
        import warnings as w

        p = "POLYGON ((100 100, 104 100, 104 104, 100 100))"
        q = "POLYGON ((102 100, 106 100, 106 104, 102 104, 102 100))"
        with w.catch_warnings():
            w.simplefilter("ignore")
            got = G.parse_wkt(_u(*self.PARTS, p, q))
        # the far pair contributes inclusion-exclusion area exactly
        far = G.area(G.parse_wkt(_u(p, q)))
        assert abs(far - (8 + 16 - 6)) < 1e-9

    def test_cascade_split_invariance_with_convex_parts(self):
        """union(union(A), union(B)) == union(A ∪ B) for every split —
        stage-1 partials must NOT convex-merge (merge_convex=False), so
        the final union sees all parts and decides component-wise."""
        import itertools
        import warnings as w

        boxes = [G.parse_wkt(x) for x in self.PARTS] + [
            G.Geometry.box(8.0, 0.0, 9.0, 1.0)
        ]
        with w.catch_warnings():
            w.simplefilter("ignore")
            whole = U.union_geoms(boxes)
            for split in range(1, len(boxes)):
                a, b = boxes[:split], boxes[split:]
                partials = [
                    G.parse_wkt(U.union_wkts([G.to_wkt(g) for g in grp], merge_convex=False))
                    for grp in (a, b)
                ]
                cascaded = U.union_geoms(partials)
                assert G.area(cascaded) == G.area(whole), split
