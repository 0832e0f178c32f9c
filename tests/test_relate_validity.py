"""DE-9IM matrix (functions/relate.py) and validity (functions/validity.py)
kernels, pinned against canonical JTS/GEOS matrices and IsValidOp reason
vocabulary. Driver row q156 pins the SQL level; these run the pure-Python
kernels directly."""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relate import (
    relate_match,
    relate_wkt,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
    isvalid_wkt,
    isvalidreason_wkt,
)

BOX = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


class TestRelateMatrix:
    CASES = [
        # canonical JTS/GEOS matrices
        (BOX, BOX, "2FFF1FFF2"),
        (BOX, "POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))", "FF2FF1212"),
        (BOX, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))", "FF2F11212"),
        (BOX, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))", "FF2F01212"),
        (BOX, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))", "212101212"),
        (BOX, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))", "212FF1FF2"),
        ("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))", BOX, "2FF1FF212"),
        ("LINESTRING (-5 5, 15 5)", BOX, "101FF0212"),
        ("LINESTRING (2 5, 8 5)", BOX, "1FF0FF212"),
        ("POINT (5 5)", BOX, "0FFFFF212"),
        ("POINT (0 0)", BOX, "F0FFFF212"),
        ("POINT (50 50)", BOX, "FF0FFF212"),
        ("LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 2 2)", "FF1F00102"),
        ("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)", "0F1FF0102"),
        ("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 6 0)", "1010F0102"),
        ("POINT (1 1)", "POINT (1 1)", "0FFFFFFF2"),
        ("POINT (1 1)", "POINT (2 2)", "FF0FFF0F2"),
        # a box's own boundary ring as a closed line: the ring has no
        # mod-2 boundary, covers B's rings (EB = F), and its interior
        # meets only B's boundary
        ("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)", BOX, "F1FFFF2F2"),
        # multipoint straddling the boundary
        ("MULTIPOINT (5 5, 0 0, 50 50)", BOX, "000FFF212"),
        # line along the boundary, shorter than the ring
        ("LINESTRING (0 0, 10 0)", BOX, "F1FF0F212"),
        # empties: rows/cols of the empty side are all F
        ("POINT EMPTY", BOX, "FFFFFF212"),
        (BOX, "LINESTRING EMPTY", "FF2FF1FF2"),
        ("POINT EMPTY", "LINESTRING EMPTY", "FFFFFFFF2"),
    ]

    @pytest.mark.parametrize("a,b,exp", CASES)
    def test_matrix(self, a, b, exp):
        assert relate_wkt(a, b) == exp

    @pytest.mark.parametrize("a,b,exp", CASES)
    def test_matrix_transpose(self, a, b, exp):
        """relate(b, a) is the transpose of relate(a, b)."""
        t = "".join(exp[3 * c + r] for r in range(3) for c in range(3))
        assert relate_wkt(b, a) == t

    def test_surface_contract(self):
        assert relate_wkt(None, BOX) is None
        assert relate_wkt(BOX, None) is None
        assert relate_wkt("junk ((", BOX) is None
        # GEOS refuses GEOMETRYCOLLECTION operands
        assert relate_wkt("GEOMETRYCOLLECTION (POINT (1 1))", BOX) is None
        # invalid areal operand: GEOS results are undefined -> NULL
        assert relate_wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))", BOX) is None
        assert relate_wkt("POINT (nan nan)", BOX) is None

    def test_relate_match(self):
        assert relate_match("2FFF1FFF2", "T*F**FFF*") is True  # equals
        assert relate_match("212101212", "T*T***T**") is True  # overlaps
        assert relate_match("FF2FF1212", "FF*FF****") is True  # disjoint
        assert relate_match("2FF1FF212", "T*F**F***") is True  # within
        assert relate_match("212FF1FF2", "T*F**F***") is False
        assert relate_match("2FFF1FFF2", "2FFF1FFF2") is True
        assert relate_match("2FFF1FFF2", "1********") is False
        assert relate_match(None, "T********") is None
        assert relate_match("2FFF1FFF2", "TOOLONGPATTERN") is None
        assert relate_match("NOTAMATRIX", "T********") is None


class TestValidity:
    CASES = [
        (BOX, "Valid Geometry"),
        ("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))", "Self-intersection"),
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (20 2, 22 2, 22 4, 20 4, 20 2))",
            "Hole lies outside shell",
        ),
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2),"
            " (3 3, 4 3, 4 4, 3 4, 3 3))",
            "Holes are nested",
        ),
        # diamond hole touching the shell's left and right edges: the
        # ring-contact multigraph has a cycle -> interior disconnected
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 5, 5 2, 10 5, 5 8, 0 5))",
            "Interior is disconnected",
        ),
        # hole touching the shell at ONE point: still valid
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 5, 5 2, 5 8, 0 5))",
            "Valid Geometry",
        ),
        # two holes touching each other at a point: valid (no cycle)
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 5 1, 5 5, 1 5, 1 1),"
            " (5 5, 8 5, 8 8, 5 8, 5 5))",
            "Valid Geometry",
        ),
        ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((4 4, 8 4, 8 8, 4 8, 4 4)))",
         "Valid Geometry"),
        ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((2 2, 4 2, 4 4, 2 4, 2 2)))",
         "Nested shells"),
        ("MULTIPOLYGON (((0 0, 6 0, 6 6, 0 6, 0 0)), ((4 4, 10 4, 10 10, 4 10, 4 4)))",
         "Self-intersection"),
        # parts sharing an edge (1-D contact): invalid for MultiPolygon
        ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((4 0, 8 0, 8 4, 4 4, 4 0)))",
         "Self-intersection"),
        # part inside another part's hole: valid
        (
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0),"
            " (2 2, 8 2, 8 8, 2 8, 2 2)), ((3 3, 7 3, 7 7, 3 7, 3 3)))",
            "Valid Geometry",
        ),
        ("POINT (3 4)", "Valid Geometry"),
        # self-crossing LINES are valid (not simple, but valid)
        ("LINESTRING (0 0, 1 1, 0 1, 1 0)", "Valid Geometry"),
        ("POINT (nan nan)", "Invalid Coordinate"),
        ("POLYGON EMPTY", "Valid Geometry"),
        ("POLYGON ((0 0, 1 0, 0 0))", "Too few points in geometry component"),
    ]

    @pytest.mark.parametrize("wkt,exp", CASES)
    def test_reason(self, wkt, exp):
        assert isvalidreason_wkt(wkt) == exp

    @pytest.mark.parametrize("wkt,exp", CASES)
    def test_bool_agrees(self, wkt, exp):
        assert isvalid_wkt(wkt) is (exp == "Valid Geometry")

    def test_surface_contract(self):
        assert isvalid_wkt(None) is None
        assert isvalidreason_wkt(None) is None
        assert isvalid_wkt("junk ((") is None


def test_relate_through_spark(spark):
    rows = spark.sql(
        "SELECT st_relate(a, b) AS m, st_relatematch(st_relate(a, b), p) AS ok,"
        " st_isvalid(a) AS v FROM VALUES "
        "('POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))',"
        " 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', 'T*F**F***'), "
        "(CAST(NULL AS STRING), 'POINT (1 1)', 'T********') AS t(a, b, p)"
    ).collect()
    assert rows[0]["m"] == "2FF1FF212" and rows[0]["ok"] is True and rows[0]["v"] is True
    assert rows[1]["m"] is None and rows[1]["ok"] is None and rows[1]["v"] is None


class TestStrictRingSimplicity:
    """code-review r10: pinched / spiked / degenerate rings must be
    invalid (GEOS 'Ring Self-intersection'), not silently valid, and
    st_relate must refuse them."""

    CASES = [
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0, -2 0, -2 -2, 0 -2, 0 0))",  # figure-8
        "POLYGON ((0 0, 10 0, 5 0, 0 0))",  # zero-area fold-back
        "POLYGON ((0 0, 10 0, 10 10, 5 5, 10 10, 0 10, 0 0))",  # spike
    ]

    @pytest.mark.parametrize("wkt", CASES)
    def test_pinched_rings_invalid(self, wkt):
        assert isvalidreason_wkt(wkt) == "Ring Self-intersection"
        assert isvalid_wkt(wkt) is False
        assert relate_wkt(wkt, BOX) is None

    def test_straight_continuation_is_valid(self):
        # a redundant collinear vertex is NOT a spike
        assert isvalidreason_wkt("POLYGON ((0 0, 5 0, 10 0, 10 10, 0 10, 0 0))") == (
            "Valid Geometry"
        )

    def test_gc_empty_refused_by_relate(self):
        # GEOS rejects GEOMETRYCOLLECTION operands by TYPE, empty or not
        assert relate_wkt("GEOMETRYCOLLECTION EMPTY", BOX) is None
        assert relate_wkt(BOX, "GEOMETRYCOLLECTION EMPTY") is None
        assert relate_wkt("GEOMETRYCOLLECTION EMPTY", "GEOMETRYCOLLECTION EMPTY") is None


class TestMakeValid:
    """functions/validity.py makevalid: PostGIS LINEWORK semantics (the
    one-arg ST_MakeValid default, ADVICE r10 #3) — all-ring parity for
    rectilinear parts, exact noding + loop extraction for diagonal
    self-intersections (VERDICT r10 item 3), parts union; loud NULL
    outside both exact classes (driver row q157)."""

    def _area(self, w):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )

        return G.area(G.parse_wkt(w))

    def test_pinched_ring_two_squares(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        w = makevalid_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 20 10, 20 20, 10 20, 10 10, 0 10, 0 0))"
        )
        assert abs(self._area(w) - 200.0) < 1e-12
        assert isvalid_wkt(w) is True

    def test_crossing_ring_even_odd(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        w = makevalid_wkt("POLYGON ((0 0, 10 0, 10 20, 20 20, 20 10, 0 10, 0 0))")
        assert abs(self._area(w) - 200.0) < 1e-12

    def test_linework_semantics(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        # hole outside shell: LINEWORK keeps the stray ring as a second
        # shell (PostGIS one-arg default) — the old 'structure' answer
        # subtracted it as a no-op and returned 36
        w = makevalid_wkt(
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (8 8, 10 8, 10 10, 8 10, 8 8))"
        )
        assert abs(self._area(w) - 40.0) < 1e-12
        # overlapping MultiPolygon parts: per-part rebuild, then parts
        # UNION (liblwgeom) — not even-odd across parts
        w = makevalid_wkt(
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)),"
            " ((5 5, 15 5, 15 15, 5 15, 5 5)))"
        )
        assert abs(self._area(w) - 175.0) < 1e-12
        # nested holes: depth parity — the 1x1 ring inside the hole
        # comes back as an ISLAND (100 - 36 + 1)
        w = makevalid_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2),"
            " (3 3, 4 3, 4 4, 3 4, 3 3))"
        )
        assert abs(self._area(w) - 65.0) < 1e-12
        # full-width strip hole: splits into two valid parts
        w = makevalid_wkt(
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0),"
            " (0 8, 30 8, 30 12, 0 12, 0 8))"
        )
        assert abs(self._area(w) - 480.0) < 1e-12
        assert w.startswith("MULTIPOLYGON")

    def test_diagonal_self_intersections(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        # the plain bowtie: canonical GEOS answer is the two triangles
        w = makevalid_wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
        assert w.startswith("MULTIPOLYGON") and abs(self._area(w) - 2.0) < 1e-12
        assert isvalid_wkt(w) is True
        # figure-8 through a shared vertex, diagonal edges
        w = makevalid_wkt("POLYGON ((0 0, 4 0, 2 2, 4 4, 0 4, 2 2, 0 0))")
        assert abs(self._area(w) - 8.0) < 1e-12
        # diagonal spike collapses, square survives as a single shell
        w = makevalid_wkt("POLYGON ((0 0, 4 0, 6 3, 4 0, 4 4, 0 4, 0 0))")
        assert abs(self._area(w) - 16.0) < 1e-12

    def test_surface_contract(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        assert makevalid_wkt(box) == box  # valid echo
        assert makevalid_wkt("LINESTRING (0 0, 1 1)") == "LINESTRING (0 0, 1 1)"
        assert makevalid_wkt("POINT EMPTY") == "POINT EMPTY"
        assert makevalid_wkt(None) is None
        assert makevalid_wkt("junk ((") is None
        # shell and hole crossing each other with diagonal edges:
        # outside both exact classes -> loud NULL, never a guess
        assert (
            makevalid_wkt(
                "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (6 2, 12 4, 6 6, 6 2))"
            )
            is None
        )
        assert makevalid_wkt("POINT (nan nan)") is None
        # every ring collapsed -> typed EMPTY
        assert makevalid_wkt("POLYGON ((0 0, 4 0, 0 0, 4 0, 0 0))") == "POLYGON EMPTY"


class TestMakeValidStructureFixes:
    """code-review r10 follow-ups on makevalid."""

    def _area(self, w):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )

        return G.area(G.parse_wkt(w))

    def test_unclosed_diagonal_closing_edge_is_null(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        # the implicit closing edge (10,10)->(0,0) is diagonal: the r11
        # loop path closes and repairs it (the rectilinear-only engine
        # had to NULL here)
        w = makevalid_wkt("POLYGON ((0 0, 10 0, 10 10))")
        assert w == "POLYGON ((0 0, 10 0, 10 10, 0 0))"
        # rectilinear implicit closing edge: closed and rebuilt
        w = makevalid_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10))")
        assert abs(self._area(w) - 100.0) < 1e-12

    def test_sibling_part_refills_hole_slice(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        # LINEWORK/liblwgeom: per-part rebuild then parts UNION — part B
        # DOES refill the slice of part A's hole it overlaps (the old
        # 'structure' semantics punched it out and returned 68)
        w = makevalid_wkt(
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0),"
            " (2 2, 8 2, 8 8, 2 8, 2 2)), ((6 3, 12 3, 12 5, 6 5, 6 3)))"
        )
        assert abs(self._area(w) - 72.0) < 1e-12

    def test_gc_members_echo_when_valid(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        # a valid non-rectilinear member must be echoed, not rebuilt
        # (and must not NULL the collection while the invalid
        # rectilinear sibling is repaired)
        w = makevalid_wkt(
            "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 2 3, 0 0)),"
            " POLYGON ((10 10, 20 10, 20 30, 30 30, 30 20, 10 20, 10 10)))"
        )
        assert w is not None and w.startswith("GEOMETRYCOLLECTION")
        assert "POLYGON ((0 0, 4 0, 2 3, 0 0))" in w


class TestRepeatedVertexNormalization:
    """GEOS analyzes removeRepeatedPoints output: a zero-length edge is
    never a self-intersection, and relate works on such operands —
    VERDICT r10 item 1, the engine's only PostGIS-divergent answer."""

    DUP_BOX = "POLYGON ((0 0, 4 0, 4 0, 4 4, 0 4, 0 0))"

    def test_repeated_vertex_polygon_is_valid(self):
        assert isvalid_wkt(self.DUP_BOX) is True
        assert isvalidreason_wkt(self.DUP_BOX) == "Valid Geometry"

    def test_relate_accepts_repeated_vertex_operand(self):
        # PostGIS: ST_Relate('POLYGON((0 0,4 0,4 0,4 4,0 4,0 0))','POINT(2 2)')
        assert relate_wkt(self.DUP_BOX, "POINT (2 2)") == "0F2FF1FF2"
        # matrix must equal the dedup'd box's matrix cell-for-cell
        clean = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        for other in (BOX, "POINT (0 0)", "LINESTRING (-1 2, 5 2)"):
            assert relate_wkt(self.DUP_BOX, other) == relate_wkt(clean, other)

    def test_makevalid_echoes_valid_dup_vertex_input(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        assert makevalid_wkt(self.DUP_BOX) == self.DUP_BOX

    def test_dedup_collapse_to_too_few_points_still_invalid(self):
        # after dedup only 3 distinct points remain: GEOS "too few"
        assert (
            isvalidreason_wkt("POLYGON ((0 0, 4 0, 4 0, 0 0))")
            == "Too few points in geometry component"
        )

    def test_genuine_pinch_and_spike_still_invalid(self):
        assert isvalid_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 20 10, 20 20, 10 20, 10 10, 0 10, 0 0))"
        ) is False
        assert isvalid_wkt("POLYGON ((0 0, 4 0, 6 0, 4 0, 4 4, 0 4, 0 0))") is False

    def test_multipoint_zero_d_containers(self):
        # ADVICE r10 medium: predicates must agree with the matrix on
        # multi-kind 0-D containers
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            relations as R,
        )

        p, mp = G.parse_wkt("POINT (1 1)"), G.parse_wkt("MULTIPOINT (1 1, 2 2)")
        assert G.within(p, mp) is True  # coveredby
        assert R.within_ogc(p, mp) is True
        assert relate_match(relate_wkt("POINT (1 1)", "MULTIPOINT (1 1, 2 2)"), "T*F**F***")
        assert G.within(mp, p) is False
        assert G.intersects(mp, G.parse_wkt("MULTIPOINT (2 2, 9 9)")) is True
        assert G.intersects(mp, G.parse_wkt("MULTIPOINT (3 3, 9 9)")) is False


class TestMakeValidParityFuzz:
    """Ground-truth fuzz for the r11 diagonal makevalid: the even-odd
    crossing parity of a sample point w.r.t. the ORIGINAL ring is the
    definition of the region ST_MakeValid must produce — for random
    (mostly self-intersecting) integer-grid rings, every off-boundary
    sample point must land inside the rebuilt geometry iff its parity
    is odd, and the rebuilt geometry must be valid."""

    @pytest.mark.parametrize("seed", range(10))
    def test_even_odd_parity_conserved(self, seed):
        import random
        from fractions import Fraction

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        rng = random.Random(4000 + seed)
        rebuilt = 0
        for _ in range(8):
            n = rng.randint(4, 7)
            pts: list[tuple[int, int]] = []
            while len(pts) < n:
                p = (rng.randint(0, 8), rng.randint(0, 8))
                if (not pts or p != pts[-1]) and p not in pts[:-1]:
                    pts.append(p)
            ring = pts + [pts[0]]
            wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"
            out = makevalid_wkt(wkt)
            if out is None or out.endswith("EMPTY"):
                continue  # outside the exact class / fully collapsed
            assert isvalid_wkt(out) is True, (wkt, out)
            rebuilt += 1
            gout = G.parse_wkt(out)
            polys = G._polys(gout)
            fring = [(Fraction(x), Fraction(y)) for x, y in ring]
            out_segs = list(G._segments(gout))
            in_segs = list(zip(ring, ring[1:]))
            for _s in range(60):
                sx = Fraction(rng.randint(-5, 90), 10) + Fraction(1, 3)
                sy = Fraction(rng.randint(-5, 90), 10) + Fraction(1, 7)
                p = (float(sx), float(sy))
                near = min(
                    G._seg_distance(p, a, b) for a, b in out_segs + in_segs
                )
                if near < 1e-6:
                    continue  # parity undefined on/near a boundary
                parity = G._point_in_ring(sx, sy, fring)
                inres = any(
                    G._point_in_polygon(float(sx), float(sy), rings)
                    for rings in polys
                )
                assert parity == inres, (wkt, out, (float(sx), float(sy)))
        assert rebuilt >= 3  # the fuzz really exercises the rebuild path

    @pytest.mark.parametrize("seed", range(10))
    def test_multi_ring_parity_conserved(self, seed):
        """Multi-ring parts through the rectilinear parity-cell path —
        the single-ring fuzz above structurally cannot reach it
        (code-review r11 found both unguarded return paths there)."""
        import random
        from fractions import Fraction

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            geometry as G,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            makevalid_wkt,
        )

        rng = random.Random(7000 + seed)
        rebuilt = 0
        for _ in range(10):
            rings = []
            for _r in range(rng.randint(2, 3)):
                x, y = rng.randint(0, 6), rng.randint(0, 6)
                w, h = rng.randint(1, 5), rng.randint(1, 5)
                rings.append(
                    [(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]
                )
            wkt = "POLYGON (" + ", ".join(
                "(" + ", ".join(f"{a} {b}" for a, b in r) + ")" for r in rings
            ) + ")"
            out = makevalid_wkt(wkt)
            if out is None or out.endswith("EMPTY"):
                continue
            assert isvalid_wkt(out) is True, (wkt, out)
            rebuilt += 1
            gout = G.parse_wkt(out)
            polys = G._polys(gout)
            out_segs = list(G._segments(gout))
            in_segs = [s for r in rings for s in zip(r, r[1:])]
            for _s in range(50):
                sx = Fraction(rng.randint(-5, 120), 10) + Fraction(1, 3)
                sy = Fraction(rng.randint(-5, 120), 10) + Fraction(1, 7)
                p = (float(sx), float(sy))
                if min(G._seg_distance(p, a, b) for a, b in out_segs + in_segs) < 1e-6:
                    continue
                parity = sum(
                    1 for r in rings
                    if G._point_in_ring(sx, sy, [(Fraction(a), Fraction(b)) for a, b in r])
                ) % 2 == 1
                inres = any(G._point_in_polygon(*p, rings_) for rings_ in polys)
                assert parity == inres, (wkt, out, p)
        assert rebuilt >= 4


def test_point_touching_hole_dissolve_repairs():
    """r11 follow-up: the rectilinear dissolve fuses a hole touching
    its shell at one point into a self-touching ring; the loop
    re-split now recovers the valid shell+hole answer (previously a
    documented honest NULL)."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
        geometry as G,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
        makevalid_wkt,
    )

    w = (
        "POLYGON ((3 2, 6 2, 6 6, 3 6, 3 2), (0 1, 3 1, 3 5, 0 5, 0 1),"
        " (1 3, 3 3, 3 6, 1 6, 1 3))"
    )
    out = makevalid_wkt(w)
    assert out is not None and isvalid_wkt(out) is True
    g = G.parse_wkt(out)
    assert len(g.coords) == 2  # shell + the recovered touching hole
    assert abs(G.area(g) - 22.0) < 1e-12
    mp = (
        "MULTIPOLYGON (((0 1, 3 1, 3 5, 0 5, 0 1), (1 3, 3 3, 3 6, 1 6, 1 3)),"
        " ((3 2, 6 2, 6 6, 3 6, 3 2)))"
    )
    out = makevalid_wkt(mp)
    assert out is not None and isvalid_wkt(out) is True
    assert abs(G.area(G.parse_wkt(out)) - 22.0) < 1e-12
