"""Grid generators + editors (functions/grids.py, r12): square/hex
grids, XYZ tile envelopes, the small editors, and their loud-NULL
gates."""

from __future__ import annotations

import math

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
    hexagon_grid,
    normalize_geom,
    project_point,
    square_grid,
    tile_envelope,
)

P = G.parse_wkt


class TestSquareGrid:
    def test_origin_alignment_and_count(self):
        cells = square_grid(10, "POLYGON ((3 3, 17 3, 17 12, 3 12, 3 3))")
        assert len(cells) == 4
        assert cells[0] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        # every cell corner is a multiple of the size
        for c in cells:
            for x, y in G._points(P(c)):
                assert x % 10 == 0 and y % 10 == 0

    def test_cells_cover_bounds_exactly_once(self):
        cells = [P(c) for c in square_grid(5, "POLYGON ((-7 -3, 6 -3, 6 9, -7 9, -7 -3))")]
        total = sum(G.area(c) for c in cells)
        # grid covers [-10,10]x[-5,10]: 4 cols x 3 rows
        assert len(cells) == 12 and total == 12 * 25

    def test_degenerate_bounds_get_one_row_and_column(self):
        assert len(square_grid(10, "POINT (5 5)")) == 1
        assert len(square_grid(10, "LINESTRING (2 5, 8 5)")) == 1

    def test_gates(self):
        assert square_grid(0, "POINT (0 0)") is None
        assert square_grid(float("nan"), "POINT (0 0)") is None
        assert square_grid(10, "JUNK") is None
        assert square_grid(10, "POLYGON EMPTY") is None
        # cell-count bomb is a loud NULL, not an OOM
        assert square_grid(0.001, "POLYGON ((0 0, 50 0, 50 50, 0 50, 0 0))") is None


class TestHexagonGrid:
    def test_hand_derived_count_and_geometry(self):
        cells = hexagon_grid(5, "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")
        # hand derivation (grid_ops docstring): bbox-overlap filter,
        # even columns cx in {0, 15} x 3 rows + odd columns
        # cx in {7.5, 22.5} x 4 rows = 14
        assert len(cells) == 14
        h = math.sqrt(3.0) * 5
        for c in cells:
            g = P(c)
            assert len(g.coords[0]) == 7  # closed hexagon
            assert abs(G.area(g) - 3 * math.sqrt(3) / 2 * 25) < 1e-9
            xs = [x for x, _ in g.coords[0]]
            ys = [y for _, y in g.coords[0]]
            assert abs((max(xs) - min(xs)) - 10) < 1e-12  # width 2*size
            assert abs((max(ys) - min(ys)) - h) < 1e-12  # height sqrt(3)*size

    def test_bomb_gate_counts_emitted_cells(self, monkeypatch):
        # ADVICE r12: the gate must bound the OUTPUT, not the unfiltered
        # candidate lattice — at cap 10 the 20x20/size-5 request emits 7
        # cells from a 24-cell candidate lattice and must succeed.
        import sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids as grids

        box = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"
        baseline = grids.hexagon_grid(5, box)
        monkeypatch.setattr(grids, "_MAX_CELLS", len(baseline))
        assert grids.hexagon_grid(5, box) == baseline
        monkeypatch.setattr(grids, "_MAX_CELLS", len(baseline) - 1)
        assert grids.hexagon_grid(5, box) is None

    def test_bomb_gate_thin_strip(self, monkeypatch):
        # worst candidate/emitted aspect: a 1-row strip's candidate
        # lattice is ~4x its output — a cap-compliant strip must pass
        import sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids as grids

        strip = "LINESTRING (0 0.1, 84 0.1)"
        cells = grids.hexagon_grid(2.0, strip)
        assert cells is not None
        monkeypatch.setattr(grids, "_MAX_CELLS", len(cells))
        assert grids.hexagon_grid(2.0, strip) == cells
        monkeypatch.setattr(grids, "_MAX_CELLS", len(cells) - 1)
        assert grids.hexagon_grid(2.0, strip) is None

    def test_cells_tile_without_overlap(self):
        # neighboring cells share edges exactly: total area of cells
        # fully inside a window equals window coverage by disjointness
        cells = [P(c) for c in hexagon_grid(5, "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")]
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            interiors_intersect,
        )

        for i in range(len(cells)):
            for j in range(i + 1, len(cells)):
                assert not interiors_intersect(cells[i], cells[j]), (i, j)


class TestTileEnvelope:
    def test_world_and_quadrants(self):
        w = 20037508.342789244
        assert tile_envelope(0, 0, 0) == (
            f"POLYGON ((-{w} -{w}, {w} -{w}, {w} {w}, -{w} {w}, -{w} -{w}))"
        )
        assert tile_envelope(1, 1, 0) == (
            f"POLYGON ((0 0, {w} 0, {w} {w}, 0 {w}, 0 0))"
        )

    def test_tiles_partition_parent(self):
        # the four z=1 tiles' envelopes partition the z=0 world
        parts = [P(tile_envelope(1, x, y)) for x in (0, 1) for y in (0, 1)]
        total = sum(G.area(p) for p in parts)
        assert abs(total - G.area(P(tile_envelope(0, 0, 0)))) < 1e-3

    def test_y_counts_from_top(self):
        # y=0 is the TOP row (slippy-map convention)
        g = P(tile_envelope(2, 0, 0))
        assert min(y for _x, y in G._points(g)) > 0

    def test_gates(self):
        assert tile_envelope(-1, 0, 0) is None
        assert tile_envelope(2, 4, 0) is None
        assert tile_envelope(2, 0, -1) is None


class TestEditors:
    def test_normalize_canonical_and_idempotent(self):
        w = "MULTIPOLYGON (((4 0, 0 0, 0 4, 4 4, 4 0)), ((9 9, 5 9, 5 5, 9 5, 9 9)))"
        n1 = G.to_wkt(normalize_geom(P(w)))
        assert n1 == (
            "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
            "((5 5, 9 5, 9 9, 5 9, 5 5)))"
        )
        assert G.to_wkt(normalize_geom(P(n1))) == n1

    def test_project_round_trip_via_inverse_bearing(self):
        # go d at azimuth a, then d at the BACK azimuth of the arrival
        # bearing returns to the start (spherical identity)
        start = "POINT (12 47)"
        out = project_point(start, 250000.0, 1.1)
        g = P(out)
        # numeric check: distance start->out on the sphere ~ 250 km
        R = 6371008.8
        lon1, lat1 = 12.0, 47.0
        lon2, lat2 = g.coords
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dl = math.radians(lon2 - lon1)
        d = R * math.acos(
            max(-1, min(1, math.sin(p1) * math.sin(p2)
                + math.cos(p1) * math.cos(p2) * math.cos(dl)))
        )
        assert abs(d - 250000.0) < 1e-3

    def test_project_gates(self):
        assert project_point("LINESTRING (0 0, 1 1)", 10.0, 0.0) is None
        assert project_point("POINT (nan 0)", 10.0, 0.0) is None
        assert project_point("POINT (0 0)", float("inf"), 0.0) is None


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT size(st_squaregrid(10.0D, 'POLYGON ((3 3, 17 3, 17 12, 3 12, 3 3))')) AS n,"
        " st_tileenvelope(1, 1, 1) AS t,"
        " st_removerepeatedpoints('LINESTRING (0 0, 0 0, 5 5)') AS rrp,"
        " st_swapordinates('POINT (3 7)') AS sw,"
        " st_forcepolygonccw('POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))') AS ccw,"
        " st_normalize('POLYGON ((4 0, 0 0, 0 4, 4 4, 4 0))') AS nm,"
        " st_hexagongrid(CAST(NULL AS DOUBLE), 'POINT (0 0)') AS hnull"
    ).collect()[0]
    assert row["n"] == 4
    assert row["t"].startswith("POLYGON ((0 -20037508")
    assert row["rrp"] == "LINESTRING (0 0, 5 5)"
    assert row["sw"] == "POINT (7 3)"
    assert row["ccw"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert row["nm"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert row["hnull"] is None


class TestSmoothingAndDumps:
    def test_chaikin_open_line_preserves_endpoints(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            chaikin_geom,
        )

        g = chaikin_geom(P("LINESTRING (0 0, 4 0, 4 4)"), 1)
        assert G.to_wkt(g) == "LINESTRING (0 0, 3 0, 4 1, 4 4)"
        # symmetric: smoothing the reverse mirrors (code-review r12)
        r = chaikin_geom(P("LINESTRING (4 4, 4 0, 0 0)"), 1)
        assert list(r.coords) == list(reversed(g.coords))
        # n = 0 echoes; negative is a loud NULL
        assert G.to_wkt(chaikin_geom(P("LINESTRING (0 0, 4 0)"), 0)) == "LINESTRING (0 0, 4 0)"
        assert chaikin_geom(P("LINESTRING (0 0, 4 0)"), -1) is None

    def test_chaikin_square_becomes_octagon_then_16gon(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            chaikin_geom,
        )

        sq = P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        one = chaikin_geom(sq, 1)
        assert len(one.coords[0]) == 9  # octagon + closing point
        two = chaikin_geom(sq, 2)
        assert len(two.coords[0]) == 17
        # area shrinks toward the inscribed shape but stays positive
        assert 0 < G.area(two) < G.area(one) < 16

    def test_chaikin_iteration_cap(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            chaikin_geom,
        )

        sq = P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        assert G.to_wkt(chaikin_geom(sq, 99)) == G.to_wkt(chaikin_geom(sq, 5))

    def test_scroll_and_gates(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            scroll_geom,
        )

        ring = P("LINESTRING (0 0, 4 0, 4 4, 0 0)")
        assert G.to_wkt(scroll_geom(ring, P("POINT (4 4)"))) == (
            "LINESTRING (4 4, 0 0, 4 0, 4 4)"
        )
        assert scroll_geom(ring, P("POINT (9 9)")) is None  # not a vertex
        assert scroll_geom(P("LINESTRING (0 0, 4 0)"), P("POINT (0 0)")) is None

    def test_line_extend_345_exact(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            line_extend,
        )

        g = line_extend(P("LINESTRING (0 0, 3 4)"), 5.0, 10.0)
        assert G.to_wkt(g) == "LINESTRING (-6 -8, 6 8)"

    def test_dumps(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            dump_points,
            dump_rings,
            dump_segments,
        )

        holed = P("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
        assert dump_rings(holed) == [
            "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))",
            "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
        ]
        assert dump_rings(P("LINESTRING (0 0, 1 1)")) is None
        assert len(dump_segments(holed)) == 8
        assert dump_points(P("MULTIPOINT (1 2, 3 4)")) == ["POINT (1 2)", "POINT (3 4)"]


class TestClusterGeo:
    def test_intersecting_clusters(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.cluster_geo import (
            cluster_wkts,
        )

        got = cluster_wkts(
            [
                "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))",  # touches #1
                "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))",
            ],
            None,
        )
        assert len(got) == 2
        assert got[0].count("POLYGON") == 2 and got[1].count("POLYGON") == 1

    def test_within_distance_chains(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.cluster_geo import (
            cluster_wkts,
        )

        pts = ["POINT (0 0)", "POINT (3 0)", "POINT (6 0)", "POINT (20 0)"]
        assert len(cluster_wkts(pts, 3.0)) == 2  # chain 0-3-6, then 20
        assert len(cluster_wkts(pts, 2.9)) == 4
        assert len(cluster_wkts(pts, 14.0)) == 1

    def test_skip_null_and_empty_members(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.cluster_geo import (
            cluster_wkts,
        )

        got = cluster_wkts([None, "POINT EMPTY", "POINT (0 0)"], None)
        assert len(got) == 1

    def test_union_find_matches_bfs_closure(self):
        # The union-find rewrite (ADVICE r12: was O(n^3) whole-array
        # relabeling) must produce exactly the BFS transitive closure,
        # including the member-order/first-index determinism contract.
        import random

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.cluster_geo import (
            cluster_components,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G

        rng = random.Random(1317)
        for _ in range(20):
            n = rng.randrange(2, 40)
            pts = [(rng.randrange(0, 12), rng.randrange(0, 12)) for _ in range(n)]
            geoms = [G.parse_wkt(f"POINT ({x} {y})") for x, y in pts]
            d = rng.choice([1.0, 2.0, 3.0])

            def edge(a, b, ba, bb):
                dx, dy = ba[0] - bb[0], ba[1] - bb[1]
                return dx * dx + dy * dy <= d * d

            got = cluster_components(geoms, edge)
            # BFS reference
            seen, expect = set(), []
            for s in range(n):
                if s in seen:
                    continue
                comp, stack = set(), [s]
                while stack:
                    v = stack.pop()
                    if v in comp:
                        continue
                    comp.add(v)
                    for w in range(n):
                        if w not in comp:
                            dx = pts[v][0] - pts[w][0]
                            dy = pts[v][1] - pts[w][1]
                            if dx * dx + dy * dy <= d * d:
                                stack.append(w)
                seen |= comp
                expect.append(sorted(comp))
            assert got == expect

    def test_sql_surface(self, spark):
        rows = spark.sql(
            "SELECT size(st_clusterintersecting(array("
            "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',"
            "'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))',"
            "'POINT (50 50)'))) AS n,"
            " st_clusterwithin(array('POINT (0 0)'), -1.0D) AS bad"
        ).collect()[0]
        assert rows["n"] == 2
        assert rows["bad"] is None


class TestSnap:
    """ST_Snap (r13, functions/editors.py): GEOS LineStringSnapper —
    vertex snap then reference-vertex insertion into segments."""

    def _s(self, w, r, t):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.editors import snap

        return snap(w, r, t)

    def test_vertex_snap(self):
        got = self._s("LINESTRING (0 0, 10 1, 20 0)", "MULTIPOINT (10 0)", 2.0)
        assert got == "LINESTRING (0 0, 10 0, 20 0)"

    def test_segment_insertion_ordered_by_parameter(self):
        got = self._s(
            "LINESTRING (0 0, 20 0)",
            "POLYGON ((9 1, 11 1, 11 3, 9 3, 9 1))",
            1.5,
        )
        assert got == "LINESTRING (0 0, 9 1, 11 1, 20 0)"

    def test_out_of_tolerance_echo_and_zero_tolerance(self):
        line = "LINESTRING (0 0, 10 1, 20 0)"
        assert self._s(line, "MULTIPOINT (10 5)", 2.0) == line
        assert self._s(line, "MULTIPOINT (10 0)", 0.0) == line

    def test_ring_closure_preserved(self):
        got = self._s(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            "MULTIPOINT (0.5 0.5, 5 -1)",
            1.5,
        )
        assert got == "POLYGON ((0.5 0.5, 5 -1, 10 0, 10 10, 0 10, 0.5 0.5))"
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G

        g = G.parse_wkt(got)
        assert g.coords[0][0] == g.coords[0][-1]

    def test_first_in_tolerance_reference_vertex_wins(self):
        # JTS findSnapForVertex: FIRST strictly-in-tolerance snap point
        # in serialized order, not the closest (review r13 parity fix)
        got = self._s("POINT (5 0)", "MULTIPOINT (5 2, 5 1)", 3.0)
        assert got == "POINT (5 2)"
        # exactly-on-a-reference-vertex does not snap; d == tol does not
        # snap (strict <)
        assert self._s("POINT (5 0)", "MULTIPOINT (5 0, 5 1)", 3.0) == "POINT (5 0)"
        assert self._s("POINT (5 0)", "MULTIPOINT (5 2)", 2.0) == "POINT (5 0)"

    def test_segment_insert_goes_to_single_closest_segment(self):
        # JTS findSegmentIndexToSnap: one insertion only — the corner
        # point must not zigzag into both adjacent segments (review
        # r13). tol 2: too far for a vertex snap (corner distance
        # ~2.12), equidistant (1.5) from both segments — the tie goes
        # to the EARLIER segment, once.
        got = self._s("LINESTRING (10 0, 0 0, 0 10)", "MULTIPOINT (1.5 1.5)", 2.0)
        assert got == "LINESTRING (10 0, 1.5 1.5, 0 0, 0 10)"
        # at tol 3 the corner vertex itself snaps first (JTS order:
        # snapVertices then snapSegments), so no insertion remains
        got = self._s("LINESTRING (10 0, 0 0, 0 10)", "MULTIPOINT (1.5 1.5)", 3.0)
        assert got == "LINESTRING (10 0, 1.5 1.5, 0 10)"

    def test_collapsed_shell_is_loud_null_not_promoted_hole(self):
        got = self._s(
            "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0),"
            " (40 40, 60 40, 60 60, 40 60, 40 40))",
            "MULTIPOINT (50 -30, 50 130)",
            60.0,
        )
        assert got is None

    def test_empty_operands_echo(self):
        assert self._s("LINESTRING EMPTY", "POINT (0 0)", 1.0) == "LINESTRING EMPTY"
        assert (
            self._s("LINESTRING (0 0, 10 0)", "POINT EMPTY", 1.0)
            == "LINESTRING (0 0, 10 0)"
        )

    def test_non_finite_input_is_null(self):
        assert self._s("LINESTRING (nan 0, 10 0)", "POINT (0 0)", 1.0) is None

    def test_gates(self, spark):
        row = spark.sql(
            "SELECT st_snap('LINESTRING (0 0, 10 1, 20 0)',"
            " 'MULTIPOINT (10 0)', 2.0D) AS s,"
            " st_snap('JUNK', 'POINT (0 0)', 1.0D) AS junk,"
            " st_snap('POINT (0 0)', 'POINT (1 1)', -1.0D) AS neg,"
            " st_snap('POINT (0 0)', 'POINT (nan nan)', 1.0D) AS nf"
        ).collect()[0]
        assert row["s"] == "LINESTRING (0 0, 10 0, 20 0)"
        assert row["junk"] is None and row["neg"] is None and row["nf"] is None


class TestGeneratePoints:
    """ST_GeneratePoints (r13): deterministic (2,3)-Halton sampling
    with rejection — the documented reproducible divergence from
    PostGIS's PRNG."""

    def _gp(self, w, n, seed=0):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
            generate_points,
        )

        return generate_points(w, n, seed)

    def test_all_points_inside_and_deterministic(self):
        tri = "POLYGON ((0 0, 30 0, 0 20, 0 0))"
        out = self._gp(tri, 6)
        assert out == self._gp(tri, 6)  # bit-reproducible
        g = P(out)
        assert len(g.coords) == 6
        for x, y in g.coords:
            assert x > 0 and y > 0 and x / 30 + y / 20 < 1

    def test_rejection_skips_outside_candidates(self):
        # Halton k=5 (0.625, 7/9) falls outside the triangle: the 5th
        # kept point must be k=6, not k=5
        tri = "POLYGON ((0 0, 30 0, 0 20, 0 0))"
        g = P(self._gp(tri, 5))
        assert g.coords[4] == (0.375 * 30, (2.0 / 9.0) * 20)

    def test_seed_offsets_sequence(self):
        box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        assert self._gp(box, 2, 0) != self._gp(box, 2, 5)
        # seed s yields the subsequence starting at k = s+1
        a = P(self._gp(box, 5, 0)).coords
        b = P(self._gp(box, 3, 2)).coords
        assert list(b) == list(a[2:5])

    def test_gates(self, spark):
        row = spark.sql(
            "SELECT st_generatepoints('POINT (1 1)', 3, 0) AS nonareal,"
            " st_generatepoints('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))', 0, 0) AS zero,"
            " st_generatepoints('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))', -1, 0) AS neg,"
            " st_generatepoints('JUNK', 3, 0) AS junk"
        ).collect()[0]
        assert row["nonareal"] is None
        assert row["zero"] == "MULTIPOINT EMPTY"
        assert row["neg"] is None and row["junk"] is None

    def test_n_zero_still_gates_invalid_inputs(self, spark):
        # review r13: the MULTIPOINT EMPTY early return must not leak
        # past the NULL/junk/non-areal gates
        row = spark.sql(
            "SELECT st_generatepoints(NULL, 0, 0) AS a,"
            " st_generatepoints('JUNK', 0, 0) AS b,"
            " st_generatepoints('POINT (1 1)', 0, 0) AS c,"
            " st_generatepoints('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))', 0, 0) AS d"
        ).collect()[0]
        assert row["a"] is None and row["b"] is None and row["c"] is None
        assert row["d"] == "MULTIPOINT EMPTY"

    def test_count_bomb_gate(self):
        # n past the 65,536 cap is a loud NULL, not a Python stall
        box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        assert self._gp(box, 65_537) is None

    def test_rejection_budget_is_loud(self):
        # a thin full-bbox polygon accepts everything (fine); a tiny
        # triangle inside a polygon with a huge bbox rejects nearly
        # every Halton candidate and must NULL at the budget, not stall
        thin = "POLYGON ((0 0, 1000 0, 1000 0.001, 0 0.001, 0 0))"
        assert self._gp(thin, 3) is not None
        # two far-apart unit triangles: interior is ~1e-12 of the bbox,
        # so the 64*3+1024-candidate budget cannot find 3 hits
        sliver = (
            "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)),"
            " ((999999 999999, 1000000 999999, 999999 1000000, 999999 999999)))"
        )
        assert self._gp(sliver, 3) is None


def test_snap_nonfinite_input_beats_empty_reference_echo():
    # review r13: garbage input must not ride an EMPTY reference out
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.editors import snap

    assert snap("LINESTRING (0 0, 1e999 0)", "POINT EMPTY", 5.0) is None
