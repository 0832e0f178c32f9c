"""ST_Node / ST_Polygonize kernels (functions/noding.py): noding
invariants (piece interiors meet nothing, length conservation),
polygonization ground truths (face areas tile the arrangement), and
the surface contract. Driver row q164 pins the SQL level."""

from __future__ import annotations

import random

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.noding import (
    node_wkt,
    polygonize_wkt,
)

P = G.parse_wkt


def _pieces(w: str) -> list:
    g = P(node_wkt(w))
    return [g] if g.kind == "LineString" else [
        G.Geometry("LineString", list(c)) for c in g.coords
    ]


class TestNode:
    def test_crossing_lines_split_into_four(self):
        ps = _pieces("MULTILINESTRING ((0 0, 4 4), (0 4, 4 0))")
        assert len(ps) == 4
        assert abs(sum(G.length(p) for p in ps) - 2 * (32 ** 0.5)) < 1e-9

    def test_t_contact_splits_the_stem_side(self):
        ps = _pieces("MULTILINESTRING ((0 0, 4 0), (2 0, 2 3))")
        assert len(ps) == 3

    def test_untouched_interior_vertex_stays_interior(self):
        assert node_wkt("LINESTRING (0 0, 1 1, 2 0)") == "LINESTRING (0 0, 1 1, 2 0)"

    def test_self_crossing_line(self):
        ps = _pieces("LINESTRING (0 0, 4 4, 4 0, 0 4)")
        assert len(ps) == 3
        # the loop chain between the two node visits survives as one piece
        assert any(len(p.coords) == 4 for p in ps)

    def test_duplicate_linework_dedupes(self):
        ps = _pieces("MULTILINESTRING ((0 0, 4 0), (0 0, 4 0))")
        assert len(ps) == 1

    def test_shared_vertex_of_two_chains_is_a_node(self):
        ps = _pieces("MULTILINESTRING ((0 0, 2 2, 4 4), (0 4, 2 2, 4 0))")
        assert len(ps) == 4

    def test_surface_contract(self):
        assert node_wkt(None) is None
        assert node_wkt("junk ((") is None
        assert node_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))") is None
        assert node_wkt("POINT (1 1)") is None
        assert node_wkt("LINESTRING EMPTY") == "GEOMETRYCOLLECTION EMPTY"
        assert node_wkt("LINESTRING (0 0, nan 1)") is None

    @pytest.mark.parametrize("seed", range(6))
    def test_fuzz_noded_pieces_only_touch_at_endpoints(self, seed):
        rng = random.Random(8000 + seed)
        lines = []
        for _ in range(4):
            x, y = rng.randint(0, 8), rng.randint(0, 8)
            x2, y2 = rng.randint(0, 8), rng.randint(0, 8)
            if (x, y) != (x2, y2):
                lines.append(f"({x} {y}, {x2} {y2})")
        if len(lines) < 2:
            return
        w = f"MULTILINESTRING ({', '.join(lines)})"
        out = node_wkt(w)
        assert out is not None
        ps = _pieces(w)
        # total length conserved modulo collinear-duplicate removal:
        # noded length never exceeds the input, and every piece pair
        # meets only at shared endpoints (no interior crossings)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                a, b = ps[i], ps[j]
                ends = {tuple(a.coords[0]), tuple(a.coords[-1])} & {
                    tuple(b.coords[0]), tuple(b.coords[-1])
                }
                from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
                    _collinear_overlap_exists,
                    _line_line_interiors,
                )

                assert not _collinear_overlap_exists(a, b), (w, i, j)
                if not ends:
                    assert not _line_line_interiors(a, b), (w, i, j)


class TestPolygonize:
    def test_ring_plus_chord_two_faces(self):
        out = polygonize_wkt(
            "MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (0 2, 4 2))"
        )
        g = P(out)
        assert len(g.coords) == 2
        assert abs(sum(G.area(p) for p in g.coords) - 16.0) < 1e-12

    def test_nested_rings_island_and_hole(self):
        out = polygonize_wkt(
            "MULTILINESTRING ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        )
        g = P(out)
        areas = sorted(G.area(p) for p in g.coords)
        assert len(g.coords) == 2 and areas == [4.0, 32.0]
        # the big face carries the hole
        assert any(len(p.coords) == 2 for p in g.coords)

    def test_dangles_and_bridges_stripped(self):
        out = polygonize_wkt(
            "MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 2))"
        )
        assert abs(G.area(P(out)) - 16.0) < 1e-12
        out = polygonize_wkt(
            "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0),"
            " (4 0, 6 0, 6 2, 4 2, 4 0), (2 1, 4 1))"
        )
        g = P(out)
        assert len(g.coords) == 2
        assert abs(sum(G.area(p) for p in g.coords) - 8.0) < 1e-12

    def test_unclosed_linework_bounds_nothing(self):
        assert polygonize_wkt("LINESTRING (0 0, 5 5)") == "GEOMETRYCOLLECTION EMPTY"

    def test_crossing_rings_tile_exactly(self):
        # two overlapping squares: 3 faces tiling their union
        out = polygonize_wkt(
            "MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))"
        )
        g = P(out)
        assert len(g.coords) == 3
        assert abs(sum(G.area(p) for p in g.coords) - 28.0) < 1e-12

    def test_surface_contract(self):
        assert polygonize_wkt(None) is None
        assert polygonize_wkt("junk ((") is None
        assert polygonize_wkt("POINT (1 1)") is None
        assert polygonize_wkt("MULTILINESTRING EMPTY") == "GEOMETRYCOLLECTION EMPTY"

    @pytest.mark.parametrize("seed", range(6))
    def test_fuzz_faces_are_valid_and_disjoint(self, seed):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            interiors_intersect,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.validity import (
            invalid_reason,
        )

        rng = random.Random(9000 + seed)
        # random axis-aligned boxes as rings: arrangements with crossings
        rings = []
        for _ in range(3):
            x, y = rng.randint(0, 5), rng.randint(0, 5)
            w, h = rng.randint(1, 4), rng.randint(1, 4)
            rings.append(
                f"({x} {y}, {x + w} {y}, {x + w} {y + h}, {x} {y + h}, {x} {y})"
            )
        out = polygonize_wkt(f"MULTILINESTRING ({', '.join(rings)})")
        assert out is not None
        if out == "GEOMETRYCOLLECTION EMPTY":
            return
        g = P(out)
        faces = list(g.coords)
        for f in faces:
            assert invalid_reason(f) is None, (out,)
        for i in range(len(faces)):
            for j in range(i + 1, len(faces)):
                assert not interiors_intersect(faces[i], faces[j]), (out, i, j)


class TestReviewRegressions:
    """code-review r11 follow-ups on the noding kernel."""

    def test_collinear_foldback_noded_once(self):
        ps = _pieces("LINESTRING (0 0, 4 0, 2 0)")
        assert len(ps) == 2
        assert abs(sum(G.length(p) for p in ps) - 4.0) < 1e-12
        # spur into a ring: unique linework length, no double cover
        ps = _pieces("LINESTRING (0 0, 4 0, 2 0, 2 2, 0 2, 0 0)")
        assert abs(sum(G.length(p) for p in ps) - 10.0) < 1e-12

    def test_non_lineal_empty_kinds_are_null(self):
        assert node_wkt("POINT EMPTY") is None
        assert polygonize_wkt("POLYGON EMPTY") is None
        assert node_wkt("MULTILINESTRING EMPTY") == "GEOMETRYCOLLECTION EMPTY"
        assert polygonize_wkt("GEOMETRYCOLLECTION EMPTY") == "GEOMETRYCOLLECTION EMPTY"

    @pytest.mark.parametrize("seed", range(4))
    def test_fuzz_multivertex_chains(self, seed):
        # the first fuzz only generated 2-point chains, which is exactly
        # why the fold-back bug survived it
        rng = random.Random(8500 + seed)
        lines = []
        for _ in range(3):
            pts, x, y = [], rng.randint(0, 8), rng.randint(0, 8)
            pts.append((x, y))
            for _k in range(rng.randint(2, 4)):
                x, y = x + rng.randint(-3, 3), y + rng.randint(-3, 3)
                if (x, y) != pts[-1]:
                    pts.append((x, y))
            if len(pts) >= 2:
                lines.append("(" + ", ".join(f"{a} {b}" for a, b in pts) + ")")
        if len(lines) < 2:
            return
        w = f"MULTILINESTRING ({', '.join(lines)})"
        ps = _pieces(w)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.relations import (
            _collinear_overlap_exists,
            _line_line_interiors,
        )

        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                a, b = ps[i], ps[j]
                assert not _collinear_overlap_exists(a, b), (w, i, j)
                ends = {tuple(a.coords[0]), tuple(a.coords[-1])} & {
                    tuple(b.coords[0]), tuple(b.coords[-1])
                }
                if not ends:
                    assert not _line_line_interiors(a, b), (w, i, j)
