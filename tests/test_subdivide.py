"""ST_Subdivide (functions/subdivide.py): vertex budget, exact area
conservation, per-kind behavior, surface contract, and the SQL/explode
path the q162 driver row uses."""

from __future__ import annotations

import random

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.subdivide import (
    subdivide_geom,
    subdivide_wkt,
)

P = G.parse_wkt


def _dense_rect(w: int, h: int) -> str:
    pts = ", ".join(f"{x} 0" for x in range(w + 1))
    return f"POLYGON (({pts}, {w} {h}, 0 {h}, 0 0))"


class TestSubdivide:
    def test_small_input_passes_through(self):
        box = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        assert subdivide_wkt(box, 8) == [box]

    def test_budget_forces_split_and_conserves_area(self):
        for w, h in ((30, 20), (45, 20), (60, 30)):
            ps = subdivide_wkt(_dense_rect(w, h), 12)
            assert len(ps) >= 2
            assert all(G.n_points(P(p)) <= 12 for p in ps)
            assert abs(sum(G.area(P(p)) for p in ps) - w * h) < 1e-9

    def test_jagged_polygon_conserves_area_exactly(self):
        pts = ", ".join(f"{i} {(i * i) % 7}" for i in range(40))
        w = f"POLYGON (({pts}, 39 20, 0 20, 0 0))"
        ps = subdivide_wkt(w, 16)
        assert abs(sum(G.area(P(p)) for p in ps) - G.area(P(w))) < 1e-9
        assert max(G.n_points(P(p)) for p in ps) <= 16

    def test_holed_polygon(self):
        hp = (
            "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
            " (8 8, 12 8, 12 12, 8 12, 8 8))"
        )
        ps = subdivide_wkt(hp, 8)
        assert abs(sum(G.area(P(p)) for p in ps) - 384.0) < 1e-9

    def test_lines_split_and_conserve_length(self):
        line = "LINESTRING (0 0, 1 1, 2 0, 3 1, 4 0, 5 1, 6 0)"
        ps = subdivide_wkt(line, 5)
        assert all(p.startswith("LINESTRING") for p in ps)
        assert abs(sum(G.length(P(p)) for p in ps) - G.length(P(line))) < 1e-9

    def test_multi_parts_subdivide_per_part(self):
        mp = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 14 0, 14 4, 10 4, 10 0)))"
        ps = subdivide_wkt(mp, 8)
        assert len(ps) == 2 and all(p.startswith("POLYGON") for p in ps)

    def test_surface_contract(self):
        assert subdivide_wkt(None, 8) is None
        assert subdivide_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", None) is None
        assert subdivide_wkt("junk ((", 8) is None
        assert subdivide_wkt("POINT EMPTY", 8) == []
        # PostGIS: max_vertices must be >= 5
        assert subdivide_wkt(_dense_rect(30, 20), 4) is None
        with pytest.raises(ValueError):
            subdivide_geom(P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), 4)
        assert subdivide_wkt("POINT (nan nan)", 8) is None

    @pytest.mark.parametrize("seed", range(6))
    def test_fuzz_area_conservation(self, seed):
        rng = random.Random(5000 + seed)
        # random staircase rectilinear polygons: always valid, many
        # vertices, exact rect-cell clips
        x, y, pts = 0, 0, [(0, 0)]
        for _ in range(rng.randint(6, 12)):
            x += rng.randint(1, 4)
            pts.append((x, y))
            y += rng.randint(1, 4)
            pts.append((x, y))
        top = y
        pts += [(0, top), (0, 0)]
        w = "POLYGON ((" + ", ".join(f"{a} {b}" for a, b in pts) + "))"
        g = P(w)
        mv = rng.choice((5, 6, 8, 12))
        ps = subdivide_wkt(w, mv)
        assert ps is not None
        assert abs(sum(G.area(P(p)) for p in ps) - G.area(g)) < 1e-9
        # r12: the budget is a guarantee, not best-effort — pivot-vertex
        # splitting resolves the concave-corner "L" that pure midpoint
        # halving re-clips forever (ADVICE r11); budget 5 (the minimum)
        # is now in the draw pool because it always converges
        assert all(G.n_points(P(p)) <= mv for p in ps)


def test_subdivide_through_spark(spark):
    rows = spark.sql(
        "SELECT st_subdivide(w, n) AS ps FROM VALUES "
        "('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 8), "
        "('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', CAST(NULL AS INT)), "  # NaN-int guard
        "(CAST(NULL AS STRING), 8) AS t(w, n)"
    ).collect()
    assert rows[0]["ps"] == ["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"]
    assert rows[1]["ps"] is None and rows[2]["ps"] is None


def test_split_line_run_lands_in_exactly_one_half():
    """code-review r11: a 1-D run lying exactly ON the split line was
    emitted in both closed halves, double-counting its length."""
    line = "LINESTRING (0 0, 1 0, 2 0, 2 1, 2 2, 2 3, 3 3, 4 3)"
    ps = subdivide_wkt(line, 5)
    assert abs(sum(G.length(P(p)) for p in ps) - 7.0) < 1e-12


def test_pad_scales_with_coordinate_magnitude():
    """code-review r11: a fixed pad of 1 vanishes below one ulp at
    ~1e16, collapsing the clip ring for degenerate-extent parts."""
    pts = ", ".join(f"{i} 100000000000000000" for i in range(10))
    ps = subdivide_wkt(f"LINESTRING ({pts})", 5)
    assert ps is not None and len(ps) >= 2


def test_over_budget_at_collapsed_extent_is_loud_null():
    """ADVICE r11: a part with more vertices than the budget whose
    extent has collapsed below float resolution must go NULL (the
    exact-or-NULL contract), never silently emit an over-budget
    piece."""
    import math

    a, b = 1.0, math.nextafter(1.0, 2.0)
    # 10-vertex zigzag inside a one-ulp extent: no midpoint exists
    pts = ", ".join(f"{a!r} 0" if i % 2 == 0 else f"{b!r} 0" for i in range(10))
    assert subdivide_wkt(f"LINESTRING ({pts})", 5) is None
