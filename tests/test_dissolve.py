"""Boundary-dissolved union (functions/dissolve.py, VERDICT r11 item 3):
PostGIS output shape for overlapping / edge-sharing simple polygons —
one polygon per connected region, holes preserved, no internal seams —
plus the cross-kernel consistency fuzz against the independent
rectilinear grid union (two implementations of the same semantics must
agree; the r10 lesson that found two production bugs)."""

from __future__ import annotations

import random
import warnings

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    union_ops as U,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.dissolve import (
    boundaries_share_linework,
    dissolve_polygons,
)

P = G.parse_wkt


def _u(*wkts: str) -> str:
    return U.union_wkts(list(wkts))


class TestDissolvedShape:
    """The dissolve returns PostGIS's boundary shape — pinned WKTs."""

    def test_overlapping_convex_pair_single_polygon(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = _u(
                "POLYGON ((0 0, 4 0, 4 4, 0 0))",
                "POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0))",
            )
        # noded vertices on the shared bottom line survive (documented:
        # the walk keeps arrangement nodes, like GEOS keeps noding)
        assert got == "POLYGON ((0 0, 2 0, 4 0, 6 0, 6 4, 4 4, 2 4, 2 2, 0 0))"
        assert G.area(P(got)) == 18.0

    def test_concave_pair_single_polygon(self):
        # the VERDICT r11 probe class: concave x convex used to come
        # back as 3 seamed parts; now one dissolved POLYGON
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = _u(
                "POLYGON ((0 0, 4 0, 4 1, 1.5 1.25, 1 4, 0 4, 0 0))",
                "POLYGON ((3 0.5, 6 0.5, 6 3, 3 3, 3 0.5))",
            )
        g = P(got)
        assert g.kind == "Polygon"
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.overlay import (
            intersection_wkt,
        )

        ia = G.area(
            P(
                intersection_wkt(
                    "POLYGON ((0 0, 4 0, 4 1, 1.5 1.25, 1 4, 0 4, 0 0))",
                    "POLYGON ((3 0.5, 6 0.5, 6 3, 3 3, 3 0.5))",
                )
            )
        )
        expect = 8.125 + 7.5 - ia
        assert abs(G.area(g) - expect) < 1e-9

    def test_edge_adjacent_triangles_merge(self):
        # PostGIS dissolves edge-adjacent polygons even with no
        # interior overlap — the shared-linework component edge
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = _u(
                "POLYGON ((0 0, 2 0, 2 2, 0 0))",
                "POLYGON ((0 0, 2 2, 0 2, 0 0))",
            )
        assert got == "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"

    def test_partial_edge_share_merges(self):
        # B's bottom edge covers only PART of A's top edge; interiors
        # never overlap — the shared-linework component edge alone
        # must merge them (non-rectilinear A so the grid path skips it)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = _u(
                "POLYGON ((0 0, 4 0, 5 2, 1 2, 0 0))",
                "POLYGON ((2 2, 4 2, 3 4, 2 2))",
            )
        g = P(got)
        assert g.kind == "Polygon"
        assert abs(G.area(g) - (8.0 + 2.0)) < 1e-12

    def test_vertex_touch_stays_multi(self):
        # point contact is NOT shared linework: GEOS keeps two parts
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = P(
                _u(
                    "POLYGON ((0 0, 2 0, 1 2, 0 0))",
                    "POLYGON ((2 0, 4 0, 3 2, 2 0))",
                )
            )
        assert got.kind == "MultiPolygon"
        assert G.area(got) == 4.0

    def test_half_frames_dissolve_with_hole(self):
        # two edge-adjacent concave half-frames -> diamond frame WITH
        # its diamond hole (hole attachment through the stitch walk)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = _u(
                "POLYGON ((-4 0, 0 -4, 4 0, 2 0, 0 -2, -2 0, -4 0))",
                "POLYGON ((-4 0, -2 0, 0 2, 2 0, 4 0, 0 4, -4 0))",
            )
        assert got == (
            "POLYGON ((-4 0, 0 -4, 4 0, 0 4, -4 0), "
            "(-2 0, 0 2, 2 0, 0 -2, -2 0))"
        )
        assert G.area(P(got)) == 24.0

    def test_holed_member_hole_filled_by_other(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = P(
                _u(
                    "POLYGON ((0 0, 10 0, 5 9, 0 0), (4 1, 6 1, 5 2, 4 1))",
                    "POLYGON ((4 0, 12 0, 12 4, 4 4, 4 0))",
                )
            )
        assert got.kind == "Polygon" and len(got.coords) == 1  # hole filled
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.overlay import (
            intersection_wkt,
        )

        ia = G.area(
            P(
                intersection_wkt(
                    "POLYGON ((0 0, 10 0, 5 9, 0 0), (4 1, 6 1, 5 2, 4 1))",
                    "POLYGON ((4 0, 12 0, 12 4, 4 4, 4 0))",
                )
            )
        )
        assert abs(G.area(got) - (44.0 + 32.0 - ia)) < 1e-9

    def test_three_way_overlap_single_polygon(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = P(
                _u(
                    "POLYGON ((0 0, 4 0, 2 3, 0 0))",
                    "POLYGON ((2 0, 6 0, 4 3, 2 0))",
                    "POLYGON ((1 1, 5 1, 3 4, 1 1))",
                )
            )
        assert got.kind == "Polygon"

    def test_permutation_invariant(self):
        ws = [
            "POLYGON ((0 0, 4 0, 2 3, 0 0))",
            "POLYGON ((2 0, 6 0, 4 3, 2 0))",
            "POLYGON ((1 1, 5 1, 3 4, 1 1))",
        ]
        import itertools

        outs = {U.union_wkts(list(p)) for p in itertools.permutations(ws)}
        assert len(outs) == 1

    def test_unrepairable_member_still_warns_stacked(self):
        # multiply-wound ring: outside makevalid's exact classes, so
        # the component stays stacked with the documented warning
        star = "POLYGON ((0 0, 4 3, 8 0, 1 5, 7 5, 0 0))"
        q = "POLYGON ((1 1, 6 1, 6 4, 1 4, 1 1))"
        with pytest.warns(RuntimeWarning, match="double-count"):
            _u(star, q)


class TestSharedLineworkPredicate:
    def test_positive_span(self):
        assert boundaries_share_linework(
            P("POLYGON ((0 0, 2 0, 2 2, 0 0))"),
            P("POLYGON ((0 0, 2 2, 0 2, 0 0))"),
        )

    def test_vertex_touch_is_not_linework(self):
        assert not boundaries_share_linework(
            P("POLYGON ((0 0, 2 0, 1 2, 0 0))"),
            P("POLYGON ((2 0, 4 0, 3 2, 2 0))"),
        )

    def test_disjoint_bbox_prescreen(self):
        assert not boundaries_share_linework(
            P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            P("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        )


def _rand_rects(rng: random.Random, n: int):
    out = []
    for _ in range(n):
        x, y = rng.randint(-6, 6), rng.randint(-6, 6)
        out.append((x, y, x + rng.randint(1, 5), y + rng.randint(1, 5)))
    return out


@pytest.mark.parametrize("seed", range(25))
def test_dissolve_matches_rect_grid_kernel(seed):
    """Cross-kernel consistency (the r10 highest-yield test class): the
    noding dissolve and the independent rectilinear grid union implement
    the same semantics — on random rectangle sets their total area and
    total perimeter must agree exactly."""
    rng = random.Random(900 + seed)
    rects = _rand_rects(rng, rng.randint(2, 5))
    members = [
        G.Geometry(
            "Polygon", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]]
        )
        for x0, y0, x1, y1 in rects
    ]
    grid = U.union_geoms(members)  # rect pool -> grid dissolve

    # Force the noding kernel: dissolve each connected component
    # directly (the kernel itself, not union_geoms' rect path).
    comp = list(range(len(members)))
    for i in range(len(members)):
        for j in range(len(members)):
            if i < j and (
                boundaries_share_linework(members[i], members[j])
                or _rects_interiors_overlap(rects[i], rects[j])
            ):
                a, b = comp[i], comp[j]
                if a != b:
                    comp = [a if c == b else c for c in comp]
    parts = []
    for c in set(comp):
        mem = [members[i] for i in range(len(members)) if comp[i] == c]
        parts.extend(dissolve_polygons(mem))

    def tot(g_or_parts):
        gs = g_or_parts if isinstance(g_or_parts, list) else [g_or_parts]
        area = sum(G.area(g) for g in gs)
        perim = sum(G.perimeter(g) for g in gs)
        return area, perim

    ga, gp = tot(grid)
    da, dp = tot(parts)
    assert ga == da, (seed, rects)
    assert gp == dp, (seed, rects)


def _rects_interiors_overlap(a, b) -> bool:
    return a[0] < b[2] and b[0] < a[2] and a[1] < b[3] and b[1] < a[3]


class TestCodeReviewR12:
    def test_non_finite_member_falls_back_not_crash(self):
        """code-review r12: NaN passes the simplicity check and inf
        survives bbox prescreens — the dissolve must go _Unsupported
        (stacked fallback), never crash the UDF batch."""
        for bad in ("nan", "inf"):
            with pytest.warns(RuntimeWarning, match="double-count"):
                got = _u(
                    f"POLYGON ((0 0, {bad} 0, 4 4, 0 0))",
                    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
                )
            assert got is not None  # stacked parts, like pre-dissolve

    def test_linework_only_component_failure_does_not_warn(self):
        """code-review r12: a component connected ONLY by shared
        boundary linework whose dissolve fails (non-simple ring) keeps
        exact area/perimeter — the double-count warning must not fire."""
        bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
        square = "POLYGON ((-2 0, 0 0, 0 2, -2 2, -2 0))"  # shares x=0 edge
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = _u(bowtie, square)
        assert got is not None
