"""Extended editor surface — functions/editors_x.py: ST_ForceCollection,
ST_UnaryUnion, ST_BuildArea (odd-even nesting), ST_WrapX (dateline
healer), ST_QuantizeCoordinates (PostGIS bit-trim, doc-example pinned)."""

from __future__ import annotations

import math

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    editors_x as E,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)


def _area(w: str) -> float:
    g = G.parse_wkt(w)
    total = 0.0
    polys = [g.coords] if g.kind == "Polygon" else g.coords
    for rings in polys:
        for i, r in enumerate(rings):
            a = 0.0
            for (x1, y1), (x2, y2) in zip(r, r[1:]):
                a += x1 * y2 - x2 * y1
            total += abs(a) / 2 * (1 if i == 0 else -1)
    return total


class TestForceCollection:
    def test_wraps_and_flattens(self):
        assert (
            E.forcecollection_wkt("MULTIPOINT ((1 2), (3 4))")
            == "GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))"
        )
        assert E.forcecollection_wkt("POINT (1 2)") == "GEOMETRYCOLLECTION (POINT (1 2))"
        assert (
            E.forcecollection_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
            == "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 0)))"
        )

    def test_collection_echo_and_empty(self):
        gc = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        assert E.forcecollection_wkt(gc) == gc
        assert E.forcecollection_wkt("POLYGON EMPTY") == "GEOMETRYCOLLECTION EMPTY"
        assert E.forcecollection_wkt(None) is None
        assert E.forcecollection_wkt("junk") is None


class TestUnaryUnion:
    def test_dissolves_own_members(self):
        mp = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))"
        out = E.unaryunion_wkt(mp)
        assert out == "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"
        assert _area(out) == 7.0

    def test_disjoint_and_empty(self):
        mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
        out = E.unaryunion_wkt(mp)
        assert out.startswith("MULTIPOLYGON") and _area(out) == 2.0
        assert E.unaryunion_wkt("POINT EMPTY") == "POINT EMPTY"
        assert E.unaryunion_wkt("POINT (3 4)") == "POINT (3 4)"


class TestBuildArea:
    def test_annulus(self):
        ml = "MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
        out = E.buildarea_wkt(ml)
        assert out.startswith("POLYGON") and "(1 1" in out  # hole kept
        assert _area(out) == 12.0

    def test_three_rings_island(self):
        ml = (
            "MULTILINESTRING ((0 0, 8 0, 8 8, 0 8, 0 0), "
            "(1 1, 7 1, 7 7, 1 7, 1 1), (2 2, 6 2, 6 6, 2 6, 2 2))"
        )
        out = E.buildarea_wkt(ml)
        assert out.startswith("MULTIPOLYGON")
        assert _area(out) == (64 - 36) + 16  # annulus + island

    def test_adjacent_faces_merge(self):
        ml = "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0), (2 0, 4 0, 4 2, 2 2, 2 0))"
        out = E.buildarea_wkt(ml)
        assert out.startswith("POLYGON") and _area(out) == 8.0

    def test_polygon_rings_as_linework(self):
        assert (
            E.buildarea_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") is not None
        )

    def test_no_area_is_null(self):
        assert E.buildarea_wkt("LINESTRING (0 0, 1 1)") is None
        assert E.buildarea_wkt("MULTILINESTRING EMPTY") is None
        assert E.buildarea_wkt("POINT (1 1)") is None
        assert E.buildarea_wkt(None) is None


class TestWrapX:
    def test_points(self):
        assert E.wrapx_wkt("MULTIPOINT ((0 0), (10 0))", 5, 20) == "MULTIPOINT (20 0, 10 0)"
        assert E.wrapx_wkt("MULTIPOINT ((0 0), (10 0))", 5, -20) == "MULTIPOINT (0 0, -10 0)"
        # exactly on the line: static for either sign
        assert E.wrapx_wkt("POINT (5 1)", 5, 20) == "POINT (5 1)"
        assert E.wrapx_wkt("POINT (5 1)", 5, -20) == "POINT (5 1)"

    def test_crossing_polygon_splits(self):
        out = E.wrapx_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 2, 10)
        assert out.startswith("MULTIPOLYGON")
        assert _area(out) == 16.0
        g = G.parse_wkt(out)
        xs = [x for rings in g.coords for r in rings for x, _y in r]
        assert min(xs) == 2.0 and max(xs) == 12.0

    def test_dateline_heal(self):
        # the canonical use: components west of 0 move +360
        out = E.wrapx_wkt("MULTIPOINT ((-170 10), (175 20))", 0, 360)
        assert out == "MULTIPOINT (190 10, 175 20)"

    def test_crossing_line_splits(self):
        out = E.wrapx_wkt("LINESTRING (0 0, 4 0)", 2, 10)
        assert out == "MULTILINESTRING ((10 0, 12 0), (2 0, 4 0))"

    def test_move_zero_echo_and_nulls(self):
        assert E.wrapx_wkt("POINT (1 2)", 0, 0) == "POINT (1 2)"
        assert E.wrapx_wkt(None, 0, 1) is None
        assert E.wrapx_wkt("POINT (1 2)", None, 1) is None
        assert E.wrapx_wkt("POINT (1 2)", 0, float("nan")) is None


class TestQuantize:
    def test_postgis_doc_example(self):
        # PostGIS docs: ST_QuantizeCoordinates('POINT (100.123456 0)', 4)
        # → POINT(100.123455047607)
        out = E.quantize_wkt("POINT (100.123456 0)", 4)
        g = G.parse_wkt(out)
        assert abs(g.coords[0] - 100.123455047607) < 5e-13
        assert g.coords[1] == 0.0

    def test_fixpoint_echoes(self):
        assert E.quantize_wkt("POINT (123.5 7)", 2) == "POINT (123.5 7)"
        assert E.quantize_wkt("POINT (0 0)", 0) == "POINT (0 0)"

    def test_monotone_in_digits(self):
        x = 100.123456
        prev_err = None
        for d in range(0, 15):
            out = E.quantize_wkt(f"POINT ({x!r} 0)", d)
            got = G.parse_wkt(out).coords[0]
            err = abs(got - x)
            if prev_err is not None:
                assert err <= prev_err + 1e-18
            prev_err = err
        # ceil((13 + 3)·log₂10) ≥ 52 → every significand bit kept
        assert prev_err == 0.0

    def test_quantized_is_trimmed_not_rounded(self):
        # trimming only CLEARS low significand bits: |q| <= |x| for x>0
        for d in range(0, 6):
            out = G.parse_wkt(E.quantize_wkt("POINT (100.123456 0)", d)).coords[0]
            assert out <= 100.123456

    def test_rejections(self):
        assert E.quantize_wkt("POINT (1 2)", -1) is None
        assert E.quantize_wkt("POINT (1 2)", 1.5) is None
        assert E.quantize_wkt("POINT (1 2)", None) is None
        assert E.quantize_wkt(None, 3) is None
        assert E.quantize_wkt("POINT Z (1 2 3)", 3) is None  # 2-D codec only

    def test_multigeometry_walk(self):
        out = E.quantize_wkt(
            "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))", 4
        )
        assert out == "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))"


class TestWrapXAreaConservation:
    def test_fuzz_split_translate_preserves_area(self):
        """Random integer boxes split at random wrap lines: ST_WrapX
        must conserve total area, produce pieces only on the expected
        sides, and keep piece x-extents within [wrap, wrap] bounds."""
        import random

        rng = random.Random(99)
        for _ in range(60):
            x0 = rng.randint(-50, 50)
            y0 = rng.randint(-50, 50)
            w = rng.randint(2, 12)
            h = rng.randint(1, 9)
            wrap = x0 + rng.randint(1, w - 1)
            move = rng.choice([-1, 1]) * rng.randint(10, 100)
            poly = (
                f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + h}, "
                f"{x0} {y0 + h}, {x0} {y0}))"
            )
            out = E.wrapx_wkt(poly, wrap, move)
            assert out is not None, (poly, wrap, move)
            assert abs(_area(out) - w * h) < 1e-9, (poly, wrap, move, out)
            g = G.parse_wkt(out)
            polys = [g.coords] if g.kind == "Polygon" else g.coords
            for rings in polys:
                xs = [x for r in rings for x, _y in r]
                if move > 0:
                    # every piece either stayed right of wrap or jumped
                    assert min(xs) >= wrap or min(xs) >= wrap + move - (w)
                    assert max(xs) <= max(x0 + w, wrap + move)
                else:
                    assert min(xs) >= min(x0, wrap + move)


class TestBuildAreaConservation:
    def test_fuzz_even_depth_equals_alternating_ring_sum(self):
        """k concentric integer square rings: BuildArea's area must be
        the alternating sum s₀² − s₁² + s₂² − … (odd-even nesting)."""
        import random

        rng = random.Random(7)
        for _ in range(40):
            k = rng.randint(1, 4)
            sides = sorted(rng.sample(range(1, 20), k), reverse=True)
            cx = rng.randint(-30, 30)
            cy = rng.randint(-30, 30)
            rings = []
            for s in sides:
                rings.append(
                    f"({cx - s} {cy - s}, {cx + s} {cy - s}, {cx + s} {cy + s}, "
                    f"{cx - s} {cy + s}, {cx - s} {cy - s})"
                )
            ml = "MULTILINESTRING (" + ", ".join(rings) + ")"
            out = E.buildarea_wkt(ml)
            want = sum(
                ((2 * s) ** 2) * (1 if i % 2 == 0 else -1)
                for i, s in enumerate(sides)
            )
            assert out is not None and abs(_area(out) - want) < 1e-9, (ml, out)
