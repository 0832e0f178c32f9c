"""ST_Split tests (functions/split.py): kernel edge cases, conservation
fuzz, and the Spark SQL surface."""

from __future__ import annotations

import random

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import split_wkt


class TestLineSplits:
    def test_point_on_line(self):
        assert split_wkt("LINESTRING (0 0, 30 0)", "POINT (10 0)") == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 10 0), LINESTRING (10 0, 30 0))"
        )

    def test_point_off_line_unchanged(self):
        assert split_wkt("LINESTRING (0 0, 30 0)", "POINT (10 5)") == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 30 0))"
        )

    def test_point_at_endpoint_noop(self):
        assert split_wkt("LINESTRING (0 0, 30 0)", "POINT (0 0)") == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 30 0))"
        )

    def test_multipoint_two_cuts(self):
        got = split_wkt("LINESTRING (0 0, 30 0)", "MULTIPOINT (10 0, 20 0)")
        assert got == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 10 0), "
            "LINESTRING (10 0, 20 0), LINESTRING (20 0, 30 0))"
        )

    def test_line_cross(self):
        got = split_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (15 -5, 15 5)")
        assert got == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 15 0), LINESTRING (15 0, 30 0))"
        )

    def test_blade_through_target_vertex(self):
        got = split_wkt("LINESTRING (0 0, 10 0, 20 10)", "LINESTRING (10 -5, 10 5)")
        assert got == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 10 0), LINESTRING (10 0, 20 10))"
        )

    def test_self_intersections_not_noded(self):
        # a figure-eight target keeps its own crossing; only the blade cuts
        got = split_wkt(
            "LINESTRING (0 0, 10 10, 10 0, 0 10)", "LINESTRING (20 0, 20 10)"
        )
        assert got == "GEOMETRYCOLLECTION (LINESTRING (0 0, 10 10, 10 0, 0 10))"

    def test_rational_crossing_is_exact(self):
        # crossing at x = 10/3: exact rational arithmetic, float at output
        got = split_wkt("LINESTRING (0 0, 10 0)", "LINESTRING (0 -10, 10 20)")
        g = G.parse_wkt(got.removeprefix("GEOMETRYCOLLECTION (").removesuffix(")")
                        .split("), ")[0] + ")")
        assert g.coords[-1][0] == pytest.approx(10 / 3)


class TestPolygonSplits:
    def test_full_cross_two_faces(self):
        got = split_wkt(
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))", "LINESTRING (10 -5, 10 25)"
        )
        gc = G.parse_wkt(got)
        assert len(gc.coords) == 2
        assert G.area(gc) == pytest.approx(600.0)

    def test_partial_cut_returns_whole(self):
        got = split_wkt(
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))", "LINESTRING (10 -5, 10 10)"
        )
        gc = G.parse_wkt(got)
        assert len(gc.coords) == 1
        assert G.area(gc) == pytest.approx(600.0)

    def test_hole_stays_attached_island_discarded(self):
        got = split_wkt(
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
            "LINESTRING (10 -5, 10 25)",
        )
        gc = G.parse_wkt(got)
        assert len(gc.coords) == 2
        assert G.area(gc) == pytest.approx(599.0)
        # the left face carries the hole
        assert sum(len(p.coords) for p in gc.coords) == 3  # 2 shells + 1 hole

    def test_blade_through_hole_splits_into_two_with_half_holes(self):
        # vertical through the hole: each face loses half the hole
        got = split_wkt(
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0), (8 8, 12 8, 12 12, 8 12, 8 8))",
            "LINESTRING (10 -5, 10 25)",
        )
        gc = G.parse_wkt(got)
        assert len(gc.coords) == 2
        assert G.area(gc) == pytest.approx(600.0 - 16.0)

    def test_multipolygon_target(self):
        got = split_wkt(
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((20 0, 30 0, 30 10, 20 10, 20 0)))",
            "LINESTRING (5 -5, 5 15)",
        )
        gc = G.parse_wkt(got)
        assert len(gc.coords) == 3
        assert G.area(gc) == pytest.approx(200.0)

    def test_unsupported_operands_null(self):
        assert split_wkt("POINT (1 1)", "LINESTRING (0 0, 2 2)") is None
        assert (
            split_wkt(
                "LINESTRING (0 0, 30 0)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
            )
            is None
        )
        assert split_wkt("nonsense", "POINT (0 0)") is None
        assert split_wkt(None, "POINT (0 0)") is None
        # non-finite coordinates on either side stay loud NULL
        assert split_wkt("LINESTRING (0 0, inf 1)", "POINT (1 0)") is None
        assert split_wkt("LINESTRING (0 0, 30 0)", "POINT (nan 0)") is None

    def test_empty_operands(self):
        assert split_wkt("POLYGON EMPTY", "LINESTRING (0 0, 1 1)") is None
        assert split_wkt("LINESTRING (0 0, 30 0)", "LINESTRING EMPTY") == (
            "GEOMETRYCOLLECTION (LINESTRING (0 0, 30 0))"
        )
        # the target gates apply before the empty-blade echo
        assert split_wkt("POINT (1 1)", "LINESTRING EMPTY") is None
        assert split_wkt("LINESTRING (0 0, inf 1)", "LINESTRING EMPTY") is None

    def test_linear_intersection_is_null(self):
        # PostGIS: 'Splitter line has linear intersection with input';
        # engine convention: loud NULL, never invented part sets
        assert split_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (10 0, 20 0)") is None
        assert (
            split_wkt(
                "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))", "LINESTRING (5 0, 25 0)"
            )
            is None
        )
        # a blade merely TOUCHING at a point is not linear: still splits
        got = split_wkt(
            "POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))", "LINESTRING (10 -5, 10 25)"
        )
        assert got is not None

    def test_fuzz_area_conservation(self):
        """Random convex-ish boxes split by random full-cross blades:
        face areas always sum to the original area."""
        rng = random.Random(13)
        for trial in range(15):
            w, h = rng.randint(5, 40), rng.randint(5, 40)
            poly = f"POLYGON ((0 0, {w} 0, {w} {h}, 0 {h}, 0 0))"
            x1, y1 = rng.randint(-5, w + 5), -3
            x2, y2 = rng.randint(-5, w + 5), h + 3
            blade = f"LINESTRING ({x1} {y1}, {x2} {y2})"
            gc = G.parse_wkt(split_wkt(poly, blade))
            assert G.area(gc) == pytest.approx(float(w * h), abs=1e-9), (
                f"trial {trial}: {poly} / {blade}"
            )


class TestSparkSurface:
    def test_sql_roundtrip(self, spark):
        row = spark.sql(
            "SELECT st_split('LINESTRING (0 0, 30 0)', 'POINT (10 0)') AS s, "
            "st_split('POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))', "
            "'LINESTRING (10 -5, 10 25)') AS p, "
            "st_split('LINESTRING (0 0, 30 0)', NULL) AS n"
        ).collect()[0]
        assert row["s"].startswith("GEOMETRYCOLLECTION (LINESTRING (0 0, 10 0)")
        assert row["p"].count("POLYGON") == 2
        assert row["n"] is None

    def test_q166_matches_duckdb_oracle(self, spark, oracle):
        from conftest import SF_DIR, assert_parity

        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.split_ops import (
            _Q166_ORACLE,
            q166_st_split,
        )

        assert_parity(q166_st_split(spark, SF_DIR), oracle, _Q166_ORACLE, "q166")


class TestSharedPaths:
    """ST_SharedPaths: collinear shared linework bucketed by direction,
    PostGIS GEOMETRYCOLLECTION(two MULTILINESTRINGs) shape."""

    def test_same_and_opposite_buckets(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        assert shared_paths_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (5 0, 20 0)") == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 20 0)), "
            "MULTILINESTRING EMPTY)"
        )
        assert shared_paths_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (20 0, 5 0)") == (
            "GEOMETRYCOLLECTION (MULTILINESTRING EMPTY, "
            "MULTILINESTRING ((5 0, 20 0)))"
        )

    def test_disjoint_parallel_and_crossing_share_nothing(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        empty = "GEOMETRYCOLLECTION (MULTILINESTRING EMPTY, MULTILINESTRING EMPTY)"
        assert shared_paths_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (0 5, 30 5)") == empty
        assert shared_paths_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (10 -5, 10 5)") == empty
        # touching at one point is a 0-dimensional intersection: nothing shared
        assert shared_paths_wkt("LINESTRING (0 0, 30 0)", "LINESTRING (30 0, 40 0)") == empty

    def test_overlapping_second_segments_union_not_double(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        got = shared_paths_wkt(
            "LINESTRING (0 0, 30 0)", "MULTILINESTRING ((5 0, 15 0), (10 0, 20 0))"
        )
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 20 0)), "
            "MULTILINESTRING EMPTY)"
        )

    def test_chains_stitch_across_target_vertices(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        got = shared_paths_wkt("LINESTRING (0 0, 10 0, 20 0)", "LINESTRING (5 0, 15 0)")
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 10 0, 15 0)), "
            "MULTILINESTRING EMPTY)"
        )

    def test_mixed_buckets_and_rational_overlap(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        got = shared_paths_wkt(
            "LINESTRING (0 0, 30 0)", "MULTILINESTRING ((5 0, 10 0), (25 0, 20 0))"
        )
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 10 0)), "
            "MULTILINESTRING ((20 0, 25 0)))"
        )
        assert shared_paths_wkt("LINESTRING (0 0, 3 3)", "LINESTRING (1 1, 2 2)") == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((1 1, 2 2)), "
            "MULTILINESTRING EMPTY)"
        )

    def test_non_lineal_and_empty_are_null(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        assert shared_paths_wkt("POINT (1 1)", "LINESTRING (0 0, 2 2)") is None
        assert shared_paths_wkt("LINESTRING (0 0, 30 0)", "LINESTRING EMPTY") is None
        assert shared_paths_wkt("LINESTRING (0 0, inf 0)", "LINESTRING (0 0, 1 0)") is None
        assert shared_paths_wkt(None, "LINESTRING (0 0, 1 0)") is None

    def test_sql_surface(self, spark):
        row = spark.sql(
            "SELECT st_sharedpaths('LINESTRING (0 0, 30 0)', "
            "'LINESTRING (5 0, 20 0)') AS sp"
        ).collect()[0]
        assert row["sp"].startswith("GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 20 0))")

    def test_merge_handles_forks_rings_and_cycles(self):
        # r11 review: the chain stitcher must survive lollipops (tail +
        # loop: no hang), forks (no dropped branch), fully-shared rings
        # (emitted once), and convergences (no duplicated linework)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        lolli = "MULTILINESTRING ((-1 0, 0 0), (0 0, 1 0, 1 1, 0 0))"
        assert shared_paths_wkt(lolli, lolli) == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((-1 0, 0 0), "
            "(0 0, 1 0, 1 1, 0 0)), MULTILINESTRING EMPTY)"
        )
        fork = "MULTILINESTRING ((0 0, 5 0, 10 0), (5 0, 5 5))"
        assert shared_paths_wkt(fork, fork) == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((0 0, 5 0), (5 0, 5 5), "
            "(5 0, 10 0)), MULTILINESTRING EMPTY)"
        )
        ring = "LINESTRING (0 0, 1 0, 1 1, 0 0)"
        assert shared_paths_wkt(ring, ring) == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((0 0, 1 0, 1 1, 0 0)), "
            "MULTILINESTRING EMPTY)"
        )
        conv = "MULTILINESTRING ((0 0, 5 0, 10 0), (5 1, 5 0))"
        assert shared_paths_wkt(conv, conv) == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((0 0, 5 0), (5 0, 10 0), "
            "(5 1, 5 0)), MULTILINESTRING EMPTY)"
        )


class TestSharedPathsBothDirections:
    """ADVICE r11: a span the second input traverses in BOTH directions
    must be reported once (same-direction bucket), never double-covered
    across buckets — the documented engine convention."""

    def test_out_and_back_single_report(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        got = shared_paths_wkt(
            "LINESTRING (0 0, 30 0)", "LINESTRING (5 0, 20 0, 5 0)"
        )
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 20 0)), "
            "MULTILINESTRING EMPTY)"
        )

    def test_partial_backtrack_same_wins(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        # forward covers [5,20], backtrack covers [10,20]: the overlap
        # stays in the same bucket only
        got = shared_paths_wkt(
            "LINESTRING (0 0, 30 0)", "LINESTRING (5 0, 20 0, 10 0)"
        )
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 20 0)), "
            "MULTILINESTRING EMPTY)"
        )

    def test_opposite_remainder_survives_subtraction(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.split import (
            shared_paths_wkt,
        )

        # same covers [5,10]; opposite covers [2,15] -> remainder
        # [2,5] + [10,15] stays opposite
        got = shared_paths_wkt(
            "LINESTRING (0 0, 30 0)",
            "MULTILINESTRING ((5 0, 10 0), (15 0, 2 0))",
        )
        assert got == (
            "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 10 0)), "
            "MULTILINESTRING ((2 0, 5 0), (10 0, 15 0)))"
        )
