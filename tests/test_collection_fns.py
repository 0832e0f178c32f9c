"""Collection family kernels (functions/collection_fns.py). Driver row
q161 pins the SQL level."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.functions.collection_fns import (
    collect_wkt,
    dumpparts_wkt,
    multi_wkt,
)


class TestCollect:
    def test_kind_promotion(self):
        assert collect_wkt("POINT (1 2)", "POINT (3 4)") == "MULTIPOINT (1 2, 3 4)"
        assert collect_wkt(
            "LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)"
        ) == "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"
        assert collect_wkt(
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))"
        ).startswith("MULTIPOLYGON (((")

    def test_mixed_and_multi_operands_wrap(self):
        assert collect_wkt("POINT (1 2)", "LINESTRING (0 0, 1 1)") == (
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        )
        # multis are NOT flattened — wrapped verbatim (PostGIS)
        assert collect_wkt("MULTIPOINT (1 2)", "POINT (3 4)") == (
            "GEOMETRYCOLLECTION (MULTIPOINT (1 2), POINT (3 4))"
        )

    def test_null_operand_echo(self):
        assert collect_wkt(None, "POINT (3 4)") == "POINT (3 4)"
        assert collect_wkt("POINT (3 4)", None) == "POINT (3 4)"
        assert collect_wkt(None, None) is None


class TestMulti:
    def test_promotion_and_idempotence(self):
        assert multi_wkt("POINT (1 2)") == "MULTIPOINT (1 2)"
        w = multi_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        assert w == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))"
        assert multi_wkt(w) == w
        assert multi_wkt("POINT EMPTY") == "MULTIPOINT EMPTY"
        assert multi_wkt(None) is None
        assert multi_wkt("junk ((") is None


class TestDumpParts:
    def test_recursive_atomic_dump(self):
        assert dumpparts_wkt(
            "GEOMETRYCOLLECTION (POINT (1 1), MULTIPOINT (2 2, 3 3))"
        ) == ["POINT (1 1)", "POINT (2 2)", "POINT (3 3)"]
        assert dumpparts_wkt("POINT (1 1)") == ["POINT (1 1)"]
        assert dumpparts_wkt("POLYGON EMPTY") == []
        assert dumpparts_wkt(None) is None
        assert dumpparts_wkt("junk ((") is None


def test_collection_through_spark(spark):
    rows = spark.sql(
        "SELECT st_collect('POINT (1 2)', 'POINT (3 4)') AS c,"
        " st_multi('LINESTRING (0 0, 1 1)') AS m,"
        " explode(st_dumpparts('MULTIPOINT (5 5, 6 6)')) AS part"
    ).collect()
    assert all(r["c"] == "MULTIPOINT (1 2, 3 4)" for r in rows)
    assert all(r["m"] == "MULTILINESTRING ((0 0, 1 1))" for r in rows)
    assert [r["part"] for r in rows] == ["POINT (5 5)", "POINT (6 6)"]


def test_collect_junk_and_empty_are_loud_nulls():
    """code-review r10: junk must not silently echo the other operand,
    and typed-EMPTY operands (unrepresentable inside a collected
    result in this WKT model) are a documented loud NULL."""
    assert collect_wkt("junk ((", "POINT (3 4)") is None
    assert collect_wkt("POINT (3 4)", "junk ((") is None
    assert collect_wkt("POINT EMPTY", "POINT (3 4)") is None
    assert collect_wkt("POINT EMPTY", "POINT EMPTY") is None


class TestShapeTools:
    """r13: ST_CollectionExtract / ST_CollectionHomogenize / ST_Points /
    ST_BoundingDiagonal."""

    def test_sql_surface(self, spark):
        gc = (
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 5 0),"
            " POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), MULTIPOINT (9 9, 8 8))"
        )
        row = spark.sql(
            f"SELECT st_collectionextract('{gc}', 1) AS p,"
            f" st_collectionextract('{gc}', 2) AS l,"
            f" st_collectionextract('{gc}', 3) AS a,"
            f" st_collectionextract('{gc}', 4) AS bad,"
            f" st_collectionextract('POINT (1 1)', 3) AS none,"
            " st_collectionhomogenize('MULTIPOINT (1 1)') AS single,"
            " st_collectionhomogenize('GEOMETRYCOLLECTION (POINT (1 1),"
            " MULTIPOINT (2 2, 3 3))') AS merged,"
            " st_points('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS pts,"
            " st_boundingdiagonal('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS bd,"
            " st_boundingdiagonal('POINT (3 4)') AS bdp"
        ).collect()[0]
        assert row["p"] == "MULTIPOINT (1 2, 9 9, 8 8)"
        assert row["l"] == "MULTILINESTRING ((0 0, 5 0))"
        assert row["a"] == "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))"
        assert row["bad"] is None
        assert row["none"] == "MULTIPOLYGON EMPTY"
        assert row["single"] == "POINT (1 1)"
        assert row["merged"] == "MULTIPOINT (1 1, 2 2, 3 3)"
        assert row["pts"] == "MULTIPOINT (0 0, 2 0, 2 2, 0 2, 0 0)"
        assert row["bd"] == "LINESTRING (0 0, 2 2)"
        assert row["bdp"] == "LINESTRING (3 4, 3 4)"

    def test_homogenize_collapses_nested_singleton(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.collection_fns import (
            collectionhomogenize_wkt,
        )

        got = collectionhomogenize_wkt(
            "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))))"
        )
        assert got == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"

    def test_homogenize_mixed_kinds_bucket_into_multis(self):
        # PostGIS lwhomogenize.c (VERDICT r13 item 1): mixed kinds come
        # back GROUPED by kind into MULTI*s, in type-number order —
        # points, then lines, then polygons — not as a flat GC
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.collection_fns import (
            collectionhomogenize_wkt,
        )

        got = collectionhomogenize_wkt(
            "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (2 2, 3 3),"
            " POLYGON ((0 0, 1 0, 1 1, 0 0)), MULTIPOINT (5 5, 6 6))"
        )
        assert got == (
            "GEOMETRYCOLLECTION (MULTIPOINT (1 1, 5 5, 6 6),"
            " LINESTRING (2 2, 3 3), POLYGON ((0 0, 1 0, 1 1, 0 0)))"
        )
        # a single member of one kind stays bare inside the GC; buckets
        # reorder to type-number order even against input order
        got = collectionhomogenize_wkt(
            "GEOMETRYCOLLECTION (LINESTRING (2 2, 3 3), POINT (1 1))"
        )
        assert got == "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (2 2, 3 3))"

    def test_homogenize_typed_empty_echoes(self):
        # ADVICE r13: echo the typed EMPTY like the sibling shape tools
        # (points_wkt/boundingdiagonal_wkt), not a loud NULL
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.collection_fns import (
            collectionhomogenize_wkt,
        )

        assert collectionhomogenize_wkt("POINT EMPTY") == "POINT EMPTY"
        assert collectionhomogenize_wkt("MULTIPOINT EMPTY") == "MULTIPOINT EMPTY"
        assert (
            collectionhomogenize_wkt("GEOMETRYCOLLECTION EMPTY")
            == "GEOMETRYCOLLECTION EMPTY"
        )


def test_collectionextract_atomic_and_multi_passthrough(spark):
    # PostGIS 3.x: non-collection inputs of the matching type come back
    # UNCHANGED (review r13), not re-wrapped
    row = spark.sql(
        "SELECT st_collectionextract('POINT (1 1)', 1) AS p,"
        " st_collectionextract('MULTILINESTRING ((0 0, 1 1))', 2) AS ml,"
        " st_collectionextract('MULTIPOINT (1 1, 2 2)', 2) AS miss"
    ).collect()[0]
    assert row["p"] == "POINT (1 1)"
    assert row["ml"] == "MULTILINESTRING ((0 0, 1 1))"
    assert row["miss"] == "MULTILINESTRING EMPTY"
