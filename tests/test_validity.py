"""ST_IsValid / ST_IsValidReason / ST_IsValidDetail (functions/validity.py)."""



class TestIsValidDetail:
    """r16: reason + witness location ('<reason>[x y]', the PostGIS
    bracketed print format; independent witness scan)."""

    def test_crossing_witnesses(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            validity as V,
        )

        assert V.isvaliddetail_wkt(
            "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"
        ) == "Self-intersection[2 2]"
        # hole edge properly crossing the shell edge
        out = V.isvaliddetail_wkt(
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0),"
            " (1 1, 3 1, 3 5, 1 5, 1 1))"
        )
        assert out.startswith("Self-intersection[") and out.endswith("]")
        # the multipolygon member's witness surfaces
        assert V.isvaliddetail_wkt(
            "MULTIPOLYGON (((0 0, 4 4, 4 0, 0 4, 0 0)))"
        ) == "Self-intersection[2 2]"

    def test_valid_null_and_reason_only(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            validity as V,
        )

        assert V.isvaliddetail_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))") == (
            "Valid Geometry"
        )
        assert V.isvaliddetail_wkt("POLYGON EMPTY") == "Valid Geometry"
        assert V.isvaliddetail_wkt("junk((") is None
        assert V.isvaliddetail_wkt(None) is None
        # a revisited vertex (self-touch) witnesses at the vertex
        out = V.isvaliddetail_wkt(
            "POLYGON ((0 0, 4 0, 2 2, 4 4, 0 4, 0 0, 2 2, 0 0))"
        )
        assert out is not None and "[" in out

    def test_detail_agrees_with_reason(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
            validity as V,
        )

        for w in [
            "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        ]:
            detail = V.isvaliddetail_wkt(w)
            reason = V.isvalidreason_wkt(w)
            assert detail.split("[")[0] == reason

    def test_sql_surface(self, spark):
        row = spark.sql(
            "SELECT st_isvaliddetail('POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))')"
            " AS d, st_isvaliddetail(NULL) AS n"
        ).collect()[0]
        assert row["d"] == "Self-intersection[2 2]" and row["n"] is None
