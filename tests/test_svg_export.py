"""ST_AsSVG / ST_AsLatLonText (functions/svg_export.py)."""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    svg_export as V,
)


def test_svg_postgis_doc_examples():
    # the PostGIS manual's own examples
    assert (
        V.as_svg("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))", 0, 15)
        == "M 0 0 L 0 -1 1 -1 1 0 Z"
    )
    assert (
        V.as_svg("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))", 1, 15)
        == "M 0 0 l 0 -1 1 0 0 1 z"
    )
    assert V.as_svg("LINESTRING (0 0, 1 1)", 0, 15) == "M 0 0 L 1 -1"
    assert (
        V.as_svg("POINT (-71.064544 42.28787)", 0, 15)
        == 'cx="-71.064544" cy="-42.28787"'
    )


def test_svg_shapes_and_separators():
    assert V.as_svg("POINT (1 2)", 1, 15) == 'x="1" y="-2"'
    # MultiPoint members joined by ',', collections by ';'
    assert (
        V.as_svg("MULTIPOINT (1 2, 3 4)", 0, 15)
        == 'cx="1" cy="-2",cx="3" cy="-4"'
    )
    assert (
        V.as_svg(
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))", 0, 15
        )
        == 'cx="1" cy="-2";M 0 0 L 1 -1'
    )
    # holed polygon: one subpath per ring
    out = V.as_svg(
        "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        0,
        15,
    )
    assert out.count("M ") == 2 and out.count("Z") == 2


def test_svg_digits_and_gates():
    assert V.as_svg("POINT (-71.064544 42.28787)", 1, 3) == 'x="-71.065" y="-42.288"'
    assert V.as_svg("POINT (1.5 2)", 0, 0) == 'cx="2" cy="-2"'  # round half-even
    assert V.as_svg("POINT EMPTY", 0, 15) == ""
    assert V.as_svg("POLYGON EMPTY", 0, 15) == ""
    assert V.as_svg("junk", 0, 15) is None
    assert V.as_svg("POINT (1 2)", 2, 15) is None  # rel ∉ {0, 1}
    assert V.as_svg("POINT (1 2)", 0, -1) is None
    assert V.as_svg("POINT (1 2)", 0, 16) is None
    assert V.as_svg("POINT (1 2)", None, 15) is None
    assert V.as_svg("POINT (inf 2)", 0, 15) is None
    assert V.as_svg(None, 0, 15) is None


def test_latlon_postgis_doc_example():
    # the PostGIS manual's default-format example
    assert (
        V.as_latlon_text("POINT (-3.2342342 -2.32498)", "")
        == "2°19'29.928\"S 3°14'3.243\"W"
    )
    assert (
        V.as_latlon_text("POINT (-3.2342342 -2.32498)", None)
        == "2°19'29.928\"S 3°14'3.243\"W"
    )


def test_latlon_formats():
    p = "POINT (-3.2342342 -2.32498)"
    assert V.as_latlon_text(p, "D.DDDD degrees C") == (
        "2.3250 degrees S 3.2342 degrees W"
    )
    # no C → signed; seconds round at the displayed resolution
    assert V.as_latlon_text(p, 'DD°MM\'SS"') == "-02°19'30\" -03°14'03\""
    # rounding carries cleanly through the integer decomposition
    assert (
        V.as_latlon_text("POINT (0.9999999 59.9999999)", "D°M'S.SS\"C")
        == "60°0'0.00\"N 1°0'0.00\"E"
    )


def test_latlon_normalization_and_gates():
    # lon wraps into [-180, 180)
    assert V.as_latlon_text("POINT (-302.2342342 -1.3234)", "") == (
        "1°19'24.240\"S 57°45'56.757\"E"
    )
    # lat clamps
    assert V.as_latlon_text("POINT (0 95)", "D C").startswith("90 N")
    assert V.as_latlon_text("LINESTRING (0 0, 1 1)", "") is None
    assert V.as_latlon_text("junk", "") is None
    assert V.as_latlon_text(None, "") is None
    assert V.as_latlon_text("POINT (nan 2)", "") is None


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT st_assvg('LINESTRING (0 0, 1 1)', 0, 15) AS svg,"
        " st_aslatlontext('POINT (-3.2342342 -2.32498)', '') AS llt"
    ).collect()[0]
    assert row["svg"] == "M 0 0 L 1 -1"
    assert row["llt"] == "2°19'29.928\"S 3°14'3.243\"W"
