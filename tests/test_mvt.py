"""ST_AsMVTGeom (functions/mvt.py): grid transform, Y flip, MVT
winding, clip, degeneration and gate behavior."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import mvt as V
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.union_ops import (
    _signed_area_ring,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G

B = "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))"


def test_point_transform_and_y_flip():
    assert V.asmvtgeom_wkt("POINT (10 10)", B, 4096, 256, True) == (
        "POINT (1024 3072)"
    )
    # top-left of the tile maps to the MVT origin
    assert V.asmvtgeom_wkt("POINT (0 40)", B, 4096, 256, True) == "POINT (0 0)"


def test_polygon_winding_is_cw_after_flip():
    w = V.asmvtgeom_wkt(
        "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))", B, 4096, 0, True
    )
    g = G.parse_wkt(w)
    assert g.kind == "Polygon"
    assert _signed_area_ring(list(g.coords[0])) < 0  # CW shell (MVT spec)


def test_clip_to_buffered_tile():
    assert V.asmvtgeom_wkt(
        "LINESTRING (20 20, 60 20)", B, 4096, 0, True
    ) == "LINESTRING (2048 2048, 4096 2048)"
    # buffer extends the clip square
    w = V.asmvtgeom_wkt("LINESTRING (20 20, 60 20)", B, 4096, 256, True)
    assert w == "LINESTRING (2048 2048, 4352 2048)"
    # outside entirely → NULL; clip=false passes through
    assert V.asmvtgeom_wkt("POINT (100 100)", B, 4096, 256, True) is None
    assert V.asmvtgeom_wkt("POINT (100 100)", B, 4096, 256, False) == (
        "POINT (10240 -6144)"
    )


def test_degeneration_is_null():
    # a feature smaller than one grid cell rounds away
    assert V.asmvtgeom_wkt(
        "LINESTRING (10 10, 10.001 10.001)", B, 4096, 0, True
    ) is None
    # a polygon clipped down to an edge-touch sliver drops dimension
    assert V.asmvtgeom_wkt(
        "POLYGON ((40 0, 50 0, 50 40, 40 40, 40 0))", B, 4096, 0, True
    ) is None


def test_gates():
    assert V.asmvtgeom_wkt("POINT (nan 0)", B, 4096, 0, True) is None
    assert V.asmvtgeom_wkt(
        "POINT (1 1)", "POLYGON ((0 0, 0 0, 0 0, 0 0))", 4096, 0, True
    ) is None  # zero-extent bounds
    assert V.asmvtgeom_wkt("POINT (1 1)", B, 0, 0, True) is None
    assert V.asmvtgeom_wkt("POINT (1 1)", B, 4096.5, 0, True) is None
    assert V.asmvtgeom_wkt("POINT (1 1)", B, 4096, -1, True) is None
    assert V.asmvtgeom_wkt("POINT EMPTY", B, 4096, 0, True) is None
    assert V.asmvtgeom_wkt("junk", B, 4096, 0, True) is None
    assert V.asmvtgeom_wkt(None, B, 4096, 0, True) is None
    assert V.asmvtgeom_wkt("POINT (1 1)", None, 4096, 0, True) is None
    assert V.asmvtgeom_wkt("POINT (1 1)", "junk", 4096, 0, True) is None


def test_multipolygon_and_collection():
    w = V.asmvtgeom_wkt(
        "MULTIPOLYGON (((10 10, 20 10, 20 20, 10 20, 10 10)),"
        " ((25 25, 35 25, 35 35, 25 35, 25 25)))",
        B, 4096, 0, True,
    )
    g = G.parse_wkt(w)
    assert g.kind in ("MultiPolygon", "Polygon")
    mp = V.asmvtgeom_wkt("MULTIPOINT (10 10, 30 30)", B, 4096, 0, True)
    assert mp == "MULTIPOINT (1024 3072, 3072 1024)"


# ---- code-review r14 (third pass) regressions -----------------------------


def test_collapsed_line_is_null_without_clip_too():
    assert V.asmvtgeom_wkt(
        "LINESTRING (10 10, 10.001 10.001)", B, 4096, 0, False
    ) is None


def test_collapsed_part_drops_but_survivors_stay():
    # PostGIS drops only the sub-pixel part, not the whole geometry
    w = V.asmvtgeom_wkt(
        "MULTIPOLYGON (((10 10, 30 10, 30 30, 10 30, 10 10)),"
        " ((5 5, 5.001 5, 5.001 5.001, 5 5.001, 5 5)))",
        B, 4096, 0, True,
    )
    g = G.parse_wkt(w)
    assert g.kind == "MultiPolygon" and len(g.coords) == 1
    ml = V.asmvtgeom_wkt(
        "MULTILINESTRING ((10 10, 30 10), (5 5, 5.001 5))", B, 4096, 0, True
    )
    assert G.parse_wkt(ml).kind == "MultiLineString"


def test_kind_does_not_depend_on_clip_flag():
    mp = "MULTIPOINT (10 10, 30 30)"
    a = V.asmvtgeom_wkt(mp, B, 4096, 0, True)
    c = V.asmvtgeom_wkt(mp, B, 4096, 0, False)
    assert G.parse_wkt(a).kind == G.parse_wkt(c).kind == "MultiPoint"
    gc = "GEOMETRYCOLLECTION (POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10)))"
    a = V.asmvtgeom_wkt(gc, B, 4096, 0, True)
    c = V.asmvtgeom_wkt(gc, B, 4096, 0, False)
    assert G.parse_wkt(a).kind == G.parse_wkt(c).kind == "GeometryCollection"
