"""Single-cell constructors / orientation predicates / longitude shift
(functions/cells.py)."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import cells as C
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.grids import (
    hexagon_grid,
)

CCW_BOX = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
CW_BOX = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
# CW shell with a CW hole (both wound the same way — mis-oriented)
CW_HOLED_BAD = (
    "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"
)


def test_square_cell_exact():
    assert C.square_cell_wkt(10, 3, 4) == (
        "POLYGON ((30 40, 40 40, 40 50, 30 50, 30 40))"
    )
    assert C.square_cell_wkt(10, -1, 0) == (
        "POLYGON ((-10 0, 0 0, 0 10, -10 10, -10 0))"
    )


def test_square_gates():
    assert C.square_cell_wkt(None, 0, 0) is None
    assert C.square_cell_wkt(0, 0, 0) is None
    assert C.square_cell_wkt(-5, 0, 0) is None
    assert C.square_cell_wkt(float("nan"), 0, 0) is None
    assert C.square_cell_wkt(10, None, 0) is None
    assert C.square_cell_wkt(10, float("nan"), 0) is None
    assert C.square_cell_wkt(10, 2**40, 0) is None


def test_hexagon_matches_grid_cell_identity():
    # every cell the grid emits must be reconstructable standalone
    cells = hexagon_grid(5.0, "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")
    standalone = {
        C.hexagon_cell_wkt(5.0, i, j) for i in range(-2, 5) for j in range(-2, 5)
    }
    for w in cells:
        assert w in standalone


def test_hexagon_origin_cell():
    w = C.hexagon_cell_wkt(2.0, 0, 0)
    # flat-top hexagon centered at the origin, circumradius 2
    assert w.startswith("POLYGON ((2 0, ")
    assert "-2 0" in w


def test_is_polygon_cw_ccw():
    assert C._is_oriented(CCW_BOX, shell_ccw=True) is True
    assert C._is_oriented(CCW_BOX, shell_ccw=False) is False
    assert C._is_oriented(CW_BOX, shell_ccw=False) is True
    # CW shell + CW hole: holes must be opposite for IsPolygonCW
    assert C._is_oriented(CW_HOLED_BAD, shell_ccw=False) is False
    # CW shell + CCW hole passes
    fixed = (
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    assert C._is_oriented(fixed, shell_ccw=False) is True


def test_orientation_vacuous_and_degenerate():
    assert C._is_oriented("POINT (1 2)", shell_ccw=True) is True
    assert C._is_oriented("LINESTRING (0 0, 1 1)", shell_ccw=False) is True
    assert C._is_oriented("POLYGON EMPTY", shell_ccw=True) is True
    # zero-area ring satisfies either orientation
    degenerate = "POLYGON ((0 0, 5 0, 0 0, 5 0, 0 0))"
    assert C._is_oriented(degenerate, shell_ccw=True) is True
    assert C._is_oriented(degenerate, shell_ccw=False) is True
    assert C._is_oriented("junk", shell_ccw=True) is None
    assert C._is_oriented(None, shell_ccw=True) is None


def test_multipolygon_and_collection_orientation():
    mp = (
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)),"
        " ((5 5, 6 5, 6 6, 5 6, 5 5)))"
    )
    assert C._is_oriented(mp, shell_ccw=True) is True
    mixed = (
        "GEOMETRYCOLLECTION (POINT (9 9),"
        " POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))"
    )
    assert C._is_oriented(mixed, shell_ccw=False) is True
    assert C._is_oriented(mixed, shell_ccw=True) is False


def test_shiftlongitude_toggle():
    assert C.shiftlongitude_wkt("POINT (-10 5)") == "POINT (350 5)"
    assert C.shiftlongitude_wkt("POINT (190 5)") == "POINT (-170 5)"
    assert C.shiftlongitude_wkt("POINT (90 5)") == "POINT (90 5)"
    # toggle is an involution on in-convention data
    assert C.shiftlongitude_wkt(C.shiftlongitude_wkt("POINT (-10 5)")) == (
        "POINT (-10 5)"
    )
    assert C.shiftlongitude_wkt(
        "LINESTRING (-170 0, 170 0)"
    ) == "LINESTRING (190 0, 170 0)"
    assert C.shiftlongitude_wkt("POINT EMPTY") == "POINT EMPTY"
    assert C.shiftlongitude_wkt("junk") is None
    assert C.shiftlongitude_wkt(None) is None
