"""ST_Transform (4326 ↔ 3857): known references, inverse round trip,
structure preservation, loud unsupported-pair failure."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import projection as P


def test_known_reference_point():
    # Eiffel Tower (2.2945, 48.8584) — the widely published Web-Mercator
    # coordinates for this lon/lat are (255422.57, 6250868.90).
    x, y = P._fwd(2.2945, 48.8584)
    assert abs(x - 255422.5716) < 0.01
    assert abs(y - 6250868.9015) < 0.01
    # equator/prime-meridian fixed point
    assert P._fwd(0.0, 0.0) == (0.0, 0.0)


def test_mercator_square_edges():
    # ±180° maps to ±πR; the clamp latitude maps to the same magnitude
    # (the defining property of the Web-Mercator square).
    x, _ = P._fwd(180.0, 0.0)
    assert abs(x - math.pi * P.R) < 1e-6
    _, y = P._fwd(0.0, P.MAX_LAT)
    assert abs(y - math.pi * P.R) < 1e-3
    # out-of-range latitude clamps instead of diverging
    _, y_over = P._fwd(0.0, 89.9)
    assert abs(y_over - y) < 1e-6


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
)
def test_roundtrip_inverse(lon, lat):
    x, y = P._fwd(lon, lat)
    lon2, lat2 = P._inv(x, y)
    assert abs(lon2 - lon) < 1e-9
    assert abs(lat2 - lat) < 1e-9


def test_structure_preserved():
    wkt = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), "
        "(0.2 0.2, 0.4 0.2, 0.4 0.4, 0.2 0.4, 0.2 0.2)), "
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3)), POINT (5 5))"
    )
    g = G.parse_wkt(wkt)
    t = P.transform(g, 4326, 3857)
    assert t.kind == "GeometryCollection"
    assert [s.kind for s in t.coords] == ["Polygon", "MultiLineString", "Point"]
    assert len(t.coords[0].coords) == 2  # hole preserved
    back = P.transform(t, 3857, 4326)
    for (x1, y1), (x2, y2) in zip(G._points(g), G._points(back)):
        assert abs(x1 - x2) < 1e-9 and abs(y1 - y2) < 1e-9


def test_same_srid_is_identity():
    g = G.parse_wkt("POINT (7 8)")
    assert P.transform(g, 4326, 4326) is g


def test_unsupported_pair_raises():
    with pytest.raises(ValueError, match="no transform"):
        P.transform(G.parse_wkt("POINT (0 0)"), 4326, 2154)


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT st_transform('POINT (0 0)', 4326, 3857) AS a,"
        " st_transform(CAST(NULL AS STRING), 4326, 3857) AS b"
    ).collect()[0]
    assert row["a"] == "POINT (0 0)"
    assert row["b"] is None


# -- ST_Azimuth -------------------------------------------------------------


def test_azimuth_cardinal_directions(spark):
    rows = spark.sql(
        "SELECT st_azimuth('POINT (0 0)', 'POINT (0 1)') AS north,"
        " st_azimuth('POINT (0 0)', 'POINT (1 0)') AS east,"
        " st_azimuth('POINT (0 0)', 'POINT (0 -1)') AS south,"
        " st_azimuth('POINT (0 0)', 'POINT (-1 0)') AS west,"
        " st_azimuth('POINT (0 0)', 'POINT (0 0)') AS degenerate,"
        " st_azimuth('LINESTRING (0 0, 1 1)', 'POINT (0 0)') AS nonpoint"
    ).collect()[0]
    assert rows["north"] == 0.0
    assert abs(rows["east"] - math.pi / 2) < 1e-12
    assert abs(rows["south"] - math.pi) < 1e-12
    assert abs(rows["west"] - 3 * math.pi / 2) < 1e-12
    assert rows["degenerate"] is None and rows["nonpoint"] is None
