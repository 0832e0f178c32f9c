"""Encoded polyline codec (functions/polyline.py)."""

from __future__ import annotations

import random

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    polyline as P,
)

_GOOGLE_WKT = "LINESTRING (-120.2 38.5, -120.95 40.7, -126.453 43.252)"
_GOOGLE_ENC = "_p~iF~ps|U_ulLnnqC_mqNvxq`@"


def test_published_example_exact():
    # the spec's own worked example (precision 5)
    assert P.encode_polyline(_GOOGLE_WKT, 5) == _GOOGLE_ENC
    assert P.decode_polyline(_GOOGLE_ENC, 5) == _GOOGLE_WKT


def test_integer_roundtrip_every_precision():
    L = "LINESTRING (-180 -80, 30 60, 12 -7)"
    for p in (0, 1, 5, 7):
        assert P.decode_polyline(P.encode_polyline(L, p), p) == L
    # ±180 at precision 8 exceeds the signed-32-bit envelope — loud
    assert P.encode_polyline(L, 8) is None
    small = "LINESTRING (-21 -8, 3 6)"
    assert P.decode_polyline(P.encode_polyline(small, 8), 8) == small


def test_empty_and_rejections():
    assert P.encode_polyline("LINESTRING EMPTY", 5) == ""
    assert P.decode_polyline("", 5) == "LINESTRING EMPTY"
    assert P.encode_polyline("POINT (1 2)", 5) is None
    assert P.encode_polyline("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 5) is None
    assert P.encode_polyline("LINESTRING Z (0 0 1, 1 1 2)", 5) is None
    assert P.encode_polyline("LINESTRING (0 0, inf 1)", 5) is None
    assert P.encode_polyline("LINESTRING (0 0, 1 1)", 9) is None
    assert P.encode_polyline("LINESTRING (0 0, 1 1)", -1) is None
    assert P.encode_polyline("LINESTRING (0 0, 1 1)", None) is None
    assert P.encode_polyline("LINESTRING (0 0, 1 1)", 2.5) is None
    # decode strictness: dangling chunk, low char, single vertex
    assert P.decode_polyline("_p~iF", 5) is None  # lone vertex
    assert P.decode_polyline("_p~i", 5) is None  # dangling continuation
    assert P.decode_polyline("\x01bad", 5) is None
    assert P.decode_polyline(None, 5) is None


def test_negative_zero_delta_edges():
    # a vertex repeating exactly → zero deltas encode as '?' (63)
    L = "LINESTRING (5 5, 5 5)"
    enc = P.encode_polyline(L, 5)
    assert enc.endswith("??")
    assert P.decode_polyline(enc, 5) == L


def test_half_away_rounding():
    # 0.000005 at precision 5 rounds AWAY from zero (C round), both signs
    up = G.parse_wkt(
        P.decode_polyline(P.encode_polyline("LINESTRING (0.000005 0, 1 1)", 5), 5)
    )
    dn = G.parse_wkt(
        P.decode_polyline(P.encode_polyline("LINESTRING (-0.000005 0, 1 1)", 5), 5)
    )
    assert up.coords[0][0] == 1e-05
    assert dn.coords[0][0] == -1e-05


def test_fuzz_snap_idempotence():
    rng = random.Random(42)
    for _ in range(500):
        n = rng.randint(2, 10)
        pts = [
            (rng.uniform(-179, 179), rng.uniform(-85, 85)) for _ in range(n)
        ]
        L = G.to_wkt(G.Geometry("LineString", pts))
        p = rng.randint(0, 6)
        d1 = P.decode_polyline(P.encode_polyline(L, p), p)
        d2 = P.decode_polyline(P.encode_polyline(d1, p), p)
        assert d1 == d2
        g1 = G.parse_wkt(d1)
        tol = 0.5 / 10**p + 1e-12
        for (x0, y0), (x1, y1) in zip(pts, g1.coords):
            assert abs(x0 - x1) <= tol and abs(y0 - y1) <= tol


def test_sql_surface(spark):
    row = spark.sql(
        f"SELECT st_asencodedpolyline('{_GOOGLE_WKT}', 5) AS e,"
        f" st_linefromencodedpolyline('{_GOOGLE_ENC}', 5) AS d"
    ).collect()[0]
    assert row["e"] == _GOOGLE_ENC
    assert row["d"] == _GOOGLE_WKT
