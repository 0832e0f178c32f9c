"""TWKB codec (functions/twkb.py)."""

from __future__ import annotations

import random

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    twkb as T,
)


def test_spec_worked_examples_byte_exact():
    assert T.wkt_to_twkb("POINT (1 1)", 0).hex() == "01000202"
    assert T.wkt_to_twkb("LINESTRING (1 1, 5 5)", 0).hex() == (
        "02000202020808"
    )
    assert T.twkb_to_wkt(bytes.fromhex("01000202")) == "POINT (1 1)"
    assert T.twkb_to_wkt(bytes.fromhex("02000202020808")) == (
        "LINESTRING (1 1, 5 5)"
    )


@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (-180 80)",
        "LINESTRING (-3 2, 5 -7, 5 -7)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT (1 2, -3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((5 5, 6 5, 6 6, 5 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        "POINT Z (1 2 3)",
        "LINESTRING M (0 0 1, 2 0 5)",
        "POINT ZM (1 2 3 4)",
        "POINT EMPTY",
        "POLYGON EMPTY",
        "POINT Z EMPTY",
        "LINESTRING M EMPTY",
    ],
)
@pytest.mark.parametrize("prec", [0, 2, 5, 7])
def test_integer_roundtrip(wkt, prec):
    assert T.twkb_to_wkt(T.wkt_to_twkb(wkt, prec)) == wkt


def test_negative_precision_snaps_to_tens():
    assert (
        T.twkb_to_wkt(T.wkt_to_twkb("POINT (1234 -5678)", -2))
        == "POINT (1200 -5700)"
    )
    # -5 (half of the 10-grid) rounds away from zero
    assert (
        T.twkb_to_wkt(T.wkt_to_twkb("POINT (15 -15)", -1))
        == "POINT (20 -20)"
    )


def test_ring_closure_is_implied():
    # a polygon ring writes npoints = n - 1 (closing vertex omitted)
    enc = T.wkt_to_twkb("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 0)
    # type 3 / meta 0 / nrings 1 / npoints 4
    assert enc[:4] == bytes([0x03, 0x00, 0x01, 0x04])
    # and a buffer that DOES carry the duplicate closing point reads too
    explicit = bytes(
        [0x03, 0x00, 0x01, 0x05]
    ) + bytes([0, 0, 8, 0, 0, 8, 7, 0, 7, 7])  # deltas closing the ring
    out = T.twkb_to_wkt(explicit)
    assert out is not None and out.startswith("POLYGON")


def test_reader_skips_optional_blocks():
    # hand-build POINT(1 1) prec 0 with the size block present
    body = bytes([0x02, 0x02])
    with_size = bytes([0x01, 0x02, len(body)]) + body
    assert T.twkb_to_wkt(with_size) == "POINT (1 1)"
    # and with a bbox block (min 1, delta 0 per dim, zigzag)
    with_bbox = bytes([0x01, 0x01, 0x02, 0x00, 0x02, 0x00]) + body
    assert T.twkb_to_wkt(with_bbox) == "POINT (1 1)"


def test_strict_rejections():
    assert T.twkb_to_wkt(b"\x01\x00\x02") is None  # truncated
    assert T.twkb_to_wkt(b"\xff\x00") is None  # unknown type 15
    assert T.twkb_to_wkt(b"\x01\x00\x02\x02\x00") is None  # trailing byte
    assert T.twkb_to_wkt(None) is None
    assert T.wkt_to_twkb("junk", 0) is None
    assert T.wkt_to_twkb("POINT (1 1)", 8) is None  # nibble range
    assert T.wkt_to_twkb("POINT (1 1)", -8) is None
    assert T.wkt_to_twkb("POINT (1 1)", None) is None
    assert T.wkt_to_twkb("POINT (inf 1)", 0) is None
    assert T.wkt_to_twkb("TRIANGLE ((0 0, 1 0, 0 1, 0 0))", 0) is None


def test_fuzz_snap_idempotence():
    rng = random.Random(3)
    for _ in range(300):
        n = rng.randint(2, 6)
        pts = [
            (rng.uniform(-1e4, 1e4), rng.uniform(-1e4, 1e4))
            for _ in range(n)
        ]
        L = G.to_wkt(G.Geometry("LineString", pts))
        p = rng.randint(-3, 7)
        d1 = T.twkb_to_wkt(T.wkt_to_twkb(L, p))
        d2 = T.twkb_to_wkt(T.wkt_to_twkb(d1, p))
        assert d1 == d2
        tol = 0.5 * 10**-p + 1e-9
        for (x0, y0), (x1, y1) in zip(pts, G.parse_wkt(d1).coords):
            assert abs(x0 - x1) <= tol and abs(y0 - y1) <= tol


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT hex(st_astwkb('POINT (1 1)', 0)) AS h,"
        " st_geomfromtwkb(st_astwkb('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))',"
        " 5)) AS p"
    ).collect()[0]
    assert row["h"] == "01000202"
    assert row["p"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
