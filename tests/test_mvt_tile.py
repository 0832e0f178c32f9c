"""ST_AsMVT layer/tile assembly (functions/mvt_tile.py, r15): the
geometry command streams against the vector-tile-spec 2.1 README's
published examples, varint/zigzag primitives, value dedup, and the
full-tile byte layout decoded field by field."""

from __future__ import annotations

import struct

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    mvt_tile as T,
)


class TestPrimitives:
    def test_varint(self):
        assert T._varint(0) == b"\x00"
        assert T._varint(1) == b"\x01"
        assert T._varint(127) == b"\x7f"
        assert T._varint(128) == b"\x80\x01"
        assert T._varint(4096) == b"\x80\x20"
        # proto int64: negative → 10-byte two's complement
        assert len(T._varint(-1)) == 10

    def test_zigzag(self):
        # the spec's published pairs
        assert [T._zigzag(v) for v in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
        assert T._zigzag(-5) == 9
        assert T._zigzag(25) == 50


class TestGeometryCommands:
    """Examples from the vector-tile-spec 2.1 README §4.3.5 (public)."""

    def geom(self, wkt):
        t, cmds = T._geom_commands(G.parse_wkt(wkt))
        return t, cmds

    def test_point(self):
        # MoveTo(25, 17) → [9, 50, 34], type POINT = 1
        assert self.geom("POINT (25 17)") == (1, [9, 50, 34])

    def test_multipoint(self):
        # MoveTo(5,7), MoveTo(3,2) → [17, 10, 14, 3, 9]
        assert self.geom("MULTIPOINT (5 7, 3 2)") == (2 - 1, [17, 10, 14, 3, 9])

    def test_linestring(self):
        # (2,2)→(2,10)→(10,10) → [9, 4, 4, 18, 0, 16, 16, 0], type 2
        assert self.geom("LINESTRING (2 2, 2 10, 10 10)") == (
            2, [9, 4, 4, 18, 0, 16, 16, 0],
        )

    def test_multilinestring(self):
        # spec: (2,2)-(2,10)-(10,10) then (1,1)-(3,5)
        assert self.geom("MULTILINESTRING ((2 2, 2 10, 10 10), (1 1, 3 5))") == (
            2, [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8],
        )

    def test_polygon(self):
        # spec: ring (3,6)-(8,12)-(20,34) closed → [9,6,12,18,10,12,24,44,15]
        assert self.geom("POLYGON ((3 6, 8 12, 20 34, 3 6))") == (
            3, [9, 6, 12, 18, 10, 12, 24, 44, 15],
        )

    def test_geometrycollection_refused(self):
        assert T._geom_commands(
            G.parse_wkt("GEOMETRYCOLLECTION (POINT (1 1))")
        ) is None


def _read_varint(b, pos):
    out = shift = 0
    while True:
        v = b[pos]
        pos += 1
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            return out, pos
        shift += 7


def _fields(b):
    """[(field, wire, value_or_bytes)] of a protobuf message."""
    pos, out = 0, []
    while pos < len(b):
        key, pos = _read_varint(b, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = _read_varint(b, pos)
        elif wire == 1:
            v = b[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(b, pos)
            v = b[pos:pos + ln]
            pos += ln
        else:
            raise AssertionError(f"unexpected wire {wire}")
        out.append((field, wire, v))
    return out


class TestTile:
    def tile(self):
        return T.encode_tile(
            [
                ("POINT (25 17)", 7, [("name", "alpha"), ("rank", 3)]),
                ("LINESTRING (2 2, 2 10, 10 10)", 8, [("name", "beta")]),
            ],
            "roads",
            4096,
        )

    def test_layout_decodes(self):
        tile = self.tile()
        (top,) = _fields(tile)
        assert top[0] == 3 and top[1] == 2  # Tile.layers
        layer = _fields(top[2])
        by_field = {}
        for f, _, v in layer:
            by_field.setdefault(f, []).append(v)
        assert by_field[15] == [2]  # version
        assert by_field[1] == [b"roads"]
        assert by_field[5] == [4096]  # extent
        assert by_field[3] == [b"name", b"rank"]  # keys, first-seen
        vals = [_fields(v) for v in by_field[4]]
        assert vals[0] == [(1, 2, b"alpha")]  # string value
        assert vals[1] == [(4, 0, 3)]  # int value
        assert vals[2] == [(1, 2, b"beta")]
        feats = [_fields(f) for f in by_field[2]]
        f0 = dict((f, v) for f, _, v in feats[0])
        assert f0[1] == 7  # id
        assert list(f0[2]) == [0, 0, 1, 1]  # tags: name→alpha, rank→3
        assert f0[3] == 1  # POINT
        assert list(f0[4]) == [9, 50, 34]
        f1 = dict((f, v) for f, _, v in feats[1])
        assert f1[1] == 8 and f1[3] == 2
        assert list(f1[4]) == [9, 4, 4, 18, 0, 16, 16, 0]

    def test_value_dedup(self):
        tile = T.encode_tile(
            [
                ("POINT (1 1)", 1, [("k", "same")]),
                ("POINT (2 2)", 2, [("k", "same")]),
            ],
            "l",
            256,
        )
        (top,) = _fields(tile)
        by_field = {}
        for f, _, v in _fields(top[2]):
            by_field.setdefault(f, []).append(v)
        assert len(by_field[4]) == 1  # one shared value slot
        assert len(by_field[3]) == 1  # one shared key

    def test_value_types(self):
        tile = T.encode_tile(
            [("POINT (1 1)", None, [
                ("s", "x"), ("i", 5), ("neg", -3), ("d", 1.5), ("b", True),
                ("skip", None),
            ])],
            "l",
            256,
        )
        (top,) = _fields(tile)
        by_field = {}
        for f, _, v in _fields(top[2]):
            by_field.setdefault(f, []).append(v)
        vals = [_fields(v)[0] for v in by_field[4]]
        assert vals[0] == (1, 2, b"x")
        assert vals[1] == (4, 0, 5)
        assert vals[2] == (6, 0, T._zigzag(-3))
        assert vals[3] == (3, 1, struct.pack("<d", 1.5))
        assert vals[4] == (7, 0, 1)
        assert by_field[3] == [b"s", b"i", b"neg", b"d", b"b"]  # no 'skip'

    def test_loud_nulls(self):
        assert T.encode_tile([], "l", 256) is None
        assert T.encode_tile([("junk((", None, [])], "l", 256) is None
        assert T.encode_tile([(None, None, [])], "l", 256) is None
        assert T.encode_tile(
            [("GEOMETRYCOLLECTION (POINT (1 1))", None, [])], "l", 256
        ) is None
        assert T.encode_tile(
            [("POINT (1 1)", None, [("d", float("nan"))])], "l", 256
        ) is None
        assert T.encode_tile([("POINT (1 1)", -1, [])], "l", 256) is None

    def test_asmvt_adapter(self):
        rows = [
            {"geom": "POINT (25 17)", "id": 7,
             "attrs": {"name": "alpha"}, "nattrs": {"rank": 3}},
        ]
        direct = T.encode_tile(
            [("POINT (25 17)", 7, [("name", "alpha"), ("rank", 3)])],
            "roads", 4096,
        )
        assert T.asmvt_of(rows, "roads", 4096) == direct
        assert T.asmvt_of(None, "roads", 4096) is None
        assert T.asmvt_of(rows, None, 4096) is None
        assert T.asmvt_of(rows, "roads", 0) is None
        # NULL extent → the spec default 4096
        assert T.asmvt_of(rows, "roads", None) == direct
