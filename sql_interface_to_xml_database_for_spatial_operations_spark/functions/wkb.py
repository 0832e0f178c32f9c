"""WKB codec: ST_AsBinary / ST_GeomFromWKB over the engine's WKT model.

The reference's PostGIS leg speaks WKB natively (every PostGIS function
the reference forwards through src/index.ts:44-63 sits on WKB-backed
geometry), and binary interchange is the engine's multimodal stance
(opaque ``binary`` columns + typed codecs, operators/multimodal.py).
This module implements the OGC "Well-Known Binary" layout (Simple
Features Access §8 — the published, public format): 1 byte byte-order
(0 = big / XDR, 1 = little / NDR), uint32 geometry type (Point=1,
LineString=2, Polygon=3, MultiPoint=4, MultiLineString=5,
MultiPolygon=6, GeometryCollection=7), then type-specific payload;
Multi*/collection members are full nested WKBs with their own headers.

Encoding always emits little-endian (like PostGIS on x86); decoding
honors either byte-order flag, per element, including mixed-endian
nested members. Truncated / malformed buffers decode to NULL (the
registry-wide null-safety convention, tests/test_udf_null_safety.py).

Scale: both directions are Arrow-vectorized pandas UDFs — map-only,
no shuffle; ``struct`` packing is pure CPython over small per-row
buffers. 2D only (no Z/M, no EWKB SRID flag), matching the rest of the
engine's 2-D WKT model; an EWKB flag byte is rejected as malformed
rather than misread.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType

from . import geometry as G
from .geometry import Geometry

_KIND_CODE = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_CODE_KIND = {v: k for k, v in _KIND_CODE.items()}


def geom_to_wkb(g: Geometry) -> bytes:
    """Little-endian WKB of a parsed geometry."""
    code = _KIND_CODE[g.kind]
    head = struct.pack("<BI", 1, code)
    if g.kind == "Point":
        return head + struct.pack("<2d", g.coords[0], g.coords[1])
    if g.kind == "LineString":
        pts = g.coords
        return head + struct.pack("<I", len(pts)) + b"".join(
            struct.pack("<2d", x, y) for x, y in pts
        )
    if g.kind == "Polygon":
        out = [head, struct.pack("<I", len(g.coords))]
        for ring in g.coords:
            out.append(struct.pack("<I", len(ring)))
            out.extend(struct.pack("<2d", x, y) for x, y in ring)
        return b"".join(out)
    # Multi* / collection: nested full WKBs
    if g.kind == "MultiPoint":
        members = [Geometry("Point", p) for p in g.coords]
    elif g.kind == "MultiLineString":
        members = [Geometry("LineString", line) for line in g.coords]
    elif g.kind == "MultiPolygon":
        members = [Geometry("Polygon", rings) for rings in g.coords]
    else:  # GeometryCollection
        members = g.coords
    return head + struct.pack("<I", len(members)) + b"".join(
        geom_to_wkb(m) for m in members
    )


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, fmt: str):
        size = struct.calcsize(fmt)
        if self.pos + size > len(self.buf):
            raise ValueError("truncated WKB")
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return vals


_MAX_COUNT = 10_000_000  # sanity bound: rejects garbage counts early
_MAX_DEPTH = 32  # nesting cap: a ~9 KB buffer of nested collection
# headers would otherwise recurse past Python's limit and crash the
# task instead of NULLing the row (code-review r7)


def _read_geom(r: _Reader, depth: int = 0) -> Geometry:
    if depth > _MAX_DEPTH:
        raise ValueError("nesting too deep")
    (order,) = r.take("B")
    if order == 0:
        e = ">"
    elif order == 1:
        e = "<"
    else:
        raise ValueError(f"bad byte order {order}")
    (code,) = r.take(e + "I")
    kind = _CODE_KIND.get(code)
    if kind is None:  # includes EWKB Z/M/SRID-flagged types
        raise ValueError(f"unsupported geometry type {code}")

    def count() -> int:
        (n,) = r.take(e + "I")
        if n > _MAX_COUNT:
            raise ValueError("implausible element count")
        return n

    if kind == "Point":
        x, y = r.take(e + "2d")
        return Geometry("Point", (x, y))
    if kind == "LineString":
        return Geometry("LineString", [tuple(r.take(e + "2d")) for _ in range(count())])
    if kind == "Polygon":
        n_rings = count()
        rings = []
        for _ in range(n_rings):
            n_pts = count()
            if n_pts == 0:
                raise ValueError("zero-point ring")
            rings.append([tuple(r.take(e + "2d")) for _ in range(n_pts)])
        return Geometry("Polygon", rings)
    members = [_read_geom(r, depth + 1) for _ in range(count())]
    # nested typed-EMPTY members (legal but exotic WKB) have no WKT
    # representation in this engine's model → loud NULL, never
    # 'MULTIPOLYGON (())'
    if any(m.kind != "Point" and not m.coords for m in members):
        raise ValueError("nested empty member")
    if kind == "MultiPoint":
        if any(m.kind != "Point" for m in members):
            raise ValueError("MULTIPOINT member is not a point")
        return Geometry("MultiPoint", [m.coords for m in members])
    if kind == "MultiLineString":
        if any(m.kind != "LineString" for m in members):
            raise ValueError("MULTILINESTRING member is not a linestring")
        return Geometry("MultiLineString", [m.coords for m in members])
    if kind == "MultiPolygon":
        if any(m.kind != "Polygon" for m in members):
            raise ValueError("MULTIPOLYGON member is not a polygon")
        return Geometry("MultiPolygon", [m.coords for m in members])
    return Geometry("GeometryCollection", members)


def wkb_to_geom(buf) -> Geometry | None:
    """Decode WKB (either endian, nested) — None on any malformation."""
    if buf is None:
        return None
    try:
        b = bytes(buf)
        r = _Reader(b)
        g = _read_geom(r)
        if r.pos != len(b):
            raise ValueError("trailing bytes after geometry")
        return g
    except (ValueError, struct.error):
        return None


_EMPTY_KINDS = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
    "GEOMETRYCOLLECTION": 7,
}


def wkt_to_wkb(wkt) -> bytes | None:
    if wkt is None:
        return None
    s = str(wkt).strip()
    up = s.upper()
    # Typed EMPTY (e.g. the overlay functions emit 'POLYGON EMPTY'):
    # PostGIS encodes POINT EMPTY as (NaN, NaN) and every other kind
    # as a zero-count body.
    for kind, code in _EMPTY_KINDS.items():
        if up == f"{kind} EMPTY":
            if code == 1:
                return struct.pack("<BI2d", 1, 1, float("nan"), float("nan"))
            return struct.pack("<BII", 1, code, 0)
    g = G.parse_wkt(s)
    return None if g is None else geom_to_wkb(g)


def wkb_to_wkt(buf) -> str | None:
    g = wkb_to_geom(buf)
    if g is None:
        return None
    # empty bodies round-trip as typed EMPTY, never 'LINESTRING ()'
    # (which the engine's own parser would reject)
    if g.kind == "Point" and g.coords[0] != g.coords[0]:  # NaN
        return "POINT EMPTY"
    if g.kind != "Point" and not g.coords:
        return g.kind.upper() + " EMPTY"
    return G.to_wkt(g)


@pandas_udf(BinaryType())
def st_asbinary(wkt: pd.Series) -> pd.Series:
    """ST_AsBinary: WKT → little-endian WKB (NULL-safe)."""
    return pd.Series([wkt_to_wkb(w) for w in wkt], dtype=object)


@pandas_udf(StringType())
def st_geomfromwkb(buf: pd.Series) -> pd.Series:
    """ST_GeomFromWKB: WKB (either endian) → WKT; NULL on malformed."""
    return pd.Series([wkb_to_wkt(b) for b in buf], dtype=object)


ALL_WKB_FUNCTIONS = {
    "st_asbinary": st_asbinary,
    "st_geomfromwkb": st_geomfromwkb,
}


def register_wkb_functions(spark: SparkSession) -> None:
    for name, fn in ALL_WKB_FUNCTIONS.items():
        spark.udf.register(name, fn)
