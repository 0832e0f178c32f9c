"""Geometry editors: ST_AddPoint / ST_SetPoint / ST_RemovePoint /
ST_FlipCoordinates / ST_Segmentize / ST_Expand (F12).

PostGIS vertex-editing surface (reference src/index.ts:44-63 forwards
every PostGIS-accepted scalar). Semantics, matching PostGIS:

- ``ST_AddPoint(line, pt, pos)``: insert ``pt`` at 0-based position
  ``pos``; ``pos = -1`` appends (the PostGIS 2-arg default — SQL
  callers pass -1 explicitly since UDF names cannot overload).
  LINESTRING + POINT only; out-of-range position → NULL (PostGIS
  raises; the engine-wide loud-NULL contract applies).
- ``ST_SetPoint(line, idx, pt)``: replace the vertex at 0-based
  ``idx``; negative counts from the end (-1 = last), PostGIS behavior.
- ``ST_RemovePoint(line, idx)``: drop the vertex at 0-based ``idx``;
  NULL when out of range or when removal would leave fewer than two
  points (PostGIS raises for both).
- ``ST_FlipCoordinates(g)``: swap x and y in every coordinate of any
  geometry (the axis-order repair tool).
- ``ST_Segmentize(g, max_len)``: subdivide every segment longer than
  ``max_len`` into ``ceil(len / max_len)`` EQUAL parts (the PostGIS
  planar rule — no segment of the result exceeds ``max_len``; original
  vertices are all preserved). LineString/MultiLineString/Polygon/
  MultiPolygon; points pass through; ``max_len ≤ 0`` → NULL.
  Interpolated coordinates evaluate as ``a + (b − a)·i / n`` so
  integer-fixture splits (e.g. a 45-long edge in 3 parts) are exact.
- ``ST_Expand(g, d)``: the envelope of ``g`` grown by ``d`` on every
  side, as a POLYGON in this engine's envelope ring order
  ((minx miny, maxx miny, maxx maxy, minx maxy, minx miny) — same as
  st_envelope/st_makeenvelope); degenerate boxes are legal polygons
  here rather than PostGIS's BOX2D special forms.

Scale shape: map-only Arrow-vectorized pandas UDFs, O(vertices)
(segmentize: O(output vertices)) per row, no shuffle.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import geometry as G
from .geometry import Geometry


def _num_arg(v) -> float | None:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return float(v)


def _line(wkt) -> Geometry | None:
    if wkt is None:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None or g.kind != "LineString":
        return None
    return g


def _point(wkt) -> tuple[float, float] | None:
    if wkt is None:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None or g.kind != "Point":
        return None
    return g.coords


def add_point(line_wkt, point_wkt, pos) -> str | None:
    g = _line(line_wkt)
    p = _point(point_wkt)
    i = _num_arg(pos)
    if g is None or p is None or i is None:
        return None
    i = int(i)
    n = len(g.coords)
    if i == -1:
        i = n
    if i < 0 or i > n:
        return None
    return G.to_wkt(Geometry("LineString", g.coords[:i] + [p] + g.coords[i:]))


def set_point(line_wkt, idx, point_wkt) -> str | None:
    g = _line(line_wkt)
    p = _point(point_wkt)
    i = _num_arg(idx)
    if g is None or p is None or i is None:
        return None
    i = int(i)
    n = len(g.coords)
    if i < 0:
        i += n
    if i < 0 or i >= n:
        return None
    return G.to_wkt(Geometry("LineString", g.coords[:i] + [p] + g.coords[i + 1 :]))


def remove_point(line_wkt, idx) -> str | None:
    g = _line(line_wkt)
    i = _num_arg(idx)
    if g is None or i is None:
        return None
    i = int(i)
    n = len(g.coords)
    if i < 0 or i >= n or n <= 2:
        return None
    return G.to_wkt(Geometry("LineString", g.coords[:i] + g.coords[i + 1 :]))


def _flip(g: Geometry) -> Geometry:
    if g.kind == "Point":
        return Geometry(g.kind, (g.coords[1], g.coords[0]))
    if g.kind in ("LineString", "MultiPoint"):
        return Geometry(g.kind, [(y, x) for x, y in g.coords])
    if g.kind in ("Polygon", "MultiLineString"):
        return Geometry(g.kind, [[(y, x) for x, y in seq] for seq in g.coords])
    if g.kind == "MultiPolygon":
        return Geometry(
            g.kind, [[[(y, x) for x, y in r] for r in poly] for poly in g.coords]
        )
    return Geometry("GeometryCollection", [_flip(s) for s in g.coords])


def flip_coordinates(wkt) -> str | None:
    if wkt is None:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None:
        return None
    return G.to_wkt(_flip(g))


def _segmentize_seq(seq, max_len: float):
    out = [seq[0]]
    for a, b in zip(seq, seq[1:]):
        d = math.dist(a, b)
        parts = max(1, math.ceil(d / max_len - 1e-12))
        for i in range(1, parts):
            out.append(
                (a[0] + (b[0] - a[0]) * i / parts, a[1] + (b[1] - a[1]) * i / parts)
            )
        out.append(b)
    return out


def segmentize(wkt, max_len) -> str | None:
    m = _num_arg(max_len)
    if wkt is None or m is None or m <= 0:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None:
        return None
    if g.kind in ("Point", "MultiPoint"):
        return G.to_wkt(g)
    if g.kind == "LineString":
        return G.to_wkt(Geometry(g.kind, _segmentize_seq(g.coords, m)))
    if g.kind in ("MultiLineString", "Polygon"):
        return G.to_wkt(
            Geometry(g.kind, [_segmentize_seq(seq, m) for seq in g.coords])
        )
    if g.kind == "MultiPolygon":
        return G.to_wkt(
            Geometry(
                g.kind,
                [[_segmentize_seq(r, m) for r in poly] for poly in g.coords],
            )
        )
    return None  # GeometryCollection: loud-NULL (PostGIS recurses; rare)


def _bounds(g: Geometry):
    pts: list[tuple[float, float]] = []

    def walk(x):
        if isinstance(x, tuple):
            pts.append(x)
        elif isinstance(x, Geometry):
            walk(x.coords)
        else:
            for e in x:
                walk(e)

    walk(g)
    if not pts:
        return None
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def expand(wkt, dist) -> str | None:
    d = _num_arg(dist)
    if wkt is None or d is None:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None:
        return None
    b = _bounds(g)
    if b is None:
        return None
    minx, miny, maxx, maxy = b
    return G.to_wkt(Geometry.box(minx - d, miny - d, maxx + d, maxy + d))


@pandas_udf(StringType())
def st_addpoint(w: pd.Series, p: pd.Series, i: pd.Series) -> pd.Series:
    return pd.Series(
        [add_point(a, b, c) for a, b, c in zip(w, p, i)], dtype="object"
    )


@pandas_udf(StringType())
def st_setpoint(w: pd.Series, i: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series(
        [set_point(a, b, c) for a, b, c in zip(w, i, p)], dtype="object"
    )


@pandas_udf(StringType())
def st_removepoint(w: pd.Series, i: pd.Series) -> pd.Series:
    return pd.Series([remove_point(a, b) for a, b in zip(w, i)], dtype="object")


@pandas_udf(StringType())
def st_flipcoordinates(w: pd.Series) -> pd.Series:
    return pd.Series([flip_coordinates(a) for a in w], dtype="object")


@pandas_udf(StringType())
def st_segmentize(w: pd.Series, m: pd.Series) -> pd.Series:
    return pd.Series([segmentize(a, b) for a, b in zip(w, m)], dtype="object")


@pandas_udf(StringType())
def st_expand(w: pd.Series, d: pd.Series) -> pd.Series:
    return pd.Series([expand(a, b) for a, b in zip(w, d)], dtype="object")


ALL_EDITOR_FUNCTIONS = {
    "st_addpoint": st_addpoint,
    "st_setpoint": st_setpoint,
    "st_removepoint": st_removepoint,
    "st_flipcoordinates": st_flipcoordinates,
    "st_segmentize": st_segmentize,
    "st_expand": st_expand,
}


def register_editor_functions(spark: SparkSession) -> None:
    for name, fn in ALL_EDITOR_FUNCTIONS.items():
        spark.udf.register(name, fn)
