"""ST_Translate / ST_Scale / ST_Rotate — 2-D affine transforms (F12).

PostGIS users reach the affine family through the forwarding surface
(reference src/index.ts:44-63 — any PostGIS-accepted scalar rides the
rebuilt PostgreSQL query); these are the standard definitions:

    ST_Translate(g, dx, dy):  (x, y) → (x + dx, y + dy)
    ST_Scale(g, sx, sy):      (x, y) → (x·sx, y·sy)
    ST_Rotate(g, θ):          (x, y) → (x·cosθ − y·sinθ, x·sinθ + y·cosθ)

Rotation is about the origin with θ in radians, counter-clockwise —
PostGIS ST_Rotate's two-argument form. A negative-determinant scale
(sx·sy < 0) mirrors the plane, which reverses ring orientation; vertex
ORDER is preserved verbatim in all three (PostGIS behavior — affine
maps don't renormalize winding), so consumers that care about
orientation see exactly what PostGIS would hand them.

Scale shape: map-only vectorized pandas UDFs over WKT — per-vertex
closed forms, cost linear in vertices, no shuffle, no state. Null/junk
WKT → NULL (registry-wide null-safety contract).

Oracle note: translate/scale are exact float arithmetic reproducible in
SQL; rotation is transcendental (cos/sin last-ulp differs across libm
builds) — driver rows compare micro-int (floor(x·1e6 + 0.5)), far above
ulp noise at fixture magnitudes. New module so geometry.py's verified
fingerprint stays untouched (same isolation rationale as simplify.py /
projection.py).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import geometry as G
from .geometry import Geometry


def _map_coords(g: Geometry, f) -> Geometry:
    if g.kind == "Point":
        return Geometry("Point", f(g.coords))
    if g.kind in ("LineString", "MultiPoint"):
        return Geometry(g.kind, [f(p) for p in g.coords])
    if g.kind in ("Polygon", "MultiLineString"):
        return Geometry(g.kind, [[f(p) for p in ring] for ring in g.coords])
    if g.kind == "MultiPolygon":
        return Geometry(
            g.kind, [[[f(p) for p in ring] for ring in poly] for poly in g.coords]
        )
    return Geometry("GeometryCollection", [_map_coords(s, f) for s in g.coords])


def _affine_wkt(wkt, f) -> str | None:
    if wkt is None:
        return None
    g = G.parse_wkt(wkt)
    if g is None:
        return None
    return G.to_wkt(_map_coords(g, f))


def translate_wkt(wkt, dx, dy) -> str | None:
    if dx is None or dy is None:
        return None
    return _affine_wkt(wkt, lambda p: (p[0] + dx, p[1] + dy))


def scale_wkt(wkt, sx, sy) -> str | None:
    if sx is None or sy is None:
        return None
    return _affine_wkt(wkt, lambda p: (p[0] * sx, p[1] * sy))


def rotate_wkt(wkt, theta) -> str | None:
    if theta is None:
        return None
    c, s = math.cos(theta), math.sin(theta)
    return _affine_wkt(wkt, lambda p: (p[0] * c - p[1] * s, p[0] * s + p[1] * c))


@pandas_udf(StringType())
def st_translate(w: pd.Series, dx: pd.Series, dy: pd.Series) -> pd.Series:
    return pd.Series(
        [translate_wkt(a, b, c) for a, b, c in zip(w, dx, dy)], dtype="object"
    )


@pandas_udf(StringType())
def st_scale(w: pd.Series, sx: pd.Series, sy: pd.Series) -> pd.Series:
    return pd.Series(
        [scale_wkt(a, b, c) for a, b, c in zip(w, sx, sy)], dtype="object"
    )


@pandas_udf(StringType())
def st_rotate(w: pd.Series, theta: pd.Series) -> pd.Series:
    return pd.Series(
        [rotate_wkt(a, b) for a, b in zip(w, theta)], dtype="object"
    )


ALL_AFFINE_FUNCTIONS = {
    "st_translate": st_translate,
    "st_scale": st_scale,
    "st_rotate": st_rotate,
}


def register_affine_functions(spark: SparkSession) -> None:
    for name, fn in ALL_AFFINE_FUNCTIONS.items():
        spark.udf.register(name, fn)
