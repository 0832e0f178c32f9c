"""ST_Transform — EPSG:4326 ↔ EPSG:3857 reprojection (F12 remainder).

PostGIS users reach ``ST_Transform(geom, srid)`` through the forwarding
surface (reference src/index.ts:44-63). A general CRS engine needs proj
(not in this runtime); the one transform pair that covers the web-map
workflows the reference's demo serves is WGS84 lon/lat ↔ spherical Web
Mercator, whose closed-form formulas are public (EPSG guidance note
7-2 / the standard spherical-Mercator derivation):

    x = R·λ·π/180          λ = x/R · 180/π
    y = R·ln(tan(π/4 + φ·π/360))    φ = (2·atan(exp(y/R)) − π/2)·180/π

with R = 6378137 (the WGS84 semi-major axis — spherical Mercator by
definition uses it for both axes). Latitudes are clamped to ±85.051129°
(the Mercator square's edge), matching the web-mapping convention.
Other SRID pairs raise a loud ValueError rather than silently passing
coordinates through — adding proj swaps one dispatcher branch.

Scale shape: map-only vectorized pandas UDF over WKT, no shuffle, same
batch-level parse memoization pattern as the rest of the registry. The
transform is a per-vertex closed form, so cost is linear in vertices
regardless of geometry complexity.

Oracle note: pairing with DuckDB requires transcendental functions
(ln/tan/atan/exp) whose last-ulp behavior differs across libm builds, so
a driver row should use the micro-int idiom at a precision the ulp noise
cannot reach (≤1e-6 of a meter is safe: doubles carry ~1e-9 relative
error at Mercator magnitudes ~2e7, i.e. ~1e-2 µm).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from . import geometry as G
from .geometry import Geometry

R = 6378137.0
MAX_LAT = 85.05112877980659  # atan(sinh(pi)) in degrees: the Mercator square


def _fwd(lon: float, lat: float) -> tuple[float, float]:
    lat = max(-MAX_LAT, min(MAX_LAT, lat))
    x = R * math.radians(lon)
    # atanh(sin φ) ≡ ln(tan(π/4 + φ/2)), but exact at φ=0 in floats
    # (tan(π/4) is not exactly 1, which would put the equator at y≈-7e-10)
    y = R * math.atanh(math.sin(math.radians(lat)))
    return x, y


def _inv(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / R)
    lat = math.degrees(2.0 * math.atan(math.exp(y / R)) - math.pi / 2.0)
    return lon, lat


def _map_coords(g: Geometry, fn) -> Geometry:
    if g.kind == "Point":
        return Geometry("Point", fn(*g.coords))
    if g.kind in ("LineString", "MultiPoint"):
        return Geometry(g.kind, [fn(*p) for p in g.coords])
    if g.kind in ("Polygon", "MultiLineString"):
        return Geometry(g.kind, [[fn(*p) for p in seq] for seq in g.coords])
    if g.kind == "MultiPolygon":
        return Geometry(
            "MultiPolygon", [[[fn(*p) for p in ring] for ring in rings] for rings in g.coords]
        )
    if g.kind == "GeometryCollection":
        return Geometry("GeometryCollection", [_map_coords(sub, fn) for sub in g.coords])
    raise ValueError(f"unknown geometry kind {g.kind!r}")


def transform(g: Geometry, srid_from: int, srid_to: int) -> Geometry:
    if srid_from == srid_to:
        return g
    if (srid_from, srid_to) == (4326, 3857):
        return _map_coords(g, _fwd)
    if (srid_from, srid_to) == (3857, 4326):
        return _map_coords(g, _inv)
    raise ValueError(
        f"no transform {srid_from}->{srid_to} in this runtime (only "
        "4326<->3857 closed forms; install proj and add a dispatcher branch)"
    )


@pandas_udf(StringType())
def st_transform(wkt: pd.Series, srid_from: pd.Series, srid_to: pd.Series) -> pd.Series:
    """NULL/malformed WKT → NULL (registry convention); an UNSUPPORTED
    SRID pair raises — a wrong CRS silently treated as a no-op would
    corrupt every downstream coordinate."""
    out = []
    for w, sf, st_ in zip(wkt, srid_from, srid_to):
        if w is None or sf is None or st_ is None or pd.isna(sf) or pd.isna(st_):
            out.append(None)
            continue
        g = G.parse_wkt(w)
        out.append(None if g is None else G.to_wkt(transform(g, int(sf), int(st_))))
    return pd.Series(out, dtype=object)


@pandas_udf(DoubleType())
def st_azimuth(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_Azimuth: bearing from point a to point b in radians, clockwise
    from north (PostGIS convention: atan2(Δx, Δy) normalized to [0, 2π)).
    NULL for non-points, NULL inputs, or coincident points (where PostGIS
    errors; the registry convention is NULL-never-crash)."""
    out = []
    for wa, wb in zip(a, b):
        ga = G.parse_wkt(wa) if wa is not None else None
        gb = G.parse_wkt(wb) if wb is not None else None
        if ga is None or gb is None or ga.kind != "Point" or gb.kind != "Point":
            out.append(None)
            continue
        dx, dy = gb.coords[0] - ga.coords[0], gb.coords[1] - ga.coords[1]
        if dx == 0.0 and dy == 0.0:
            out.append(None)
            continue
        out.append(math.atan2(dx, dy) % (2.0 * math.pi))
    return pd.Series(out, dtype="float64")


ALL_PROJECTION_FUNCTIONS = {"st_transform": st_transform, "st_azimuth": st_azimuth}


def register_projection_functions(spark: SparkSession) -> None:
    for name, fn in ALL_PROJECTION_FUNCTIONS.items():
        spark.udf.register(name, fn)
