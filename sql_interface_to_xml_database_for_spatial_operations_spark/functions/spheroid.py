"""Spheroidal (ellipsoidal) distances: ST_DistanceSpheroid and
ST_LengthSpheroid on WGS84 (F12 remainder, r14 continuation — the
reference forwards both names to PostGIS verbatim, src/index.ts:44-63).

Kernel: Vincenty's inverse formulae (Vincenty 1975, Survey Review
XXIII 176) on the WGS84 ellipsoid a = 6378137, f = 1/298.257223563 —
the published iteration with the λ fixed point driven to 1e-14 rad
(sub-micrometre in distance; the equatorial geodesic's fixed point is
λ* = L/(1−f), giving s = a·L exactly in the limit, which the q169
oracle pins against the closed form a·radians(Δλ) at millimetre
precision). The classic Vincenty non-convergence window around
antipodal pairs is a documented loud NULL (PostGIS's GeographicLib
kernel converges there; nearly-antipodal measurement is out of this
kernel's contract). Published anchor: the Vincenty/GDA reference line
Flinders Peak → Buninyong = 54 972.271 m (unit-test pinned to 2 mm).

- ``st_distancespheroid(pt_a, pt_b)`` — POINT × POINT only (loud NULL
  otherwise; PostGIS accepts any geometry via its C loop, the puntal
  restriction is documented); coordinates are lon/lat degrees, range
  checked like st_geohash.
- ``st_lengthspheroid(line)`` — sum of per-segment Vincenty distances
  over LINESTRING / MULTILINESTRING (points → 0.0 like ST_Length;
  areal input → loud NULL).

Map-only Arrow-batched pandas UDFs; ~12 iterations per pair (the
linear rate is f ≈ 0.0033).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from . import geometry as G
from . import overlay as _ov

_A = 6378137.0
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)
_MAX_ITER = 200
_EPS = 1e-14  # λ fixed-point residual (radians)


def vincenty_inverse(lon1, lat1, lon2, lat2) -> float | None:
    """Geodesic distance in metres, or None on non-convergence."""
    if lon1 == lon2 and lat1 == lat2:
        return 0.0
    u1 = math.atan((1.0 - _F) * math.tan(math.radians(lat1)))
    u2 = math.atan((1.0 - _F) * math.tan(math.radians(lat2)))
    big_l = math.radians(lon2 - lon1)
    sin_u1, cos_u1 = math.sin(u1), math.cos(u1)
    sin_u2, cos_u2 = math.sin(u2), math.cos(u2)
    lam = big_l
    for _ in range(_MAX_ITER):
        sin_lam, cos_lam = math.sin(lam), math.cos(lam)
        sin_sigma = math.sqrt(
            (cos_u2 * sin_lam) ** 2
            + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
        )
        if sin_sigma == 0.0:
            return 0.0  # coincident on the ellipsoid
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cos_u1 * cos_u2 * sin_lam / sin_sigma
        cos2_alpha = 1.0 - sin_alpha * sin_alpha
        if cos2_alpha == 0.0:
            cos_2sigma_m = 0.0  # equatorial line
        else:
            cos_2sigma_m = cos_sigma - 2.0 * sin_u1 * sin_u2 / cos2_alpha
        c = _F / 16.0 * cos2_alpha * (4.0 + _F * (4.0 - 3.0 * cos2_alpha))
        lam_prev = lam
        lam = big_l + (1.0 - c) * _F * sin_alpha * (
            sigma
            + c * sin_sigma * (
                cos_2sigma_m
                + c * cos_sigma * (-1.0 + 2.0 * cos_2sigma_m * cos_2sigma_m)
            )
        )
        if abs(lam - lam_prev) < _EPS:
            break
    else:
        return None  # the documented near-antipodal window — loud
    u_sq = cos2_alpha * (_A * _A - _B * _B) / (_B * _B)
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    big_b = u_sq / 1024.0 * (
        256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq))
    )
    delta_sigma = big_b * sin_sigma * (
        cos_2sigma_m
        + big_b / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos_2sigma_m * cos_2sigma_m)
            - big_b / 6.0 * cos_2sigma_m
            * (-3.0 + 4.0 * sin_sigma * sin_sigma)
            * (-3.0 + 4.0 * cos_2sigma_m * cos_2sigma_m)
        )
    )
    return _B * big_a * (sigma - delta_sigma)


def _lonlat(wkt):
    if wkt is None:
        return None
    s = str(wkt).strip()
    if _ov._EMPTY_RE.match(s.upper()):
        return None
    g = G.parse_wkt(s)
    if g is None or g.kind != "Point":
        return None
    x, y = g.coords
    if not (math.isfinite(x) and math.isfinite(y)):
        return None
    if not (-180.0 <= x <= 180.0 and -90.0 <= y <= 90.0):
        return None
    return (x, y)


def distancespheroid_of(a_wkt, b_wkt) -> float | None:
    a, b = _lonlat(a_wkt), _lonlat(b_wkt)
    if a is None or b is None:
        return None
    return vincenty_inverse(a[0], a[1], b[0], b[1])


def lengthspheroid_of(wkt) -> float | None:
    if wkt is None:
        return None
    s = str(wkt).strip()
    m = _ov._EMPTY_RE.match(s.upper())
    if m:
        return 0.0 if m.group(1) in (
            "LINESTRING", "MULTILINESTRING", "POINT", "MULTIPOINT"
        ) else None
    g = G.parse_wkt(s)
    if g is None:
        return None
    if g.kind in ("Point", "MultiPoint"):
        return 0.0
    if g.kind == "LineString":
        chains = [g.coords]
    elif g.kind == "MultiLineString":
        chains = g.coords
    else:
        return None  # areal/mixed: loud (ST_Length semantics are lineal)
    total = 0.0
    for ch in chains:
        for (x1, y1), (x2, y2) in zip(ch, ch[1:]):
            if not all(math.isfinite(v) for v in (x1, y1, x2, y2)):
                return None
            if not (-180.0 <= x1 <= 180.0 and -90.0 <= y1 <= 90.0):
                return None
            if not (-180.0 <= x2 <= 180.0 and -90.0 <= y2 <= 90.0):
                return None
            d = vincenty_inverse(x1, y1, x2, y2)
            if d is None:
                return None
            total += d
    return total


@pandas_udf(DoubleType())
def st_distancespheroid(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        try:
            out.append(distancespheroid_of(x, y))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="object").astype("float64")


@pandas_udf(DoubleType())
def st_lengthspheroid(wkt: pd.Series) -> pd.Series:
    out = []
    for w in wkt:
        try:
            out.append(lengthspheroid_of(w))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="object").astype("float64")


ALL_SPHEROID_FUNCTIONS = {
    "st_distancespheroid": st_distancespheroid,
    "st_lengthspheroid": st_lengthspheroid,
}


def register_spheroid_functions(spark: SparkSession) -> None:
    for name, fn in ALL_SPHEROID_FUNCTIONS.items():
        spark.udf.register(name, fn)
