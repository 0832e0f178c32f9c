"""Linear referencing: ST_LineInterpolatePoint / ST_LineLocatePoint /
ST_LineSubstring / ST_ClosestPoint / ST_ShortestLine (F12).

PostGIS linear-referencing surface (reference src/index.ts:44-63
forwards every PostGIS-accepted scalar). Semantics, matching PostGIS:

- ``ST_LineInterpolatePoint(line, f)``: the point at fraction
  ``f ∈ [0, 1]`` of the 2-D cartesian length along a LINESTRING.
  NULL for non-linestrings or f outside [0, 1] (PostGIS raises; the
  engine-wide loud-NULL contract applies).
- ``ST_LineLocatePoint(line, point)``: the fraction of the line's
  length at the point on the line closest to the given point. Ties
  (several segments equally close) resolve to the SMALLEST fraction,
  PostGIS behavior.
- ``ST_LineSubstring(line, a, b)``: the sub-linestring from fraction
  ``a`` to ``b`` (0 ≤ a ≤ b ≤ 1). ``a == b`` returns the single
  interpolated POINT, as PostGIS. Consecutive duplicate vertices
  (slice boundary landing exactly on a vertex) are not emitted twice.
- ``ST_ClosestPoint(g, p)``: the point of ``g`` closest to point
  ``p``; supports Point / MultiPoint / LineString / MultiLineString
  left sides (the lineal+point class every formula here is exact on);
  other kinds → NULL (loud, never approximate).
- ``ST_ShortestLine(g, p)``: LINESTRING from that closest point to
  ``p`` (degenerate p-on-g gives a zero-length 2-vertex line, as
  PostGIS).

All distances are planar (SRID-agnostic cartesian, like the PostGIS
non-geography forms). Scale shape: map-only Arrow-vectorized pandas
UDFs, O(vertices) per row, no shuffle. Projections use exact float
dot products; the oracle rows compare at micro-precision (the q130 /
q131 micro-int idiom) so libm ulp differences between engines cannot
flake.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from . import geometry as G
from .geometry import Geometry


def _line(wkt) -> Geometry | None:
    if wkt is None:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None or g.kind != "LineString" or len(g.coords) < 2:
        return None
    return g


def _point(wkt) -> tuple[float, float] | None:
    if wkt is None:
        return None
    g = G.parse_wkt(str(wkt).strip())
    if g is None or g.kind != "Point":
        return None
    return g.coords


def _seg_lengths(coords) -> tuple[list[float], float]:
    lens = [math.dist(a, b) for a, b in zip(coords, coords[1:])]
    return lens, sum(lens)


def _point_at(coords, lens, total, target) -> tuple[float, float]:
    """Point at arc distance ``target`` from the start (0 ≤ target ≤ total)."""
    acc = 0.0
    for (a, b), sl in zip(zip(coords, coords[1:]), lens):
        if sl > 0 and target <= acc + sl:
            t = (target - acc) / sl
            return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        acc += sl
    return coords[-1]


def line_interpolate_point(line_wkt, frac) -> str | None:
    g = _line(line_wkt)
    if g is None or frac is None:
        return None
    f = float(frac)
    if not (0.0 <= f <= 1.0) or math.isnan(f):
        return None
    lens, total = _seg_lengths(g.coords)
    if total == 0:
        return G.to_wkt(Geometry("Point", g.coords[0]))
    return G.to_wkt(Geometry("Point", _point_at(g.coords, lens, total, f * total)))


def _project_to_segment(p, a, b) -> tuple[float, float, float]:
    """(t, qx, qy): clamped projection parameter of p on segment a→b and
    the projected point."""
    ax, ay = a
    dx, dy = b[0] - ax, b[1] - ay
    den = dx * dx + dy * dy
    if den == 0:
        return 0.0, ax, ay
    t = ((p[0] - ax) * dx + (p[1] - ay) * dy) / den
    t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
    return t, ax + t * dx, ay + t * dy


def line_locate_point(line_wkt, point_wkt) -> float | None:
    g = _line(line_wkt)
    p = _point(point_wkt)
    if g is None or p is None:
        return None
    lens, total = _seg_lengths(g.coords)
    if total == 0:
        return 0.0
    best: tuple[float, float] | None = None  # (dist2, fraction)
    acc = 0.0
    for (a, b), sl in zip(zip(g.coords, g.coords[1:]), lens):
        t, qx, qy = _project_to_segment(p, a, b)
        d2 = (p[0] - qx) ** 2 + (p[1] - qy) ** 2
        frac = (acc + t * sl) / total
        if best is None or d2 < best[0] or (d2 == best[0] and frac < best[1]):
            best = (d2, frac)
        acc += sl
    return best[1]


def line_substring(line_wkt, a, b) -> str | None:
    g = _line(line_wkt)
    if g is None or a is None or b is None:
        return None
    fa, fb = float(a), float(b)
    if math.isnan(fa) or math.isnan(fb) or not (0.0 <= fa <= fb <= 1.0):
        return None
    lens, total = _seg_lengths(g.coords)
    if total == 0:
        return G.to_wkt(Geometry("Point", g.coords[0]))
    start = _point_at(g.coords, lens, total, fa * total)
    if fa == fb:
        return G.to_wkt(Geometry("Point", start))
    end = _point_at(g.coords, lens, total, fb * total)
    pts = [start]
    acc = 0.0
    lo, hi = fa * total, fb * total
    for v, sl in zip(g.coords[1:], lens):
        acc += sl
        if lo < acc < hi and v != pts[-1]:
            pts.append(v)
    if end != pts[-1]:
        pts.append(end)
    if len(pts) == 1:  # zero-length span collapsed onto one vertex
        return G.to_wkt(Geometry("Point", pts[0]))
    return G.to_wkt(Geometry("LineString", pts))


def _closest_on_geometry(g: Geometry, p) -> tuple[float, float] | None:
    """Closest point of g to p for the supported left-side kinds."""
    if g.kind == "Point":
        return g.coords
    if g.kind == "MultiPoint":
        return min(g.coords, key=lambda q: (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2)
    if g.kind in ("LineString", "MultiLineString"):
        seqs = [g.coords] if g.kind == "LineString" else g.coords
        best = None
        for seq in seqs:
            if len(seq) == 1:
                cands = [(0.0, seq[0][0], seq[0][1])]
            else:
                cands = [_project_to_segment(p, s, e) for s, e in zip(seq, seq[1:])]
            for _t, qx, qy in cands:
                d2 = (p[0] - qx) ** 2 + (p[1] - qy) ** 2
                if best is None or d2 < best[0]:
                    best = (d2, (qx, qy))
        return best[1] if best else None
    return None


def closest_point(g_wkt, point_wkt) -> str | None:
    p = _point(point_wkt)
    if g_wkt is None or p is None:
        return None
    g = G.parse_wkt(str(g_wkt).strip())
    if g is None:
        return None
    q = _closest_on_geometry(g, p)
    if q is None:
        return None
    return G.to_wkt(Geometry("Point", q))


def shortest_line(g_wkt, point_wkt) -> str | None:
    p = _point(point_wkt)
    if g_wkt is None or p is None:
        return None
    g = G.parse_wkt(str(g_wkt).strip())
    if g is None:
        return None
    q = _closest_on_geometry(g, p)
    if q is None:
        return None
    return G.to_wkt(Geometry("LineString", [q, p]))


@pandas_udf(StringType())
def st_lineinterpolatepoint(w: pd.Series, f: pd.Series) -> pd.Series:
    return pd.Series(
        [line_interpolate_point(x, v) for x, v in zip(w, f)], dtype="object"
    )


@pandas_udf(DoubleType())
def st_linelocatepoint(w: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series([line_locate_point(x, q) for x, q in zip(w, p)], dtype="object")


@pandas_udf(StringType())
def st_linesubstring(w: pd.Series, a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [line_substring(x, u, v) for x, u, v in zip(w, a, b)], dtype="object"
    )


@pandas_udf(StringType())
def st_closestpoint(w: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series([closest_point(x, q) for x, q in zip(w, p)], dtype="object")


@pandas_udf(StringType())
def st_shortestline(w: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series([shortest_line(x, q) for x, q in zip(w, p)], dtype="object")


ALL_LINEARREF_FUNCTIONS = {
    "st_lineinterpolatepoint": st_lineinterpolatepoint,
    "st_linelocatepoint": st_linelocatepoint,
    "st_linesubstring": st_linesubstring,
    "st_closestpoint": st_closestpoint,
    "st_shortestline": st_shortestline,
}


def register_linearref_functions(spark: SparkSession) -> None:
    for name, fn in ALL_LINEARREF_FUNCTIONS.items():
        spark.udf.register(name, fn)
