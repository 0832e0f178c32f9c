"""Spatial function registry: PostGIS-style ``st_*`` over WKT columns.

Covers the reference's user-visible spatial surface (SURVEY.md §2.6):
the pushdown-translated functions F1-F11 (ST_Distance, ST_Within,
ST_Intersects, ST_Dimension, ST_GeometryType, ST_SRID, ST_AsText,
ST_GeomFrom*) and the "whatever PostGIS accepts" remainder (F12) that the
reference shipped to PostgreSQL — here they are one registry of Arrow-
vectorized pandas UDFs, usable from both the DataFrame API and
``spark.sql`` strings.

Scale design: UDFs are the slow path, so (a) everything is a pandas UDF
(Arrow batches, no per-row pickling); (b) point-only batches take a pure
numpy vectorized path with zero Python-object geometry; (c) the spatial
*join* operators in ``operators.spatial_ops`` pre-filter with JVM-side
bbox range predicates so these UDFs only see candidate pairs (the moral
equivalent of the reference's Mongo ``$near`` pushdown, its only real
optimization — mongo_extension.ts:129-152).
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, DoubleType, IntegerType, StringType

from ._register_once import once_per_session
from . import geometry as G

_POINT_EXTRACT = (
    r"^\s*POINT\s*(ZM|Z|M)?\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)"
    r"((?:\s+[-+0-9.eE]+)*)\s*\)\s*$"
)
_DIM_EXTRAS = {"Z": 1, "M": 1, "ZM": 2}


def _point_xy(s: pd.Series):
    """Vectorized POINT coordinate extraction. Returns (x, y) float arrays
    with NaN where the value is not a point. Dimensional points
    (POINT Z / M / ZM — r15, PostGIS ST_X/ST_Y answer on any point)
    contribute their first two coordinates, with the trailing-count
    checked against the tag so 'POINT Z (1 2)' stays junk.

    Parsing goes through numpy's strtod (correctly rounded) — NOT
    ``pd.to_numeric``, whose fast path (xstrtod) loses ulps on long
    decimal strings and would break exact WKT round-trips."""
    ext = s.astype("string").str.extract(_POINT_EXTRACT)
    want = ext[0].map(_DIM_EXTRAS).fillna(0)
    got = ext[3].fillna("").str.split().str.len()
    bad = want.to_numpy(dtype=np.float64) != got.to_numpy(dtype=np.float64)
    x = ext[1].fillna("nan").to_numpy(dtype="U32").astype(np.float64)
    y = ext[2].fillna("nan").to_numpy(dtype="U32").astype(np.float64)
    x[bad] = np.nan
    y[bad] = np.nan
    return x, y


def _parse_series(s: pd.Series) -> list:
    # memoize by WKT string within the batch: spatial joins broadcast a
    # small geometry side against many probe rows, so a batch typically
    # carries thousands of copies of a few dozen distinct WKTs — parse
    # each once, not once per row
    cache: dict[str, object] = {}
    out = []
    for v in s:
        if not isinstance(v, str):
            out.append(None)
        elif v in cache:
            out.append(cache[v])
        else:
            cache[v] = g = G.parse_wkt(v)
            out.append(g)
    return out


def _binary_fallback(a: pd.Series, b: pd.Series, fn, dtype=object) -> pd.Series:
    ga, gb = _parse_series(a), _parse_series(b)
    out = [fn(x, y) if x is not None and y is not None else None for x, y in zip(ga, gb)]
    return pd.Series(out, dtype=dtype)


# -- constructors ---------------------------------------------------------


@pandas_udf(StringType())
def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if (xv is None or yv is None or pd.isna(xv) or pd.isna(yv)) else G.to_wkt(G.Geometry.point(xv, yv))
            for xv, yv in zip(x, y)
        ],
        dtype=object,
    )


@pandas_udf(StringType())
def st_makeenvelope(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if any(v is None or pd.isna(v) for v in (a, b, c, d))
            else G.to_wkt(G.Geometry.box(a, b, c, d))
            for a, b, c, d in zip(minx, miny, maxx, maxy)
        ],
        dtype=object,
    )


@pandas_udf(StringType())
def st_geomfromtext(wkt: pd.Series) -> pd.Series:
    """Parse + re-serialize (normalizes whitespace/case; None if invalid)."""
    return pd.Series([(lambda g: G.to_wkt(g) if g else None)(G.parse_wkt(v) if isinstance(v, str) else None) for v in wkt], dtype=object)


@pandas_udf(StringType())
def st_geomfromgeojson(js: pd.Series) -> pd.Series:
    """GeoJSON geometry (or full Feature) string → WKT.
    Reference: json_extension.ts:131-158 (ST_GeomFromGeoJSON ingestion)."""
    out = []
    for v in js:
        g = None
        if isinstance(v, str) and v.strip():
            try:
                obj = json.loads(v)
                if isinstance(obj, dict) and obj.get("type") == "Feature":
                    obj = obj.get("geometry")
                g = G.from_geojson(obj)
            except (ValueError, TypeError, KeyError):
                g = None
        out.append(G.to_wkt(g) if g else None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_geomfromgml(xml: pd.Series) -> pd.Series:
    """GML 2/3 fragment (Point/LineString/Polygon, coordinates or
    pos/posList) → WKT. Reference: extension/xml_extension.ts:283-308
    (ST_GeomFromGML injected into the rebuilt projection)."""
    return pd.Series(
        [(lambda g: G.to_wkt(g) if g else None)(G.from_xml_geometry(v) if isinstance(v, str) else None) for v in xml],
        dtype=object,
    )


@pandas_udf(StringType())
def st_geomfromkml(xml: pd.Series) -> pd.Series:
    """KML fragment (Point/LineString/Polygon Placemark geometry) → WKT.
    Reference: extension/xml_extension.ts:340-369 (ST_GeomFromKML)."""
    return pd.Series(
        [(lambda g: G.to_wkt(g) if g else None)(G.from_xml_geometry(v) if isinstance(v, str) else None) for v in xml],
        dtype=object,
    )


# -- serializers ----------------------------------------------------------


@pandas_udf(StringType())
def st_astext(wkt: pd.Series) -> pd.Series:
    return pd.Series([(lambda g: G.to_wkt(g) if g else None)(G.parse_wkt(v) if isinstance(v, str) else None) for v in wkt], dtype=object)


@pandas_udf(StringType())
def st_asgeojson(wkt: pd.Series) -> pd.Series:
    return pd.Series(
        [(lambda g: G.to_geojson(g) if g else None)(G.parse_wkt(v) if isinstance(v, str) else None) for v in wkt],
        dtype=object,
    )


# -- accessors ------------------------------------------------------------


@pandas_udf(DoubleType())
def st_x(wkt: pd.Series) -> pd.Series:
    x, _ = _point_xy(wkt)
    return pd.Series(x)


@pandas_udf(DoubleType())
def st_y(wkt: pd.Series) -> pd.Series:
    _, y = _point_xy(wkt)
    return pd.Series(y)


@pandas_udf(IntegerType())
def st_srid(wkt: pd.Series) -> pd.Series:
    """Fixed 4326 like the reference's data (F6: geo:srid, BaseX 9.7);
    NULL for unparseable input like every sibling accessor."""
    return pd.Series(
        [
            4326
            if isinstance(v, str) and G.parse_wkt(v) is not None
            else None
            for v in wkt
        ],
        dtype="Int32",
    )


@pandas_udf(IntegerType())
def st_dimension(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.dimension(g) if g else None)
    return pd.Series(out, dtype="Int32")


@pandas_udf(StringType())
def st_geometrytype(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.geometry_type(g) if g else None)
    return pd.Series(out, dtype=object)


def _bbox_coord(wkt: pd.Series, idx: int) -> pd.Series:
    """One bbox coordinate per geometry (PostGIS ST_XMin/YMin/XMax/YMax).
    Point batches take the vectorized numpy path (x == xmin == xmax)."""
    x, y = _point_xy(wkt)
    fast_vals = (x, y, x, y)[idx]
    fast = ~np.isnan(fast_vals)
    if fast.all():
        return pd.Series(fast_vals)
    res = np.full(len(wkt), np.nan)
    res[fast] = fast_vals[fast]
    wv = wkt.reset_index(drop=True)
    for i in np.flatnonzero(~fast):
        g = G.parse_wkt(wv.iloc[i]) if isinstance(wv.iloc[i], str) else None
        if g is not None:
            res[i] = G.bbox(g)[idx]
    return pd.Series(res)


@pandas_udf(DoubleType())
def st_xmin(wkt: pd.Series) -> pd.Series:
    return _bbox_coord(wkt, 0)


@pandas_udf(DoubleType())
def st_ymin(wkt: pd.Series) -> pd.Series:
    return _bbox_coord(wkt, 1)


@pandas_udf(DoubleType())
def st_xmax(wkt: pd.Series) -> pd.Series:
    return _bbox_coord(wkt, 2)


@pandas_udf(DoubleType())
def st_ymax(wkt: pd.Series) -> pd.Series:
    return _bbox_coord(wkt, 3)


@pandas_udf(DoubleType())
def st_area(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.area(g) if g else None)
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def st_length(wkt: pd.Series) -> pd.Series:
    """PostGIS parity (ADVICE r6): linear parts only, 0 for polygons —
    ring boundaries are ``st_perimeter``'s job."""
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.length(g) if g else None)
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def st_perimeter(wkt: pd.Series) -> pd.Series:
    """ST_Perimeter: boundary length of areal geometry (holes included),
    0 for points/lines — the measure q52/q94/q124 report for polygons."""
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.perimeter(g) if g else None)
    return pd.Series(out, dtype="float64")


@pandas_udf(StringType())
def st_envelope(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.to_wkt(G.envelope(g)) if g else None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_convexhull(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.to_wkt(G.convex_hull(g)) if g else None)
    return pd.Series(out, dtype=object)


@pandas_udf(IntegerType())
def st_npoints(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.n_points(g) if g else None)
    return pd.Series(out, dtype="Int32")


@pandas_udf(StringType())
def st_centroid(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        g = G.parse_wkt(v) if isinstance(v, str) else None
        out.append(G.to_wkt(G.Geometry.point(*G.centroid(g))) if g else None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_buffer(wkt: pd.Series, dist: pd.Series) -> pd.Series:
    """Real round-join buffers (functions/buffer.py, r9): NULL for
    junk/outside-class, 'POLYGON EMPTY' for empty results. NULL doubles
    arrive as NaN under Arrow — buffer_wkt guards that itself."""
    from .buffer import buffer_wkt  # lazy: buffer.py imports spatial's deps

    return pd.Series([buffer_wkt(v, d) for v, d in zip(wkt, dist)], dtype=object)


@pandas_udf(StringType())
def st_bufferstyle(wkt: pd.Series, dist: pd.Series, style: pd.Series) -> pd.Series:
    """PostGIS ST_Buffer's 3-argument style form (r14): 'quad_segs=N
    endcap=round|flat|square join=round|mitre|bevel mitre_limit=X'.
    Spark SQL Python UDFs are fixed-arity, so the optional third
    argument registers under its own name; st_bufferstyle(g, d, '') ≡
    st_buffer(g, d). Unknown style tokens → loud NULL."""
    from .buffer import bufferstyle_wkt  # lazy: buffer.py imports spatial's deps

    return pd.Series(
        [bufferstyle_wkt(v, d, s) for v, d, s in zip(wkt, dist, style)],
        dtype=object,
    )


# -- binary predicates & measures ----------------------------------------


@pandas_udf(DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """Planar distance (F1). Point-point batches run fully in numpy."""
    ax, ay = _point_xy(a)
    bx, by = _point_xy(b)
    fast = ~(np.isnan(ax) | np.isnan(bx))
    if fast.all():
        dx, dy = ax - bx, ay - by
        return pd.Series(np.sqrt(dx * dx + dy * dy))
    res = np.full(len(a), np.nan)
    dx, dy = ax[fast] - bx[fast], ay[fast] - by[fast]
    res[fast] = np.sqrt(dx * dx + dy * dy)
    slow_idx = np.flatnonzero(~fast)
    av, bv = a.reset_index(drop=True), b.reset_index(drop=True)
    for i in slow_idx:
        ga = G.parse_wkt(av.iloc[i]) if isinstance(av.iloc[i], str) else None
        gb = G.parse_wkt(bv.iloc[i]) if isinstance(bv.iloc[i], str) else None
        if ga is not None and gb is not None:
            res[i] = G.distance(ga, gb)
    return pd.Series(res)


@pandas_udf(DoubleType())
def st_distance_sphere(a: pd.Series, b: pd.Series) -> pd.Series:
    """Haversine meters between points — replaces the reference's
    ``c*111.32*1000`` degrees hack (mongo_extension.ts:142-151)."""
    ax, ay = _point_xy(a)
    bx, by = _point_xy(b)
    r = 6371008.8
    phi1, phi2 = np.radians(ay), np.radians(by)
    dphi = phi2 - phi1
    dlmb = np.radians(bx - ax)
    h = np.sin(dphi / 2) ** 2 + np.cos(phi1) * np.cos(phi2) * np.sin(dlmb / 2) ** 2
    return pd.Series(2 * r * np.arcsin(np.sqrt(h)))


@pandas_udf(BooleanType())
def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
    """OGC ST_Within: covered by AND interiors intersect — a point on
    the container's boundary is NOT within (the ST_Within/ST_Covers
    distinction; r10). Lazy import: relations.py imports this module."""
    from .relations import within_ogc

    return _binary_fallback(a, b, within_ogc, dtype="boolean")


@pandas_udf(BooleanType())
def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
    from .relations import within_ogc

    return _binary_fallback(a, b, lambda x, y: within_ogc(y, x), dtype="boolean")


@pandas_udf(BooleanType())
def st_coveredby(a: pd.Series, b: pd.Series) -> pd.Series:
    """PostGIS ST_CoveredBy: pure point-set coverage, boundary contact
    legal (geometry.within's native semantics)."""
    return _binary_fallback(a, b, G.within, dtype="boolean")


@pandas_udf(BooleanType())
def st_covers(a: pd.Series, b: pd.Series) -> pd.Series:
    return _binary_fallback(a, b, G.contains, dtype="boolean")


@pandas_udf(BooleanType())
def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    return _binary_fallback(a, b, G.intersects, dtype="boolean")


@pandas_udf(BooleanType())
def st_dwithin(a: pd.Series, b: pd.Series, d: pd.Series) -> pd.Series:
    ax, ay = _point_xy(a)
    bx, by = _point_xy(b)
    fast = ~(np.isnan(ax) | np.isnan(bx))
    out = pd.Series([None] * len(a), dtype="boolean")
    dv = pd.to_numeric(d, errors="coerce").to_numpy(dtype=np.float64)
    dxf, dyf = ax[fast] - bx[fast], ay[fast] - by[fast]
    out[fast] = np.sqrt(dxf * dxf + dyf * dyf) <= dv[fast]
    slow_idx = np.flatnonzero(~fast)
    av, bv = a.reset_index(drop=True), b.reset_index(drop=True)
    for i in slow_idx:
        ga = G.parse_wkt(av.iloc[i]) if isinstance(av.iloc[i], str) else None
        gb = G.parse_wkt(bv.iloc[i]) if isinstance(bv.iloc[i], str) else None
        if ga is not None and gb is not None:
            out.iloc[i] = G.distance(ga, gb) <= dv[i]
    return out


ALL_FUNCTIONS = {
    "st_point": st_point,
    "st_makeenvelope": st_makeenvelope,
    "st_geomfromtext": st_geomfromtext,
    "st_geomfromgeojson": st_geomfromgeojson,
    "st_geomfromgml": st_geomfromgml,
    "st_geomfromkml": st_geomfromkml,
    "st_astext": st_astext,
    "st_asgeojson": st_asgeojson,
    "st_x": st_x,
    "st_y": st_y,
    "st_srid": st_srid,
    "st_xmin": st_xmin,
    "st_ymin": st_ymin,
    "st_xmax": st_xmax,
    "st_ymax": st_ymax,
    "st_dimension": st_dimension,
    "st_geometrytype": st_geometrytype,
    "st_area": st_area,
    "st_length": st_length,
    "st_perimeter": st_perimeter,
    "st_envelope": st_envelope,
    "st_convexhull": st_convexhull,
    "st_npoints": st_npoints,
    "st_centroid": st_centroid,
    "st_buffer": st_buffer,
    "st_bufferstyle": st_bufferstyle,
    "st_distance": st_distance,
    "st_distance_sphere": st_distance_sphere,
    # the modern PostGIS spelling (2.2+ ST_DistanceSphere) — same UDF
    "st_distancesphere": st_distance_sphere,
    "st_within": st_within,
    "st_contains": st_contains,
    "st_coveredby": st_coveredby,
    "st_covers": st_covers,
    "st_intersects": st_intersects,
    "st_dwithin": st_dwithin,
}


@once_per_session
def register_spatial_functions(spark: SparkSession) -> None:
    """Register every st_* function for use in spark.sql strings — the
    engine-side analog of the reference's per-driver capability tables
    (extension/extension.ts:35-83)."""
    for name, fn in ALL_FUNCTIONS.items():
        spark.udf.register(name, fn)
